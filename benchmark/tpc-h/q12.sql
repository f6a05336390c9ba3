IMPORT INTO Lineitem DSV "benchmark/tpc-h/data/lineitem.tbl" DELIMITER "|";
IMPORT INTO Orders DSV "benchmark/tpc-h/data/orders.tbl" DELIMITER "|";

SELECT
    o_orderpriority, COUNT(*)
FROM
    Lineitem,
    Orders
WHERE
    o_orderkey = l_orderkey
    AND (o_orderpriority = "1-URGENT" OR o_orderpriority = "2-HIGH")
    AND l_shipdate >= d'1996-01-01'
    AND l_shipdate < d'1997-01-01'
GROUP BY
    o_orderpriority
ORDER BY
    o_orderpriority;
