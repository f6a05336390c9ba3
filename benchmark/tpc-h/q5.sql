IMPORT INTO Lineitem DSV "benchmark/tpc-h/data/lineitem.tbl" DELIMITER "|";
IMPORT INTO Orders DSV "benchmark/tpc-h/data/orders.tbl" DELIMITER "|";
IMPORT INTO Customer DSV "benchmark/tpc-h/data/customer.tbl" DELIMITER "|";
IMPORT INTO Supplier DSV "benchmark/tpc-h/data/supplier.tbl" DELIMITER "|";
IMPORT INTO Nation DSV "benchmark/tpc-h/data/nation.tbl" DELIMITER "|";
IMPORT INTO Region DSV "benchmark/tpc-h/data/region.tbl" DELIMITER "|";

SELECT
        n_name,
        SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM
        Customer,
        Orders,
        Lineitem,
        Supplier,
        Nation,
        Region
WHERE
        c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
        AND r_name = "ASIA"
        AND o_orderdate >= d'1996-01-01'
        AND o_orderdate < d'1997-01-01'
GROUP BY
        n_name
ORDER BY
        revenue DESC,
        n_name;
