IMPORT INTO Lineitem DSV "benchmark/tpc-h/data/lineitem.tbl" DELIMITER "|";
IMPORT INTO Orders DSV "benchmark/tpc-h/data/orders.tbl" DELIMITER "|";
IMPORT INTO Customer DSV "benchmark/tpc-h/data/customer.tbl" DELIMITER "|";
IMPORT INTO Nation DSV "benchmark/tpc-h/data/nation.tbl" DELIMITER "|";

SELECT
        c_custkey,
        c_name,
        SUM(l_extendedprice * (1 - l_discount)) AS revenue,
        c_acctbal,
        n_name,
        c_mktsegment
FROM
        Customer,
        Orders,
        Lineitem,
        Nation
WHERE
        c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND c_nationkey = n_nationkey
        AND o_orderdate >= d'1996-10-01'
        AND o_orderdate < d'1997-01-01'
        AND l_returnflag = "R"
GROUP BY
        c_custkey,
        c_name,
        c_acctbal,
        n_name,
        c_mktsegment
ORDER BY
        revenue DESC,
        c_custkey
LIMIT 20;
