"""Queries written in *mutable's SQL dialect* and executed through the full
frontend (lex → parse → sema → DataFrame compile) — these prove the parity
surface end-to-end inside the driver's correctness gate: the dialect text
goes through `mutable_spark.dialect`, the oracle is the ANSI translation
DuckDB runs.

Aggregate choices are deliberately exact-in-any-order (COUNT, MIN/MAX,
SUM/AVG over *integral* doubles like l_quantity ≤ 2^53) because the dialect
compiler emits plain floating aggregates per mutable's typing rules — no
decimal rewrite is applied to user SQL.
"""

from __future__ import annotations

from mutable_spark.catalog import load_tables
from mutable_spark.dialect import parse
from mutable_spark.dialect.compiler import compile_select
from mutable_spark.registry import query


def _run(spark, sf_dir, sql):
    t = load_tables(spark, sf_dir)
    tables = {name: getattr(t, name) for name in vars(t)}
    return compile_select(parse(sql), tables)


@query(
    "dialect_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_orderkey % 10 AS bucket,
           CAST(TRUNC(l_quantity) AS BIGINT) AS qty_int
    FROM lineitem
    WHERE l_quantity >= 30.0 AND NOT (l_returnflag = 'N') AND l_linenumber < 5
    """,
)
def dialect_filter_project(spark, sf_dir):
    """σ+π through the dialect: CNF WHERE with NOT, `%`, and the INT()
    scalar cast (`Functions.tbl:20`, truncating like the reference)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT l_orderkey, l_linenumber, l_quantity,
               l_orderkey % 10 AS bucket,
               INT(l_quantity) AS qty_int
        FROM lineitem
        WHERE l_quantity >= 30.0 AND NOT (l_returnflag = "N") AND l_linenumber < 5
        """,
    )


@query(
    "dialect_join_group_having",
    oracle="""
    SELECT c.c_name AS name, COUNT(*) AS cnt, SUM(l.l_quantity) AS qty
    FROM customer c, orders o, lineitem l
    WHERE c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_name
    HAVING COUNT(*) > 40
    ORDER BY cnt DESC, name
    LIMIT 15
    """,
)
def dialect_join_group_having(spark, sf_dir):
    """Comma-FROM 3-way join through the dialect: the compiler splits the
    CNF WHERE into per-source filters and join predicates exactly like the
    reference's GraphBuilder (`QueryGraph.cpp:1740+`), then
    group/having/order/limit. d'…' is mutable's date-literal syntax."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c.c_name AS name, COUNT(*) AS cnt, SUM(l.l_quantity) AS qty
        FROM customer AS c, orders AS o, lineitem AS l
        WHERE c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
          AND o.o_orderdate >= d'1998-01-01'
        GROUP BY c.c_name
        HAVING COUNT(*) > 40
        ORDER BY cnt DESC, name
        LIMIT 15
        """,
    )


@query(
    "dialect_string_ops",
    oracle="""
    SELECT n_name || '/' || r_name AS tag, n_nationkey
    FROM nation, region
    WHERE n_regionkey = r_regionkey AND n_name LIKE '%A%'
    ORDER BY n_nationkey
    """,
)
def dialect_string_ops(spark, sf_dir):
    """`..` concatenation (`Sema.cpp:794-811`) and LIKE through the
    dialect."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT n_name .. "/" .. r_name AS tag, n_nationkey
        FROM nation, region
        WHERE n_regionkey = r_regionkey AND n_name LIKE "%A%"
        ORDER BY n_nationkey
        """,
    )


@query(
    "dialect_group_alias_subquery",
    oracle="""
    SELECT bucket, total
    FROM (
        SELECT o_orderkey % 7 AS bucket, COUNT(*) AS total
        FROM orders
        GROUP BY o_orderkey % 7
    ) s
    WHERE total > 100
    ORDER BY bucket
    """,
)
def dialect_group_alias_subquery(spark, sf_dir):
    """The nonstandard `GROUP BY expr AS alias` (grammar group_by-clause)
    + FROM-subquery with alias renaming (`Optimizer.cpp:242-249`)."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT bucket, total
        FROM (
            SELECT o_orderkey % 7 AS bucket, COUNT(*) AS total
            FROM orders
            GROUP BY o_orderkey % 7 AS bucket
        ) AS s
        WHERE total > 100
        ORDER BY bucket
        """,
    )


@query(
    "dialect_global_agg",
    oracle="""
    SELECT COUNT(*) AS cnt,
           SUM(l_quantity) AS total_qty,
           AVG(l_quantity) AS avg_qty,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
    """,
)
def dialect_global_agg(spark, sf_dir):
    """Global aggregation (AggregationOperator) through the dialect; AVG
    is DOUBLE and SUM of an integral double is exact in any order."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT COUNT(*) AS cnt,
               SUM(l_quantity) AS total_qty,
               AVG(l_quantity) AS avg_qty,
               MIN(l_shipdate) AS first_ship,
               MAX(l_shipdate) AS last_ship
        FROM lineitem
        WHERE l_shipdate < d'1997-06-01 00:00:00'
        """,
    )


@query(
    "dialect_correlated_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > 2.0 * (
        SELECT AVG(c2.c_acctbal) FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
)
def dialect_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery through the dialect — the reference's
    hardest semantics (`src/IR/QueryGraph.cpp:24-340`): the compiler
    decorrelates by grouping the inner query on the correlation key and
    joining the per-key aggregate back. AVG is exact here because
    c_acctbal carries 2 decimals: DOUBLE summation of ≤2^53-scaled values
    is order-independent at this cardinality, and both engines divide the
    same sum by the same count."""
    return _run(
        spark,
        sf_dir,
        """
        SELECT c.c_custkey, c.c_name, c.c_acctbal
        FROM customer AS c
        WHERE c.c_acctbal > 2.0 * (
            SELECT AVG(c2.c_acctbal) FROM customer AS c2
            WHERE c2.c_nationkey = c.c_nationkey
        )
        """,
    )
