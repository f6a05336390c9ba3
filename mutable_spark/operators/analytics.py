"""Analytics operators beyond the reference's surface: DISTINCT, set
operations, top-k per group, pivot, cube — all absent from the reference
(SURVEY §2.6 no windows, §2.8 no set ops, no DISTINCT keyword) but table
stakes for an analytics engine — plus approximate sketches for the 100 TB
regime (rows-only checks: sketch internals are engine-specific).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from mutable_spark.catalog import load_tables
from mutable_spark.functions import dsum, sql_dsum
from mutable_spark.registry import query


@query(
    "op_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def op_distinct(spark, sf_dir):
    """DISTINCT (no keyword exists in the reference's grammar): hash
    aggregation without aggregates; map-side partial dedup keeps the
    shuffle tiny."""
    li = load_tables(spark, sf_dir).lineitem
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "op_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def op_count_distinct(spark, sf_dir):
    """Exact multi-column DISTINCT aggregates (Spark expands to two-phase
    aggregation per distinct column automatically)."""
    li = load_tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
    )


@query("op_approx_sketches")  # HLL/KLL internals are engine-specific → rows-only
def op_approx_sketches(spark, sf_dir):
    """Approximate sketches — the 100 TB substitutes for exact distinct/
    quantile: approx_count_distinct (HyperLogLog++) and percentile_approx.
    Deterministic for a fixed input/partitioning but not portable across
    engines, hence no SQL oracle."""
    li = load_tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
    )


@query(
    "op_set_ops",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def op_set_ops(spark, sf_dir):
    """Set operation (INTERSECT; the grammar has no UNION/INTERSECT/EXCEPT
    at all, SURVEY §2.8): nation keys having both customers and
    suppliers."""
    t = load_tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("k")).intersect(
        t.supplier.select(F.col("s_nationkey").alias("k"))
    )


@query(
    "op_except",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def op_except(spark, sf_dir):
    """EXCEPT: nations with customers but no suppliers."""
    t = load_tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("k")).subtract(
        t.supplier.select(F.col("s_nationkey").alias("k"))
    )


@query(
    "op_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def op_topk_per_group(spark, sf_dir):
    """Top-3 orders by value per priority: row_number window + filter.
    One shuffle on the partition key; the unique o_orderkey tiebreak makes
    the result deterministic."""
    o = load_tables(spark, sf_dir).orders
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@query(
    "op_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS O,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def op_pivot(spark, sf_dir):
    """Pivot l_linestatus into columns (FILTERed aggregates are the ANSI
    equivalent — NULL for empty cells in both engines)."""
    li = load_tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )


@query(
    "op_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt, {sql_dsum('l_quantity')} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def op_cube(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass (the reference has no grouping sets, SURVEY §2.5). Spark expands
    the cube before the shuffle, so it's still a single aggregation."""
    li = load_tables(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("l_quantity").alias("qty")
    )
