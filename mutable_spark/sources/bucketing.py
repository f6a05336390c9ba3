"""Bucketed tables: shuffle-free co-located joins.

The reference is single-node and in-memory, so "co-location" is free; at
100 TB it's the difference between joining and re-shuffling 100 TB first.
Writing both fact tables bucketed by the join key means every future join
or aggregation on that key reads pre-partitioned data: Catalyst sees the
matching `outputPartitioning` on both sides and plans a SortMergeJoin with
ZERO Exchange operators (asserted in tests/test_bucketing.py).

This is the batch analog of the reference's sortedness "conditions"
(`include/mutable/IR/Condition.hpp:148`): a physical property carried by
the data that the optimizer exploits instead of re-establishing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally removes the Sort below a future
    SortMergeJoin — the full 'no Exchange, no Sort' plan."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed previous run can leave the managed location behind with no
    # catalog entry — Spark then refuses to create the table
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)

    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — no shuffle."""
    return spark.table(left_table).join(spark.table(right_table), on)


# --------------------------------------------------------------------------
# Registry op: the bucketed join as a driver-gated query. `write_bucketed`
# and `bucketed_join` above have plan-shape evidence (test_bucketing.py pins
# ZERO Exchange operators); this registers the same path for value-level
# driver checking — results must equal the plain shuffle join's, because
# bucketing is a physical property, not a semantic one.

import pyspark.sql.functions as F  # noqa: E402

from mutable_spark.catalog import load_tables  # noqa: E402
from mutable_spark.functions import dsum, sql_dsum  # noqa: E402
from mutable_spark.registry import query  # noqa: E402

#: (session id, sf_dir) → table-name suffix of already-written bucket tables
_BUCKETED_READY: dict[tuple, str] = {}


def _ensure_bucketed(spark: SparkSession, sf_dir: str) -> str:
    """Write orders+lineitem bucketed by orderkey once per (session,
    sf_dir); return the table-name suffix. The write is the one-time
    ingest cost the co-located read-path amortizes — exactly the
    reference's IMPORT-before-query boundary."""
    import hashlib

    key = (id(spark), sf_dir)
    if key in _BUCKETED_READY:
        return _BUCKETED_READY[key]
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t = load_tables(spark, sf_dir)
    write_bucketed(t.orders, f"msq_bkt_orders_{sfx}", "o_orderkey")
    write_bucketed(t.lineitem, f"msq_bkt_lineitem_{sfx}", "l_orderkey")
    _BUCKETED_READY[key] = sfx
    return sfx


@query(
    "op_join_bucketed",
    oracle=f"""
    SELECT o_orderkey,
           MIN(o_orderdate) AS o_orderdate,
           {sql_dsum("l_quantity")} AS sum_qty,
           COUNT(*) AS n_items
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderkey
    """,
)
def op_join_bucketed(spark, sf_dir):
    """Co-located join over bucketed storage — the 100 TB fact-fact join
    shape: orders and lineitem are persisted bucketed (and sorted) by
    orderkey, so the join needs NO Exchange and NO Sort on either side,
    and the follow-up per-order aggregation ALSO reuses the bucket
    partitioning (groupBy on the join key adds zero shuffles — the
    whole plan moves no rows between executors at any scale). The plain
    shuffle-join twin of this query is what every dialect_tpch_* q3/q12
    gate runs; bucketing is a physical property, so the driver checks
    the results are identical while tests/test_bucketing.py pins the
    exchange-free plan.

    At 100 TB: bucket count sizes to ~1-4 GB per bucket per table;
    every future orderkey join/agg (daily pipelines re-join these
    tables constantly) reads pre-partitioned data — the shuffle is paid
    once at ingest, not per query."""
    sfx = _ensure_bucketed(spark, sf_dir)
    o = spark.table(f"msq_bkt_orders_{sfx}").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = spark.table(f"msq_bkt_lineitem_{sfx}")
    j = o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    return j.groupBy("o_orderkey").agg(
        F.min("o_orderdate").alias("o_orderdate"),
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )
