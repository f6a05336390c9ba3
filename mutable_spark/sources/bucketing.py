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
