"""Partitioned layout: directory-level pruning for time-filtered scans.

The reference has no partitioning at all (SURVEY §4.2: "Partitioning/
shuffling — absent"); at 100 TB, date-partitioned layout is what turns a
"scan everything" query into an I/O plan proportional to the queried
window. Writing facts as `.../year=YYYY/part-*.parquet` makes Catalyst
resolve time predicates at *planning* time (PartitionFilters — zero data
read for pruned partitions), and dynamic partition pruning extends that to
join-derived predicates at runtime.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_partitioned_by_year(
    df: DataFrame, ts_col: str, path: str
) -> None:
    """Persist with a derived year partition column (hive-style dirs)."""
    (
        df.withColumn("year", F.year(ts_col))
        .write.mode("overwrite")
        .partitionBy("year")
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
