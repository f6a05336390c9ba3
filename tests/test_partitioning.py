"""Partition pruning: a year filter must resolve to PartitionFilters (no
data read from pruned years)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mutable_spark.catalog import load_tables
from mutable_spark.sources.partitioning import read_partitioned, write_partitioned_by_year
from tests.conftest import SF_DIR
from tests.test_plan_shape import explain


def test_year_partition_pruning(spark, tmp_path):
    orders = load_tables(spark, SF_DIR).orders
    path = str(tmp_path / "orders_by_year")
    write_partitioned_by_year(orders, "o_orderdate", path)

    df = read_partitioned(spark, path).filter(F.col("year") == 1997)
    p = explain(df)
    pf = [l for l in p.splitlines() if "PartitionFilters" in l]
    assert pf and "year" in pf[0]

    want = orders.filter(F.year("o_orderdate") == 1997).count()
    assert df.count() == want
