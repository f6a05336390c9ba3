"""Bucketed joins must plan with zero Exchange operators (the shuffle-free
co-located join — the 100 TB pattern bucketing exists for)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mutable_spark.catalog import load_tables
from mutable_spark.sources.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_DIR
from tests.test_plan_shape import explain


def test_bucketed_join_no_shuffle(spark):
    t = load_tables(spark, SF_DIR)
    write_bucketed(
        t.lineitem.select("l_orderkey", "l_quantity").withColumnRenamed(
            "l_orderkey", "k"
        ),
        "b_lineitem",
        "k",
    )
    write_bucketed(
        t.orders.select("o_orderkey", "o_totalprice").withColumnRenamed(
            "o_orderkey", "k"
        ),
        "b_orders",
        "k",
    )
    # disable broadcast so the co-located SortMergeJoin is visible (at
    # real scale neither side would fit the broadcast threshold anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "k")
        p = explain(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # the whole point
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it's still correct
    n = joined.count()
    want = (
        t.lineitem.join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .count()
    )
    assert n == want

    # aggregation on the bucket key also avoids the shuffle
    agg = spark.table("b_lineitem").groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    pa = explain(agg)
    assert "Exchange" not in pa

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
