"""Salting rewrites must be result-identical to their naive forms."""

from __future__ import annotations

import pyspark.sql.functions as F

from mutable_spark.catalog import load_tables
from mutable_spark.operators.skew import salted_aggregate, salted_join
from tests.conftest import SF_DIR


def test_salted_aggregate_equals_plain(spark):
    li = load_tables(spark, SF_DIR).lineitem
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
        )
        .collect()
    )
    salted = salted_aggregate(
        li.withColumn("one", F.lit(1)),
        ["l_returnflag"],
        {
            "cnt": ("count", "one"),
            "mn": ("min", "l_quantity"),
            "mx": ("max", "l_quantity"),
            "sq": ("sum", "l_quantity"),
        },
        n_salts=8,
    ).collect()
    p = {r.l_returnflag: (r.cnt, r.mn, r.mx, float(r.sq)) for r in plain}
    s = {r.l_returnflag: (r.cnt, r.mn, r.mx, float(r.sq)) for r in salted}
    # sums here are integral-valued doubles → exact in any combine order
    assert p == s


def test_salted_join_equals_plain(spark):
    t = load_tables(spark, SF_DIR)
    orders = t.orders.withColumnRenamed("o_custkey", "k")
    cust = t.customer.withColumnRenamed("c_custkey", "k").select("k", "c_name")
    plain = sorted(
        (r.o_orderkey, r.c_name)
        for r in orders.join(cust, "k").select("o_orderkey", "c_name").collect()
    )
    salted = sorted(
        (r.o_orderkey, r.c_name)
        for r in salted_join(orders, cust, "k", n_salts=8)
        .select("o_orderkey", "c_name")
        .collect()
    )
    assert plain == salted
