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
        salt_on="l_orderkey",
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
        for r in salted_join(orders, cust, "k", salt_on="o_orderkey", n_salts=8)
        .select("o_orderkey", "c_name")
        .collect()
    )
    assert plain == salted


def test_salt_is_content_deterministic(spark):
    """Retry-safety pin: the salt must be a pure function of row content,
    so a recomputed map task places every row identically (ADVICE r9 —
    monotonically_increasing_id() re-salts rows across task retries).
    Same rows under different physical layouts must get identical salts."""
    from mutable_spark.operators.skew import _salt_col

    li = load_tables(spark, SF_DIR).lineitem.select(
        "l_orderkey", "l_linenumber"
    )
    a = {
        (r.l_orderkey, r.l_linenumber): r.s
        for r in li.repartition(4).withColumn(
            "s", _salt_col(F.concat_ws("|", "l_orderkey", "l_linenumber"), 8)
        ).collect()
    }
    b = {
        (r.l_orderkey, r.l_linenumber): r.s
        for r in li.repartition(17, "l_linenumber").withColumn(
            "s", _salt_col(F.concat_ws("|", "l_orderkey", "l_linenumber"), 8)
        ).collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))
