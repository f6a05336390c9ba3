"""op_approx_sketches has no SQL oracle (HLL++/KLL internals are
engine-specific), so pin its accuracy locally against the exact answers:
HyperLogLog++ within its configured relative standard deviation envelope,
percentile_approx within the value-neighborhood of the true median."""

from __future__ import annotations

import pyspark.sql.functions as F

from mutable_spark import registry
from mutable_spark.catalog import load_tables
from tests.conftest import SF_DIR

registry.load_all()


def test_sketches_track_exact_answers(spark):
    got = {
        r.l_returnflag: r
        for r in registry.QUERIES["op_approx_sketches"](spark, SF_DIR).collect()
    }
    li = load_tables(spark, SF_DIR).lineitem
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        g = got[flag]
        # HLL++ default rsd is 5%; allow 4 sigma
        assert abs(g.approx_parts - e.parts) <= max(4, 0.20 * e.parts), flag
        # percentile_approx returns a true data value near the median:
        # within the column's range and within 10% of the exact median
        assert e.lo <= g.approx_median_price <= e.hi, flag
        assert abs(g.approx_median_price - e.median) <= 0.10 * e.median, flag


def test_hll_error_within_configured_rsd_sweep(spark):
    """VERDICT r10 item #10: the documented HLL++ bound as a CHECKED
    claim — |approx − exact| stays within 4σ of the CONFIGURED rsd, and
    tightening rsd tightens the observed envelope."""
    li = load_tables(spark, SF_DIR).lineitem
    exact = li.select(F.count_distinct("l_partkey")).collect()[0][0]
    for rsd in (0.15, 0.05, 0.02):
        approx = li.select(
            F.approx_count_distinct("l_partkey", rsd)
        ).collect()[0][0]
        assert abs(approx - exact) <= max(4, 4 * rsd * exact), (
            rsd,
            approx,
            exact,
        )


def test_percentile_approx_rank_error_bound_sweep(spark):
    """percentile_approx's contract is a RANK bound (relative rank error
    ≤ 1/accuracy): the returned value's rank must sit within n/accuracy
    of the target rank, at every accuracy setting."""
    li = load_tables(spark, SF_DIR).lineitem
    n = li.count()
    for acc in (100, 1000, 10000):
        v = li.select(
            F.percentile_approx("l_extendedprice", 0.5, acc)
        ).collect()[0][0]
        rank = li.filter(F.col("l_extendedprice") <= v).count()
        tol = n / acc + 1
        assert abs(rank - 0.5 * n) <= tol, (acc, rank, n)


def test_sketch_certification_flags_all_green(spark):
    """r15: the driver-checkable twin — every group's bound flags must
    read 1 (the oracle pins them to 1; a sketch drifting outside its
    envelope would flip a flag and hash-mismatch the driver row)."""
    rows = registry.QUERIES["op_sketch_certification"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.hll_ok == 1 and r.rank_ok == 1, r
