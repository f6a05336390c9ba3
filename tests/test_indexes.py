"""ArrayIndex / RecursiveModelIndex (`include/mutable/storage/Index.hpp`)
parity + the ZoneIndex scan-pruning integration."""

from __future__ import annotations

import numpy as np
import pytest

from mutable_spark.catalog import load_tables
from mutable_spark.sources.indexes import (
    ArrayIndex,
    LinearModel,
    RecursiveModelIndex,
    ZoneIndex,
)
from tests.conftest import SF_DIR


def _reference_bounds(keys, q):
    return (
        int(np.searchsorted(keys, q, side="left")),
        int(np.searchsorted(keys, q, side="right")),
    )


@pytest.mark.parametrize(
    "dist",
    ["uniform", "lognormal", "dups"],
)
def test_rmi_bounds_equal_binary_search(dist):
    rng = np.random.default_rng(11)
    if dist == "uniform":
        keys = rng.uniform(0, 1e6, 20_000)
    elif dist == "lognormal":
        keys = rng.lognormal(10, 2, 20_000)  # heavy skew
    else:
        keys = rng.integers(0, 500, 20_000).astype(float)  # many dups
    arr = ArrayIndex()
    rmi = RecursiveModelIndex()
    arr.bulkload(keys, np.arange(len(keys)))
    rmi.bulkload(keys, np.arange(len(keys)))
    arr.finalize()
    rmi.finalize()
    sorted_keys = np.sort(keys)
    queries = np.concatenate(
        [
            rng.choice(keys, 200),  # present
            rng.uniform(keys.min() - 10, keys.max() + 10, 200),  # arbitrary
            [keys.min() - 100, keys.max() + 100],  # out of range
        ]
    )
    for q in queries:
        lo, hi = _reference_bounds(sorted_keys, q)
        assert arr.lower_bound(q) == lo
        assert arr.upper_bound(q) == hi
        assert rmi.lower_bound(q) == lo, q
        assert rmi.upper_bound(q) == hi, q


def test_rmi_is_actually_learned():
    rmi = RecursiveModelIndex()
    rmi.bulkload(np.arange(10_000, dtype=float), np.arange(10_000))
    rmi.finalize()
    assert len(rmi.models) >= 2
    # on perfectly linear keys the leaf prediction is near-exact
    assert abs(rmi._predict(5_000.0) - 5_000) <= 2


def test_unfinalized_index_raises():
    idx = ArrayIndex()
    idx.add(1, "a")
    with pytest.raises(RuntimeError):
        idx.lower_bound(1)


def test_lookup_range_inclusive_exclusive():
    idx = ArrayIndex()
    idx.bulkload([1, 2, 2, 3, 4], ["a", "b1", "b2", "c", "d"])
    idx.finalize()
    assert list(idx.lookup_range(2, 3)) == ["b1", "b2", "c"]
    assert list(idx.lookup_range(2, 3, lo_open=True)) == ["c"]
    assert list(idx.lookup_range(2, 3, hi_open=True)) == ["b1", "b2"]
    assert list(idx.lookup_range(None, 1)) == ["a"]
    assert list(idx.lookup_range(5, None)) == []


def test_linear_regression_matches_polyfit():
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0, 100, 500))
    m = LinearModel.train_linear_regression(x, offset=10)
    slope, intercept = np.polyfit(x, 10 + np.arange(500), 1)
    assert m.slope == pytest.approx(slope)
    assert m.intercept == pytest.approx(intercept)


# --- ZoneIndex: file pruning over a range-partitioned layout ---------------
@pytest.fixture(scope="module")
def sorted_orders_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("zones") / "orders_by_key"
    t = load_tables(spark, SF_DIR)
    (
        t.orders.repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(str(out))
    )
    return str(out)


def test_zone_index_prunes_files_and_preserves_results(
    spark, sorted_orders_dir
):
    t = load_tables(spark, SF_DIR)
    zi = ZoneIndex.build(sorted_orders_dir, "o_orderkey", learned=True)
    n_files = len(zi.zones)
    assert n_files >= 4
    lo, hi = 100, 900
    pruned_files = zi.files_for_range(lo, hi)
    assert 0 < len(pruned_files) < n_files  # actually prunes
    got = sorted(
        r.o_orderkey
        for r in zi.read_pruned(spark, lo, hi).select("o_orderkey").collect()
    )
    exp = sorted(
        r.o_orderkey
        for r in t.orders.filter(
            f"o_orderkey >= {lo} AND o_orderkey <= {hi}"
        )
        .select("o_orderkey")
        .collect()
    )
    assert got == exp


def test_zone_index_empty_range(spark, sorted_orders_dir):
    zi = ZoneIndex.build(sorted_orders_dir, "o_orderkey")
    df = zi.read_pruned(spark, 10**9, 2 * 10**9)
    assert df.count() == 0


def test_zone_index_open_ended(spark, sorted_orders_dir):
    t = load_tables(spark, SF_DIR)
    zi = ZoneIndex.build(sorted_orders_dir, "o_orderkey")
    got = zi.read_pruned(spark, lo=5_000, hi=None).count()
    exp = t.orders.filter("o_orderkey >= 5000").count()
    assert got == exp


def test_zone_index_range_edge_cases(spark, tmp_path):
    """Pruned scans equal full-scan filters on every range shape: one-sided,
    out-of-domain (below min / above max), reversed (empty), and exact
    single-key ranges — pruning may only ever over-read, never drop."""
    import pyspark.sql.functions as F

    from mutable_spark.sources.indexes import ZoneIndex

    src = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    layout = tmp_path / "edge"
    src.repartitionByRange(8, "k").write.parquet(str(layout))
    full = spark.read.parquet(str(layout))
    for learned in (True, False):
        zi = ZoneIndex.build(str(layout), "k", learned=learned)
        for lo, hi in [
            (None, 100),       # one-sided upper
            (900, None),       # one-sided lower
            (-50, -1),         # entirely below the domain -> empty
            (2000, 3000),      # entirely above the domain -> empty
            (500, 400),        # reversed -> empty
            (123, 123),        # single key
            (None, None),      # unbounded -> everything
            (0, 999),          # exact domain
        ]:
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (F.col("k") >= lo)
            if hi is not None:
                cond = cond & (F.col("k") <= hi)
            want = sorted(r.k for r in full.filter(cond).collect())
            got = sorted(r.k for r in zi.read_pruned(spark, lo, hi).collect())
            assert got == want, (learned, lo, hi)


def test_zone_index_string_keys(spark, tmp_path):
    """String zones prune by the 6-byte-prefix surrogate: distinct
    prefixes prune exactly; a shared prefix beyond 6 bytes collapses to
    equal keys and can only OVER-read (soundness), never drop a file."""
    import pyspark.sql.functions as F

    from mutable_spark.sources.indexes import ZoneIndex, _key_num

    # order preservation incl. ties past 6 bytes
    vals = ["", "a", "abcdef", "abcdefX", "abcdefZ", "abcdeg", "b", "src10", "src15", "src2"]
    keys = [_key_num(v) for v in vals]
    for a, b in zip(vals, vals[1:]):
        assert _key_num(a) <= _key_num(b), (a, b)
    assert _key_num("abcdefX") == _key_num("abcdefZ")  # tie -> over-read only

    path = tmp_path / "docs"
    df = spark.createDataFrame(
        [(i, f"src{i:02d}") for i in range(40)], "doc_id long, source string"
    )
    df.repartitionByRange(4, "source").write.parquet(str(path))
    zi = ZoneIndex.build(str(path), "source", learned=False)
    assert len(zi.zones) == 4
    pruned = zi.files_for_range("src10", "src15")
    assert 0 < len(pruned) < len(zi.zones)
    # soundness: the pruned subset holds every matching row
    got = (
        spark.read.parquet(*pruned)
        .filter((F.col("source") >= "src10") & (F.col("source") <= "src15"))
        .count()
    )
    assert got == 6


def test_zone_index_refresh_tracks_appends_and_deletes(spark, tmp_path):
    """Incremental zone maintenance: after an append-mode write adds new
    files, refresh() maps ONLY the new footers (count returned), pruning
    reflects the new data immediately, and files removed by a compaction
    rewrite drop out of the map."""
    import os

    import pyspark.sql.functions as F

    from mutable_spark.sources.indexes import ZoneIndex

    path = tmp_path / "zr"
    spark.range(0, 1000).select(F.col("id").alias("k")).repartitionByRange(
        4, "k"
    ).write.parquet(str(path))
    zi = ZoneIndex.build(str(path), "k", learned=False)
    n0 = len(zi.zones)
    assert zi.refresh(str(path)) == 0  # idempotent on no change

    # append a disjoint key range as new files
    spark.range(5000, 6000).select(F.col("id").alias("k")).repartitionByRange(
        2, "k"
    ).write.mode("append").parquet(str(path))
    added = zi.refresh(str(path))
    assert added == 2 and len(zi.zones) == n0 + 2
    # the appended range is served by exactly the new files
    new_files = set(zi.files_for_range(5000, 5999))
    assert 0 < len(new_files) <= added
    # old pruning still exact: full-range read equals a fresh scan
    assert zi.read_pruned(spark, 0, 6000).count() == 2000

    # a "compaction" removes one old file: refresh drops it
    victim = sorted(f for _, _, f in zi.zones)[0]
    os.remove(victim)
    zi.refresh(str(path))
    assert victim not in {f for _, _, f in zi.zones}
    assert len(zi.zones) == n0 + 2 - 1
