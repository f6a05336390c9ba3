"""`connected_components` (the dedup_duplicate_classes engine) against a
Python union-find oracle on adversarial graph shapes. The driver gate only
ever sees diameter-2 LSH classes; these pin multi-round convergence
(chains), merging star constellations, and random graphs."""

from __future__ import annotations

#: property suite (adversarial graph shapes vs a union-find oracle) — opt-out of the default gate
#: (see pytest.ini); run everything with `pytest -m ""`
import pytest

pytestmark = pytest.mark.slow

import random


from mutable_spark.operators.dedup import connected_components


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    # local_threshold=0 forces the distributed star rounds — the subject
    # under test here (the driver-local union-find fast path has its own
    # equality pin below)
    got = {
        (r.doc_id, r.class_rep)
        for r in connected_components(df, local_threshold=0).collect()
    }
    want = set(_union_find(None, edges).items())
    assert got == want


def test_long_chain_converges(spark):
    # a 40-node path: diameter 39. Min-label propagation would need ~40
    # rounds here; large-star/small-star contracts it in O(log n).
    _check(spark, [(i, i + 1) for i in range(40)])


def test_long_chain_rounds_logarithmic(spark):
    """The Kiveris et al. guarantee the implementation claims: a 256-node
    chain (diameter 255) converges in <= log2(n) + c star rounds — the
    shape where plain min-label propagation degrades to O(diameter)."""
    import math

    from mutable_spark.operators.dedup import connected_components as cc

    n = 256
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    stats = {}
    got = {
        (r.doc_id, r.class_rep)
        for r in cc(df, stats=stats, local_threshold=0).collect()
    }
    assert got == {(i, 0) for i in range(n)}
    assert stats["rounds"] <= math.log2(n) + 4, (
        f"{stats['rounds']} rounds for a {n}-chain — not logarithmic"
    )


def test_two_stars_merged_by_bridge(spark):
    edges = [(0, i) for i in range(1, 10)] + [(100, 100 + i) for i in range(1, 10)]
    edges.append((9, 109))  # bridge merges both stars into one class
    _check(spark, edges)


def test_disjoint_cliques(spark):
    edges = []
    for base in (0, 50, 90):
        members = list(range(base, base + 5))
        edges += [(a, b) for a in members for b in members if a < b]
    _check(spark, edges)


@pytest.mark.parametrize("seed", [1, 2])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = [
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
        )
        if a != b
    ]
    _check(spark, edges)


def test_train_test_split_stable_across_partitionings(spark):
    """pipeline_train_test_split's core guarantee: the same doc lands in
    the same split no matter how the data is partitioned or ordered."""
    import pyspark.sql.functions as F

    from mutable_spark.catalog import load_tables
    from mutable_spark.operators.pipeline import _TRAIN_FRAC

    d = load_tables(spark, "/root/testdata/sf0.001").documents
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    split = F.when(h < F.lit(_TRAIN_FRAC * float(1 << 52)), "train").otherwise("test")
    a = {r.doc_id: r.s for r in d.select("doc_id", split.alias("s")).collect()}
    scrambled = d.repartition(13, F.xxhash64("text")).sortWithinPartitions(
        F.col("doc_id").desc()
    )
    b = {
        r.doc_id: r.s
        for r in scrambled.select("doc_id", split.alias("s")).collect()
    }
    assert a == b
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac < 0.9  # hash threshold lands near the target split


def test_local_fast_path_equals_distributed(spark):
    """The r10 driver-local union-find fast path (edge list below
    _CC_LOCAL_MAX_EDGES collects once instead of running star rounds)
    must be value-identical to the distributed path on a random graph
    with chains, stars, cliques and isolated self-loops."""
    rng = random.Random(0xC0FFEE)
    edges = [(i, i + 1) for i in range(30)]                     # chain
    edges += [(100, 100 + i) for i in range(1, 12)]             # star
    edges += [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    edges += [(500, 500), (600, 600)]                           # self-loops
    edges += [
        (rng.randrange(0, 300), rng.randrange(0, 300)) for _ in range(60)
    ]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    stats_l, stats_d = {}, {}
    local = {
        (r.doc_id, r.class_rep)
        for r in connected_components(df, stats=stats_l).collect()
    }
    dist = {
        (r.doc_id, r.class_rep)
        for r in connected_components(
            df, stats=stats_d, local_threshold=0
        ).collect()
    }
    assert stats_l["path"] == "driver-local-union-find"
    assert stats_d["path"] == "distributed-star"
    assert local == dist
