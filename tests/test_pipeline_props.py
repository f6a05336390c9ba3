"""Property pins for the round-7 pipeline operators: the invariants a
100 TB deployment actually relies on, checked against the real frames.

- packing: per-shard offsets are exactly contiguous (no token gap or
  overlap between consecutive documents), spans are arithmetic-consistent,
  and the whole layout is invariant to input partitioning/order;
- stratified sampling: raising a stratum's cap only ever ADDS documents
  (re-sampling never churns the kept set), and membership is invariant to
  partitioning;
- k-NN join: every query gets exactly k exact-ranked neighbors, invariant
  to partitioning.
"""

from __future__ import annotations

#: property suite (packing/sampling/knn invariants on real frames) — opt-out of the default gate
#: (see pytest.ini); run everything with `pytest -m ""`
import pytest

pytestmark = pytest.mark.slow


import pyspark.sql.functions as F

from mutable_spark import registry
from mutable_spark.catalog import load_tables
from tests.conftest import SF_DIR

registry.load_all()


def test_pack_offsets_contiguous_per_shard(spark):
    rows = registry.QUERIES["pipeline_pack_sequences"](spark, SF_DIR).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1
    from mutable_spark.operators.pipeline import _PACK_CAP

    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        expect_off = 0
        for r in docs:
            assert r.off == expect_off, (shard, r.doc_id)
            assert r.begin_seq == r.off // _PACK_CAP
            assert r.begin_off == r.off % _PACK_CAP
            assert r.end_seq == (r.off + r.n_tok - 1) // _PACK_CAP
            expect_off = r.off + r.n_tok


def test_pack_layout_invariant_to_partitioning(spark):
    from mutable_spark.operators.pipeline import pack_sequences_frame

    d = load_tables(spark, SF_DIR).documents
    base = sorted(map(tuple, pack_sequences_frame(d).collect()))
    scrambled = d.repartition(17, F.col("n_chars")).sortWithinPartitions(
        F.col("text")
    )
    got = sorted(map(tuple, pack_sequences_frame(scrambled).collect()))
    assert got == base


def test_stratified_cap_monotone_subset(spark):
    from mutable_spark.operators.pipeline import stratified_kept_frame

    d = load_tables(spark, SF_DIR).documents
    kept_small = {r.doc_id for r in stratified_kept_frame(d, 5).select("doc_id").collect()}
    kept_mid = {r.doc_id for r in stratified_kept_frame(d, 15).select("doc_id").collect()}
    kept_all = {r.doc_id for r in stratified_kept_frame(d, 10**9).select("doc_id").collect()}
    assert kept_small < kept_mid < kept_all
    assert len(kept_all) == d.count()


def test_stratified_membership_partition_invariant(spark):
    from mutable_spark.operators.pipeline import _STRATUM_CAP, stratified_kept_frame

    d = load_tables(spark, SF_DIR).documents
    base = {r.doc_id for r in stratified_kept_frame(d, _STRATUM_CAP).select("doc_id").collect()}
    scrambled = d.repartition(13, F.col("lang")).sortWithinPartitions(F.col("n_chars"))
    got = {r.doc_id for r in stratified_kept_frame(scrambled, _STRATUM_CAP).select("doc_id").collect()}
    assert got == base


def test_knn_every_query_has_k_exact_neighbors(spark):
    from mutable_spark.operators.similarity import _KNN_K, _KNN_QMOD

    rows = registry.QUERIES["sim_knn_join"](spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    n_vec = load_tables(spark, SF_DIR).embeddings.count()
    assert len(by_q) == len([v for v in range(0, n_vec) if v % _KNN_QMOD == 0])
    for qid, nbrs in by_q.items():
        assert sorted(r.rank for r in nbrs) == list(range(1, _KNN_K + 1))
        nbrs.sort(key=lambda r: r.rank)
        cos = [r.cos for r in nbrs]
        assert cos == sorted(cos, reverse=True)
        assert qid not in {r.neighbor_id for r in nbrs}


def test_write_packed_shards_one_ordered_file_per_shard(spark, tmp_path):
    from mutable_spark.operators.pipeline import (
        pack_sequences_frame,
        write_packed_shards,
    )

    d = load_tables(spark, SF_DIR).documents
    path = str(tmp_path / "packed")
    write_packed_shards(d, path)

    import glob
    import os

    shard_dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert len(shard_dirs) > 1
    for sd in shard_dirs:
        files = [f for f in glob.glob(os.path.join(sd, "*.parquet"))]
        assert len(files) == 1, sd  # one task wrote each shard

    back = spark.read.parquet(path)
    want = {
        (r.shard, r.doc_id): (r.off, r.begin_seq, r.begin_off, r.end_seq)
        for r in pack_sequences_frame(d).collect()
    }
    got = {
        (r.shard, r.doc_id): (r.off, r.begin_seq, r.begin_off, r.end_seq)
        for r in back.collect()
    }
    assert got == want
    # within each shard file, rows are in doc_id order (the stream a
    # sequence writer consumes)
    import pyarrow.parquet as pq

    for sd in shard_dirs:
        f = glob.glob(os.path.join(sd, "*.parquet"))[0]
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids)


def test_rarity_score_dictionary_join_broadcasts(spark):
    """The vocab dictionary join is NOT hinted (data-dependent frame);
    AQE must still pick a broadcast at runtime from the aggregated
    frame's true size — the skew-proof shape for a token join."""
    df = registry.QUERIES["text_rarity_score"](spark, SF_DIR)
    df.collect()  # finalize the adaptive plan
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_token_budget_monotone_subset(spark):
    from mutable_spark.operators.pipeline import token_budget_frame

    d = load_tables(spark, SF_DIR).documents
    kept_small = {r.doc_id for r in token_budget_frame(d, 400).select("doc_id").collect()}
    kept_mid = {r.doc_id for r in token_budget_frame(d, 800).select("doc_id").collect()}
    kept_all = {r.doc_id for r in token_budget_frame(d, 10**12).select("doc_id").collect()}
    assert kept_small < kept_mid < kept_all
    assert len(kept_all) == d.count()


def test_token_budget_membership_partition_invariant(spark):
    from mutable_spark.operators.pipeline import _TOKEN_BUDGET, token_budget_frame

    d = load_tables(spark, SF_DIR).documents
    base = sorted(map(tuple, token_budget_frame(d, _TOKEN_BUDGET).collect()))
    scrambled = d.repartition(13, F.col("lang")).sortWithinPartitions(F.col("n_chars"))
    got = sorted(map(tuple, token_budget_frame(scrambled, _TOKEN_BUDGET).collect()))
    assert got == base


def test_epoch_orders_differ_but_preserve_shards(spark):
    """Epoch reshuffling: epochs 1 and 2 produce DIFFERENT within-shard
    orders (off assignments differ for some docs) while the
    epoch-independent pieces are identical — every doc keeps its shard
    and n_tok, and each shard's total token count (= max off + its
    doc's n_tok, but simplest: sum n_tok) is unchanged."""
    from mutable_spark.catalog import load_tables
    from mutable_spark.operators.pipeline import pack_sequences_frame

    d = load_tables(spark, SF_DIR).documents
    e1 = {r.doc_id: r for r in pack_sequences_frame(d, epoch=1).collect()}
    e2 = {r.doc_id: r for r in pack_sequences_frame(d, epoch=2).collect()}
    assert set(e1) == set(e2)
    assert all(e1[k].shard == e2[k].shard and e1[k].n_tok == e2[k].n_tok for k in e1)
    assert any(e1[k].off != e2[k].off for k in e1), "epochs must reshuffle"
    # per-shard token mass identical
    import collections

    t1, t2 = collections.Counter(), collections.Counter()
    for k in e1:
        t1[e1[k].shard] += e1[k].n_tok
        t2[e2[k].shard] += e2[k].n_tok
    assert t1 == t2


def test_epoch_layout_invariant_to_partitioning(spark):
    from mutable_spark.catalog import load_tables
    from mutable_spark.operators.pipeline import pack_sequences_frame

    d = load_tables(spark, SF_DIR).documents
    base = sorted(map(tuple, pack_sequences_frame(d, epoch=3).collect()))
    scrambled = d.repartition(7)
    got = sorted(map(tuple, pack_sequences_frame(scrambled, epoch=3).collect()))
    assert got == base


def test_temperature_rates_inverse_to_size(spark):
    """α=0.5 mixing: a strictly smaller source never gets a lower keep
    rate (rate ∝ 1/sqrt(n) until the 1.0 clamp), and every rate is in
    (0, 1]."""
    rows = registry.QUERIES["pipeline_mix_temperature"](spark, SF_DIR).collect()
    assert rows
    by_n = sorted(rows, key=lambda r: r.n_total)
    for a, b in zip(by_n, by_n[1:]):
        if a.n_total < b.n_total:
            assert a.rate >= b.rate, (a, b)
    assert all(0 < r.rate <= 1.0 for r in rows)


def test_chunks_cover_every_token_and_respect_geometry(spark):
    """Sliding chunks: for every doc, chunk 0 starts at token 0, chunks
    advance by exactly the stride, every chunk is full-size except
    possibly the last, the last chunk reaches the document end, and
    every token position is covered by at least one chunk."""
    from mutable_spark.operators.text import _CHUNK_STRIDE, _CHUNK_TOKENS

    rows = registry.QUERIES["text_chunk_sliding"](spark, SF_DIR).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    multi = 0
    for doc, cs in by_doc.items():
        cs.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in cs] == list(range(len(cs)))
        assert cs[0].begin_tok == 0
        n = cs[-1].begin_tok + cs[-1].n_tok_chunk  # doc length
        for c in cs:
            assert c.begin_tok == c.chunk_idx * _CHUNK_STRIDE
            assert c.n_tok_chunk == min(_CHUNK_TOKENS, n - c.begin_tok)
        # coverage: consecutive chunk windows overlap or touch
        for a, b in zip(cs, cs[1:]):
            assert b.begin_tok <= a.begin_tok + a.n_tok_chunk
        multi += len(cs) > 1
    assert multi > 0, "fixture must exercise multi-chunk docs"


def test_write_packed_shards_epoch_order(spark, tmp_path):
    """Epoch-reshuffled shard writing: same shard directories and row
    sets as the base layout, but in-file rows follow the seeded epoch
    order (non-identical to doc_id order somewhere), and a rewrite of
    the same epoch reproduces the byte-identical row stream."""
    import glob
    import os

    import pyarrow.parquet as pq

    from mutable_spark.operators.pipeline import write_packed_shards

    d = load_tables(spark, SF_DIR).documents
    p1 = str(tmp_path / "e1")
    write_packed_shards(d, p1, epoch=1)

    shard_dirs = sorted(glob.glob(os.path.join(p1, "shard=*")))
    assert len(shard_dirs) > 1
    reordered = 0
    for sd in shard_dirs:
        files = glob.glob(os.path.join(sd, "*.parquet"))
        assert len(files) == 1, sd
        ids = pq.read_table(files[0], columns=["doc_id"])["doc_id"].to_pylist()
        assert sorted(ids) == sorted(set(ids))  # same membership, no dupes
        reordered += ids != sorted(ids)
    assert reordered > 0, "epoch order must differ from doc_id order somewhere"

    # restart determinism: same epoch → identical per-shard row streams
    p2 = str(tmp_path / "e1b")
    write_packed_shards(d, p2, epoch=1)
    for sd in shard_dirs:
        rel = os.path.basename(sd)
        a = pq.read_table(glob.glob(os.path.join(p1, rel, "*.parquet"))[0])
        b = pq.read_table(glob.glob(os.path.join(p2, rel, "*.parquet"))[0])
        assert a.equals(b), rel


def test_chunk_geometry_property_random_lengths():
    """Hypothesis over arbitrary document lengths (pure-Python replica of
    the chunk index rule): chunk starts advance by the stride, windows
    are full except possibly the last, the tail is covered exactly once
    (last start is the FIRST stride position whose window reaches the
    end), and the union of windows is exactly [0, n)."""
    from hypothesis import given
    from hypothesis import strategies as st

    from mutable_spark.operators.text import _CHUNK_STRIDE as S
    from mutable_spark.operators.text import _CHUNK_TOKENS as C

    @given(st.integers(min_value=1, max_value=5000))
    def check(n):
        imax = (n - C + S - 1) // S if n > C else 0
        starts = [i * S for i in range(imax + 1)]
        lens = [min(C, n - b) for b in starts]
        assert starts[0] == 0
        assert all(l == C for l in lens[:-1])
        assert starts[-1] + lens[-1] == n
        if imax > 0:
            # minimality: the previous start's window does NOT reach the end
            assert starts[-2] + C < n
        covered = set()
        for b, l in zip(starts, lens):
            covered.update(range(b, b + l))
        assert covered == set(range(n))

    check()


def test_leakage_safe_split_no_pair_straddles(spark):
    """pipeline_split_leakage_safe's structural invariant, checked
    directly: every verified near-dup pair has both ends on the same
    side of the split (the doc-keyed split does NOT have this property —
    also asserted, so the test would catch a silent regression to
    doc-keyed hashing only if the corpus actually exercises it)."""
    import mutable_spark.operators.dedup as D
    import mutable_spark.operators.pipeline as P
    import pyspark.sql.functions as F
    from mutable_spark.catalog import load_tables
    from tests.conftest import SF_DIR

    d = load_tables(spark, SF_DIR).documents
    g = D._hashed_shingle_df(d).cache()
    pairs = D.minhash_lsh_pairs(g).select("doc_a", "doc_b")
    classes = D.connected_components(pairs.localCheckpoint(eager=True))
    withc = (
        d.select("doc_id")
        .join(F.broadcast(classes), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("class_rep", "doc_id").alias("class_rep"),
        )
    )
    h = P._hash52(F.col("class_rep"))
    split = F.when(
        h < F.lit(P._TRAIN_FRAC * P._HASH52_DOMAIN), "train"
    ).otherwise("test")
    side = withc.select("doc_id", split.alias("split"))
    joined = (
        pairs.join(side.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("split", "split_a")
        .join(side.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("split", "split_b")
    )
    n_pairs = joined.count()
    assert n_pairs > 0, "corpus must exercise the invariant"
    straddle = joined.filter(F.col("split_a") != F.col("split_b")).count()
    assert straddle == 0


def test_dsir_selection_partition_invariant(spark):
    """r15 DSIR: scores and acceptance decisions are pure integer
    functions of corpus content (exact fixed-point rates, md5 draws),
    so the full selection frame must be identical under any input
    partitioning — the property that makes the sample reproducible
    across cluster sizes."""
    from mutable_spark.operators.pipeline import (
        _dsir_selection_frame,
        _dsir_tok_base,
    )

    d = load_tables(spark, SF_DIR).documents
    a = _dsir_tok_base(d.repartition(3)).cache()
    b = _dsir_tok_base(d.repartition(17)).cache()
    try:
        ra = sorted(map(tuple, _dsir_selection_frame(a).collect()))
        rb = sorted(map(tuple, _dsir_selection_frame(b).collect()))
    finally:
        a.unpersist()
        b.unpersist()
    assert ra == rb and len(ra) > 0
