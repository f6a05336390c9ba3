"""Property pins for the late-r14 exact-substring span tier and the BPE
trainer family: the invariants a 100 TB scrubbing/tokenizing deployment
relies on, checked on the real frames.

- spans: arithmetic consistency (n_grams == width - k + 1), in-bounds,
  MAXIMALITY (two spans of one doc are never mergeable — at least one
  non-duplicated gram position separates them), and invariance to input
  partitioning (the run-id window rule must not depend on physical
  layout);
- scrub: exact accounting against the span list (removed == |union of
  span token ranges|, kept + removed == doc token count) and the rebuilt
  text is precisely the out-of-span tokens in order;
- BPE: the sweep's token count is monotone non-increasing per merge
  round with round 0 equal to the non-whitespace character mass, and the
  encode counts are bounded by (whitespace tokens, character mass) per
  document.
"""

from __future__ import annotations

#: property suite — opt-out of the default gate (see pytest.ini); run
#: everything with `pytest -m ""`
import pytest

pytestmark = pytest.mark.slow


import pyspark.sql.functions as F

from mutable_spark import registry
from mutable_spark.catalog import load_tables
from tests.conftest import SF_DIR

registry.load_all()


def _spans(spark):
    return registry.QUERIES["dedup_duplicate_spans"](spark, SF_DIR).collect()


def test_span_arithmetic_and_bounds(spark):
    from mutable_spark.operators.dedup import _SPAN_K

    spans = _spans(spark)
    assert spans
    ntok = {
        r.doc_id: r.n
        for r in load_tables(spark, SF_DIR)
        .documents.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        )
        .collect()
    }
    for r in spans:
        width = r.span_end - r.span_start + 1
        assert width >= _SPAN_K
        assert r.n_grams == width - _SPAN_K + 1
        assert 0 <= r.span_start and r.span_end <= ntok[r.doc_id] - 1


def test_spans_maximal_and_disjoint_per_doc(spark):
    from mutable_spark.operators.dedup import _SPAN_K

    by_doc: dict[int, list] = {}
    for r in _spans(spark):
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.span_start)
        for a, b in zip(rows, rows[1:]):
            # last gram of a starts at a.span_end - k + 1; maximality of
            # the run rule requires the next duplicated gram to start at
            # least TWO positions later (adjacent would be the same run)
            assert b.span_start >= (a.span_end - _SPAN_K + 1) + 2


def test_two_separated_passages_stay_two_spans(spark):
    """Planted multi-span case (the natural corpus at this SF never puts
    two spans in one doc): two shared 22-token passages separated by
    unique middles must surface as TWO disjoint spans per doc at each
    doc's own offsets — never merged across the unique gap."""
    from mutable_spark.operators.dedup import duplicate_span_frame

    p1 = " ".join(f"alpha{i}" for i in range(22))
    p2 = " ".join(f"beta{i}" for i in range(22))
    mid_a = " ".join(f"ma{i}" for i in range(15))
    mid_b = " ".join(f"mb{i}" for i in range(9))
    docs = [
        (0, f"{p1} {mid_a} {p2}", "en", "s", 0),
        (1, f"{p1} {mid_b} {p2}", "en", "s", 0),
    ]
    d = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_span_frame(d).collect()
    )
    # doc 0: p1 at 0..21, p2 at 37..58; doc 1: p1 at 0..21, p2 at 31..52
    assert got == [(0, 0, 21), (0, 37, 58), (1, 0, 21), (1, 31, 52)]


def test_spans_invariant_to_partitioning(spark):
    from mutable_spark.operators.dedup import duplicate_span_frame

    d = load_tables(spark, SF_DIR).documents
    base = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in duplicate_span_frame(d).collect()
    )
    shuffled = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in duplicate_span_frame(d.repartition(7)).collect()
    )
    assert base == shuffled and base


def test_scrub_accounts_exactly_for_spans(spark):
    spans: dict[int, set] = {}
    for r in _spans(spark):
        spans.setdefault(r.doc_id, set()).update(
            range(r.span_start, r.span_end + 1)
        )
    docs = {
        r.doc_id: [t for t in r.text.strip().split() if t]
        for r in load_tables(spark, SF_DIR)
        .documents.select("doc_id", "text")
        .collect()
    }
    got = registry.QUERIES["dedup_scrub_spans"](spark, SF_DIR).collect()
    assert len(got) == len(docs)
    for r in got:
        toks = docs[r.doc_id]
        cut = spans.get(r.doc_id, set())
        assert r.n_tokens_removed == len(cut)
        assert r.n_tokens_kept + r.n_tokens_removed == len(toks)
        want = " ".join(t for i, t in enumerate(toks) if i not in cut)
        assert r.scrubbed_text == want


def test_bpe_sweep_monotone_from_character_mass(spark):
    rows = sorted(
        registry.QUERIES["text_bpe_sweep"](spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    assert rows[0].round == 0 and rows[0].compression_bp == 10000
    char_mass = (
        load_tables(spark, SF_DIR)
        .documents.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .filter(F.length("w") >= 1)
        .agg(F.sum(F.length("w")))
        .collect()[0][0]
    )
    assert rows[0].n_tokens == char_mass
    for a, b in zip(rows, rows[1:]):
        assert b.n_tokens <= a.n_tokens
        assert b.compression_bp <= a.compression_bp


def test_bpe_encode_bounded_per_doc(spark):
    enc = {
        r.doc_id: r
        for r in registry.QUERIES["text_bpe_encode"](spark, SF_DIR).collect()
    }
    per_doc = (
        load_tables(spark, SF_DIR)
        .documents.select(
            "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .filter(F.length("w") >= 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ws"),
            F.sum(F.length("w")).alias("n_chars"),
        )
        .collect()
    )
    assert len(per_doc) == len(enc)
    for r in per_doc:
        e = enc[r.doc_id]
        assert e.n_ws_tokens == r.n_ws
        # every word is at least one symbol, at most its character count
        assert r.n_ws <= e.n_bpe_tokens <= r.n_chars
