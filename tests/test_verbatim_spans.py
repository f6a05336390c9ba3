"""Semantic pins for the exact-substring tier: the oracle equality in
test_queries_oracle covers the arithmetic; these pin the CLAIM — a shared
k-token contiguous span is detected, anything shorter is not."""

from __future__ import annotations

import pyspark.sql.functions as F

from mutable_spark.operators import dedup as D


def _corpus(spark, tmp_path, docs):
    import os

    from tests.conftest import SF_DIR

    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    for f in os.listdir(SF_DIR):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(SF_DIR, f), str(tmp_path / f))
    return str(tmp_path)


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_span_detected_shorter_not(spark, tmp_path):
    from mutable_spark.registry import QUERIES, load_all

    load_all()
    k = D._SPAN_K
    quote = _words("q", k)  # exactly k tokens
    short = _words("s", k - 1)  # one token short of a span
    docs = [
        _words("a", 30) + " " + quote + " " + _words("b", 30),  # 0: quote inside
        _words("c", 30) + " " + quote + " " + _words("d", 30),  # 1: same quote
        _words("e", 30) + " " + short + " " + _words("f", 30),  # 2: short overlap w/ 3
        _words("g", 30) + " " + short + " " + _words("h", 30),  # 3
    ]
    sf = _corpus(spark, tmp_path, docs)
    rows = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in QUERIES["dedup_verbatim_ngrams"](spark, sf).collect()
    }
    # the k-token quote is found between docs 0 and 1 (exactly one shared
    # distinct k-gram: the quote itself -- its flanks differ)
    assert rows.get((0, 1)) == 1
    # a (k-1)-token overlap opens no k-gram: docs 2/3 are invisible
    assert (2, 3) not in rows
    assert all(p == (0, 1) for p in rows)


def test_contained_document_shares_all_its_grams(spark, tmp_path):
    from mutable_spark.registry import QUERIES, load_all

    load_all()
    k = D._SPAN_K
    inner = _words("w", k + 5)  # k+5 tokens -> 6 distinct k-grams
    docs = [
        inner,  # 0: the contained document
        _words("x", 25) + " " + inner + " " + _words("y", 25),  # 1: contains it
    ]
    sf = _corpus(spark, tmp_path, docs)
    rows = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in QUERIES["dedup_verbatim_ngrams"](spark, sf).collect()
    }
    assert rows == {(0, 1): 6}
