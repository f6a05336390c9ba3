"""Adversarial edge-case corpus through the driver's own oracle-equality
harness: the bit-exact Spark==DuckDB contract must hold not just on the
generator's well-behaved corpus but on the inputs a real crawl throws at
an ingest pipeline — empty text, single tokens, maximal repetition,
unicode, PII-shaped strings with regex metacharacters next to them.

The fixture writes a documents.parquet into tmp_path shaped exactly like
the testdata table, so every registered text/pipeline operator runs
unmodified with sf_dir=tmp_path.
"""

from __future__ import annotations

import duckdb
import pytest

from mutable_spark import registry
from tests.oracle_harness import compare

registry.load_all()

#: (doc_id, text, lang, source, n_chars) — adversarial shapes
_EDGE_DOCS = [
    (0, "", "en", "src0", 0),  # empty text
    (1, "solo", "en", "src0", 4),  # single token (no bigrams/shingles)
    (2, "a a a a a a a a a a", "en", "src1", 19),  # maximal repetition
    (3, "the quick brown fox jumps over the lazy dog", "en", "src1", 43),
    (4, "naïve café résumé — ünïcödé tokens", "fr", "src2", 34),  # unicode
    (5, "email me at a+b.c_d%e@ex-ample.co.uk now", "en", "src2", 40),  # real PII
    (6, "not an email: a@@b a@ b@c. .@x 1.2.3.4.5", "en", "src3", 40),  # near-misses
    (7, "call 555-123-4567 or visit 10.0.0.1 today", "en", "src3", 41),
    (8, "regex bait: a.b*c+d?e(f)g[h]i{2}j|k\\l", "en", "src4", 37),  # metachars
    (9, "  leading and trailing whitespace   ", "en", "src4", 36),
    (10, "the the the of of a a is is in", "en", "src0", 30),  # stopword soup
    (11, "x " * 300 + "y", "en", "src1", 601),  # long doc, 301 tokens
    # id ≡ 0 (mod _BIN_MOD=20): lands in the binary-ingestion MOD sample,
    # so the blob-arithmetic oracles see a NON-ASCII payload (ADVICE r14:
    # the byte-vs-codepoint divergence only shows on multi-byte text)
    (20, "naïve café — ünïcödé blob €42", "fr", "src2", 29),
]

#: ops whose oracle bridge requires ASCII payloads (the multimodal
#: stand-in codec mirrors BYTE arithmetic with DuckDB CHARACTER
#: functions — exact only when bytes == characters; real deployments
#: hold opaque binary and no oracle at all). They get the ASCII-only
#: fixture below.
_ASCII_OPS = [
    "multimodal_extract",
    "multimodal_fake_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_audio_chunks",
    "multimodal_phash",
]

#: every registered op whose only input is the documents table
_DOC_OPS = [
    "text_token_count",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "text_vocab_topk",
    "text_repetition_filter",
    "text_pii_scrub",
    "text_rarity_score",
    "text_lm_surprisal",
    "text_chunk_sliding",
    "pipeline_length_buckets",
    "pipeline_train_test_split",
    "pipeline_mix_sources",
    "pipeline_stratified_sample",
    "pipeline_pack_sequences",
    "pipeline_decontaminate",
    "pipeline_curriculum_order",
    "pipeline_curriculum_sharded",
    "pipeline_contamination_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_verbatim_ngrams",
    "pipeline_dedup_keep_best",
    "pipeline_token_budget_sample",
    "pipeline_end_to_end",
    "pipeline_oversample",
    # r9/r10 text additions (bm25: empty docs must fall out of the
    # score filter, never divide by zero under ANSI)
    "text_bpe_pairs",
    # r14: multi-round BPE training — unicode multi-byte symbols,
    # single-char words (no pairs), and the 'a a a ...' repetition doc
    # exercise the greedy run-parity merge in both engines — and the
    # encode consumer (empty docs must emit no row in both engines)
    "text_bpe_train",
    # r15: the batched trainer — the tiny edge vocabulary exhausts the
    # pool mid-round, so under-full batches and merge-less rounds must
    # select identically in both engines
    "text_bpe_train_batched",
    "text_bpe_encode",
    # r14: the rounds-knob sweep — merge-less rounds on the tiny edge
    # vocabulary must pad to the oracle's fixed row count with the
    # token count unchanged
    "text_bpe_sweep",
    # r14: BPE-budget sampling — empty docs must never enter the
    # sample, and the quality/doc_id window order must cross engines
    # on the adversarial text shapes
    "pipeline_bpe_budget_sample",
    # r14: per-language fertility — the unicode 'fr' doc's multi-byte
    # words must count identical symbol masses in both engines, and
    # langs whose docs are all empty must emit no row
    "text_bpe_fertility",
    # r14: duplicated-span extraction — the 301-token repetition doc is
    # one giant self-duplicated run; short docs fall out of the k-gram
    # window identically in both engines — and the scrub pass (the
    # fully-scrubbed repetition doc must survive as an empty-text row,
    # and the rebuilt text itself is hash-checked)
    "dedup_duplicate_spans",
    "dedup_scrub_spans",
    # r15: the keep-one variant — the 301-token repetition doc must
    # keep exactly its FIRST duplicated occurrence in both engines
    "dedup_scrub_spans_canonical",
    # r14: the k-width sweep — the 301-token repetition doc fires at
    # every width, short docs fall out of coarser widths identically
    "dedup_span_k_sweep",
    "text_tfidf_terms",
    "text_boilerplate_grams",
    "text_bm25_rank",
    "pipeline_dedup_stats",
    "dedup_containment",
    # r12 certifications: each runs its tier AND the exact baseline on
    # the MOD-sampled edge corpus — unicode/empty/regex-metachar text
    # must certify identically in both engines (or vacuously via the
    # 0-denominator guards)
    "dedup_tier_certification",
    "dedup_simhash_certification",
    "dedup_containment_certification",
    # r13: preference pairs — empty/unicode text must score and rank
    # identically (chosen/rejected ids + IEEE margin) in both engines
    "pipeline_preference_pairs",
    # r14: the top-m extension — groups SMALLER than 2m overlap their
    # extremes, so the id-inequality and margin gates must fire
    # identically; struct-array collection order is pinned by sort_array
    "pipeline_preference_topm",
    # r13: span corruption — tokenization of empty/regex-metachar text
    # and the trailing mask window must lay out identically
    "pipeline_span_corruption",
    # r15: DSIR selection — the edge target (doc 0 alone: EMPTY text,
    # whose token stream is the single '' token) must produce identical
    # smoothed bucket weights, scores, and acceptance draws in both
    # engines on unicode/metachar pool docs — and the bucket-count
    # sweep's three folds must summarize identically
    "pipeline_dsir_select",
    "pipeline_dsir_sweep",
    # r15: UniMax allocation — the edge corpus' two-language profile
    # (en-heavy, tiny fr) must waterfill identically, including the
    # running-AND cap window over the ≤|langs| frame
    "pipeline_mix_unimax",
    # r15: BPE-token packing — the empty doc must occupy NO layout
    # space in both engines (the length >= 1 token filter), and the
    # unicode doc's multi-byte symbol counts must lay out identically
    "pipeline_pack_bpe",
    # r15 (ADVICE r14): the binary-ingestion ops' oracles now recompute
    # mean_byte/first_byte from encode(text) BLOB bytes, so they hold on
    # non-ASCII corpora — the MOD sample here is doc 0 (empty payload)
    # and doc 20 (multi-byte UTF-8 payload)
    "source_binary_scan",
    "multimodal_binary_extract",
]


def _write_corpus(spark, path, docs):
    import os

    from tests.conftest import SF_DIR

    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(path / "documents.parquet"))
    # the catalog loads every table eagerly; the non-document tables are
    # irrelevant here, so link them from the regular fixture dir
    for f in os.listdir(SF_DIR):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(SF_DIR, f), str(path / f))
    return str(path)


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    return _write_corpus(spark, tmp_path_factory.mktemp("edge_corpus"), _EDGE_DOCS)


@pytest.fixture(scope="module")
def ascii_dir(spark, tmp_path_factory):
    docs = [d for d in _EDGE_DOCS if d[1].isascii()]
    return _write_corpus(spark, tmp_path_factory.mktemp("edge_ascii"), docs)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{edge_dir}/documents.parquet/*.parquet'"
    )
    return con


@pytest.fixture(scope="module")
def ascii_duck(ascii_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{ascii_dir}/documents.parquet/*.parquet'"
    )
    return con


@pytest.mark.parametrize("name", _DOC_OPS)
def test_edge_corpus_matches_oracle(name, spark, edge_duck, edge_dir):
    ok, msg = compare(name, spark, edge_duck, edge_dir)
    assert ok, msg


@pytest.mark.parametrize("name", _ASCII_OPS)
def test_ascii_edge_corpus_matches_oracle(name, spark, ascii_duck, ascii_dir):
    ok, msg = compare(name, spark, ascii_duck, ascii_dir)
    assert ok, msg
