"""The driver checks the FIRST 50 registry entries against the DuckDB
oracle (CORRECTNESS_r02 rows == registration indices 0-49).  Pin the
round-3 ordering contract: every distinct operator family lands inside
the 50-query sample window (VERDICT r2, next-round item #3)."""

from mutable_spark import registry

# Operator families that must hold a slot in the current 50-query sample.
# Round 6 rotates the five never-sampled round-5 operators in (VERDICT r5
# item #1) in place of 3x-green twins (distinct/count_distinct/zscore/
# left_outer/anti/json_extract/sliding) and the structurally rows-only
# op_approx_sketches (accuracy pinned locally in test_sketches.py).
# Round 7 rotates in its seven new ops; op_topk_per_group and
# events_sessionize (both green r1-r5) hand over their slots with family
# coverage retained (TakeOrderedAndProject pin; retention+funnel).
# Round 8 rotated in dialect_zoneindex_string and the 13 round-8
# additions. Round 9 applies the same policy at full width: NO r6/r8
# driver artifacts exist, so everything rotated in last round stays,
# and ALL remaining never-sampled names (late-r8 past-horizon ops +
# the eleven r9 additions) take the 19 slots of names holding r7
# triple-match rows (see registry.py's rotation note).
NEVER_SAMPLED = [
    # Round 15: CORRECTNESS_r14 was the fifth 50/50 clean sweep and
    # rotation debt reached zero (r14 verdict), so "never sampled" is
    # the r15 registrations, plus the ops REWRITTEN this round that
    # need a fresh triple-match even though their names hold old rows:
    # the five stored-label consumers (sim_semantic_dedup,
    # dedup_embedding_multiprobe, dedup_multiprobe_certification,
    # dedup_multiprobe_sweep, pipeline_decontaminate_semantic — all
    # already in-sample), the blob-arithmetic oracle rewrites
    # (source_binary_scan, multimodal_binary_extract), and the
    # presence-contract oracle rewrites (sim_ann_recall,
    # sim_lsh_band_sweep — in-sample; sim_ann_lsh is rotated back in
    # below for its Spark-side NULL-chunk change).
    "sim_label_store_roundtrip",
    "pipeline_dsir_select",
    "op_sketch_certification",
    "dedup_scrub_spans_canonical",
    "text_bpe_train_batched",
    "sim_growing_cluster_sweep",
    "sim_semantic_dedup",
    "dedup_embedding_multiprobe",
    "dedup_multiprobe_certification",
    "dedup_multiprobe_sweep",
    "pipeline_decontaminate_semantic",
    "source_binary_scan",
    "multimodal_binary_extract",
    "sim_ann_recall",
    "sim_lsh_band_sweep",
]


def test_priority_list_is_exhaustive():
    registry.load_all()
    assert set(registry.QUERIES) == set(registry._SAMPLE_PRIORITY), (
        "every registered query must take an explicit sample-priority slot; "
        "unlisted names silently fall past the driver's 50-query horizon"
    )
    assert len(registry._SAMPLE_PRIORITY) == len(set(registry._SAMPLE_PRIORITY))


def test_first_50_covers_every_family():
    registry.load_all()
    sample = set(list(registry.QUERIES)[:50])
    missing = [n for n in NEVER_SAMPLED if n not in sample]
    assert not missing, f"families outside the driver sample window: {missing}"
    # Demoted twins must still be registered (they remain in queries()).
    for twin in ("tpch_q1", "text_token_count", "dialect_string_ops"):
        assert twin in registry.QUERIES


def test_entry_flagship_still_registered():
    registry.load_all()
    assert "tpch_q1" in registry.QUERIES  # __spark_entry__.entry() runs it
