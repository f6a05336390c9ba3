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
# Round 8 rotates in dialect_zoneindex_string (the one query that had
# never held a driver row), pipeline_curriculum_sharded, the composed
# pipeline_end_to_end, and — late r8 — ALL 13 round-8 additions that
# would otherwise sit past the horizon unsampled; the 13 displaced ops
# each hold an r7 triple-match driver row (CORRECTNESS_r07.json) and
# every family keeps an in-sample member (see registry.py's per-slot
# notes).
NEVER_SAMPLED = [
    "dialect_zoneindex_string",
    "pipeline_curriculum_sharded",
    "op_join_asof",
    "op_set_ops",
    "op_zoneindex_scan",
    "dialect_spn_planned_join",
    "dialect_zoneindex_scan",
    "dialect_spn_string_filter",
    "multimodal_phash",
    "op_mvcc_snapshot",
    "op_grouping_sets",
    "pipeline_decontaminate_fuzzy",
    "sim_ivf_train",
    "pipeline_end_to_end",
    "events_attribution",
    "pipeline_clean_corpus",
    "pipeline_pack_sequences",
    "text_lm_surprisal",
    # the 13 round-8 additions (each one's FIRST driver sample)
    "op_join_full_outer",
    "dialect_spn_like_prefix",
    "dedup_verbatim_ngrams",
    "sim_ivf_recall",
    "sim_quantize_embeddings",
    "sim_quantized_rerank",
    "sim_semantic_dedup",
    "multimodal_audio_chunks",
    "events_interarrival",
    "pipeline_contamination_stats",
    "pipeline_token_budget_sample",
    "pipeline_dedup_keep_best",
    "pipeline_oversample",
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
