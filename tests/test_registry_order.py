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
    # never-driver-sampled as of round 9 (no r6/r8 driver artifacts were
    # ever produced, so the r8 in-sample additions still await their first
    # rows — they all stay), plus every late-r8/r9 registration:
    "dialect_zoneindex_string",
    "dialect_spn_like_prefix",
    "op_join_full_outer",
    "op_grouping_sets",
    "dedup_verbatim_ngrams",
    "sim_ivf_recall",
    "sim_quantize_embeddings",
    "sim_quantized_rerank",
    "sim_semantic_dedup",
    "sim_hard_negatives",
    "multimodal_phash",
    "multimodal_audio_chunks",
    "events_interarrival",
    "events_attribution",
    "events_markov_transitions",
    "events_cooccurrence",
    "text_lm_surprisal",
    "text_chunk_sliding",
    "pipeline_curriculum_sharded",
    "pipeline_decontaminate_fuzzy",
    "pipeline_contamination_stats",
    "pipeline_end_to_end",
    "pipeline_token_budget_sample",
    "pipeline_dedup_keep_best",
    "pipeline_oversample",
    "pipeline_pack_sequences",
    "pipeline_epoch_order",
    "pipeline_source_overlap",
    "pipeline_mix_temperature",
    "pipeline_length_buckets",
    "pipeline_clean_corpus",
    # the eleven round-9 additions (each one's FIRST driver sample)
    "text_bpe_pairs",
    "text_tfidf_terms",
    "events_path_trigrams",
    "pipeline_dedup_stats",
    "op_join_bucketed",
    "events_anomaly_mad",
    "sim_pair_histogram",
    "source_partitioned_scan",
    "source_orc_roundtrip",
    "op_agg_salted",
    "events_pagerank",
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
