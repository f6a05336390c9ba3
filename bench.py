#!/usr/bin/env python
"""Headline benchmark: runs the flagship query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set: the five TPC-H parity queries the reference benchmarks
(benchmark/tpc-h/q*.yml) plus the scale-path pipeline operators (hash dedup,
MinHash-LSH near-dup, text scoring/fingerprinting, vector top-k, event
sessionization). The quadratic exact baselines (ngram all-pairs,
all-pairs cosine) are deliberately excluded — they exist as correctness
oracles, not as the scale path.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "tpch_q12",
    "tpch_q14",
    "op_join_nary",
    "op_subquery_scalar",
    "op_join_asof",
    "op_topk_per_group",
    "op_count_distinct",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_score",
    "text_fingerprint",
    "text_langid",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "events_window_tumbling",
    "events_sessionize",
    "multimodal_extract",
    # rounds-6/7 heavy operators (VERDICT r7 item #4): tracked so a perf
    # regression in them is visible to the per-round gate; the legacy 21
    # above keep cross-round continuity.
    "dedup_embedding_cosine",
    "pipeline_decontaminate_fuzzy",
    "sim_ivf_train",
    "sim_knn_join",
    "text_repetition_filter",
    # round-8 heavy additions
    "dedup_verbatim_ngrams",
    # r15: the trained-label write-back store — runs BEFORE the heavy
    # stored-label consumers in each pass, so it prices train+write+read
    # while sim_semantic_dedup / dedup_embedding_multiprobe /
    # pipeline_decontaminate_semantic below price the READ path the
    # store buys them (the r14 verdict's duplicated-Lloyd-chain fix)
    "sim_label_store_roundtrip",
    "sim_semantic_dedup",
    "pipeline_contamination_stats",
    "pipeline_end_to_end",
    "text_lm_surprisal",
    # late-r8/r9 heavies previously untracked (measured ≥ ~1 s at sf0.1 —
    # everything cheaper stays out to keep the bench tight)
    "pipeline_source_overlap",
    "multimodal_phash",
    "sim_hard_negatives",
    "text_tfidf_terms",
    "events_cooccurrence",
    "sim_pair_histogram",
    # late-r9 additions over the ≥ ~1 s bar (boilerplate 2.2 s, threshold
    # histogram 2.8 s, leakage-safe split 4.6 s at sf0.1; salted join /
    # time-range window / covariance / session text stay out at
    # 0.4/0.8/0.8/1.0 s)
    "text_boilerplate_grams",
    "dedup_threshold_histogram",
    "pipeline_split_leakage_safe",
    # r10 additions over the bar (containment 3.3 s, PQ trainer 1.8 s at
    # sf0.1; text_bm25_rank and op_group_join stay out at 0.6 s each)
    "dedup_containment",
    "sim_pq_train",
    # r11 additions over the bar (two-stage ANN 2.9 s, IVF-PQ 3.1 s at
    # sf0.1 — the trained codebooks rebuild per call by design; the
    # thirteen new TPC-H queries, matryoshka recall, filter funnel and
    # the format roundtrips all stay out at 0.2-0.9 s)
    "sim_pq_search",
    "sim_ivfpq_search",
    # r12 additions over the bar (the multiprobe blocking family: sweep
    # ~2.0 s, production tier ~1.4 s at sf0.1; ivf_balance, unpivot and
    # the point certifications stay out at 0.2-1.2 s)
    "dedup_multiprobe_sweep",
    "dedup_embedding_multiprobe",
    # r13 addition over the bar (reassign certification 1.9 s — three
    # cosine tiers on the MOD sample; sim_matryoshka_search and
    # sim_cell_reassign stay out at 0.7 / 0.6 s)
    "dedup_reassign_certification",
    # r14 additions: the production coarse quantizer itself and the
    # embedding-tier decontamination screen it feeds (the other r14
    # registrations stay out: band sweep / convergence / topm /
    # binary_extract are instruments or sub-second maps)
    "sim_retrained_cells",
    "pipeline_decontaminate_semantic",
    # late-r14: the multi-round BPE trainer (3.3 s warm at sf0.1 —
    # three argmax/merge/rebuild rounds over the vocabulary frame), its
    # encode consumer (3.0 s — re-trains then joins the doc stream),
    # and the duplicated-span cut list (1.3 s — positional grams +
    # count window + run compression)
    "text_bpe_train",
    "text_bpe_train_batched",
    "text_bpe_encode",
    "dedup_duplicate_spans",
    # late-r14: the scrub pass applying the span cut list (2.2 s —
    # shared span tier + two shuffle-hash doc_id joins) and the
    # BPE-budget sampler (4.0 s — trained-tokenizer counts + quality
    # attach + per-source window, all key-partitioned)
    "dedup_scrub_spans",
    "pipeline_bpe_budget_sample",
    # late-r14: per-language tokenizer fertility (3.5 s — encode join
    # carrying lang + one <=|langs|-key rollup)
    "text_bpe_fertility",
    # r15: DSIR importance-resampling selection (one cached token scan
    # feeding two <=4096-row bucket rollups, a broadcast weight attach,
    # and the per-doc mean/acceptance pass)
    "pipeline_dsir_select",
    # r15 note: sim_growing_cluster_sweep (the constant-P experiment)
    # deliberately stays OUT of the headline set — its synthetic corpus
    # is fixed-size by design, so it carries no per-SF signal; its cost
    # (~15 s warm, 3 sizes x full quantizer chain + certificate) is
    # recorded in SCALE.md and it remains driver-sampled for
    # correctness
]


def _run_invocation(
    sf_dir: str, reps: int, tag: str
) -> tuple[dict[str, float], dict[str, int], list[float], dict[str, object]]:
    """One full bench invocation: a FRESH SparkSession, warm-up, then
    ``reps`` complete passes over the headline set. Returns per-query
    mins, row counts, the per-pass totals, and the session's actual
    execution environment (master string + defaultParallelism) so the
    JSON line self-evidences the $SPARK_GRAFT_CPUS contract — a
    floor-bound workload and an ignored env var both produce ~flat
    8v32 scaling ratios, and only this field tells them apart (r15
    verdict item 2)."""
    from mutable_spark import registry
    from mutable_spark.session import get_spark

    registry.load_all()
    spark = get_spark(f"mutable_spark-bench-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    env = {
        "master": spark.sparkContext.master,
        "effective_parallelism": spark.sparkContext.defaultParallelism,
    }

    # warm the JVM + parquet footers once so we measure query execution,
    # not first-touch session costs (the reference's harness also separates
    # compile from execute time, and times queries after IMPORT). Loading
    # every table up front also runs the one-time ingest re-layout
    # (catalog._maybe_relayout) outside the timed region.
    from mutable_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    registry.QUERIES["tpch_q6"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    rows_seen: dict[str, int] = {}
    pass_totals: list[float] = []
    for p in range(reps):
        pass_total = 0.0
        for name in HEADLINE:
            fn = registry.QUERIES[name]
            spark.catalog.clearCache()  # no cross-query cache accumulation
            registry.release_caches(spark, blocking=False)  # + checkpoints
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # Arrow fetch (toPandas), not collect(): every result row
            # still materializes in Python, but through the columnar
            # Arrow path any real consumer would use. Row-pickle
            # collect() adds ~0.8 s of pure Py4J deserialization on the
            # 98k-row sessionize result — harness cost, not engine cost
            # (the DuckDB baseline's fetch is likewise native).
            rows_seen[name] = len(df.toPandas())
            dt = time.perf_counter() - t0
            pass_total += dt
            timings[name] = round(min(timings.get(name, float("inf")), dt), 4)
        pass_totals.append(round(pass_total, 4))
        print(f"# [{tag}] pass {p + 1}/{reps}: {pass_total:.2f}s", file=sys.stderr)
    spark.stop()
    return timings, rows_seen, pass_totals, env


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    # min-of-N per query: this box is a VM on a shared host and single runs
    # show 2-5x spikes on identical code (host contention, not GC/code-cache
    # — ruled out by heap/warning checks; r7 measured 2.6-6.0 s on the same
    # query back-to-back). Min-of-N is the standard way to measure the code
    # rather than the neighbor's workload; the baseline proxy measurements
    # use min-of-3 the same way, so 3 reps keeps the two sides comparable.
    #
    # r11 hardening (VERDICT r10 item #6): the N reps run as N FULL PASSES
    # over the whole query set, not back-to-back per query — a noisy host
    # window a few seconds long used to swallow all 3 reps of one query
    # and mislabel a round as a regression (r10's phantom +25% on
    # unchanged code); with passes ~40 s apart the same window taxes at
    # most one rep of each query.
    #
    # r12 hardening (VERDICT r11 item #8): the passes all run inside ONE
    # invocation, so a bad window minutes long still poisons all of them
    # (it mislabeled two of the last three rounds). When the per-pass
    # totals spread > 20%, the WHOLE bench re-invokes — a fresh
    # SparkSession, a fresh warm-up, minutes apart — and per-query mins
    # merge across invocations; the artifact records `invocations` and
    # the quietest invocation's spread, so the JSON says how clean the
    # best measurement window actually was.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    max_inv = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_INVOCATIONS", "3"))
    spread_bar = 20.0

    timings: dict[str, float] = {}
    rows_seen: dict[str, int] = {}
    all_pass_totals: list[list[float]] = []
    best_spread = float("inf")
    invocations = 0
    env: dict[str, object] = {}
    while invocations < max_inv:
        invocations += 1
        t, r, passes, env = _run_invocation(sf_dir, reps, f"inv{invocations}")
        rows_seen.update(r)
        for name, dt in t.items():
            timings[name] = round(min(timings.get(name, float("inf")), dt), 4)
        all_pass_totals.append(passes)
        spread = 100.0 * (max(passes) - min(passes)) / min(passes)
        best_spread = min(best_spread, spread)
        if spread <= spread_bar:
            break
        if invocations < max_inv:
            print(
                f"# invocation {invocations} spread {spread:.1f}% > "
                f"{spread_bar:.0f}%: re-invoking",
                file=sys.stderr,
            )
        else:
            print(
                f"# invocation {invocations} spread {spread:.1f}% > "
                f"{spread_bar:.0f}%: invocation budget exhausted, keeping "
                f"cross-invocation mins (best spread {best_spread:.1f}%)",
                file=sys.stderr,
            )
    for name in HEADLINE:
        print(
            f"# {name}: {timings[name]:.3f}s ({rows_seen[name]} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    # cross-round continuity: rounds ≤5 tracked exactly the first 21 names;
    # rounds 6-8 added nine heavy operators to the set, so the grand total
    # is not comparable across rounds — legacy_21_total is.
    legacy_21 = round(sum(timings[n] for n in HEADLINE[:21] if n in timings), 4)
    print(
        json.dumps(
            {
                "metric": "total_runtime_headline_queries",
                "value": total,
                "unit": "sec",
                "legacy_21_total": legacy_21,
                "queries": timings,
                "sf": sf,
                # contract self-evidence (r15 verdict item 2): the master
                # string actually used and sc.defaultParallelism, so the
                # driver's scaling probe can distinguish "floor-bound at
                # this SF" from "$SPARK_GRAFT_CPUS ignored".
                "master": env.get("master"),
                "effective_parallelism": env.get("effective_parallelism"),
                "runs": reps,
                "invocations": invocations,
                "pass_totals": [p for inv in all_pass_totals for p in inv],
                "pass_totals_by_invocation": all_pass_totals,
                "spread_pct": round(best_spread, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
