#!/usr/bin/env python
"""Interleaved A/B of the InferFiltersFromGenerate exclusion: flip
`spark.sql.optimizer.excludedRules` per rep inside ONE session so host
noise cancels. min-of-N per arm, per query.

Usage: python scripts/ab_infergen.py [reps] [name ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

args = sys.argv[1:]
reps = int(args.pop(0)) if args and args[0].isdigit() else 5
sf_dir = "/root/testdata/sf0.1"

from mutable_spark import registry
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("ab-infergen")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()

RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
names = args or [
    "multimodal_phash", "dedup_threshold_histogram",
    "pipeline_split_leakage_safe", "dedup_reassign_certification",
    "pipeline_decontaminate_fuzzy", "pipeline_dsir_select",
    "text_bpe_train_batched", "dedup_minhash_lsh",
    "dedup_verbatim_ngrams", "pipeline_source_overlap",
]

best: dict[tuple[str, str], float] = {}
for rep in range(reps):
    for arm in ("on", "off"):
        spark.conf.set("spark.sql.optimizer.excludedRules", RULE if arm == "off" else "")
        for name in names:
            spark.catalog.clearCache()
            registry.release_caches(spark, blocking=False)
            spark.sparkContext.setJobDescription(f"{name}[{arm}]")
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            k = (name, arm)
            best[k] = min(best.get(k, float("inf")), dt)
    print(f"# rep {rep + 1}/{reps} done", flush=True)

spark.conf.set("spark.sql.optimizer.excludedRules", RULE)
print(f"{'query':40s} {'rule-on':>8s} {'rule-off':>9s} {'delta':>8s}")
for name in names:
    on, off = best[(name, "on")], best[(name, "off")]
    print(f"{name:40s} {on:8.3f} {off:9.3f} {off - on:+8.3f}")
