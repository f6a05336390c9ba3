#!/usr/bin/env python
"""Interleaved A/B of the r16 batch-2 expression memoizations (simhash
signature/pairs, k-gram chain, shingle/token-hash builders,
_bucket_pairs). Arm "fresh" evicts every `functions._EXPR_MEMO` entry
EXCEPT the already-committed minhash one before each query build
(reproducing the old per-build construction for exactly this batch);
arm "memo" runs warm. Flipped per rep in ONE session; min-of-N per arm.

Usage: [AB_REVERSE=1] python scripts/ab_exprmemo.py [reps] [name ...]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

args = sys.argv[1:]
reps = int(args.pop(0)) if args and args[0].isdigit() else 4
sf_dir = "/root/testdata/sf0.1"

from mutable_spark import functions as MF
from mutable_spark import registry
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("ab-exprmemo")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()

KEEP = {"minhash"}  # batch-1, committed separately — warm in BOTH arms


def evict_batch2():
    for k in [k for k in MF._EXPR_MEMO if len(k) < 2 or k[1] not in KEEP]:
        del MF._EXPR_MEMO[k]


names = args or [
    "dedup_simhash",
    "dedup_verbatim_ngrams",
    "dedup_duplicate_spans",
    "dedup_scrub_spans",
    "dedup_containment",
    "pipeline_source_overlap",
    "text_boilerplate_grams",
    "dedup_minhash_lsh",  # inherits only the small shingle/bucket memos
    "tpch_q3",  # control
]

arms = ("memo", "fresh") if os.environ.get("AB_REVERSE") else ("fresh", "memo")

best: dict[tuple[str, str], float] = {}
for rep in range(reps):
    for arm in arms:
        for name in names:
            spark.catalog.clearCache()
            registry.release_caches(spark, blocking=False)
            if arm == "fresh":
                evict_batch2()
            else:
                # steady-state arm: an untimed build re-populates any
                # entries the preceding fresh arm left evicted (its last
                # query evicts without rebuilding this query's exprs)
                registry.QUERIES[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name}[{arm}]")
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best[(name, arm)] = min(best.get((name, arm), float("inf")), dt)
    print(f"# rep {rep + 1}/{reps} done", flush=True)

print(f"{'query':38s} {'fresh':>8s} {'memo':>8s} {'delta':>8s}")
for name in names:
    a, b = best[(name, "fresh")], best[(name, "memo")]
    print(f"{name:38s} {a:8.3f} {b:8.3f} {b - a:+8.3f}")
