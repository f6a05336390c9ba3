#!/usr/bin/env python
"""Interleaved A/B of the r16 minhash expression memoization
(`dedup._minhash_exprs` / `_MINHASH_EXPR_CACHE`). Arm "fresh" clears the
cache before every query build (reproducing the old per-build Column
construction cost); arm "memo" runs the shipped warm-cache path. Flipped
per rep in ONE session so host noise cancels; min-of-N per arm.

Usage: python scripts/ab_minhash_memo.py [reps] [name ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

args = sys.argv[1:]
reps = int(args.pop(0)) if args and args[0].isdigit() else 4
sf_dir = "/root/testdata/sf0.1"

from mutable_spark import registry
from mutable_spark.operators import dedup as DD
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("ab-minhash-memo")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()

names = args or [
    "dedup_minhash_lsh",
    "dedup_threshold_histogram",
    "pipeline_decontaminate_fuzzy",
    "pipeline_split_leakage_safe",
    "pipeline_dsir_select",
    "dedup_simhash",  # control: simhash family, no minhash exprs
    "tpch_q3",  # control: no dedup code at all
]

import os

arms = ("memo", "fresh") if os.environ.get("AB_REVERSE") else ("fresh", "memo")

best: dict[tuple[str, str], float] = {}
for rep in range(reps):
    for arm in arms:
        for name in names:
            spark.catalog.clearCache()
            registry.release_caches(spark, blocking=False)
            if arm == "fresh":
                DD._MINHASH_EXPR_CACHE.clear()
            else:
                DD._minhash_exprs()  # warm once; steady-state arm
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
