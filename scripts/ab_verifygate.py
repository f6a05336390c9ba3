#!/usr/bin/env python
"""Interleaved A/B of the r16 bytes-gated verify-side broadcast in the
multiprobe pair tier (`dedup._gate_verify_side`). Arm "shj" monkeypatches
the gate back to the unconditional r15 shuffle-hash pin; arm "gate" runs
the shipped bytes-gated code. Flipped per rep in ONE session so host
noise cancels; min-of-N per arm.

Usage: python scripts/ab_verifygate.py [reps] [name ...]
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
spark = get_spark("ab-verifygate")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()

names = args or [
    "dedup_embedding_multiprobe",
    "sim_semantic_dedup",
    "pipeline_decontaminate_semantic",
    "dedup_multiprobe_sweep",
    "dedup_multiprobe_certification",
    "dedup_reassign_certification",  # control: n_rows=None path
    "dedup_minhash_lsh",  # control: no embedding tier at all
]

_shipped = DD._gate_verify_side


def _r15_pin(side, spark, n_rows):
    return side.hint("shuffle_hash")


best: dict[tuple[str, str], float] = {}
for rep in range(reps):
    for arm, fn in (("shj", _r15_pin), ("gate", _shipped)):
        DD._gate_verify_side = fn
        for name in names:
            spark.catalog.clearCache()
            registry.release_caches(spark, blocking=False)
            spark.sparkContext.setJobDescription(f"{name}[{arm}]")
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best[(name, arm)] = min(best.get((name, arm), float("inf")), dt)
    print(f"# rep {rep + 1}/{reps} done", flush=True)

DD._gate_verify_side = _shipped
print(f"{'query':38s} {'shj':>8s} {'gate':>8s} {'delta':>8s}")
for name in names:
    a, b = best[(name, "shj")], best[(name, "gate")]
    print(f"{name:38s} {a:8.3f} {b:8.3f} {b - a:+8.3f}")
