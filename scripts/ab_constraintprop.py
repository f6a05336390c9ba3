#!/usr/bin/env python
"""Interleaved A/B of constraint-propagation cost (r16): three arms —
  on      : shipped confs (constraint propagation enabled)
  norule  : `InferFiltersFromConstraints` added to excludedRules
            (narrow: skips the main O(tree^2) filter-inference pass,
            keeps constraints for PruneFilters etc.)
  off     : `spark.sql.constraintPropagation.enabled=false` (broad)
Result-neutral by construction: constraint propagation only ever ADDS
predicates implied by existing ones, so disabling it can change plans
and latency but never rows. Arm order rotates per rep so order bias
cancels; min-of-N per arm, per query.

Usage: python scripts/ab_constraintprop.py [reps] [name ...]
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
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("ab-constraintprop")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()

CP_KEY = "spark.sql.constraintPropagation.enabled"
EX_KEY = "spark.sql.optimizer.excludedRules"
BASE_EXCLUDED = str(spark.conf.get(EX_KEY) or "")
IFC = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints"


def set_arm(arm: str) -> None:
    if arm == "on":
        spark.conf.set(CP_KEY, "true")
        spark.conf.set(EX_KEY, BASE_EXCLUDED)
    elif arm == "norule":
        spark.conf.set(CP_KEY, "true")
        ex = (BASE_EXCLUDED + "," + IFC).lstrip(",")
        spark.conf.set(EX_KEY, ex)
    else:  # off
        spark.conf.set(CP_KEY, "false")
        spark.conf.set(EX_KEY, BASE_EXCLUDED)


names = args or [
    "sim_semantic_dedup", "dedup_embedding_multiprobe",
    "dedup_multiprobe_sweep", "pipeline_split_leakage_safe",
    "pipeline_decontaminate_fuzzy", "sim_ivfpq_search",
    "dedup_reassign_certification", "dedup_minhash_lsh",
    "dedup_verbatim_ngrams", "tpch_q3",
]

ARMS = ["on", "norule", "off"]
best: dict[tuple[str, str], float] = {}
for rep in range(reps):
    order = ARMS[rep % 3:] + ARMS[: rep % 3]
    for arm in order:
        set_arm(arm)
        for name in names:
            spark.catalog.clearCache()
            registry.release_caches(spark, blocking=False)
            spark.sparkContext.setJobDescription(f"{name}[cp-{arm}]")
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            k = (name, arm)
            best[k] = min(best.get(k, float("inf")), dt)
    print(f"# rep {rep + 1}/{reps} done (order {order})", flush=True)

set_arm("on")
print(f"{'query':40s} {'on':>8s} {'norule':>8s} {'off':>8s} {'d-norule':>9s} {'d-off':>8s}")
for name in names:
    on = best[(name, "on")]
    nr = best[(name, "norule")]
    off = best[(name, "off")]
    print(
        f"{name:40s} {on:8.3f} {nr:8.3f} {off:8.3f}"
        f" {nr - on:+9.3f} {off - on:+8.3f}"
    )
