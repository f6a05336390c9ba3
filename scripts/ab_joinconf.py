#!/usr/bin/env python
"""Interleaved A/B of the join-strategy confs the guide recommends
(§3.1/§9): `spark.sql.join.preferSortMergeJoin=false` +
`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold` (AQE's
runtime SMJ→SHJ rewrite, off by default). Flipped per rep in one
session so host noise cancels; min-of-N per arm.

Usage: python scripts/ab_joinconf.py [reps] [name ...]
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
spark = get_spark("ab-joinconf")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()

CONFS = {
    "spark.sql.join.preferSortMergeJoin": ("true", "false"),
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": ("0", "67108864"),
}
names = args or [
    "sim_semantic_dedup", "pipeline_split_leakage_safe",
    "pipeline_decontaminate_semantic", "sim_ivf_train",
    "dedup_embedding_multiprobe", "dedup_minhash_lsh",
    "pipeline_source_overlap", "tpch_q3", "op_join_nary",
]

best: dict[tuple[str, str], float] = {}
for rep in range(reps):
    for arm_i, arm in enumerate(("smj", "shj")):
        for k, v in CONFS.items():
            spark.conf.set(k, v[arm_i])
        for name in names:
            spark.catalog.clearCache()
            registry.release_caches(spark, blocking=False)
            spark.sparkContext.setJobDescription(f"{name}[{arm}]")
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best[(name, arm)] = min(best.get((name, arm), float("inf")), dt)
    print(f"# rep {rep + 1}/{reps} done", flush=True)

for k, v in CONFS.items():
    spark.conf.set(k, v[0])
print(f"{'query':38s} {'smj':>8s} {'shj':>8s} {'delta':>8s}")
for name in names:
    a, b = best[(name, "smj")], best[(name, "shj")]
    print(f"{name:38s} {a:8.3f} {b:8.3f} {b - a:+8.3f}")
