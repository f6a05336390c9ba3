#!/usr/bin/env python
"""Split each headline query's wall time into DataFrame CONSTRUCTION
(python+py4j plan build: `QUERIES[name](spark, sf_dir)`) vs EXECUTION
(`.collect()` on the built frame). Construction cost is pure driver-side
overhead that memoization can remove without touching the plan (the
r16 minhash finding). Warm pass first; min-of-N of each part.

Usage: python scripts/prof_build_vs_exec.py [reps] [name ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

args = sys.argv[1:]
reps = int(args.pop(0)) if args and args[0].isdigit() else 3
sf_dir = "/root/testdata/sf0.1"

from mutable_spark import registry
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("prof-build-vs-exec")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)

if args:
    names = args
else:
    import bench

    names = list(bench.HEADLINE)

# warm pass (codegen cache, parquet footers, any per-process memo)
for name in names:
    spark.catalog.clearCache()
    registry.release_caches(spark, blocking=False)
    registry.QUERIES[name](spark, sf_dir).collect()
print("# warm pass done", flush=True)

best_b: dict[str, float] = {}
best_e: dict[str, float] = {}
for rep in range(reps):
    for name in names:
        spark.catalog.clearCache()
        registry.release_caches(spark, blocking=False)
        spark.sparkContext.setJobDescription(f"{name}[bve]")
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        best_b[name] = min(best_b.get(name, float("inf")), t1 - t0)
        best_e[name] = min(best_e.get(name, float("inf")), t2 - t1)
    print(f"# rep {rep + 1}/{reps} done", flush=True)

print(f"{'query':38s} {'build':>8s} {'exec':>8s} {'total':>8s} {'b%':>5s}")
for name in sorted(names, key=lambda n: -(best_b[n] + best_e[n])):
    b, e = best_b[name], best_e[name]
    print(f"{name:38s} {b:8.3f} {e:8.3f} {b + e:8.3f} {100 * b / (b + e):4.0f}%")
