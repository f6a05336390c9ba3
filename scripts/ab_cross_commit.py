#!/usr/bin/env python
"""Cross-commit A/B of a single registry query (r16, verdict item 3).

Interleaving two code trees inside ONE session is impossible (modules
load once), so this alternates short-lived PROCESSES over two checkouts
— A, B, A, B, ... — so slow box drift taxes both arms equally. Each
process warms up (2 untimed runs) then times ``reps`` runs and prints
the min; the parent reports per-arm min-of-processes and the full
sequence so a drift trend is visible.

Usage:
  python scripts/ab_cross_commit.py <rootA> <rootB> <query> [pairs] [reps]

Worker mode (internal):
  python scripts/ab_cross_commit.py --worker <root> <query> <reps>
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def worker(root: str, name: str, reps: int) -> None:
    sys.path.insert(0, root)
    from mutable_spark import registry
    from mutable_spark.session import get_spark

    registry.load_all()
    spark = get_spark("ab-cross")
    spark.sparkContext.setLogLevel("ERROR")
    from mutable_spark.catalog import load_tables

    sf_dir = "/root/testdata/sf0.1"
    load_tables(spark, sf_dir)
    registry.QUERIES["tpch_q6"](spark, sf_dir).collect()
    fn = registry.QUERIES[name]
    for _ in range(2):  # warm-up: codegen + parquet footers
        spark.catalog.clearCache()
        registry.release_caches(spark, blocking=False)
        fn(spark, sf_dir).collect()
    times = []
    for _ in range(reps):
        spark.catalog.clearCache()
        registry.release_caches(spark, blocking=False)
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
    print(json.dumps({"min": min(times), "all": times}))
    spark.stop()


def main() -> None:
    if sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    root_a, root_b, name = sys.argv[1:4]
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    mins: dict[str, list[float]] = {"A": [], "B": []}
    for p in range(pairs):
        for arm, root in (("A", root_a), ("B", root_b)):
            env = dict(os.environ)
            env.pop("PYTHONPATH", None)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", root, name, str(reps)],
                capture_output=True, text=True, env=env, cwd=root,
            )
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            mins[arm].append(r["min"])
            print(
                f"pair {p + 1}/{pairs} arm {arm} ({root}): min {r['min']:.3f}s "
                f"all {[round(t, 3) for t in r['all']]}",
                flush=True,
            )
    a, b = min(mins["A"]), min(mins["B"])
    print(f"\n{name}: A({root_a}) min {a:.3f}s  B({root_b}) min {b:.3f}s  B-A {b - a:+.3f}s")
    print(f"A mins per process: {[round(t, 3) for t in mins['A']]}")
    print(f"B mins per process: {[round(t, 3) for t in mins['B']]}")


if __name__ == "__main__":
    main()
