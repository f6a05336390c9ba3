#!/usr/bin/env python
"""Capture .explain("formatted") for headline (or named) queries into
plans/<tag>/<name>_<suffix>.txt  (r15 optimization-round deliverable).

Usage: python scripts/explain_all.py <tag> <suffix> [name ...]
  e.g. python scripts/explain_all.py r15 before            # all headliners
       python scripts/explain_all.py r15 after sim_semantic_dedup
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
names = sys.argv[3:]

from mutable_spark import registry
from mutable_spark.session import get_spark

registry.load_all()
if not names:
    import bench

    names = list(bench.HEADLINE)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("explain_all")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)

out_dir = ROOT / "plans" / tag
out_dir.mkdir(parents=True, exist_ok=True)

mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
for name in names:
    spark.catalog.clearCache()
    registry.release_caches(spark, blocking=False)
    try:
        df = registry.QUERIES[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
    except Exception as exc:  # capture the failure instead of aborting the sweep
        txt = f"EXPLAIN FAILED: {exc!r}\n"
    (out_dir / f"{name}_{suffix}.txt").write_text(txt)
    print(f"wrote plans/{tag}/{name}_{suffix}.txt ({len(txt)} bytes)")
spark.stop()
