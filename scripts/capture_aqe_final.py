#!/usr/bin/env python
"""Capture the EXECUTED (AQE-final) plan for named queries (r16, verdict
item 4): run the query's action, then dump
`queryExecution().executedPlan()` — with AQE on this prints
`AdaptiveSparkPlan isFinalPlan=true` and the join operators the runtime
actually used (the static `explain` captures only show the pre-AQE plan,
which is why the r15 SMJ->SHJ rewrite claim had timing-only evidence).

Usage: python scripts/capture_aqe_final.py <tag> <suffix> name [name ...]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

tag, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

from mutable_spark import registry
from mutable_spark.session import get_spark

registry.load_all()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("aqe_final")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)

out_dir = ROOT / "plans" / tag
out_dir.mkdir(parents=True, exist_ok=True)

for name in names:
    spark.catalog.clearCache()
    registry.release_caches(spark, blocking=False)
    df = registry.QUERIES[name](spark, sf_dir)
    df.collect()  # run the action so AQE finalizes every stage
    txt = df._jdf.queryExecution().executedPlan().toString()
    (out_dir / f"{name}_{suffix}.txt").write_text(txt)
    print(f"wrote plans/{tag}/{name}_{suffix}.txt ({len(txt)} bytes)")
spark.stop()
