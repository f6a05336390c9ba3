#!/usr/bin/env python
"""Time individual registry queries at a given SF (dev loop helper).

Usage: python scripts/timeq.py [sf_dir] name [name...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

args = sys.argv[1:]
sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.1"

from mutable_spark import registry
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("timeq")
spark.sparkContext.setLogLevel("ERROR")

from mutable_spark.catalog import load_tables

load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()

for name in args:
    for rep in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = len(registry.QUERIES[name](spark, sf_dir).collect())
        print(f"{name} rep{rep}: {time.perf_counter() - t0:.3f}s ({n} rows)")
