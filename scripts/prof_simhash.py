#!/usr/bin/env python
"""Profile dedup_simhash stage costs at sf0.1."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from mutable_spark import registry
from mutable_spark.session import get_spark
from mutable_spark.catalog import load_tables
from mutable_spark.operators.dedup import _shingle_df

registry.load_all()
spark = get_spark("prof")
spark.sparkContext.setLogLevel("ERROR")
t = load_tables(spark, "/root/testdata/sf0.1")


def tick(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"{label}: {best:.3f}s ({r})", flush=True)


g = _shingle_df(t.documents, distinct=False)
tick("shingle build (count rows)", lambda: g.count())
ex = g.select("doc_id", F.explode("sh").alias("tok"))
tick("explode (count)", lambda: ex.count())
m = ex.select("doc_id", F.md5("tok").alias("m"))
tick("explode+md5 (agg count)", lambda: m.agg(F.count("m")).collect())
th = m.select(
    "doc_id",
    F.conv(F.substring("m", 1, 8), 16, 10).cast("long").alias("h0"),
    F.conv(F.substring("m", 9, 8), 16, 10).cast("long").alias("h1"),
)
tick("conv parse (sum h0)", lambda: th.agg(F.sum(F.col("h0").cast("decimal(38,0)"))).collect())
votes = th.groupBy("doc_id").agg(
    *[F.sum((F.shiftrightunsigned(F.col(f"h{b//32}"), b % 32).bitwiseAND(F.lit(1)) * 2 - 1)).alias(f"b{b}")
      for b in range(64)]
)
tick("votes 64-agg", lambda: votes.count())
tick("full dedup_simhash", lambda: len(registry.QUERIES["dedup_simhash"](spark, "/root/testdata/sf0.1").collect()))
