#!/usr/bin/env python
"""Profile the minhash pipeline stages separately (current r8 shape:
shingle build → 128-slot signature+band buckets → bucket pairs with the
carried size-ratio prune → exact verify)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from mutable_spark import registry
from mutable_spark.catalog import load_tables
from mutable_spark.operators.dedup import (
    _bucket_pairs,
    _hashed_shingle_df,
    _minhash_buckets,
    _verify_pairs,
    minhash_lsh_pairs,
)
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("prof")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
t = load_tables(spark, sf_dir, inflation=__import__("mutable_spark.catalog", fromlist=["SHINGLE_INFLATION"]).SHINGLE_INFLATION)


def tick(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s ({r})", flush=True)


g = _hashed_shingle_df(t.documents).cache()
tick("g cache build (count)", lambda: g.count())
tick("g recount (cached)", lambda: g.count())

buckets = _minhash_buckets(g)
tick("signature + band buckets", lambda: buckets.count())

grouped = (
    _minhash_buckets(g)
    .groupBy("band", "bkey")
    .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ms"))
    .filter(F.size("ms") >= 2)
)
p = _bucket_pairs(grouped)
cand = (
    p.select(
        F.col("p.a.doc_id").alias("doc_a"),
        F.col("p.a.n").alias("n_a"),
        F.col("p.b.doc_id").alias("doc_b"),
        F.col("p.b.n").alias("n_b"),
    )
    .filter((F.col("n_a") * 2 >= F.col("n_b")) & (F.col("n_b") * 2 >= F.col("n_a")))
    .distinct()
)
tick("bucket pairs + size prune + distinct", lambda: cand.count())

cand_c = cand.localCheckpoint(eager=True)
tick("verify (from checkpointed cand)", lambda: _verify_pairs(cand_c, g).count())

tick("full minhash_lsh_pairs", lambda: minhash_lsh_pairs(g).count())
