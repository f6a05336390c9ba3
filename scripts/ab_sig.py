#!/usr/bin/env python
"""A/B the MinHash signature formulation at sf0.1 (warm, 3 reps each):

  A) current: 64 xxhash64(i, h) calls split hi/lo into 128 32-bit min slots
  B) multiply-mod: h reduced to 31 bits once, then 128 codegen'd
     min((a_i*hh + b_i) % (2^61-1)) universal-hash slots (no xxhash64 in
     the per-shingle hot loop; band keys unchanged)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from mutable_spark import registry
from mutable_spark.catalog import load_tables
from mutable_spark.operators.dedup import _BANDS, _N_PERM, _ROWS, _hashed_shingle_df
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("ab-sig")
spark.sparkContext.setLogLevel("ERROR")
t = load_tables(spark, "/root/testdata/sf0.1")
g = _hashed_shingle_df(t.documents).cache()
g.count()

half_mask = (1 << 32) - 1


def buckets_a():
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(_N_PERM // 2):
        x = F.xxhash64(F.lit(i), F.col("h"))
        aggs.append(F.min(F.shiftrightunsigned(x, 32)).alias(f"m{2 * i}"))
        aggs.append(F.min(x.bitwiseAND(F.lit(half_mask))).alias(f"m{2 * i + 1}"))
    sig = g.select("doc_id", F.explode("shh").alias("h")).groupBy("doc_id").agg(*aggs)
    bands = F.array(
        *[
            F.xxhash64(F.lit(j), *[F.col(f"m{j * _ROWS + r}") for r in range(_ROWS)])
            for j in range(_BANDS)
        ]
    )
    return sig.select("doc_id", "n", F.posexplode(bands).alias("band", "bkey"))


_P61 = (1 << 61) - 1


def buckets_b():
    # deterministic odd multipliers/offsets below 2^30 (golden-ratio walk)
    def ab(i):
        a = (0x9E3779B9 * (2 * i + 1)) & ((1 << 30) - 1) | 1
        b = (0x85EBCA77 * (i + 1)) & ((1 << 30) - 1)
        return a, b

    hh = F.pmod(F.col("h"), F.lit(2147483647))
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(_N_PERM):
        a, b = ab(i)
        aggs.append(F.min((hh * F.lit(a) + F.lit(b)) % F.lit(_P61)).alias(f"m{i}"))
    sig = g.select("doc_id", F.explode("shh").alias("h")).groupBy("doc_id").agg(*aggs)
    bands = F.array(
        *[
            F.xxhash64(F.lit(j), *[F.col(f"m{j * _ROWS + r}") for r in range(_ROWS)])
            for j in range(_BANDS)
        ]
    )
    return sig.select("doc_id", "n", F.posexplode(bands).alias("band", "bkey"))


for label, fn in [("A xxhash64-split", buckets_a), ("B multiply-mod", buckets_b)]:
    for rep in range(3):
        t0 = time.perf_counter()
        n = fn().count()
        print(f"{label} rep{rep}: {time.perf_counter() - t0:.3f}s ({n})", flush=True)
