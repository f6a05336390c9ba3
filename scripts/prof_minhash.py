#!/usr/bin/env python
"""Profile the minhash pipeline stages separately."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from mutable_spark import registry
from mutable_spark.session import get_spark
from mutable_spark.catalog import load_tables
from mutable_spark.operators.dedup import (
    _hashed_shingle_df, _bucket_pairs, _AB, _P31, _BANDS, _ROWS,
)

registry.load_all()
spark = get_spark("prof")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
t = load_tables(spark, sf_dir)

def tick(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s ({r})", flush=True)

g = _hashed_shingle_df(t.documents).cache()
tick("g cache build (count)", lambda: g.count())
tick("g recount (cached)", lambda: g.count())

sig = (
    g.select("doc_id", F.explode("shh").alias("sh_h"))
    .select("doc_id", F.pmod(F.col("sh_h"), F.lit(_P31)).alias("h"))
    .groupBy("doc_id")
    .agg(*[F.min((F.lit(a) * F.col("h") + F.lit(b)) % _P31).alias(f"m{i}")
           for i, (a, b) in enumerate(_AB)])
)
tick("signature build", lambda: sig.count())

bands = F.array(*[F.xxhash64(F.lit(j), *[F.col(f"m{j*_ROWS+r}") for r in range(_ROWS)])
                  for j in range(_BANDS)])
buckets = sig.select("doc_id", F.posexplode(bands).alias("band", "bkey"))
grouped = (buckets.groupBy("band", "bkey")
           .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
           .filter(F.size("ids") >= 2))
cand = _bucket_pairs(grouped)
tick("bucket pass + cand", lambda: cand.count())

cand_c = cand.localCheckpoint(eager=True)
sizes = g.select("doc_id", F.size("shh").alias("n"))
cand2 = (cand_c.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n": "n_a"}), "doc_a")
         .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n": "n_b"}), "doc_b")
         .filter((F.col("n_a") * 2 >= F.col("n_b")) & (F.col("n_b") * 2 >= F.col("n_a"))))
tick("size prune (from checkpointed cand)", lambda: cand2.count())

verified = (
    cand2.join(g.select(F.col("doc_id").alias("doc_a"), F.col("shh").alias("sh_a")), "doc_a")
    .join(g.select(F.col("doc_id").alias("doc_b"), F.col("shh").alias("sh_b")), "doc_b")
    .select("doc_a", "doc_b", "n_a", "n_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"))
)
jac = F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
out = verified.select("doc_a", "doc_b", jac.alias("jac")).filter(F.col("jac") >= 0.5)
tick("verify from checkpointed cand", lambda: out.count())

from mutable_spark.operators.dedup import minhash_lsh_pairs
tick("full minhash_lsh_pairs", lambda: minhash_lsh_pairs(g).count())
