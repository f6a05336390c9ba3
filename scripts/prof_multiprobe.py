#!/usr/bin/env python
"""Stage-wise profiling of the production multiprobe pair tier at sf0.1
(dev loop helper, guide §1: noop sink + job labels).

Usage: python scripts/prof_multiprobe.py [sf_dir]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from mutable_spark import registry
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("prof-multiprobe")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

from mutable_spark.catalog import load_tables
import mutable_spark.operators.dedup as D

tabs = load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()
e = tabs.embeddings
print(f"embeddings N = {e.count()}")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        registry.release_caches(spark, blocking=False)
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}s")
    return best


# warm the store + codegen once
lab, k, n = D.stored_retrained_labels(e, sf_dir)
print(f"k={k} P={D._probe_depth(k)}")
noop(D.retrained_multiprobe_pairs(e, labels=lab, k=k))

sd = spark.sparkContext.setJobDescription

sd("label store read only")
timeit("1 stored_retrained_labels (read)", lambda: noop(D.stored_retrained_labels(e, sf_dir)[0]))

sd("staged join")
timeit("2 staged = e SHJ labels", lambda: noop(D._staged_with_labels(e, D.stored_retrained_labels(e, sf_dir)[0])))


def assign_only():
    lab2, k2, _ = D.stored_retrained_labels(e, sf_dir)
    staged = D._staged_with_labels(e, lab2).localCheckpoint(eager=False)
    noop(D._multiprobe_assign(staged, D._probe_depth(k2)).select("vec_id", "cell"))


sd("probe assign")
timeit("3 probe assign (top-p)", assign_only)


def cand_only():
    lab2, k2, _ = D.stored_retrained_labels(e, sf_dir)
    staged = D._staged_with_labels(e, lab2).localCheckpoint(eager=False)
    assign = (
        D._multiprobe_assign(staged, D._probe_depth(k2))
        .select("vec_id", "cell")
        .localCheckpoint(eager=False)
    )
    a = assign.select(F.col("vec_id").alias("vec_a"), "cell")
    b = assign.select(F.col("vec_id").alias("vec_b"), F.col("cell").alias("cell_b"))
    cand = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("cell") == F.col("cell_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b")
        .distinct()
    )
    noop(cand)


sd("candidates distinct")
timeit("4 assign + cand distinct", cand_only)

sd("full pair tier")
timeit(
    "5 full retrained_multiprobe_pairs",
    lambda: noop(
        D.retrained_multiprobe_pairs(e, labels=D.stored_retrained_labels(e, sf_dir)[0], k=k)
    ),
)

sd("registered query dedup_embedding_multiprobe")
timeit(
    "6 dedup_embedding_multiprobe (toPandas)",
    lambda: registry.QUERIES["dedup_embedding_multiprobe"](spark, sf_dir).toPandas(),
)

sd("registered query sim_semantic_dedup")
timeit(
    "7 sim_semantic_dedup (toPandas)",
    lambda: registry.QUERIES["sim_semantic_dedup"](spark, sf_dir).toPandas(),
)
spark.stop()
