#!/usr/bin/env python
"""A/B: HOF fold dot vs unrolled fixed-dim codegen dot on the multiprobe
verify frame. Checks bit-identity (xxhash over results) and timing.
"""
from __future__ import annotations

import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from mutable_spark import registry
from mutable_spark.session import get_spark

registry.load_all()
spark = get_spark("prof-dot")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

from mutable_spark.catalog import load_tables
from mutable_spark.functions import vec_cosine_pre, vec_dot, vec_norm
import mutable_spark.operators.dedup as D

tabs = load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()
e = tabs.embeddings
lab, k, n = D.stored_retrained_labels(e, sf_dir)
P = D._probe_depth(k)

staged = D._staged_with_labels(e, lab).localCheckpoint(eager=False)
assign = (
    D._multiprobe_assign(staged, P).select("vec_id", "cell").localCheckpoint(eager=False)
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
ea = staged.select(
    F.col("vec_id").alias("vec_a"),
    F.col("embedding").alias("ea"),
    vec_norm(F.col("embedding")).alias("na"),
)
eb = staged.select(
    F.col("vec_id").alias("vec_b"),
    F.col("embedding").alias("eb"),
    vec_norm(F.col("embedding")).alias("nb"),
)
attached = (
    cand.join(ea.hint("shuffle_hash"), "vec_a")
    .join(eb.hint("shuffle_hash"), "vec_b")
    .localCheckpoint(eager=True)
)
print(f"attached pairs = {attached.count()}")


def unrolled_dot(x, y, dim=64):
    acc = F.lit(0.0)
    for d in range(dim):
        acc = acc + x[d].cast("double") * y[d].cast("double")
    return acc


def adaptive_dot(x, y, dim=64):
    return F.when(
        (F.size(x) == dim) & (F.size(y) == dim), unrolled_dot(x, y, dim)
    ).otherwise(vec_dot(x, y))


def cos_of(dotexpr):
    return F.try_divide(dotexpr, F.col("na") * F.col("nb"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}s")


hof = attached.select(
    "vec_a", "vec_b", cos_of(vec_dot(F.col("ea"), F.col("eb"))).alias("cos")
).filter(F.col("cos") >= D.EMBEDDING_COS_THRESHOLD)
ada = attached.select(
    "vec_a", "vec_b", cos_of(adaptive_dot(F.col("ea"), F.col("eb"))).alias("cos")
).filter(F.col("cos") >= D.EMBEDDING_COS_THRESHOLD)

noop(hof)
noop(ada)
timeit("HOF fold cosine     ", lambda: noop(hof))
timeit("adaptive unrolled   ", lambda: noop(ada))


def sig(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("vec_a", "vec_b", F.col("cos").cast("string")).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (r["n"], r["h"])


s1, s2 = sig(hof), sig(ada)
print(f"hof sig = {s1}")
print(f"ada sig = {s2}")
print("IDENTICAL" if s1 == s2 else "*** MISMATCH ***")
spark.stop()
