#!/usr/bin/env python
"""A/B the multiprobe verify stage: joins-only vs full cosine; counts.

Usage: python scripts/prof_verify.py [sf_dir]
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
spark = get_spark("prof-verify")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

from mutable_spark.catalog import load_tables
from mutable_spark.functions import vec_cosine_pre, vec_norm
import mutable_spark.operators.dedup as D

tabs = load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()
e = tabs.embeddings

lab, k, n = D.stored_retrained_labels(e, sf_dir)
P = D._probe_depth(k)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_cand():
    staged = D._staged_with_labels(e, lab).localCheckpoint(eager=False)
    assign = (
        D._multiprobe_assign(staged, P)
        .select("vec_id", "cell")
        .localCheckpoint(eager=False)
    )
    a = assign.select(F.col("vec_id").alias("vec_a"), "cell")
    b = assign.select(F.col("vec_id").alias("vec_b"), F.col("cell").alias("cell_b"))
    raw = a.join(
        b.hint("shuffle_hash"),
        (F.col("cell") == F.col("cell_b")) & (F.col("vec_a") < F.col("vec_b")),
    ).select("vec_a", "vec_b")
    return staged, raw


staged, raw = build_cand()
print(f"N={n} k={k} P={P}")
print(f"raw cand rows   = {raw.count()}")
cand = raw.distinct().localCheckpoint(eager=True)
print(f"distinct cand   = {cand.count()}")

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

attached = cand.join(ea.hint("shuffle_hash"), "vec_a").join(
    eb.hint("shuffle_hash"), "vec_b"
)


def timeit(name, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}s")


# warm
noop(attached.select("vec_a", "vec_b", F.size("ea").alias("z")))

timeit(
    "joins only (size expr)",
    lambda: noop(attached.select("vec_a", "vec_b", (F.size("ea") + F.size("eb")).alias("z"))),
)
timeit(
    "joins + HOF cosine",
    lambda: noop(
        attached.select(
            "vec_a",
            "vec_b",
            vec_cosine_pre(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias("cos"),
        ).filter(F.col("cos") >= D.EMBEDDING_COS_THRESHOLD)
    ),
)

# verify-in-the-cell-join variant: attach embeddings BEFORE the pair join
def cell_local():
    staged2 = D._staged_with_labels(e, lab).localCheckpoint(eager=False)
    assign2 = (
        D._multiprobe_assign(staged2, P)
        .select("vec_id", "cell")
        .localCheckpoint(eager=False)
    )
    ev = staged2.select("vec_id", "embedding", vec_norm(F.col("embedding")).alias("nn"))
    av = assign2.join(ev.hint("shuffle_hash"), "vec_id").select(
        "vec_id", "cell", "embedding", "nn"
    )
    a2 = av.select(
        F.col("vec_id").alias("vec_a"),
        "cell",
        F.col("embedding").alias("ea"),
        F.col("nn").alias("na"),
    )
    b2 = av.select(
        F.col("vec_id").alias("vec_b"),
        F.col("cell").alias("cell_b"),
        F.col("embedding").alias("eb"),
        F.col("nn").alias("nb"),
    )
    pairs = (
        a2.join(
            b2.hint("shuffle_hash"),
            (F.col("cell") == F.col("cell_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .select(
            "vec_a",
            "vec_b",
            vec_cosine_pre(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias("cos"),
        )
        .filter(F.col("cos") >= D.EMBEDDING_COS_THRESHOLD)
        .distinct()
    )
    noop(pairs)


cell_local()  # warm
timeit("cell-local verify (attach-before-pair-join, distinct after)", cell_local)

spark.stop()
