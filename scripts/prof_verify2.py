#!/usr/bin/env python
"""A/B the multiprobe verify restructure: current shape (cell join ->
distinct pairs -> two embedding join-backs -> cosine -> filter) vs
carrying embeddings through the cell join (cosine computed pre-distinct,
filter first, distinct over survivors). Checks exact output equality.

Usage: python scripts/prof_verify2.py [sf_dir]
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
spark = get_spark("prof-verify2")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

from mutable_spark.catalog import load_tables
import mutable_spark.operators.dedup as D
from mutable_spark.functions import _DOT_UNROLL_DIM, vec_cosine_pre, vec_norm
from mutable_spark.operators.dedup import EMBEDDING_COS_THRESHOLD

tabs = load_tables(spark, sf_dir)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()
e = tabs.embeddings

lab, k, n = D.stored_retrained_labels(e, sf_dir)
P = D._probe_depth(k)
staged = D._staged_with_labels(e, lab).localCheckpoint(eager=True)


def new_pairs(e, max_rk):
    assign = (
        D._multiprobe_assign(e, max_rk)
        .select("vec_id", "cell")
        .localCheckpoint(eager=False)
    )
    ev = e.select(
        "vec_id",
        F.col("embedding").alias("emb"),
        vec_norm(F.col("embedding"), _DOT_UNROLL_DIM).alias("nrm"),
    )
    av = assign.join(ev.hint("shuffle_hash"), "vec_id")
    a = av.select(
        F.col("vec_id").alias("vec_a"), "cell",
        F.col("emb").alias("ea"), F.col("nrm").alias("na"),
    )
    b = av.select(
        F.col("vec_id").alias("vec_b"), F.col("cell").alias("cell_b"),
        F.col("emb").alias("eb"), F.col("nrm").alias("nb"),
    )
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("cell") == F.col("cell_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .select(
            "vec_a", "vec_b",
            vec_cosine_pre(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"),
                _DOT_UNROLL_DIM,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= EMBEDDING_COS_THRESHOLD)
        .distinct()
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# equality first
cur = D.multiprobe_cosine_pairs(staged, max_rk=P)
new = new_pairs(staged, P)
rows_cur = sorted(map(tuple, cur.collect()))
rows_new = sorted(map(tuple, new.collect()))
print("rows cur/new:", len(rows_cur), len(rows_new), "equal:", rows_cur == rows_new)

# rk=1 arm equality (reassign certification path)
c1 = sorted(map(tuple, D.multiprobe_cosine_pairs(staged, max_rk=1).collect()))
n1 = sorted(map(tuple, new_pairs(staged, 1).collect()))
print("rk=1 rows cur/new:", len(c1), len(n1), "equal:", c1 == n1)

# interleaved timing
best = {"cur": float("inf"), "new": float("inf")}
for rep in range(5):
    for arm, fn in (("cur", lambda: noop(D.multiprobe_cosine_pairs(staged, max_rk=P))),
                    ("new", lambda: noop(new_pairs(staged, P)))):
        spark.sparkContext.setJobDescription(f"verify2-{arm}")
        t0 = time.perf_counter()
        fn()
        best[arm] = min(best[arm], time.perf_counter() - t0)
print(f"pair tier noop  cur {best['cur']:.3f}s  new {best['new']:.3f}s")
