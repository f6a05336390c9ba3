#!/usr/bin/env python
"""Stage-wise profiling of the k-gram tier (guide §1: noop sink + job
labels): token-hash stage, chained-zip_with gram build, full query —
for dedup_verbatim_ngrams (k=20), text_boilerplate_grams (k=5) and the
positional span tier.

Usage: python scripts/prof_grams.py [sf_dir]
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
spark = get_spark("prof-grams")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

from mutable_spark.catalog import load_tables
import mutable_spark.operators.dedup as D

tabs = load_tables(spark, sf_dir, inflation=D.SHINGLE_INFLATION)
registry.QUERIES["tpch_q6"](spark, sf_dir).collect()
docs = tabs.documents


def t(label, df, reps=3):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best:7.3f}s", flush=True)
    return best


# stage 0: token split + md5 hash only
toks = docs.select("doc_id", D._tokens().alias("t")).filter(F.size("t") >= 20)
th = toks.select("doc_id", F.transform(F.col("t"), D._token_hash).alias("th"))
t("tokens only", toks)
t("token md5 hash (transform HOF)", th)

# stage 1: gram arrays via chained zip_with (current production shape)
t("gram arrays k=20 (19 chained zip_with)", D.verbatim_gram_arrays(docs))
t("gram arrays k=5", D.verbatim_gram_arrays(docs, k=5))

# stage 2: exploded rows + full query
t("gram rows k=20 (exploded)", D.verbatim_gram_rows(docs))
t("FULL dedup_verbatim_ngrams", registry.QUERIES["dedup_verbatim_ngrams"](spark, sf_dir))

# positional variant (span tier)
t("positional grams k=20", D.positional_gram_frame(docs))
t("FULL dedup_duplicate_spans", registry.QUERIES["dedup_duplicate_spans"](spark, sf_dir))

# shingle tier (k=3 zip_with x2) for reference
t("hashed shingles (minhash input)", D._hashed_shingle_df(docs))
