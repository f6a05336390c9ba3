#!/usr/bin/env python
"""A/B the verbatim-gram build (r9 measurement, recorded in SCALE.md):

A. the shipped k-1 chained zip_withs over aligned array views
   (`dedup.verbatim_gram_rows`)
B. a single transform-over-positions with a nested aggregate-over-slice
   per gram (one expression, no intermediate arrays)

Measured at sf0.1 / 32 cores: B loses COLD (4.5 s vs 2.6 s — bigger
Janino codegen) and WARM (2.4 s vs 2.1 s — each per-gram slice
materializes a k-element array the chain never allocates). Third
rejected alternative after the r8 pair (hot-gram prefilter ~2.5×
slower; flat element_at chain ~10× slower). The chain stands.

Run: python scripts/ab_gram.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from mutable_spark.catalog import load_tables  # noqa: E402
from mutable_spark.operators.dedup import (  # noqa: E402
    _PH,
    _SPAN_K,
    _token_hash,
    _tokens,
    verbatim_gram_rows,
)
from mutable_spark.session import get_spark  # noqa: E402


def slice_agg_gram_rows(d):
    """Variant B: per-position nested fold. The guard on the sequence
    upper bound matters — sequence(1, m) DESCENDS through 0 when m < 1,
    and slice(_, 0, _) is an ANSI error."""
    toks = _tokens()
    t = d.select("doc_id", toks.alias("t")).filter(F.size("t") >= _SPAN_K)
    t = t.select("doc_id", F.transform(F.col("t"), _token_hash).alias("th"))
    m = F.greatest(F.size("th") - _SPAN_K + 1, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.aggregate(
            F.slice(F.col("th"), i, _SPAN_K),
            F.lit(0).cast("long"),
            lambda a, b: (a * 131 + b) % _PH,
        ),
    )
    g = t.select("doc_id", F.array_distinct(grams).alias("grams"))
    return g.select("doc_id", F.explode("grams").alias("h"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-gram", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    d = load_tables(spark, sf_dir).documents
    d.count()
    for name, fn in [("chain", verbatim_gram_rows), ("slice_agg", slice_agg_gram_rows)]:
        ts = []
        for _ in range(3):
            t0 = time.time()
            n = fn(d).count()
            ts.append(time.time() - t0)
        print(f"{name}: cold {ts[0]:.2f}s warm {min(ts[1:]):.2f}s rows={n}")


if __name__ == "__main__":
    main()
