#!/usr/bin/env python
"""A/B: multiprobe blocking at the stored k=10 quantizer vs a re-trained
k=sqrt(N) quantizer (2 Lloyd rounds — each round IS the registered
`refreshed_cells` rk=1 assignment, chained), across probe depths.

Measures, per (k, P): full-corpus pair-join wall, verified pair count,
and MOD-sample recall vs the exact baseline — the experiment behind
SCALE.md's "k ~ sqrt(N) demonstrated" section. Run at any SF via
SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import pyspark.sql.functions as F

    from mutable_spark import registry
    from mutable_spark.session import get_spark

    registry.load_all()
    import mutable_spark.operators.dedup as dd
    from mutable_spark.catalog import load_tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-ksweep")
    spark.sparkContext.setLogLevel("ERROR")
    e = load_tables(spark, sf_dir).embeddings
    n = e.count()
    k = int(math.isqrt(n))

    def relabel(frame, labels):
        return frame.drop("label").join(
            labels.withColumnRenamed("cell", "label"), "vec_id"
        )

    def measure(frame, tag, p):
        t = time.time()
        n_pairs = dd.multiprobe_cosine_pairs(frame, max_rk=p).count()
        wall = time.time() - t
        sm = frame.filter(F.col("vec_id") % dd._CERT_MOD == 0)
        n_tier = dd.multiprobe_cosine_pairs(sm, max_rk=p).count()
        n_exact = dd.exact_cosine_pairs(sm).count()
        print(
            f"{tag} P={p}: wall {wall:.2f}s, {n_pairs} verified pairs, "
            f"recall {n_tier * 10000 // max(n_exact, 1)} bp",
            flush=True,
        )

    print(f"N={n}, sqrt-N k={k}, derived P={dd._probe_depth(k)}", flush=True)
    measure(e, "k=stored", dd._MULTIPROBE)

    # 2 Lloyd rounds from a deterministic modulo init (the shared
    # library k-means: operators/dedup.py::retrained_cells)
    ek = relabel(e, dd.retrained_cells(e, k)).localCheckpoint(eager=True)
    # r14: sweep through the ADOPTED derived depth (P = min(k, ceil
    # sqrt(2k)), the production rule) so the A/B always prices the
    # shipped point alongside the historical ones
    for p in sorted({dd._MULTIPROBE, 6, 8, dd._probe_depth(k)}):
        measure(ek, f"k={k}", p)


if __name__ == "__main__":
    main()
