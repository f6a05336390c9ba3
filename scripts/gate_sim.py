#!/usr/bin/env python
"""Driver-gate simulation — the round-end pre-flight.

Replicates the external driver's correctness check: a VANILLA
SparkSession (no mutable_spark.session tuning — runtime confs must be
applied by the queries themselves via catalog/apply paths), the FIRST 50
registry entries (or all with --all), each query's rows/schema/values
compared against its DuckDB oracle on the same parquet.

Usage:
    python scripts/gate_sim.py [--all] [--sf /root/testdata/sf0.01]

Exit code 1 if any row is red. Output: one line per query + a summary.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="all registrations")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names (overrides the 50-sample)",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from mutable_spark import registry
    from oracle_harness import compare

    registry.load_all()
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    names = list(registry.QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n]
    elif not args.all:
        names = names[:50]
    bad: list[str] = []
    for n in names:
        try:
            ok, msg = compare(n, spark, con, args.sf)
        except Exception as e:  # noqa: BLE001 — report and continue
            ok, msg = False, f"{n}: ERROR {type(e).__name__}: {e}"
        # cache hygiene (VERDICT r10 item #5): after materialization,
        # every cache()/localCheckpoint block a query created must be
        # releasable, and the storage layer must come back EMPTY —
        # a long-lived session must not accrue residue query over query.
        registry.release_caches(spark)
        left = registry.persistent_rdd_count(spark)
        if left:
            ok = False
            msg += f" [CACHE RESIDUE: {left} persistent RDDs after release]"
        if not ok:
            bad.append(n)
        print(msg, flush=True)
    print(f"\n{len(names) - len(bad)}/{len(names)} green; red: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
