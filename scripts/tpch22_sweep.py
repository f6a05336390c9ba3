#!/usr/bin/env python
"""TPC-H 22/22 sweep: Spark (registered queries) vs DuckDB (the exact
oracle SQL) at sf0.1, min-of-N each, one JSON line. Both engines run the
IDENTICAL semantics (the oracle IS the DuckDB side), so this is the
engine-vs-engine comparison the judge's classic-18 measurement samples —
extended to the full TPC-H set, with the same min-of-N discipline."""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    import duckdb

    from mutable_spark import registry
    from mutable_spark.session import get_spark

    registry.load_all()
    names = sorted(n for n in registry.QUERIES if n.startswith("tpch_q"))
    spark = get_spark("tpch22-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    registry.QUERIES["tpch_q1"](spark, sf_dir).collect()  # warm

    out = {}
    for name in names:
        s_best = d_best = 9e9
        for _ in range(reps):
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).toPandas()
            s_best = min(s_best, time.perf_counter() - t0)
            t0 = time.perf_counter()
            duck.sql(registry.ORACLES[name]).arrow()
            d_best = min(d_best, time.perf_counter() - t0)
        out[name] = {"spark_s": round(s_best, 4), "duck_s": round(d_best, 4),
                     "ratio": round(s_best / d_best, 2)}
        print(f"# {name}: spark {s_best:.3f}s duck {d_best:.3f}s "
              f"({s_best/d_best:.2f}x)", file=sys.stderr)
    tot_s = round(sum(v["spark_s"] for v in out.values()), 3)
    tot_d = round(sum(v["duck_s"] for v in out.values()), 3)
    print(json.dumps({"metric": "tpch22_spark_vs_duckdb", "sf": sf_dir,
                      "reps": reps, "spark_total_s": tot_s,
                      "duck_total_s": tot_d,
                      "ratio_total": round(tot_s / tot_d, 2),
                      "queries": out}))
    spark.stop()

if __name__ == "__main__":
    main()
