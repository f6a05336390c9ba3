#!/usr/bin/env python
"""Same-session A/B of per-query fixed-floor levers on the classic-18 set
(legacy-21 minus the LSH trio). Usage: ab_floor.py [variant ...]"""
import sys, time
sys.path.insert(0, "/root/repo")

CLASSIC18 = [
    "tpch_q1","tpch_q3","tpch_q6","tpch_q12","tpch_q14",
    "op_join_nary","op_subquery_scalar","op_join_asof","op_topk_per_group",
    "op_count_distinct","dedup_exact","text_quality_score","text_fingerprint",
    "text_langid","sim_cosine_topk","events_window_tumbling",
    "events_sessionize","multimodal_extract",
]

def run_set(spark, sf, reps=3):
    from mutable_spark import registry
    best = {}
    for _ in range(reps):
        for name in CLASSIC18:
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf)
            df.toPandas()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, 9e9), dt)
    return best

def main():
    from mutable_spark.session import get_spark
    from mutable_spark import registry
    registry.load_all()
    sf = "/root/testdata/sf0.1"
    spark = get_spark("ab_floor")
    # warm everything once (relayout, codegen, JIT)
    run_set(spark, sf, reps=1)
    for variant in sys.argv[1:] or ["baseline"]:
        if variant == "baseline":
            pass
        elif variant.startswith("conf:"):      # conf:key=value
            k, v = variant[5:].split("=", 1)
            spark.conf.set(k, v)
        b = run_set(spark, sf)
        print(f"{variant}: total={sum(b.values()):.3f}s  " +
              " ".join(f"{n}={v:.3f}" for n, v in sorted(b.items(), key=lambda kv: -kv[1])[:5]))
if __name__ == "__main__":
    main()
