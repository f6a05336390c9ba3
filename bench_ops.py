#!/usr/bin/env python
"""Operator microbenchmarks — the reference's ``benchmark/operators``
suite re-run Spark-vs-DuckDB on identical parquet.

The reference measures per-operator execution time on 10M-tuple
synthetic tables (``benchmark/operators/gen.py``: ``NUM_TUPLES =
10_000_000``) across scale factors, for grouping
(``group_by_i32_single/multiple/distinct.yml``), aggregation widths
(``group_by_aggregates.yml``), ordering (``order_by_i32_*.yml``) and
equi-joins (``equi_join_pk_fk.yml`` fk→pk at 1e-8 selectivity,
``equi_join_n2m.yml`` n:m at 1e-6). This harness mirrors those cases:

* **Same data shapes.** ``Distinct_i32(id, n1..n100000)`` with nK
  uniform in [0, K); ``Relation(id, fid, n2m)`` with fid uniform over
  the id domain (fk→pk selectivity 1/N = 1e-7..1e-8 by SF) and n2m
  uniform over N/10 values (the reference's 1e-6-selectivity n:m key
  at 10M rows). Deterministic numpy seed, written ONCE as parquet to
  ``$SPARK_GRAFT_OPSBENCH_DIR`` (default /tmp); both engines read the
  SAME files.
* **Same queries.** The DuckDB SQL is the reference's own DuckDB case
  text (count-wrapped so no engine pays result-transfer); the Spark
  side is the same plan expressed on the DataFrame API.
* **Same measurement.** Warm-up run, then min-of-3, matching
  ``bench.py`` and the judge's DuckDB proxy methodology.
* **Scale factors, not one point.** Each case runs at SF ∈ {0.25, 0.5,
  1.0} of 10M rows via an ``id < N`` predicate both engines push into
  the same parquet. The per-operator SLOPE is the number that
  transfers to cluster scale: Spark's fixed ~0.2 s scheduling floor
  amortizes with size, so throughput (rows/s) should RISE with SF
  while a saturated single-node engine stays flat.

Emits one JSON line: {"suite": "operators", "cases": {name: {sf:
{"spark_s": .., "duckdb_s": ..}}}}.  Not run by the driver — results
are recorded in SCALE.md §operator-microbenchmarks.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

#: reference gen.py NUM_TUPLES; env-overridable so the smoke test
#: (tests/test_bench_ops.py) can exercise every case on a tiny table
N_TUPLES = int(os.environ.get("SPARK_GRAFT_OPSBENCH_N", 10_000_000))
SFS = (0.25, 0.5, 1.0)
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def gen_data(root: Path) -> None:
    """Write Distinct_i32 and Relation as parquet (once, seeded)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    root.mkdir(parents=True, exist_ok=True)
    # The marker encodes N_TUPLES so a prior run with a small
    # SPARK_GRAFT_OPSBENCH_N can never silently feed tiny parquet to a
    # later full-size benchmark (ADVICE r9): size mismatch → regenerate.
    marker = root / f".complete_v3_{N_TUPLES}"  # v3: adds Attribute_scalar
    if marker.exists():
        return
    for stale in root.glob(".complete_v*"):
        stale.unlink()
    rng = np.random.default_rng(0x5EED)
    ident = np.arange(N_TUPLES, dtype=np.int32)
    cols: dict[str, "np.ndarray"] = {"id": ident}
    for k in (1, 10, 100, 1_000, 10_000, 100_000):
        cols[f"n{k}"] = rng.integers(0, k, N_TUPLES, dtype=np.int32)
    pq.write_table(
        pa.table(cols),
        root / "Distinct_i32.parquet",
        row_group_size=512 * 1024,
    )
    # phys-cost-models/filter: d uniform, d_sorted = the ordered twin
    # (row-group min/max stats make the `d_sorted <= x` scan prunable in
    # BOTH engines — the zone-map effect the reference's '-ordered' yml
    # variants isolate), payload = the GROUP BY consumer
    d = rng.random(N_TUPLES)
    sel = pa.table(
        {
            "d": d,
            "d_sorted": np.sort(d),
            "payload": rng.integers(0, 100, N_TUPLES, dtype=np.int32),
        }
    )
    pq.write_table(
        sel, root / "Selectivity_d.parquet", row_group_size=512 * 1024
    )
    rel = pa.table(
        {
            "id": ident,
            # fk → pk: uniform over the FULL id domain so every SF slice
            # of R joins the same slice of S at ~1 match per fid
            # (reference FKEY_JOIN_SELECTIVITY 1e-8 at SF 1.0)
            "fid": rng.integers(0, N_TUPLES, N_TUPLES, dtype=np.int32),
            # n:m: N/10 distinct values → selectivity 1e-7 per pair,
            # ~1e7·1e7·1e-7 = 1e7·10 output pairs at SF 1.0
            "n2m": rng.integers(0, N_TUPLES // 10, N_TUPLES, dtype=np.int32),
        }
    )
    pq.write_table(rel, root / "Relation.parquet", row_group_size=512 * 1024)
    # selection_* suites (Attribute_i32/i64/f + Attributes_multi_i32,
    # reference gen.py domains): uniform over the FULL signed domain so a
    # selectivity s maps to the cutoff MIN + s·2^bits, exactly like the
    # reference's precomputed literals
    attr = pa.table(
        {
            "val_i32": rng.integers(-(2**31), 2**31, N_TUPLES, dtype=np.int64).astype(np.int32),
            "val_i64": rng.integers(-(2**63), 2**63 - 1, N_TUPLES, dtype=np.int64),
            "val_f": rng.random(N_TUPLES, dtype=np.float32),
            "a0": rng.integers(-(2**31), 2**31, N_TUPLES, dtype=np.int64).astype(np.int32),
            "a1": rng.integers(-(2**31), 2**31, N_TUPLES, dtype=np.int64).astype(np.int32),
        }
    )
    pq.write_table(
        attr, root / "Attribute_scalar.parquet", row_group_size=512 * 1024
    )
    marker.touch()


# ---------------------------------------------------------------------------
# cases: name -> (duckdb SQL template, spark builder). {D}=Distinct_i32 view,
# {R}=Relation view, {N}=row cutoff for the SF. The DuckDB text is the
# reference's own DuckDB case wrapped so the result is one row.
CASES: dict[str, str] = {
    # group_by_i32_single.yml / group_by_i32_distinct.yml
    "group_by_i32_n10": "SELECT COUNT(DISTINCT n10) FROM {D}",
    "group_by_i32_n1000": "SELECT COUNT(DISTINCT n1000) FROM {D}",
    "group_by_i32_n100000": "SELECT COUNT(DISTINCT n100000) FROM {D}",
    # group_by_i32_multiple.yml case 4
    "group_by_i32_multi4": (
        "SELECT COUNT(*) FROM (SELECT 1 FROM {D} "
        "GROUP BY n10000, n1000, n100, n10)"
    ),
    # group_by_aggregates.yml case 4
    "group_by_aggregates4": (
        "SELECT COUNT(*), SUM(m1), SUM(m2), SUM(m3), SUM(m4) FROM ("
        "SELECT MIN(n100) m1, MIN(n1000) m2, MIN(n10000) m3, "
        "MIN(n100000) m4 FROM {D} GROUP BY n10)"
    ),
    # order_by_i32_single.yml — a real global sort on both sides. DuckDB
    # can't skip the ORDER BY because ROW_NUMBER consumes it; its window
    # over a sorted stream is a streaming pass, so the sort dominates.
    # The Spark side is df.orderBy → range-partitioned parallel sort
    # executed via a noop-sink write (a count-wrap would either let
    # Catalyst drop the sort or — via a global row_number — collapse the
    # plan to ONE partition, which is the window anti-pattern, not the
    # sort operator this case measures).
    "order_by_i32": (
        "SELECT COUNT(*), MAX(rk) FROM (SELECT ROW_NUMBER() OVER "
        "(ORDER BY n100000, id) rk FROM {D})"
    ),
    # order_by_i32_multiple.yml case 4
    "order_by_i32_multi4": (
        "SELECT COUNT(*), MAX(rk) FROM (SELECT ROW_NUMBER() OVER "
        "(ORDER BY n10000, n1000, n100, n10) rk FROM {D})"
    ),
    # group_by_i32_multiple.yml cases 1-3 (case 4 below predates r10; the
    # x-axis is the number of grouping keys)
    "group_by_i32_multi1": (
        "SELECT COUNT(*) FROM (SELECT 1 FROM {D} GROUP BY n10000)"
    ),
    "group_by_i32_multi2": (
        "SELECT COUNT(*) FROM (SELECT 1 FROM {D} GROUP BY n10000, n1000)"
    ),
    "group_by_i32_multi3": (
        "SELECT COUNT(*) FROM (SELECT 1 FROM {D} "
        "GROUP BY n10000, n1000, n100)"
    ),
    # group_by_aggregates.yml cases 1-3 (x-axis: aggregate count)
    "group_by_aggregates1": (
        "SELECT COUNT(*), SUM(m1) FROM ("
        "SELECT MIN(n100) m1 FROM {D} GROUP BY n10)"
    ),
    "group_by_aggregates2": (
        "SELECT COUNT(*), SUM(m1), SUM(m2) FROM ("
        "SELECT MIN(n100) m1, MIN(n1000) m2 FROM {D} GROUP BY n10)"
    ),
    "group_by_aggregates3": (
        "SELECT COUNT(*), SUM(m1), SUM(m2), SUM(m3) FROM ("
        "SELECT MIN(n100) m1, MIN(n1000) m2, MIN(n10000) m3 "
        "FROM {D} GROUP BY n10)"
    ),
    # order_by_i32_multiple.yml cases 2-3 (case 1 == the single-key sort
    # above, case 4 predates r10; x-axis: sort-key count)
    "order_by_i32_multi2": (
        "SELECT COUNT(*), MAX(rk) FROM (SELECT ROW_NUMBER() OVER "
        "(ORDER BY n10000, n1000) rk FROM {D})"
    ),
    "order_by_i32_multi3": (
        "SELECT COUNT(*), MAX(rk) FROM (SELECT ROW_NUMBER() OVER "
        "(ORDER BY n10000, n1000, n100) rk FROM {D})"
    ),
    # order_by_i32_distinct.yml (x-axis: distinct sort-key values; the
    # n100000 point is `order_by_i32` above)
    "order_by_i32_distinct_n10": (
        "SELECT COUNT(*), MAX(rk) FROM (SELECT ROW_NUMBER() OVER "
        "(ORDER BY n10, id) rk FROM {D})"
    ),
    "order_by_i32_distinct_n1000": (
        "SELECT COUNT(*), MAX(rk) FROM (SELECT ROW_NUMBER() OVER "
        "(ORDER BY n1000, id) rk FROM {D})"
    ),
    # equi_join_pk_fk.yml — two Spark configurations per the reference's
    # own multi-configuration format (it measures Interpreter vs WasmV8):
    # Catalyst's default pick (sort-merge under AQE) and a SHUFFLE_HASH
    # hint (skips both sorts; the right choice when neither side needs
    # sorted output and partitions fit in memory)
    "equi_join_pk_fk": (
        "SELECT COUNT(*) FROM {R} R, {R} S WHERE R.id = S.fid"
    ),
    "equi_join_pk_fk_shj": (
        "SELECT COUNT(*) FROM {R} R, {R} S WHERE R.id = S.fid"
    ),
    # phys-cost-models/hash-based-group-join/hbgj_vs_shj_hbg.yml: the
    # group-join shape (aggregate the join result BY the join key). The
    # reference fuses this into one HashBasedGroupJoin physical operator;
    # Spark's exchange-placement rule gives the same fusion (the agg
    # reuses the join's hash partitioning — no third exchange;
    # plan-pinned via op_group_join in tests/test_plan_shape.py)
    "group_join_pk_fk": (
        "SELECT COUNT(*), SUM(c), MIN(m) FROM ("
        "SELECT R.id, COUNT(*) c, MIN(S.n2m) m FROM {R} R, {R} S "
        "WHERE R.id = S.fid GROUP BY R.id)"
    ),
    # same query over BUCKETED storage (VERDICT r10 item #8): both sides
    # bucketed+sorted on their join key (sources/bucketing.py), so the
    # join AND the by-key aggregate run with ZERO Exchange — the physical
    # shape SCALE.md claims closes the fused-group-join gap at 100 TB,
    # measured. The DuckDB text is identical (it has no bucketing; the
    # A/B isolates OUR layout change on the same computation).
    "group_join_pk_fk_bucketed": (
        "SELECT COUNT(*), SUM(c), MIN(m) FROM ("
        "SELECT R.id, COUNT(*) c, MIN(S.n2m) m FROM {R} R, {R} S "
        "WHERE R.id = S.fid GROUP BY R.id)"
    ),
    # r12 floor-attack pattern, measured at 10M rows: "keep each
    # group's argmin rows" — the shape behind the tpch_q2/q9 and
    # clean_corpus rewrites. Two formulations of the SAME computation
    # (value-checked equal): the groupBy + join-back form builds the
    # grouped relation AND re-reads the fact (two passes, two wide
    # shuffles at scale), the window form does it in ONE pass over one
    # (n10000) exchange. DuckDB gets each form's own text — its
    # optimizer does not rewrite between them either, so the A/B
    # isolates the formulation choice both engines face.
    "argmin_groupjoin": (
        "SELECT COUNT(*), SUM(v) FROM ("
        "SELECT D.n100000 v FROM {D} D JOIN "
        "(SELECT n10000 g, MIN(n100000) m FROM {D} GROUP BY n10000) a "
        "ON D.n10000 = a.g AND D.n100000 = a.m)"
    ),
    "argmin_window": (
        "SELECT COUNT(*), SUM(v) FROM (SELECT n100000 v FROM ("
        "SELECT n100000, MIN(n100000) OVER (PARTITION BY n10000) m "
        "FROM {D}) WHERE n100000 = m)"
    ),
    # equi_join_n2m.yml
    "equi_join_n2m": (
        "SELECT COUNT(*) FROM {R} R, {R} S WHERE R.n2m = S.n2m "
        "AND R.id < S.id"
    ),
    "equi_join_n2m_shj": (
        "SELECT COUNT(*) FROM {R} R, {R} S WHERE R.n2m = S.n2m "
        "AND R.id < S.id"
    ),
}


#: phys-cost-models/filter (`branch_vs_pred-w_hashing-{un,}ordered.yml`):
#: selectivity is the x-axis (always at full size), the GROUP BY payload
#: consumer keeps the filter's output alive, and the '-ordered' variant
#: runs the same predicate on the SORTED column where row-group pruning
#: applies in both engines.
SELECTIVITIES = (0.01, 0.1, 0.5, 0.9)


def filter_case(sel_tbl, col: str, x: float):
    from pyspark.sql import functions as F

    g = (
        sel_tbl.filter(F.col(col) <= x)
        .groupBy("payload")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"), F.sum("c").alias("n_rows")
    )


FILTER_SQL = (
    "SELECT COUNT(*) AS n_groups, SUM(c) AS n_rows FROM ("
    "SELECT payload, COUNT(*) AS c FROM {S} WHERE {col} <= {x} "
    "GROUP BY payload)"
)


#: selection_* suites (selection_range_onesided_{i32,i64,f}.yml,
#: selection_range_twosided_i32_varying_first_fixed_second.yml,
#: selection_multi_i32_varying_both.yml): full-size scan + COUNT(*), the
#: selectivity is the x-axis. Cutoffs derive from the selectivity over the
#: full signed domain — the same arithmetic behind the reference's
#: precomputed literals (e.g. sel 0.01 over INT(4) → -2104533974).
SELECTION_SELS = (0.01, 0.2, 0.5, 0.9)
_TWOSIDED_WIDTH = 0.01  # the reference's fixed-second window width


def _sel_pred(name: str, sel: float) -> str:
    if name == "selection_onesided_i32":
        return f"val_i32 < {int(-(2 ** 31) + sel * 2 ** 32)}"
    if name == "selection_onesided_i64":
        return f"val_i64 < {int(-(2 ** 63) + sel * 2 ** 64)}"
    if name == "selection_onesided_f":
        return f"val_f < {sel}"
    if name == "selection_twosided_i32":
        lo = int(-(2 ** 31) + sel * 2 ** 32)
        hi = int(lo + _TWOSIDED_WIDTH * 2 ** 32)
        return f"{lo} < val_i32 AND val_i32 < {hi}"
    if name == "selection_multi_i32":
        c = int(-(2 ** 31) + sel * 2 ** 32)
        return f"a0 < {c} AND a1 < {c}"
    raise KeyError(name)


SELECTION_CASES = (
    "selection_onesided_i32",
    "selection_onesided_i64",
    "selection_onesided_f",
    "selection_twosided_i32",
    "selection_multi_i32",
)


def selection_case(attr_tbl, name: str, sel: float):
    """Spark plan for a selection case: the predicate column(s) only, so
    the filter pushes to the parquet scan, then COUNT(*)."""
    from pyspark.sql import functions as F

    if name == "selection_onesided_i32":
        pred = F.col("val_i32") < int(-(2 ** 31) + sel * 2 ** 32)
    elif name == "selection_onesided_i64":
        pred = F.col("val_i64") < int(-(2 ** 63) + sel * 2 ** 64)
    elif name == "selection_onesided_f":
        pred = F.col("val_f") < float(sel)
    elif name == "selection_twosided_i32":
        lo = int(-(2 ** 31) + sel * 2 ** 32)
        hi = int(lo + _TWOSIDED_WIDTH * 2 ** 32)
        pred = (F.lit(lo) < F.col("val_i32")) & (F.col("val_i32") < F.lit(hi))
    elif name == "selection_multi_i32":
        c = int(-(2 ** 31) + sel * 2 ** 32)
        pred = (F.col("a0") < c) & (F.col("a1") < c)
    else:
        raise KeyError(name)
    return attr_tbl.filter(pred).agg(F.count(F.lit(1)).alias("n"))


#: (session id, slice tag) → bucketed table names, so reps time the
#: co-located READ path while the one-time bucketed write (the ingest
#: boundary, sources/bucketing.py) happens during the warm/value-check run
_OPSB_BUCKETED: dict[tuple, tuple[str, str]] = {}


def _ensure_bucketed_rel(spark, rel) -> tuple[str, str]:
    """Write the (already SF-sliced) Relation as two bucketed+sorted
    managed tables — by id (the PK side) and by fid (the FK side) — once
    per (session, slice)."""
    import hashlib

    plan = rel._jdf.queryExecution().logical().toString()
    tag = hashlib.md5(plan.encode()).hexdigest()[:8]
    key = (id(spark), tag)
    if key in _OPSB_BUCKETED:
        return _OPSB_BUCKETED[key]
    from mutable_spark.sources.bucketing import write_bucketed

    bid, bfid = f"opsb_rel_bid_{tag}", f"opsb_rel_bfid_{tag}"
    write_bucketed(rel, bid, "id")
    write_bucketed(rel, bfid, "fid")
    _OPSB_BUCKETED[key] = (bid, bfid)
    return bid, bfid


def spark_df(spark, name: str, dist, rel):
    """The Spark plan for each case — same work as the SQL text."""
    from pyspark.sql import functions as F

    if name.startswith("group_by_i32_n"):
        col = name.rsplit("_", 1)[-1]
        return dist.agg(F.countDistinct(col))
    if name.startswith("group_by_i32_multi"):
        keys = ["n10000", "n1000", "n100", "n10"][: int(name[-1])]
        return dist.groupBy(*keys).agg(F.lit(1)).agg(F.count(F.lit(1)))
    if name.startswith("group_by_aggregates"):
        cols = ["n100", "n1000", "n10000", "n100000"][: int(name[-1])]
        g = dist.groupBy("n10").agg(
            *(F.min(c).alias(f"m{i + 1}") for i, c in enumerate(cols))
        )
        return g.agg(
            F.count(F.lit(1)),
            *(F.sum(f"m{i + 1}") for i in range(len(cols))),
        )
    if name == "order_by_i32":
        return dist.orderBy("n100000", "id").select("id")
    if name.startswith("order_by_i32_multi"):
        keys = ["n10000", "n1000", "n100", "n10"][: int(name[-1])]
        return dist.orderBy(*keys).select("id")
    if name.startswith("order_by_i32_distinct_"):
        return dist.orderBy(name.rsplit("_", 1)[-1], "id").select("id")
    if name == "group_join_pk_fk":
        left = rel.select("id")
        right = rel.select(F.col("fid"), F.col("n2m"))
        g = (
            left.join(right, F.col("id") == F.col("fid"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("c"), F.min("n2m").alias("m"))
        )
        return g.agg(F.count(F.lit(1)), F.sum("c"), F.min("m"))
    if name == "group_join_pk_fk_bucketed":
        bid, bfid = _ensure_bucketed_rel(spark, rel)
        left = spark.table(bid).select("id")
        right = spark.table(bfid).select("fid", "n2m")
        g = (
            left.join(right, F.col("id") == F.col("fid"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("c"), F.min("n2m").alias("m"))
        )
        return g.agg(F.count(F.lit(1)), F.sum("c"), F.min("m"))
    if name == "argmin_groupjoin":
        a = dist.groupBy(F.col("n10000").alias("g")).agg(
            F.min("n100000").alias("m")
        )
        j = dist.join(
            a, (F.col("n10000") == F.col("g")) & (F.col("n100000") == F.col("m"))
        )
        return j.agg(F.count(F.lit(1)), F.sum("n100000"))
    if name == "argmin_window":
        from pyspark.sql import Window

        w = Window.partitionBy("n10000")
        k = dist.select(
            "n100000", F.min("n100000").over(w).alias("m")
        ).filter(F.col("n100000") == F.col("m"))
        return k.agg(F.count(F.lit(1)), F.sum("n100000"))
    if name.startswith("equi_join_pk_fk"):
        right = rel.select(F.col("fid"))
        if name.endswith("_shj"):
            right = right.hint("shuffle_hash")
        return rel.select("id").join(
            right, F.col("id") == F.col("fid")
        ).agg(F.count(F.lit(1)))
    if name.startswith("equi_join_n2m"):
        left = rel.select("id", "n2m")
        right = rel.select(
            F.col("id").alias("id2"), F.col("n2m").alias("k2")
        )
        if name.endswith("_shj"):
            right = right.hint("shuffle_hash")
        return left.join(
            right,
            (F.col("n2m") == F.col("k2")) & (F.col("id") < F.col("id2")),
        ).agg(F.count(F.lit(1)))
    raise KeyError(name)


def main() -> None:
    root = Path(
        os.environ.get(
            "SPARK_GRAFT_OPSBENCH_DIR", "/tmp/mutable_spark_opsbench"
        )
    )
    gen_data(root)

    import duckdb

    sys.path.insert(0, str(Path(__file__).parent))
    from mutable_spark.session import get_spark

    spark = get_spark("mutable_spark-opsbench")
    spark.sparkContext.setLogLevel("ERROR")
    dist_full = spark.read.parquet(str(root / "Distinct_i32.parquet"))
    rel_full = spark.read.parquet(str(root / "Relation.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW dist_full AS SELECT * FROM "
        f"read_parquet('{root}/Distinct_i32.parquet')"
    )
    con.execute(
        f"CREATE VIEW rel_full AS SELECT * FROM "
        f"read_parquet('{root}/Relation.parquet')"
    )

    #: comma-separated case names to (re-)measure; everything else is
    #: skipped — pair with a JSON merge by the caller to refresh single
    #: rows of OPSBENCH.json without a full multi-hour sweep
    only = {
        n for n in os.environ.get("SPARK_GRAFT_OPSBENCH_ONLY", "").split(",") if n
    }
    results: dict[str, dict] = {}
    for name, sql_t in CASES.items():
        if only and name not in only:
            continue
        results[name] = {}
        for sf in SFS:
            cutoff = int(N_TUPLES * sf)
            # both engines see the identical `id < cutoff` pushdown
            dist = dist_full.filter(dist_full.id < cutoff)
            rel = rel_full.filter(rel_full.id < cutoff)
            sql = sql_t.format(
                D=f"(SELECT * FROM dist_full WHERE id < {cutoff})",
                R=f"(SELECT * FROM rel_full WHERE id < {cutoff})",
            )

            # IMPORTANT: rebuild the DataFrame on every rep. Under AQE,
            # re-collecting the SAME DataFrame object reuses its already-
            # materialized query stages — rep 2+ would time the cached
            # result, not the operator (measured: a 10M×10M sort-merge
            # join "ran" in 29 ms on the reused object vs ~3 s fresh).
            def run() -> None:
                df = spark_df(spark, name, dist, rel)
                if name.startswith("order_by"):
                    # full-result case: execute the sorted plan through
                    # the noop sink (collecting 10M rows would time Py4J
                    # transfer, which the reference's PrintOperator-to-
                    # /dev/null doesn't)
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()

            # warm (JVM + parquet footers) + cross-engine value check:
            # both engines must agree on the scalar result before any
            # timing is trusted (order_by is full-result, checked by the
            # count cases sharing its input)
            if not name.startswith("order_by"):
                got = [
                    tuple(r) for r in spark_df(spark, name, dist, rel).collect()
                ]
                want = con.execute(sql).fetchall()
                assert got == want, (name, sf, got, want)
            else:
                run()
            spark_s = min(_timed(run) for _ in range(REPS))
            con.execute(sql).fetchall()  # warm
            duck_s = min(
                _timed(lambda: con.execute(sql).fetchall())
                for _ in range(REPS)
            )
            results[name][str(sf)] = {
                "spark_s": round(spark_s, 4),
                "duckdb_s": round(duck_s, 4),
            }
            print(
                f"# {name} sf={sf}: spark {spark_s:.3f}s "
                f"duckdb {duck_s:.3f}s",
                file=sys.stderr,
            )

    # phys-cost-models/filter sweep: full size, selectivity as the x-axis
    if only and not {"filter_ordered", "filter_unordered"} & only:
        print(json.dumps({"suite": "operators", "n_tuples": N_TUPLES,
                          "reps": REPS, "cases": results}))
        spark.stop()
        return
    sel_full = spark.read.parquet(str(root / "Selectivity_d.parquet"))
    con.execute(
        f"CREATE VIEW sel_full AS SELECT * FROM "
        f"read_parquet('{root}/Selectivity_d.parquet')"
    )
    for col in ("d", "d_sorted"):
        name = f"filter_{'ordered' if col == 'd_sorted' else 'unordered'}"
        results[name] = {}
        for x in SELECTIVITIES:
            sql = FILTER_SQL.format(S="sel_full", col=col, x=x)

            def frun() -> None:
                filter_case(sel_full, col, x).collect()

            got = [tuple(r) for r in filter_case(sel_full, col, x).collect()]
            want = con.execute(sql).fetchall()
            assert got == want, (name, x, got, want)
            spark_s = min(_timed(frun) for _ in range(REPS))
            con.execute(sql).fetchall()  # warm
            duck_s = min(
                _timed(lambda: con.execute(sql).fetchall())
                for _ in range(REPS)
            )
            results[name][str(x)] = {
                "spark_s": round(spark_s, 4),
                "duckdb_s": round(duck_s, 4),
            }
            print(
                f"# {name} sel={x}: spark {spark_s:.3f}s "
                f"duckdb {duck_s:.3f}s",
                file=sys.stderr,
            )

    # selection_* sweep (r10): full size, selectivity as the x-axis
    attr_full = spark.read.parquet(str(root / "Attribute_scalar.parquet"))
    con.execute(
        f"CREATE VIEW attr_full AS SELECT * FROM "
        f"read_parquet('{root}/Attribute_scalar.parquet')"
    )
    for name in SELECTION_CASES:
        results[name] = {}
        for x in SELECTION_SELS:
            sql = f"SELECT COUNT(*) AS n FROM attr_full WHERE {_sel_pred(name, x)}"

            def srun() -> None:
                selection_case(attr_full, name, x).collect()

            got = [tuple(r) for r in selection_case(attr_full, name, x).collect()]
            want = con.execute(sql).fetchall()
            assert got == want, (name, x, got, want)
            spark_s = min(_timed(srun) for _ in range(REPS))
            con.execute(sql).fetchall()  # warm
            duck_s = min(
                _timed(lambda: con.execute(sql).fetchall())
                for _ in range(REPS)
            )
            results[name][str(x)] = {
                "spark_s": round(spark_s, 4),
                "duckdb_s": round(duck_s, 4),
            }
            print(
                f"# {name} sel={x}: spark {spark_s:.3f}s "
                f"duckdb {duck_s:.3f}s",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "suite": "operators",
                "n_tuples": N_TUPLES,
                "reps": REPS,
                "cases": results,
            }
        )
    )


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
