"""Smoke test for the operator-microbenchmark harness (bench_ops.py):
every case's Spark plan must produce exactly the DuckDB result on a tiny
generated dataset — the same cross-engine value check the full run
asserts per case, kept alive here so the harness can't rot between
(manual) full runs. Timing is not tested; OPSBENCH.json records it.
"""

from __future__ import annotations

#: property suite (the OPSBENCH harness value checks) — opt-out of the default gate
#: (see pytest.ini); run everything with `pytest -m ""`
import pytest

pytestmark = pytest.mark.slow

import importlib
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def ops(tmp_path_factory, monkeypatch_module=None):
    sys.path.insert(0, str(REPO))
    import bench_ops

    importlib.reload(bench_ops)
    bench_ops.N_TUPLES = 20_000  # tiny but join-/group-shaped
    root = tmp_path_factory.mktemp("opsbench")
    bench_ops.gen_data(root)
    return bench_ops, root


def _views(root):
    con = duckdb.connect()
    for t in ("Distinct_i32", "Relation", "Selectivity_d"):
        con.execute(
            f"CREATE VIEW {t.lower()} AS SELECT * FROM "
            f"read_parquet('{root}/{t}.parquet')"
        )
    return con


def test_every_case_matches_duckdb(ops, spark):
    bench_ops, root = ops
    con = _views(root)
    dist = spark.read.parquet(str(root / "Distinct_i32.parquet"))
    rel = spark.read.parquet(str(root / "Relation.parquet"))
    cutoff = bench_ops.N_TUPLES // 2  # one non-trivial SF slice
    dist_c = dist.filter(dist.id < cutoff)
    rel_c = rel.filter(rel.id < cutoff)
    for name, sql_t in bench_ops.CASES.items():
        sql = sql_t.format(
            D=f"(SELECT * FROM distinct_i32 WHERE id < {cutoff})",
            R=f"(SELECT * FROM relation WHERE id < {cutoff})",
        )
        df = bench_ops.spark_df(spark, name, dist_c, rel_c)
        if name.startswith("order_by"):
            # full-result case: check the sorted ids themselves
            got = [r[0] for r in df.collect()]
            cols = sql.split("ORDER BY", 1)[1].split(") rk")[0]
            want = [
                r[0]
                for r in con.execute(
                    f"SELECT id FROM distinct_i32 WHERE id < {cutoff} "
                    f"ORDER BY {cols}, id"
                ).fetchall()
            ]
            assert len(got) == len(want), name
            # engines may tie-break differently on non-id sort keys; the
            # multiset of ids and the sort-key sequence must both match
            assert sorted(got) == sorted(want), name
            # ordering pin (ADVICE r9): map each returned id back to its
            # sort-key tuple and assert the sequence is non-decreasing —
            # a dropped or reordered sort must fail here, not pass on
            # the multiset check alone.
            key_cols = [
                c.strip() for c in cols.split(",") if c.strip() != "id"
            ]
            keymap = {
                r[0]: tuple(r[1:])
                for r in con.execute(
                    f"SELECT id, {', '.join(key_cols)} FROM distinct_i32 "
                    f"WHERE id < {cutoff}"
                ).fetchall()
            }
            keyseq = [keymap[i] for i in got]
            assert all(
                a <= b for a, b in zip(keyseq, keyseq[1:])
            ), f"{name}: sort-key sequence not non-decreasing"
            continue
        got = [tuple(r) for r in df.collect()]
        want = con.execute(sql).fetchall()
        assert got == want, (name, got, want)


def test_filter_sweep_matches_duckdb(ops, spark):
    bench_ops, root = ops
    con = _views(root)
    sel = spark.read.parquet(str(root / "Selectivity_d.parquet"))
    for col in ("d", "d_sorted"):
        for x in (0.01, 0.5):
            sql = bench_ops.FILTER_SQL.format(S="selectivity_d", col=col, x=x)
            got = [tuple(r) for r in bench_ops.filter_case(sel, col, x).collect()]
            want = con.execute(sql).fetchall()
            assert got == want, (col, x)


def test_selection_cases_match_duckdb(ops, spark):
    """The r10 selection_* suites: Spark filter+count equals DuckDB on
    every (case, selectivity) point of the sweep grid."""
    bench_ops, root = ops
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW attr_full AS SELECT * FROM "
        f"read_parquet('{root}/Attribute_scalar.parquet')"
    )
    attr = spark.read.parquet(str(root / "Attribute_scalar.parquet"))
    for name in bench_ops.SELECTION_CASES:
        for x in bench_ops.SELECTION_SELS:
            got = [
                tuple(r)
                for r in bench_ops.selection_case(attr, name, x).collect()
            ]
            want = con.execute(
                "SELECT COUNT(*) AS n FROM attr_full WHERE "
                + bench_ops._sel_pred(name, x)
            ).fetchall()
            assert got == want, (name, x, got, want)


def test_bucketed_group_join_single_exchange(ops, spark):
    """group_join_pk_fk_bucketed (r11): with both sides bucketed+sorted
    on their join key, the join AND the by-key aggregate carry the
    bucket partitioning — the ONLY Exchange left in the whole plan is
    the final single-row scalar rollup. (Broadcast disabled so the tiny
    smoke tables can't sidestep the claim.)"""
    import contextlib
    import io

    bench_ops, root = ops
    rel = spark.read.parquet(str(root / "Relation.parquet")).filter(
        "id < 10000"
    )
    old_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_a = spark.conf.get("spark.sql.adaptive.enabled")
    df = bench_ops.spark_df(spark, "group_join_pk_fk_bucketed", None, rel)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        p = buf.getvalue()
        assert "SortMergeJoin" in p, p
        assert p.count("Exchange") == 1, p  # only the scalar rollup moves
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_b)
        spark.conf.set("spark.sql.adaptive.enabled", old_a)
