"""The shell's `.learn_spns` instruction — the reference's registered
instruction of the same name (`src/catalog/DatabaseCommand.cpp:23-45`):
one SPN per table in the current database, then planning uses the learned
estimates (SpnEstimator wired in)."""

from __future__ import annotations

from mutable_spark.dialect import Engine
from mutable_spark.shell import learn_spns


def _engine(spark) -> Engine:
    eng = Engine(spark)
    eng.execute("CREATE DATABASE spnshell")
    eng.execute("USE spnshell")
    eng.register(
        "r",
        spark.createDataFrame(
            [(i, float(i % 7)) for i in range(200)], "key int, val double"
        ),
    )
    eng.register(
        "s",
        spark.createDataFrame(
            [(i % 50, i) for i in range(1000)], "rkey int, sval int"
        ),
    )
    eng.register(
        "names", spark.createDataFrame([("a",), ("b",)], "label string")
    )
    return eng


def test_learn_spns_instruction(spark):
    eng = _engine(spark)
    assert eng.planner is None
    msgs = learn_spns(eng)
    assert "learned SPN on r (2 numeric columns)" in msgs
    assert "learned SPN on s (2 numeric columns)" in msgs
    assert "skipped names: no numeric columns" in msgs
    # models learned for every numeric table, estimates anchored on true size
    assert set(eng.spn_models) == {"r", "s"}
    assert eng.spn_models["r"].estimate_rows({}) == 200
    assert eng.spn_models["s"].estimate_rows({}) == 1000
    # an SPN-estimating planner is installed and planning still yields
    # correct results on a multi-table query
    assert eng.planner is not None
    rows = eng.execute(
        "SELECT COUNT(*) AS n FROM r, s WHERE r.key = s.rkey"
    ).collect()
    assert rows[0].n == 1000  # every s row matches exactly one r key


def test_plan_and_cardinalities_commands(spark, tmp_path):
    """`.plan` (the reference's --plan dump) and `.cardinalities` (the
    reference's --use-cardinality-file): the injected file drives the
    compiled join's broadcast side, visible in the plan text."""
    import json

    from mutable_spark.shell import install_cardinalities, plan_text

    eng = _engine(spark)
    ptext = plan_text(eng, "SELECT COUNT(*) AS n FROM r, s WHERE r.key = s.rkey")
    assert "== Physical Plan ==" in ptext
    # DDL/DML gets a usage message and is NOT executed (ADVICE r5: .plan
    # used to silently run the statement)
    assert plan_text(eng, 'CREATE TABLE t2 (key INT(4) PRIMARY KEY)').startswith("usage:")
    assert "t2" not in eng.catalog._db()

    f = tmp_path / "cards.json"
    f.write_text(json.dumps({"db": [
        {"relations": ["r"], "size": 5},
        {"relations": ["s"], "size": 5_000_000},
        {"relations": ["r", "s"], "size": 5_000_000},
    ]}))
    msg = install_cardinalities(eng, str(f))
    assert "2 relations" in msg
    assert eng.planner.should_broadcast("r", {}) and not eng.planner.should_broadcast("s", {})
    ptext = plan_text(eng, "SELECT COUNT(*) AS n FROM r, s WHERE r.key = s.rkey")
    assert "BroadcastHashJoin" in ptext or "broadcast" in ptext.lower()


def test_estimator_driven_sort_strategy(spark):
    """r12: a grouped ORDER BY whose group-key distinct product the
    learned SPN bounds below _TINY_SORT_ROWS plans a single-partition
    sort — no rangepartitioning exchange, no boundary-sampling job.
    Without models (no planner) the scale-safe range sort stays, and a
    LIMIT query keeps TakeOrderedAndProject either way."""
    eng = _engine(spark)
    q = "SELECT val, COUNT(*) AS n FROM r GROUP BY val ORDER BY val"

    # no planner yet: range sort
    p0 = eng.execute(q)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in p0

    learn_spns(eng)  # r.val has 7 distinct values -> tiny
    df = eng.execute(q)
    p1 = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in p1
    assert "Coalesce 1" in p1 or "Coalesce(1)" in p1 or "coalesce" in p1.lower()
    # values unchanged and ordered
    vals = [r.val for r in df.collect()]
    assert vals == sorted(vals) and len(vals) == 7

    # a SAMPLED model (n_rows > SAMPLE_CAP) keeps the range sort — a
    # bounded sample cannot bound a long-tailed key's distinct count
    from mutable_spark.plans.spn import SAMPLE_CAP

    real_n = eng.spn_models["r"].n_rows
    eng.spn_models["r"].n_rows = SAMPLE_CAP + 1
    p_sampled = eng.execute(q)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in p_sampled
    eng.spn_models["r"].n_rows = real_n

    # a non-designator group key keeps the range sort (gate is conservative)
    p2 = (
        eng.execute("SELECT key % 3 AS k, COUNT(*) AS n FROM r GROUP BY key % 3 AS k ORDER BY k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in p2

    # LIMIT keeps the top-k sink, never a 1-partition global sort
    p3 = (
        eng.execute("SELECT val, COUNT(*) AS n FROM r GROUP BY val ORDER BY val LIMIT 3")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in p3
