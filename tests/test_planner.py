"""Planner parity knobs: GOO join ordering + injected cardinalities +
broadcast decisions, verified both for plan shape and unchanged results."""

from __future__ import annotations

import json

import pytest

from mutable_spark.dialect import parse
from mutable_spark.dialect.compiler import compile_select
from mutable_spark.catalog import load_tables
from mutable_spark.plans.planner import (
    Cardinalities,
    JoinPlanner,
    goo_order,
    footer_cardinalities,
)
from tests.conftest import SF_DIR
from tests.test_plan_shape import explain

SQL = """
SELECT c.c_name AS name, COUNT(*) AS cnt
FROM lineitem AS l, customer AS c, orders AS o
WHERE c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
GROUP BY c.c_name
"""


@pytest.fixture(scope="module")
def tables(spark):
    t = load_tables(spark, SF_DIR)
    return {name: getattr(t, name) for name in vars(t)}


def test_goo_prefers_connected_small_pairs():
    cards = Cardinalities(base={"l": 600_000, "o": 150_000, "c": 15_000})
    edges = {frozenset({"c", "o"}), frozenset({"o", "l"})}
    order = goo_order(["l", "c", "o"], edges, cards)
    # c⋈o is the smallest connected pair → built first; lineitem last
    assert order[-1] == "l" and set(order[:2]) == {"c", "o"}


def test_goo_cartesian_only_when_disconnected():
    cards = Cardinalities(base={"a": 10, "b": 10, "c": 10})
    order = goo_order(["a", "b", "c"], set(), cards)
    assert set(order) == {"a", "b", "c"}


def test_injected_json_roundtrip(tmp_path):
    p = tmp_path / "cards.json"
    p.write_text(
        json.dumps(
            [
                {"relations": ["l"], "size": 600000},
                {"relations": ["o"], "size": 150000},
                {"relations": ["o", "l"], "size": 600000},
            ]
        )
    )
    c = Cardinalities.from_json(str(p))
    assert c.base["o"] == 150000
    assert c.est(frozenset({"o", "l"})) == 600000.0
    assert c.est(frozenset({"l"})) == 600000.0


def test_planner_changes_plan_not_results(spark, tables):
    stmt = parse(SQL)
    plain = compile_select(stmt, tables)

    cards = footer_cardinalities(SF_DIR)
    planner = JoinPlanner(cards, broadcast_rows=50_000)
    planned = compile_select(parse(SQL), tables, planner=planner)

    # broadcast hints must show up for the small sides
    p = explain(planned)
    assert "BroadcastHashJoin" in p
    # and the results are identical
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in planned.collect())
    assert a == b


def test_footer_cardinalities_are_exact(spark):
    cards = footer_cardinalities(SF_DIR)
    li = load_tables(spark, SF_DIR).lineitem
    assert cards.base["lineitem"] == li.count()
