"""Heuristic-search join enumeration (`plans/planner.py::hs_plan`) — the
reference's SIGMOD'23 flagship family
(`include/mutable/IR/HeuristicSearchPlanEnumerator.hpp`): A* optimality
pinned to the exact DPs, the approximate configs (weighted / beam /
anytime) validated for plan well-formedness and bounded regret, and the
anytime budget exercised down to zero (pure greedy completion)."""

from __future__ import annotations

import itertools

import pytest

from mutable_spark.plans.planner import (
    Cardinalities,
    JoinPlanner,
    dpccp_plan,
    hs_anytime_plan,
    hs_astar_plan,
    hs_beam_plan,
    hs_plan,
    hs_weighted_astar_plan,
    plan_cost,
)

# the greedy-trap chain from test_planner: GOO takes B⋈C first (10 rows)
# and pays 2000-row intermediates; the bushy optimum is (A⋈B)⋈(C⋈D) = 210
_CHAIN = Cardinalities(
    base={"A": 10, "B": 10, "C": 10, "D": 10},
    subsets={
        frozenset("AB"): 100,
        frozenset("BC"): 10,
        frozenset("CD"): 100,
        frozenset("ABC"): 2000,
        frozenset("BCD"): 2000,
        frozenset("ABCD"): 10,
    },
)
_CHAIN_EDGES = {frozenset("AB"), frozenset("BC"), frozenset("CD")}

_CYCLE = Cardinalities(
    base={"W": 50, "X": 40, "Y": 30, "Z": 20},
    subsets={
        frozenset("WX"): 500,
        frozenset("XY"): 60,
        frozenset("YZ"): 300,
        frozenset("WZ"): 80,
        frozenset("WXY"): 1000,
        frozenset("XYZ"): 90,
        frozenset("WYZ"): 400,
        frozenset("WXZ"): 700,
        frozenset("WXYZ"): 25,
    },
)
_CYCLE_EDGES = {
    frozenset("WX"),
    frozenset("XY"),
    frozenset("YZ"),
    frozenset("WZ"),
}


def _flatten(t):
    return [t] if isinstance(t, str) else _flatten(t[0]) + _flatten(t[1])


_CASES = [
    (list("ABCD"), _CHAIN_EDGES, _CHAIN),
    (list("WXYZ"), _CYCLE_EDGES, _CYCLE),
]


@pytest.mark.parametrize("aliases,edges,cards", _CASES, ids=["chain", "cycle"])
def test_astar_matches_dp_optimum(aliases, edges, cards):
    """Zero heuristic = uniform-cost search: provably C_out-optimal, so it
    must land exactly on the DPccp optimum (including beating GOO's 2210
    on the trap chain)."""
    ref = plan_cost(dpccp_plan(aliases, edges, cards), cards)
    t = hs_astar_plan(aliases, edges, cards)
    assert plan_cost(t, cards) == ref
    assert sorted(_flatten(t)) == sorted(aliases)


_APPROX = [hs_weighted_astar_plan, hs_beam_plan, hs_anytime_plan]


@pytest.mark.parametrize("enum", _APPROX, ids=lambda f: f.__name__)
@pytest.mark.parametrize("aliases,edges,cards", _CASES, ids=["chain", "cycle"])
def test_approx_configs_emit_valid_plans_with_bounded_regret(
    enum, aliases, edges, cards
):
    ref = plan_cost(dpccp_plan(aliases, edges, cards), cards)
    t = enum(aliases, edges, cards)
    assert sorted(_flatten(t)) == sorted(aliases)
    cost = plan_cost(t, cards)
    assert ref <= cost <= 15 * ref, (cost, ref)


def test_anytime_budget_zero_is_pure_greedy_completion():
    """With no expansions allowed, anytimeAStar degenerates to GOO-style
    bushy completion of the start state — still a valid covering plan."""
    t = hs_anytime_plan(list("ABCD"), _CHAIN_EDGES, _CHAIN, budget=0)
    assert sorted(_flatten(t)) == list("ABCD")


def test_anytime_with_ample_budget_is_optimal():
    t = hs_anytime_plan(list("ABCD"), _CHAIN_EDGES, _CHAIN, budget=10_000)
    assert plan_cost(t, _CHAIN) == 210.0


def test_disconnected_graph_returns_none():
    cards = Cardinalities(base={"a": 10, "b": 10, "c": 10})
    assert hs_plan(["a", "b", "c"], {frozenset("ab")}, cards) is None


def test_beam_explores_fewer_states_than_astar_on_clique():
    """The point of beam search: on a 7-relation clique the full A* state
    space is large; beam(2) must finish while touching far fewer states.
    Proxy: both complete, beam's plan is valid, and A* cost ≤ beam cost."""
    n = 7
    aliases = [f"r{i}" for i in range(n)]
    edges = {frozenset({a, b}) for a, b in itertools.combinations(aliases, 2)}
    cards = Cardinalities(base={a: 10 * (i + 1) for i, a in enumerate(aliases)})
    astar = hs_astar_plan(aliases, edges, cards)
    beam = hs_beam_plan(aliases, edges, cards)
    assert sorted(_flatten(beam)) == sorted(aliases)
    assert plan_cost(astar, cards) <= plan_cost(beam, cards)


@pytest.mark.parametrize(
    "enum", ["hs-astar", "hs-weighted", "hs-beam", "hs-anytime"]
)
def test_joinplanner_accepts_hs_enumerators(enum):
    planner = JoinPlanner(_CHAIN, broadcast_rows=50_000, enumerator=enum)
    t = planner.plan(list("ABCD"), _CHAIN_EDGES)
    assert sorted(_flatten(t)) == list("ABCD")
    if enum == "hs-astar":
        assert plan_cost(t, _CHAIN) == 210.0
