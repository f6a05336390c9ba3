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
    dpccp_plan,
    dpsize_plan,
    dpsizeopt_plan,
    dpsizesub_plan,
    dpsub_plan,
    dpsubopt_plan,
    goo_order,
    ikkbz_order,
    ikkbz_plan,
    linearizeddp_plan,
    peall_plan,
    plan_cost,
    tdbasic_plan,
    tdgoo_plan,
    tdmincut_plan,
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


def test_injected_json_multi_db_selects_section(tmp_path):
    """A multi-db cardinality file installs the section matching the
    current database (reference InjectionCardinalityEstimator keys on the
    db name); an unknown db raises instead of silently using the first
    section (ADVICE r5)."""
    import pytest

    p = tmp_path / "cards.json"
    p.write_text(
        json.dumps(
            {
                "db1": [{"relations": ["r"], "size": 10}],
                "db2": [{"relations": ["r"], "size": 99}],
            }
        )
    )
    assert Cardinalities.from_json(str(p), database="db2").base["r"] == 99
    assert Cardinalities.from_json(str(p), database="db1").base["r"] == 10
    with pytest.raises(KeyError):
        Cardinalities.from_json(str(p), database="nope")
    with pytest.raises(KeyError):
        Cardinalities.from_json(str(p))  # ambiguous without a db name
    # a lone section applies regardless of label
    q = tmp_path / "one.json"
    q.write_text(json.dumps({"whatever": [{"relations": ["r"], "size": 7}]}))
    assert Cardinalities.from_json(str(q), database="other").base["r"] == 7


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


# --- DPccp: exact DP over csg-cmp pairs (`PlanEnumerator.cpp` DPccp) ------
#: chain A—B—C—D where greedy fails: BC is the cheapest first merge (10),
#: but both of its extensions are catastrophic (2000); the optimum is the
#: BUSHY plan (A⋈B)⋈(C⋈D) = 100 + 100 + 10, which no greedy left-deep
#: construction starting from BC can reach.
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


def _left_deep(order):
    tree = order[0]
    for a in order[1:]:
        tree = (tree, a)
    return tree


def test_dpccp_beats_goo_on_greedy_trap_chain():
    goo_tree = _left_deep(goo_order(list("ABCD"), _CHAIN_EDGES, _CHAIN))
    dp_tree = dpccp_plan(list("ABCD"), _CHAIN_EDGES, _CHAIN)
    goo_cost = plan_cost(goo_tree, _CHAIN)
    dp_cost = plan_cost(dp_tree, _CHAIN)
    assert dp_cost < goo_cost, (dp_cost, goo_cost)
    assert dp_cost == 210.0  # the bushy optimum: |AB| + |CD| + |ABCD|
    # shape: a bushy join of {A,B} against {C,D}
    sides = {frozenset(_flatten(dp_tree[0])), frozenset(_flatten(dp_tree[1]))}
    assert sides == {frozenset("AB"), frozenset("CD")}


def _flatten(t):
    return [t] if isinstance(t, str) else _flatten(t[0]) + _flatten(t[1])


def test_dpccp_never_emits_cross_products():
    # disconnected graph → None (caller falls back to GOO)
    cards = Cardinalities(base={"a": 10, "b": 10, "c": 10})
    assert dpccp_plan(["a", "b", "c"], {frozenset("ab")}, cards) is None


def test_dpccp_exhaustive_vs_bruteforce():
    """DPccp must equal brute-force optimum over all cross-product-free
    trees on a cycle graph (hardest small topology: chords create many
    csg-cmp pairs)."""
    import itertools

    aliases = list("WXYZ")
    edges = {
        frozenset("WX"),
        frozenset("XY"),
        frozenset("YZ"),
        frozenset("WZ"),
    }
    cards = Cardinalities(
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

    def connected(s):
        if len(s) == 1:
            return True
        s = set(s)
        seen = {next(iter(s))}
        while True:
            grow = {
                b
                for e in edges
                for b in e
                if b in s and any(a in seen for a in e)
            } | seen
            if grow == seen:
                break
            seen = grow
        return seen == s

    def best_tree(s: frozenset):
        if len(s) == 1:
            return 0.0, next(iter(s))
        best = None
        for k in range(1, len(s) // 2 + 1):
            for left in itertools.combinations(sorted(s), k):
                l, r = frozenset(left), s - frozenset(left)
                if not (connected(l) and connected(r)):
                    continue
                cl, tl = best_tree(l)
                cr, tr = best_tree(r)
                c = cl + cr + cards.est(s)
                if best is None or c < best[0]:
                    best = (c, (tl, tr))
        return best

    brute_cost, _ = best_tree(frozenset(aliases))
    dp = dpccp_plan(aliases, edges, cards)
    assert plan_cost(dp, cards) == brute_cost


# --- the rest of the reference's enumerator family ------------------------
_EXACT_DPS = [
    dpccp_plan,
    dpsize_plan,
    dpsizeopt_plan,
    dpsizesub_plan,
    dpsub_plan,
    dpsubopt_plan,
    tdbasic_plan,
    tdmincut_plan,
]


@pytest.mark.parametrize("enum", _EXACT_DPS[1:], ids=lambda f: f.__name__)
def test_exact_dps_agree_with_dpccp_on_trap_chain(enum):
    """DPsize/DPsub/TDbasic are exact over the same space as DPccp —
    identical optimum (the bushy 210.0) on the greedy-trap chain."""
    t = enum(list("ABCD"), _CHAIN_EDGES, _CHAIN)
    assert plan_cost(t, _CHAIN) == 210.0
    assert sorted(_flatten(t)) == list("ABCD")


@pytest.mark.parametrize("enum", _EXACT_DPS, ids=lambda f: f.__name__)
def test_exact_dps_agree_on_cycle(enum):
    """All four exact DPs find the same optimal cost on a cycle graph
    (many csg-cmp pairs; brute-force pinned by
    test_dpccp_exhaustive_vs_bruteforce)."""
    aliases = list("WXYZ")
    edges = {
        frozenset("WX"),
        frozenset("XY"),
        frozenset("YZ"),
        frozenset("WZ"),
    }
    cards = Cardinalities(
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
    ref = plan_cost(dpccp_plan(aliases, edges, cards), cards)
    assert plan_cost(enum(aliases, edges, cards), cards) == ref


@pytest.mark.parametrize("enum", _EXACT_DPS[1:], ids=lambda f: f.__name__)
def test_exact_dps_never_emit_cross_products(enum):
    cards = Cardinalities(base={"a": 10, "b": 10, "c": 10})
    assert enum(["a", "b", "c"], {frozenset("ab")}, cards) is None


def _bruteforce_linear_min(aliases, edges, cards):
    """Min C_out over all *connected* left-deep orders."""
    import itertools

    best = float("inf")
    for perm in itertools.permutations(aliases):
        s = {perm[0]}
        cost = 0.0
        ok = True
        for a in perm[1:]:
            if not any(a in e and e & s for e in edges):
                ok = False
                break
            s.add(a)
            cost += cards.est(frozenset(s))
        if ok:
            best = min(best, cost)
    return best


def _linear_cost(lin, cards):
    s = set()
    cost = 0.0
    for a in lin:
        s.add(a)
        if len(s) > 1:
            cost += cards.est(frozenset(s))
    return cost


def test_ikkbz_optimal_linear_on_star():
    """Star query with independent per-edge selectivities — the textbook
    IKKBZ case: rank order = ascending selectivity, optimal among all
    connected linear orders."""
    cards = Cardinalities(
        base={"H": 1000, "S1": 10, "S2": 20, "S3": 30},
        subsets={
            frozenset({"H", "S1"}): 10,
            frozenset({"H", "S2"}): 200,
            frozenset({"H", "S3"}): 3000,
            frozenset({"H", "S1", "S2"}): 2,
            frozenset({"H", "S1", "S3"}): 30,
            frozenset({"H", "S2", "S3"}): 600,
            frozenset({"H", "S1", "S2", "S3"}): 6,
        },
    )
    edges = {
        frozenset({"H", "S1"}),
        frozenset({"H", "S2"}),
        frozenset({"H", "S3"}),
    }
    aliases = ["H", "S1", "S2", "S3"]
    lin = ikkbz_order(aliases, edges, cards)
    assert sorted(lin) == sorted(aliases)
    assert _linear_cost(lin, cards) == _bruteforce_linear_min(
        aliases, edges, cards
    )


def test_ikkbz_optimal_linear_on_trap_chain():
    """On the greedy-trap chain the best *linear* order costs 2020 (the
    bushy DP optimum 210 is out of IKKBZ's space by design) — IKKBZ must
    find it."""
    lin = ikkbz_order(list("ABCD"), _CHAIN_EDGES, _CHAIN)
    assert _linear_cost(lin, _CHAIN) == _bruteforce_linear_min(
        list("ABCD"), _CHAIN_EDGES, _CHAIN
    )
    # and the reconstructed plan is right-deep over that order
    t = ikkbz_plan(list("ABCD"), _CHAIN_EDGES, _CHAIN)
    assert sorted(_flatten(t)) == list("ABCD")


@pytest.mark.parametrize(
    "enum",
    [
        "dpsize", "dpsizeopt", "dpsizesub", "dpsub", "dpsubopt",
        "tdbasic", "tdmincut", "tdgoo", "ikkbz", "lineardp", "peall", "goo",
    ],
)
def test_planner_results_identical_across_enumerators(spark, tables, enum):
    """Join order is a physical choice: every enumerator must produce the
    same rows as the default DPccp plan on a real query."""
    cards = footer_cardinalities(SF_DIR)
    dp = JoinPlanner(cards, broadcast_rows=50_000, enumerator="dpccp")
    other = JoinPlanner(cards, broadcast_rows=50_000, enumerator=enum)
    a = compile_select(parse(SQL), tables, planner=dp)
    b = compile_select(parse(SQL), tables, planner=other)
    assert sorted(tuple(r) for r in a.collect()) == sorted(
        tuple(r) for r in b.collect()
    )


def test_footer_cardinalities_are_exact(spark):
    cards = footer_cardinalities(SF_DIR)
    li = load_tables(spark, SF_DIR).lineitem
    assert cards.base["lineitem"] == li.count()


# --- the round-5 additions: full 13-enumerator parity ----------------------
def test_peall_finds_cross_product_plan_dp_cannot():
    """PEall's space includes Cartesian products (PlanEnumerator.cpp:33):
    on a star with two tiny dimensions whose cross product is cheaper than
    any connected intermediate, PEall must beat the cross-product-free
    DPs. Subset cardinalities are fully injected (including disconnected
    sets priced as products) so the comparison is honest."""
    cards = Cardinalities(
        base={"F": 100_000, "d1": 3, "d2": 4},
        subsets={
            frozenset({"F", "d1"}): 50_000,
            frozenset({"F", "d2"}): 60_000,
            frozenset({"d1", "d2"}): 12,  # the cross product: 3 × 4
            frozenset({"F", "d1", "d2"}): 20_000,
        },
    )
    edges = {frozenset({"F", "d1"}), frozenset({"F", "d2"})}
    aliases = ["F", "d1", "d2"]
    dp = plan_cost(dpccp_plan(aliases, edges, cards), cards)
    pe = plan_cost(peall_plan(aliases, edges, cards), cards)
    assert pe == 12 + 20_000  # (d1 × d2) ⋈ F
    assert pe < dp  # 70k / 80k for the connected orders

    # and on a disconnected graph PEall still returns a (cross-product)
    # plan where every other enumerator yields None
    dis = Cardinalities(
        base={"a": 10, "b": 20},
        subsets={frozenset({"a", "b"}): 200},
    )
    t = peall_plan(["a", "b"], set(), dis)
    assert sorted(_flatten(t)) == ["a", "b"]


def test_peall_exhaustive_optimum_on_trap_chain_with_full_subsets():
    """With every disconnected set priced as its true product, PEall's
    exhaustive space finds (A×D) ⋈ (B⋈C) at 100 + 10 + 10 = 120 — below
    the cross-product-free optimum of 210, because this fixture's
    connected intermediates (ABC/BCD = 2000) are deliberately inflated.
    The exact DPs cannot see this plan by design."""
    cards = Cardinalities(
        base=dict(_CHAIN.base),
        subsets={
            **_CHAIN.subsets,
            # disconnected subsets priced as true products (10 × 10 etc.)
            frozenset("AC"): 100,
            frozenset("AD"): 100,
            frozenset("BD"): 100,
            frozenset("ABD"): 1000,
            frozenset("ACD"): 1000,
        },
    )
    t = peall_plan(list("ABCD"), _CHAIN_EDGES, cards)
    assert plan_cost(t, cards) == 120.0
    assert plan_cost(dpccp_plan(list("ABCD"), _CHAIN_EDGES, cards), cards) == 210.0


def test_tdgoo_valid_and_greedy_quality():
    """TDGOO cuts each set to minimize the two sides' estimated sizes —
    greedy, so ≥ the DP optimum, but always a valid cross-product-free
    covering plan."""
    t = tdgoo_plan(list("ABCD"), _CHAIN_EDGES, _CHAIN)
    assert sorted(_flatten(t)) == list("ABCD")
    assert plan_cost(t, _CHAIN) >= 210.0
    # disconnected → None like the DPs
    cards = Cardinalities(base={"a": 10, "b": 10, "c": 10})
    assert tdgoo_plan(["a", "b", "c"], {frozenset("ab")}, cards) is None


def test_linearizeddp_between_ikkbz_and_optimum():
    """LinearizedDP searches all bushy plans over contiguous IKKBZ-order
    intervals (PlanEnumerator.cpp:457): never worse than IKKBZ's own
    left-deep plan (a prefix chain of intervals), never better than the
    unrestricted DP optimum."""
    aliases = list("ABCD")
    opt = plan_cost(dpccp_plan(aliases, _CHAIN_EDGES, _CHAIN), _CHAIN)
    ik = plan_cost(ikkbz_plan(aliases, _CHAIN_EDGES, _CHAIN), _CHAIN)
    t = linearizeddp_plan(aliases, _CHAIN_EDGES, _CHAIN)
    assert sorted(_flatten(t)) == aliases
    lin = plan_cost(t, _CHAIN)
    assert opt <= lin <= ik, (opt, lin, ik)


def test_mincut_agat_enumerates_exactly_the_ccp_partitions():
    """The MinCutAGaT cut enumeration must yield each unordered connected
    subgraph / connected complement partition exactly once — pinned
    against naive generate-and-test on a cycle (rich in ccps)."""
    from mutable_spark.plans.planner import _BitGraph, _mincut_agat_partitions

    aliases = list("WXYZ")
    g = _BitGraph(aliases, _CYCLE_EDGES_P)
    full = (1 << 4) - 1
    got = sorted(
        (min(c, s), max(c, s)) for c, s in _mincut_agat_partitions(g, full)
    )
    naive = []
    sub = (full - 1) & full
    while sub:
        comp = full & ~sub
        if (
            comp
            and (sub & -sub) < (comp & -comp)
            and g.connected(sub)
            and g.connected(comp)
        ):
            naive.append((min(sub, comp), max(sub, comp)))
        sub = (sub - 1) & full
    assert got == sorted(naive)
    assert len(got) == len(set(got))  # no duplicates


_CYCLE_EDGES_P = {
    frozenset("WX"),
    frozenset("XY"),
    frozenset("YZ"),
    frozenset("WZ"),
}
