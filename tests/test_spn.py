"""SPN cardinality estimator (`src/util/Spn.cpp` parity surface): learned
structure, estimate quality on real testdata (q-error bounded), and the
SpnEstimator-style planner integration."""

from __future__ import annotations

import numpy as np
import pytest

from mutable_spark.catalog import load_tables
from mutable_spark.plans.planner import JoinPlanner, goo_order
from mutable_spark.plans.spn import (
    EQUAL,
    GREATER,
    GREATER_EQUAL,
    LESS,
    LESS_EQUAL,
    SpnTableModel,
    _Product,
    _Sum,
    learn_spn,
    spn_base_cardinalities,
)
from tests.conftest import SF_DIR


def _qerr(est: float, true: float) -> float:
    est, true = max(est, 1.0), max(true, 1.0)
    return max(est / true, true / est)


# --- structure -------------------------------------------------------------
def test_independent_columns_become_product_split():
    rng = np.random.default_rng(3)
    a = rng.normal(size=4000)
    b = rng.normal(size=4000)  # independent of a
    root = learn_spn(np.column_stack([a, b]))
    assert isinstance(root, _Product)
    assert sorted(map(sorted, root.scopes)) == [[0], [1]]


def test_correlated_columns_get_clustered_not_factored():
    rng = np.random.default_rng(3)
    # two clearly separated clusters with intra-cluster correlation
    a = np.concatenate([rng.normal(0, 1, 2000), rng.normal(50, 1, 2000)])
    b = a * 2 + rng.normal(0, 0.1, 4000)
    root = learn_spn(np.column_stack([a, b]))
    assert isinstance(root, _Sum)
    assert len(root.children) == 2
    assert pytest.approx(sum(root.weights)) == 1.0


def test_likelihood_sums_to_one_and_handles_ranges():
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 100, 5000)
    m = SpnTableModel.__new__(SpnTableModel)
    m.columns = ["x"]
    m.pos = {"x": 0}
    m.n_rows = 5000
    m.dicts = {}
    m.string_distinct = {}
    m._dict_keys = {}
    m.root = learn_spn(x.reshape(-1, 1))
    total = m.selectivity({"x": [(GREATER_EQUAL, 0.0)]})
    assert 0.98 <= total <= 1.0
    # interval query is an interval integral, not a marginal product
    sel = m.selectivity({"x": [(GREATER, 25.0), (LESS, 75.0)]})
    assert 0.4 <= sel <= 0.6
    # disjoint interval → ~0
    assert m.selectivity({"x": [(GREATER, 90.0), (LESS, 10.0)]}) == 0.0


# --- estimate quality on real testdata -------------------------------------
@pytest.fixture(scope="module")
def lineitem_model(spark):
    t = load_tables(spark, SF_DIR)
    return (
        SpnTableModel.from_dataframe(
            t.lineitem, ["l_extendedprice", "l_linenumber", "l_discount"]
        ),
        t.lineitem,
    )


#: conjunctive filters with their Spark equivalents; q-error bound 4 is
#: DeepDB-class quality for single-table conjuncts at this sample size
_CASES = [
    ({"l_extendedprice": [(LESS, 20_000.0)]}, "l_extendedprice < 20000"),
    (
        {
            "l_extendedprice": [
                (GREATER_EQUAL, 20_000.0),
                (LESS, 50_000.0),
            ]
        },
        "l_extendedprice >= 20000 AND l_extendedprice < 50000",
    ),
    ({"l_linenumber": [(EQUAL, 1.0)]}, "l_linenumber = 1"),
    (
        {
            "l_extendedprice": [(GREATER, 50_000.0)],
            "l_discount": [(LESS_EQUAL, 0.05)],
        },
        "l_extendedprice > 50000 AND l_discount <= 0.05",
    ),
]


@pytest.mark.parametrize("filt,sql", _CASES, ids=[c[1] for c in _CASES])
def test_lineitem_estimates_within_qerror_4(lineitem_model, filt, sql):
    model, lineitem = lineitem_model
    true = lineitem.filter(sql).count()
    est = model.estimate_rows(filt)
    assert _qerr(est, true) <= 4.0, (est, true, sql)


def test_distinct_estimate_right_order_of_magnitude(lineitem_model):
    model, lineitem = lineitem_model
    true = lineitem.select("l_linenumber").distinct().count()
    est = model.estimate_distinct("l_linenumber")
    assert _qerr(est, true) <= 4.0


# --- planner integration (SpnEstimator role) -------------------------------
def test_spn_filtered_cardinalities_steer_join_order(spark):
    """The SpnEstimator integration: a highly selective filter on orders
    shrinks its SPN base estimate below customer's, flipping the GOO
    merge order — cardinality feedback actually reaches the planner."""
    t = load_tables(spark, SF_DIR)
    models = {
        "o": SpnTableModel.from_dataframe(t.orders, ["o_totalprice"]),
        "c": SpnTableModel.from_dataframe(t.customer, ["c_acctbal"]),
        "l": SpnTableModel.from_dataframe(t.lineitem, ["l_quantity"]),
    }
    unfiltered = spn_base_cardinalities(models, {})
    assert (
        unfiltered.base["l"]
        > unfiltered.base["o"]
        > unfiltered.base["c"]
    )
    # o_totalprice > 450k keeps a sliver of orders
    filt = {"o": {"o_totalprice": [(GREATER, 450_000.0)]}}
    filtered = spn_base_cardinalities(models, filt)
    assert filtered.base["o"] < unfiltered.base["o"] / 5
    edges = {frozenset({"c", "o"}), frozenset({"o", "l"})}
    order = goo_order(["l", "c", "o"], edges, filtered)
    planner = JoinPlanner(filtered, broadcast_rows=10_000)
    assert order[-1] == "l"  # the big table still joins last
    # and the filtered orders side is now a broadcast candidate
    assert planner.should_broadcast("o", {})
