"""Plan-shape and pruning assertions for the zone-index scan and the
SPN-planned dialect join (`mutable_spark/plans/index_queries.py`) — the
oracle equality itself is covered by `test_queries_oracle.py`; these pin
the *mechanism*: files actually skipped, SPN estimates actually reaching
the planner's order/broadcast decisions."""

from __future__ import annotations

import pyspark.sql.functions as F

from mutable_spark.plans.index_queries import (
    _SPN_FILTERS,
    _key_range,
    _keyed_orders_layout,
    _spn_models,
    spn_planner,
)
from tests.conftest import SF_DIR


def test_zone_index_prunes_files_and_loses_no_rows(spark):
    from mutable_spark.sources.indexes import ZoneIndex

    layout = _keyed_orders_layout(spark, SF_DIR)
    lo, hi = _key_range(spark, layout)
    zi = ZoneIndex.build(str(layout), "o_custkey", learned=True)
    pruned = zi.files_for_range(lo, hi)
    # the range layout concentrates the key range in few files — most of
    # the dataset must be skipped, from footer metadata alone
    assert len(pruned) < len(zi.zones) / 2, (len(pruned), len(zi.zones))
    # pruning is an I/O layer, never a correctness layer: the pruned scan
    # equals the full scan + filter row-for-row
    full = (
        spark.read.parquet(str(layout))
        .filter(F.col("o_custkey").between(lo, hi))
        .count()
    )
    assert zi.read_pruned(spark, lo, hi).count() == full


def test_zone_index_scan_reads_only_pruned_files(spark):
    from mutable_spark.sources.indexes import ZoneIndex

    layout = _keyed_orders_layout(spark, SF_DIR)
    lo, hi = _key_range(spark, layout)
    zi = ZoneIndex.build(str(layout), "o_custkey", learned=True)
    pruned = set(zi.files_for_range(lo, hi))
    df = zi.read_pruned(spark, lo, hi)
    scanned = {
        r[0]
        for r in df.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    # every scanned file is one the index admitted (file:// prefix aside)
    assert all(any(s.endswith(p.split("/")[-1]) for p in pruned) for s in scanned)
    assert len(scanned) <= len(pruned)


def test_spn_estimates_drive_order_and_broadcast(spark):
    """The SpnEstimator integration on real testdata: the o_totalprice
    filter shrinks orders' SPN estimate below the broadcast threshold,
    flipping it from the middle of the join order into a broadcast side."""
    models = _spn_models(spark, SF_DIR)
    unfiltered = spn_planner(spark, SF_DIR, None)
    filtered = spn_planner(spark, SF_DIR, _SPN_FILTERS)
    # the filter's SPN selectivity reaches the planner: orders' base
    # estimate collapses and the filtered side becomes a broadcast
    # candidate (at tiny SFs the unfiltered table may already be under the
    # absolute broadcast bar — the scale-invariant claim is the shrink)
    assert filtered.cards.base["o"] < unfiltered.cards.base["o"] / 5
    assert filtered.should_broadcast("o", {})
    # and the unfiltered estimate is sane vs truth (loose q-error bound)
    true_o = models["o"].n_rows
    assert 0.5 <= unfiltered.cards.base["o"] / true_o <= 2.0


def test_spn_planned_join_broadcasts_filtered_orders(spark):
    from mutable_spark.registry import QUERIES, load_all

    load_all()
    df = QUERIES["dialect_spn_planned_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_compiler_derives_spn_filters_from_where():
    """The compiler → SpnEstimator hand-off: single-source numeric
    comparisons in WHERE become the planner's filter dict (including
    flipped literal-first comparisons); everything else contributes
    nothing (selectivity 1)."""
    from mutable_spark.dialect import ast_nodes as A
    from mutable_spark.dialect.compiler import _spn_filter_dict

    des = lambda a: A.Designator(table="o", attr=a)
    num = lambda v: A.Literal(value=v, kind="float" if isinstance(v, float) else "int")
    conjuncts = [
        A.Binary(op=">", left=des("o_totalprice"), right=num(450_000.0)),
        A.Binary(op="<", left=num(7), right=des("o_shippriority")),  # flips to >
        A.Binary(op="=", left=des("o_orderstatus"), right=A.Literal(value="F", kind="str")),
        A.Binary(op="+", left=des("o_custkey"), right=num(1)),  # not a comparison
    ]
    assert _spn_filter_dict(conjuncts) == {
        "o_totalprice": [(">", 450_000.0)],
        "o_shippriority": [(">", 7.0)],
    }


def test_with_spn_filters_reestimates_base_cards(spark):
    """JoinPlanner.with_spn_filters: derived filters shrink the filtered
    alias' base estimate exactly as the hand-fed dict did, and leave
    model-less aliases untouched."""
    planner = spn_planner(spark, SF_DIR)
    refined = planner.with_spn_filters(_SPN_FILTERS, {})
    assert refined.cards.base["o"] < planner.cards.base["o"] / 5
    assert refined.cards.base["l"] == planner.cards.base["l"]
    assert refined.should_broadcast("o", {})


def test_spn_models_estimate_date_filters(spark):
    """DATE columns are SPN-modeled as days-since-epoch (the reference's
    DATE is a 32-bit integer, `Type.hpp:334-360`): a shipdate range filter
    estimates within a loose q-error of the true count, and the dialect
    compiler's derived filter dict carries the same encoding."""
    import pyspark.sql.functions as F

    from mutable_spark.catalog import load_tables
    from mutable_spark.dialect import ast_nodes as A
    from mutable_spark.dialect.compiler import _spn_filter_dict
    from mutable_spark.plans.spn import date_to_spn_value

    models = _spn_models(spark, SF_DIR)
    cut = "1995-06-17"
    filt = {"l_shipdate": [("<=", date_to_spn_value(cut))]}
    est = models["l"].estimate_rows(filt)
    true = (
        load_tables(spark, SF_DIR)
        .lineitem.filter(F.col("l_shipdate") <= F.lit(cut).cast("date"))
        .count()
    )
    assert true / 4 <= est <= true * 4, (est, true)

    # the compiler derives the identical encoding from a date literal
    conj = [
        A.Binary(
            op="<=",
            left=A.Designator(table="l", attr="l_shipdate"),
            right=A.Literal(value=cut, kind="date"),
        )
    ]
    assert _spn_filter_dict(conj) == filt
