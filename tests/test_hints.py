"""Pinned physical join implementations must materialize in the plan (the
reference's per-test physical pinning, SURVEY §5)."""

from __future__ import annotations

import pytest

from mutable_spark.catalog import load_tables
from mutable_spark.plans.hints import conf_scope, pin_join
from tests.conftest import SF_DIR
from tests.test_plan_shape import explain


@pytest.mark.parametrize(
    "impl,marker",
    [
        ("SimpleHash", "ShuffledHashJoin"),
        ("SortMerge", "SortMergeJoin"),
        ("Broadcast", "BroadcastHashJoin"),
    ],
)
def test_pinned_join_strategy(spark, impl, marker):
    t = load_tables(spark, SF_DIR)
    with conf_scope(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        joined = t.orders.join(
            pin_join(t.customer, impl),
            t.orders.o_custkey == t.customer.c_custkey,
        )
        assert marker in explain(joined)


def test_conf_scope_restores(spark):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with conf_scope(spark, **{"spark.sql.autoBroadcastJoinThreshold": "12345"}):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "12345"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
