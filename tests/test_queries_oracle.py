"""Every registered query matches its DuckDB oracle exactly (the driver's
correctness gate, replicated locally at sf0.001 by default; set
MS_TEST_SF_DIR=/root/testdata/sf0.01 for the driver's scale)."""

from __future__ import annotations

import pytest

from mutable_spark import registry
from tests.conftest import SF_DIR
from tests.oracle_harness import compare

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, duck):
    ok, msg = compare(name, spark, duck, SF_DIR)
    assert ok, msg


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"


def test_registry_contract():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
