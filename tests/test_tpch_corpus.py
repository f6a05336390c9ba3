"""The reference's `test/tpc-h` corpus (59 YAMLs) run LITERALLY through
the dialect engine against the reference's own TPC-H DDL fixture
(`/root/reference/test/tpc-h/data/schema.sql`) — sema-stage cases only
(the corpus ships no data): each YAML's stage block is the contract, as in
tests/test_ours_corpus.py and tests/test_ddl_corpus.py.

- `sema.num_err >= 1` / `returncode == 1` → the statement must be rejected
  (SemaError; ParseError tolerated where our frontend rejects earlier, the
  same latitude the ours-port takes — the reference also only checks that
  the stage fails);
- otherwise → the statement must execute cleanly, and SELECTs are also
  collected (empty tables), driving the full compile path.

Nothing is copied: YAMLs and the fixture schema are read in place at test
time; the module skips when the reference checkout is absent.
"""

from __future__ import annotations

from pathlib import Path

import pytest

yaml = pytest.importorskip("yaml")

from mutable_spark.dialect import Engine
from mutable_spark.dialect.parser import ParseError
from mutable_spark.dialect.sema import SemaError

TPCH = Path("/root/reference/test/tpc-h")

pytestmark = pytest.mark.skipif(
    not TPCH.exists(), reason="reference test corpus not available"
)


def _split(text: str) -> list[str]:
    return [s.strip() for s in text.split(";") if s.strip()]


def _cases() -> list[str]:
    return sorted(p.stem for p in TPCH.glob("*.yml"))


def _load(name: str) -> dict:
    return yaml.safe_load((TPCH / f"{name}.yml").read_text())


@pytest.fixture(scope="module")
def schema_stmts() -> list[str]:
    return _split((TPCH / "data" / "schema.sql").read_text())


def _fresh_engine(spark, schema_stmts) -> Engine:
    eng = Engine(spark)
    for stmt in schema_stmts:
        eng.execute(stmt)
    return eng


@pytest.mark.parametrize("name", _cases())
def test_tpch_sema_stage(spark, schema_stmts, name):
    case = _load(name)
    sema = case["stages"]["sema"]
    expect_error = bool(sema.get("returncode")) or bool(sema.get("num_err"))
    eng = _fresh_engine(spark, schema_stmts)

    def run():
        for stmt in _split(case["query"]):
            df = eng.execute(stmt)
            if df is not None:
                df.collect()

    if expect_error:
        with pytest.raises((SemaError, ParseError)):
            run()
    else:
        run()


def test_lineitem_money_columns_on_two_decimal_grid():
    """`functions.cents` (the split-accumulator input scaler) is lossless
    only if every money/rate value sits on the 2-decimal grid — i.e.
    x*100 is within representation error (≪0.5) of an integer. Checked
    in DuckDB over the full sf0.01 table so the q1 rewrite's premise is
    pinned, not assumed."""
    import duckdb

    con = duckdb.connect()
    dev = con.sql(
        "SELECT greatest("
        " max(abs(l_quantity*100 - round(l_quantity*100))),"
        " max(abs(l_extendedprice*100 - round(l_extendedprice*100))),"
        " max(abs(l_discount*100 - round(l_discount*100))),"
        " max(abs(l_tax*100 - round(l_tax*100))))"
        " FROM '/root/testdata/sf0.01/lineitem.parquet'"
    ).fetchone()[0]
    assert dev < 1e-6, dev


def test_floor_cents_equals_round_cents_both_signs(spark):
    """`functions.cents` uses FLOOR(x*100 + 0.5) instead of round() (which
    allocates a BigDecimal per row — measured -25% on q1). Pin that it
    matches round() exactly for grid values of BOTH signs — a CAST
    truncation instead of FLOOR would break negatives like acctbal."""
    import pyspark.sql.functions as F

    from mutable_spark.functions import cents

    vals = [k / 100.0 for k in range(-100000, 100000, 37)] + [
        -0.01, 0.0, 0.01, 21474836.47, -21474836.47
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = df.select(
        cents("x").alias("fast"),
        F.round(F.col("x") * 100).cast("long").alias("slow"),
        F.floor(F.col("x") * 100 + F.lit(0.5)).cast("long").alias("lit"),
    )
    bad = out.filter("fast <> slow OR fast <> lit").count()
    assert bad == 0
