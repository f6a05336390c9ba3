"""The reference's `test/ddl` corpus (37 YAMLs) run LITERALLY through the
dialect engine against the reference's own fixture schema
(`/root/reference/test/ddl/data/schema.sql`), with each YAML's stage block
as the contract — the same reading of `IntegrationTest.py` the
`test/ours` port uses (tests/test_ours_corpus.py):

- `parser.returncode == 1`  → the statement must be rejected by lex/parse;
- `sema.num_err >= 1`       → parses, but sema must error
                              (our engine raises SemaError at execute);
- otherwise                 → the statement must execute cleanly.

Positive cases additionally assert the observable catalog effect (table /
index / database actually gone or present) — strictly stronger than the
reference harness, which only checks stage stdout.

Nothing is copied from the reference: YAMLs and the fixture schema are
read in place at test time; the module skips if the checkout is absent.
"""

from __future__ import annotations

from pathlib import Path

import pytest

yaml = pytest.importorskip("yaml")

from mutable_spark.dialect import Engine
from mutable_spark.dialect.lexer import LexError
from mutable_spark.dialect.parser import ParseError, parse
from mutable_spark.dialect.sema import SemaError

DDL = Path("/root/reference/test/ddl")

pytestmark = pytest.mark.skipif(
    not DDL.exists(), reason="reference test corpus not available"
)


def _split(text: str) -> list[str]:
    return [s.strip() for s in text.split(";") if s.strip()]


def _cases() -> list[str]:
    return sorted(p.stem for p in DDL.glob("*.yml"))


def _load(name: str) -> dict:
    return yaml.safe_load((DDL / f"{name}.yml").read_text())


def _fresh_engine(spark) -> Engine:
    eng = Engine(spark)
    for stmt in _split((DDL / "data" / "schema.sql").read_text()):
        eng.execute(stmt)
    return eng


PARSE_SAN = [n for n in _cases() if n.startswith("parse-san")]
SEMA_CASES = [n for n in _cases() if n.startswith("sema-")]


@pytest.mark.parametrize("name", PARSE_SAN)
def test_parse_san(name):
    case = _load(name)
    assert case["stages"]["parser"]["returncode"] == 1, f"{name}: not a parse sanction"
    with pytest.raises((LexError, ParseError)):
        for stmt in _split(case["query"]):
            parse(stmt)


@pytest.mark.parametrize("name", SEMA_CASES)
def test_sema_stage(spark, name):
    # fresh engine per case: every DDL statement mutates catalog state
    eng = _fresh_engine(spark)
    case = _load(name)
    sema = case["stages"]["sema"]
    expect_error = bool(sema.get("returncode")) or bool(sema.get("num_err"))

    def run():
        for stmt in _split(case["query"]):
            eng.execute(stmt)

    if expect_error:
        with pytest.raises(SemaError):
            run()
    else:
        run()


# --- observable catalog effects (stronger than the reference's stdout check)
def test_drop_table_removes_table_and_indexes(spark):
    eng = _fresh_engine(spark)
    eng.execute("DROP TABLE tab0")
    assert "tab0" not in eng.catalog._db()
    assert "idx0_a" not in eng.catalog.db_indexes()  # covering index gone
    with pytest.raises(SemaError):
        eng.execute("SELECT a FROM tab0")


def test_drop_index_multi_removes_both(spark):
    eng = _fresh_engine(spark)
    eng.execute("DROP INDEX idx0_a, idx1_b")
    assert eng.catalog.db_indexes() == {}


def test_drop_index_multi_one_missing_is_atomic(spark):
    """One unresolved name fails the whole statement; nothing is dropped
    (`Sema.cpp:1780-1788` only emits DropIndex when every name resolved)."""
    eng = _fresh_engine(spark)
    with pytest.raises(SemaError):
        eng.execute("DROP INDEX idx0_a, nope")
    assert "idx0_a" in eng.catalog.db_indexes()


def test_drop_database_removes_and_in_use_precedes_existence(spark):
    eng = _fresh_engine(spark)
    eng.execute("DROP DATABASE db1")
    assert "db1" not in eng.catalog.databases
    # in-use error fires even with IF EXISTS (sema-san-…-in_use_if_exists)
    with pytest.raises(SemaError):
        eng.execute("DROP DATABASE IF EXISTS db0")


def test_create_index_registers_metadata(spark):
    eng = _fresh_engine(spark)
    eng.execute("CREATE INDEX idx0_b ON tab0(b)")
    assert eng.catalog.db_indexes()["idx0_b"] == ("tab0", "b")
    # IF NOT EXISTS on a duplicate: warn-and-skip, not an error
    eng.execute("CREATE INDEX IF NOT EXISTS idx0_b ON tab0(b)")


def test_create_unique_index_rejected_at_sema(spark):
    """UNIQUE parses (`Parser.cpp:405-407`) but sema rejects it
    (`Sema.cpp:1622-1626`)."""
    eng = _fresh_engine(spark)
    with pytest.raises(SemaError):
        eng.execute("CREATE UNIQUE INDEX u0 ON tab0(a)")


def test_create_index_expression_key_field_rejected_at_sema(spark):
    """A parenthesized expression key field parses (`Parser.cpp:448-460`)
    but sema rejects non-attribute key fields (`Sema.cpp:1692-1695`)."""
    eng = _fresh_engine(spark)
    with pytest.raises(SemaError):
        eng.execute("CREATE INDEX e0 ON tab0((b+b))")
