"""The reference's `test/empty` corpus (58 YAMLs), run LITERALLY — the
empty-database lexer/parser/sema/end2end stages the reference's
IntegrationTest drives (`/root/reference/test/IntegrationTest.py`):

- `lexer` stage: our `token_dump` must reproduce the reference lexer's
  stdout byte-for-byte (`FILE:LINE:COL: TEXT TK_NAME` per token, token
  names from `include/mutable/tables/TokenType.tbl`).
- `parser` stage, pos: parse + pretty-print must reproduce the
  reference ASTPrinter's canonical layout byte-for-byte.
- `parser` stage, san (returncode 1): the parser must reject.
- `sema` stage, pos: the statement must sema-check clean against an
  empty database.
- `end2end` stage: engine output via `print_result` must match.

Nothing is copied from the reference: the YAMLs are read in place at
test time and the module skips when the checkout is absent.
"""

from __future__ import annotations

import io
from pathlib import Path

import pytest

yaml = pytest.importorskip("yaml")

from mutable_spark.dialect.lexer import LexError, token_dump
from mutable_spark.dialect.parser import ParseError, parse
from mutable_spark.dialect.printer import print_stmt

EMPTY = Path("/root/reference/test/empty")

pytestmark = pytest.mark.skipif(
    not EMPTY.exists(), reason="reference test corpus not available"
)


def _cases():
    return sorted(p.stem for p in EMPTY.glob("*.yml"))


def _load(name: str) -> dict:
    return yaml.safe_load((EMPTY / f"{name}.yml").read_text())


# --- lexer stage: every file that declares one -----------------------------
LEXER_CASES = [
    n for n in _cases() if "lexer" in (_load(n).get("stages") or {})
]


@pytest.mark.parametrize("name", LEXER_CASES)
def test_lexer_stage(name):
    doc = _load(name)
    st = doc["stages"]["lexer"]
    got = token_dump(doc["query"])
    assert got == st["out"], f"{name}: token dump mismatch\n{got}"


# --- parser stage -----------------------------------------------------------
PARSE_POS = [
    n
    for n in _cases()
    if "parser" in (_load(n).get("stages") or {})
    and (_load(n)["stages"]["parser"] or {}).get("returncode") == 0
]
PARSE_SAN = [
    n
    for n in _cases()
    if "parser" in (_load(n).get("stages") or {})
    and (_load(n)["stages"]["parser"] or {}).get("returncode") == 1
]


@pytest.mark.parametrize("name", PARSE_POS)
def test_parser_stage_pretty_print(name):
    doc = _load(name)
    expected = doc["stages"]["parser"]["out"]
    got = print_stmt(parse(doc["query"])) + "\n"
    assert got == expected, f"{name}:\n--- got ---\n{got}--- want ---\n{expected}"


@pytest.mark.parametrize("name", PARSE_SAN)
def test_parser_stage_rejects(name):
    doc = _load(name)
    with pytest.raises((ParseError, LexError)):
        parse(doc["query"])


# --- sema / end2end stages on an empty database -----------------------------
SEMA_POS = [
    n
    for n in _cases()
    if "sema" in (_load(n).get("stages") or {})
    and (_load(n)["stages"]["sema"] or {}).get("returncode") == 0
]
E2E_POS = [
    n
    for n in _cases()
    if "end2end" in (_load(n).get("stages") or {})
    and (_load(n)["stages"]["end2end"] or {}).get("returncode") == 0
]


@pytest.fixture()
def empty_eng(spark):
    from mutable_spark.dialect import Engine

    eng = Engine(spark)
    eng.execute("CREATE DATABASE empty")
    eng.execute("USE empty")
    return eng


def _run(eng, query: str) -> str:
    from mutable_spark.plans.sinks import print_result

    buf = io.StringIO()
    for stmt in (s.strip() for s in query.split(";")):
        if not stmt:
            continue
        df = eng.execute(stmt)
        if df is not None:
            print_result(df, buf)
    return buf.getvalue()


@pytest.mark.parametrize("name", SEMA_POS)
def test_sema_stage_accepts(name, empty_eng):
    _run(empty_eng, _load(name)["query"])  # must not raise


@pytest.mark.parametrize("name", E2E_POS)
def test_end2end_stage(name, empty_eng):
    doc = _load(name)
    expected = doc["stages"]["end2end"]["out"]
    got = _run(empty_eng, doc["query"])
    if expected in (None, "NULL"):
        assert got == ""
    else:
        assert got == expected, f"{name}: {got!r} != {expected!r}"


@pytest.mark.parametrize("name", PARSE_POS)
def test_parser_print_is_canonical_fixpoint(name):
    """print∘parse must be a FIXPOINT: re-parsing the canonical rendering
    and printing again yields the identical text (the reference property
    that makes `mutable --parse` output stable under round-trips)."""
    doc = _load(name)
    once = print_stmt(parse(doc["query"]))
    twice = print_stmt(parse(once))
    assert once == twice


def _all_reference_statements():
    """Every parseable statement across the reference's OTHER corpora
    (test/ours and test/ddl queries + the tpc-h/ddl schema scripts) — the
    fixpoint property should hold on the full dialect surface, not just
    the 31 empty-corpus shapes."""
    stmts: list[str] = []
    for corpus in ("ours", "ddl"):
        root = Path(f"/root/reference/test/{corpus}")
        if not root.exists():
            continue
        for y in sorted(root.glob("*.yml")):
            doc = yaml.safe_load(y.read_text())
            q = doc.get("query")
            if not isinstance(q, str):
                continue
            for stmt in q.split(";"):
                stmt = stmt.strip()
                if not stmt:
                    continue
                try:
                    parse(stmt)
                except Exception:
                    continue  # san cases / unsupported forms
                stmts.append(stmt)
    return stmts


def test_print_parse_fixpoint_over_all_corpora():
    stmts = _all_reference_statements()
    assert len(stmts) > 100  # the corpora are not silently missing
    bad = []
    for stmt in stmts:
        once = print_stmt(parse(stmt))
        twice = print_stmt(parse(once))
        if once != twice:
            bad.append((stmt[:80], once[:120], twice[:120]))
    assert not bad, bad[:5]
