"""UPDATE / DELETE through the dialect engine. The reference parses both
(grammar `doc/syntax-grammar.md:105,110`) but sema and execution are
`M_unreachable` (`Sema.cpp:1884,1892`, `DatabaseCommand.cpp:189-196`);
the engine completes them copy-on-write (additive surface)."""

from __future__ import annotations

import pytest

from mutable_spark.dialect.engine import Engine, SemaError


@pytest.fixture()
def eng(spark):
    e = Engine(spark)
    e.execute("CREATE DATABASE d")
    e.execute("USE d")
    e.execute(
        'CREATE TABLE r (id INT(4) PRIMARY KEY, name CHAR(5), val DOUBLE)'
    )
    e.execute(
        'INSERT INTO r VALUES (1, "aa", 1.5), (2, "bb", 2.5), (3, "cc", NULL)'
    )
    return e


def _rows(eng, sql="SELECT * FROM r"):
    return sorted(tuple(r) for r in eng.execute(sql).collect())


def test_delete_where(eng):
    eng.execute("DELETE FROM r WHERE id = 2")
    assert [r[0] for r in _rows(eng)] == [1, 3]


def test_delete_null_predicate_keeps_row(eng):
    # val IS NULL for id=3: `val < 2.0` is NULL there → row is kept
    eng.execute("DELETE FROM r WHERE val < 2.0")
    assert [r[0] for r in _rows(eng)] == [2, 3]


def test_delete_without_where_empties_table(eng):
    eng.execute("DELETE FROM r")
    assert _rows(eng) == []


def test_update_assignment_and_where(eng):
    eng.execute("UPDATE r SET val = val + 1.0 WHERE id < 3")
    got = {r[0]: r[2] for r in _rows(eng)}
    assert got == {1: 2.5, 2: 3.5, 3: None}


def test_update_without_where_hits_all_rows(eng):
    eng.execute('UPDATE r SET name = "zz"')
    assert {r[1] for r in _rows(eng)} == {"zz"}


def test_update_char_limit_truncates(eng):
    eng.execute('UPDATE r SET name = "longer-than-five" WHERE id = 1')
    got = {r[0]: r[1] for r in _rows(eng)}
    assert got[1] == "longe"  # CHAR(5) write truncation


def test_update_multiple_assignments(eng):
    eng.execute('UPDATE r SET name = "xx", val = 0.0 WHERE id = 3')
    assert (3, "xx", 0.0) in _rows(eng)


def test_copy_on_write_preserves_prior_select(eng, spark):
    before = eng.execute("SELECT * FROM r")
    eng.execute("DELETE FROM r WHERE id = 1")
    # the pre-delete DataFrame value still sees all three rows
    assert len(before.collect()) == 3
    assert len(eng.execute("SELECT * FROM r").collect()) == 2


# --- sema ------------------------------------------------------------------
def test_update_unknown_attribute_rejected(eng):
    with pytest.raises(SemaError, match="not found"):
        eng.execute("UPDATE r SET nope = 1")


def test_update_duplicate_assignment_rejected(eng):
    with pytest.raises(SemaError, match="duplicate"):
        eng.execute("UPDATE r SET val = 1.0, val = 2.0")


def test_update_type_category_mismatch_rejected(eng):
    with pytest.raises(SemaError, match="cannot assign"):
        eng.execute('UPDATE r SET val = "not-a-number"')


def test_update_null_assignment_allowed(eng):
    eng.execute("UPDATE r SET val = NULL WHERE id = 1")
    got = {r[0]: r[2] for r in _rows(eng)}
    assert got[1] is None


def test_where_must_be_boolean(eng):
    with pytest.raises(SemaError, match="BOOL"):
        eng.execute("DELETE FROM r WHERE id + 1")


def test_aggregate_in_assignment_rejected(eng):
    with pytest.raises(SemaError, match="aggregate"):
        eng.execute("UPDATE r SET val = SUM(val)")


def test_aggregate_in_where_rejected(eng):
    with pytest.raises(SemaError, match="aggregate"):
        eng.execute("DELETE FROM r WHERE COUNT(*) > 1")


def test_delete_missing_table_rejected(eng):
    with pytest.raises(SemaError, match="does not exist"):
        eng.execute("DELETE FROM nope")


def test_update_scalar_subquery_in_where(eng):
    """Subqueries stay legal in the WHERE (compiled by the SELECT path)."""
    eng.execute("DELETE FROM r WHERE val < (SELECT AVG(r2.val) FROM r AS r2)")
    assert [r[0] for r in _rows(eng)] == [2, 3]
