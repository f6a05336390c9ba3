"""Property-based dialect testing (hypothesis): random expression trees
over the R fixture, compiled by our lexer/parser/sema/compiler and checked
against DuckDB evaluating the translated ANSI SQL on the same data.

The reference has no property-based layer (SURVEY §5 "No property-based/
randomized testing"); this goes beyond it. The generator stays inside the
dialect's *defined* semantics: integer arithmetic on key/fkey (+ - * %),
comparisons, AND/OR/NOT — avoiding the places where engines legitimately
diverge (float formatting, division by zero, overflow past int64).
"""

from __future__ import annotations

#: property suite (random program generation vs DuckDB) — opt-out of the default gate
#: (see pytest.ini); run everything with `pytest -m ""`
import pytest

pytestmark = pytest.mark.slow

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mutable_spark.dialect import parse
from mutable_spark.dialect.compiler import compile_select

ROWS = 25  # tiny table → fast rounds, still 625 predicate evaluations


@pytest.fixture(scope="module")
def ptables(spark):
    rows = [(k, (k * 7 + 3) % ROWS) for k in range(ROWS)]
    df = spark.createDataFrame(rows, "key int, fkey int")
    con = duckdb.connect()
    con.execute("CREATE TABLE R (key INTEGER, fkey INTEGER)")
    con.executemany("INSERT INTO R VALUES (?, ?)", rows)
    return {"R": df}, con


# --- expression generator -------------------------------------------------
_ints = st.integers(min_value=1, max_value=9).map(str)
_cols = st.sampled_from(["key", "fkey"])


def _arith(children):
    # `%` only with a literal (non-zero) divisor: a computed divisor can be
    # zero, where Spark's ANSI mode errors while DuckDB yields NULL — both
    # outside the dialect's defined semantics (C++ UB in the reference)
    return st.one_of(
        st.builds(
            lambda a, op, b: f"({a} {op} {b})",
            children,
            st.sampled_from(["+", "-", "*"]),
            children,
        ),
        st.builds(lambda a, b: f"({a} % {b})", children, _ints),
    )


arith_expr = st.recursive(st.one_of(_ints, _cols), _arith, max_leaves=6)

cmp_expr = st.builds(
    lambda a, op, b: f"({a} {op} {b})",
    arith_expr,
    st.sampled_from(["=", "!=", "<", ">", "<=", ">="]),
    arith_expr,
)

bool_expr = st.recursive(
    cmp_expr,
    lambda children: st.one_of(
        st.builds(lambda a, b: f"({a} AND {b})", children, children),
        st.builds(lambda a, b: f"({a} OR {b})", children, children),
        st.builds(lambda a: f"(NOT {a})", children),
    ),
    max_leaves=4,
)


def _translate(sql: str) -> str:
    """dialect → DuckDB: `%` must keep C truncation semantics. Both the
    dialect compiler and DuckDB's % truncate toward zero for positive
    operands (all generated operands are non-negative), so text is
    identical here."""
    return sql


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(proj=arith_expr, pred=bool_expr)
def test_random_expressions_match_duckdb(ptables, proj, pred):
    tables, con = ptables
    sql = f"SELECT key, {proj} AS x FROM R WHERE {pred} ORDER BY key"
    got = [(r.key, r.x) for r in compile_select(parse(sql), tables).collect()]
    want = con.execute(_translate(sql)).fetchall()
    assert got == [tuple(w) for w in want], sql


# --- zone-pruned scans: random range predicates vs DuckDB -----------------
@pytest.fixture(scope="module")
def zoned(spark, tmp_path_factory):
    """A parquet-backed, doubly-indexed table on a range layout, plus a
    DuckDB twin over the same files."""
    import pyspark.sql.functions as F

    from mutable_spark.dialect import Engine

    layout = tmp_path_factory.mktemp("prop") / "zt"
    spark.range(0, 2000).select(
        F.col("id").alias("k"), ((F.col("id") * 13 + 5) % 2000).alias("v")
    ).repartitionByRange(8, "k").write.parquet(str(layout))
    eng = Engine(spark)
    eng.catalog.create_database("zprop")
    eng.catalog.use("zprop")
    eng.create_table_from_parquet("t", str(layout))
    eng.execute("CREATE INDEX pk ON t USING rmi (k)")
    eng.execute("CREATE INDEX pv ON t (v)")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{layout}/*.parquet'")
    return eng, con


_ops = st.sampled_from([">", ">=", "<", "<=", "="])
_bnd = st.integers(min_value=-100, max_value=2100)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    conj=st.lists(
        st.tuples(st.sampled_from(["k", "v"]), _ops, _bnd), min_size=1, max_size=4
    )
)
def test_zone_pruned_scan_matches_duckdb(zoned, conj):
    """Any conjunction of range predicates over the two indexed columns —
    one-sided, contradictory, out-of-domain, repeated, mixed across both
    indexes — returns exactly DuckDB's full-scan answer through the
    pruned dialect path (pruning may only ever over-read)."""
    eng, con = zoned
    where = " AND ".join(f"{c} {op} {val}" for c, op, val in conj)
    sql = f"SELECT k, v FROM t WHERE {where}"
    got = sorted(tuple(r) for r in eng.execute(sql).collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want, where


# --- string-keyed zones: random lexicographic ranges vs DuckDB ------------
@pytest.fixture(scope="module")
def str_zoned(spark, tmp_path_factory):
    """A string-indexed range layout whose keys DELIBERATELY share a
    common prefix longer than the 6-byte surrogate ("domain" + digits):
    every zone-key comparison beyond the prefix collapses to a tie, so
    the index prunes coarsely — and the property is that results stay
    exact anyway (the surrogate may only ever over-read)."""
    import pyspark.sql.functions as F

    from mutable_spark.dialect import Engine

    layout = tmp_path_factory.mktemp("strprop") / "st"
    spark.range(0, 1000).select(
        F.concat(F.lit("domain"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("s"),
        F.col("id").alias("v"),
    ).repartitionByRange(8, "s").write.parquet(str(layout))
    eng = Engine(spark)
    eng.catalog.create_database("sprop")
    eng.catalog.use("sprop")
    eng.create_table_from_parquet("t", str(layout))
    eng.execute("CREATE INDEX ps ON t (s)")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{layout}/*.parquet'")
    return eng, con


_str_ops = st.sampled_from([">", ">=", "<", "<=", "="])
_str_bnd = st.one_of(
    # in-domain, shares the >6-byte prefix with every key
    st.integers(min_value=-50, max_value=1050).map(lambda i: f"domain{i:04d}"),
    # short / out-of-domain / prefix-boundary strings
    st.sampled_from(["", "a", "domain", "domaiz", "dom", "zzz", "domain0500extra"]),
)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    conj=st.lists(st.tuples(_str_ops, _str_bnd), min_size=1, max_size=3)
)
def test_string_zone_pruned_scan_matches_duckdb(str_zoned, conj):
    """Any conjunction of lexicographic ranges over the string-indexed
    column — including bounds that tie on the 6-byte prefix, empty
    strings, and out-of-domain values — returns exactly DuckDB's
    full-scan answer through the pruned dialect path."""
    eng, con = str_zoned
    where = " AND ".join(f's {op} "{val}"' for op, val in conj)
    duck_where = " AND ".join(f"s {op} '{val}'" for op, val in conj)
    got = sorted(tuple(r) for r in eng.execute(f"SELECT s, v FROM t WHERE {where}").collect())
    want = sorted(tuple(r) for r in con.execute(f"SELECT s, v FROM t WHERE {duck_where}").fetchall())
    assert got == want, where


# --- query-level fuzzing: grouped aggregates and joins (r8) ---------------
_agg = st.sampled_from(["COUNT", "SUM", "MIN", "MAX"])

# the reference rejects attribute-free grouping keys (constants group
# nothing — sema-san-select-scalar_function_in_group_by), so the group
# key and the aggregate argument are column-anchored
col_arith = st.builds(lambda c, e: f"({c} + {e})", _cols, arith_expr)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(gkey=col_arith, fn=_agg, arg=col_arith, pred=bool_expr)
def test_random_grouped_aggregates_match_duckdb(ptables, gkey, fn, arg, pred):
    """Random GROUP BY expression + aggregate over a random argument +
    random WHERE, through lexer/parser/sema/compiler — the full grouped
    pipeline, not just scalar expressions. Operand domain keeps SUM far
    under int64, and DuckDB's HUGEINT SUM compares equal at the Python
    level (this is not a driver-hash context)."""
    tables, con = ptables
    sql = (
        f"SELECT ({gkey}) AS g, {fn}({arg}) AS a FROM R "
        f"WHERE {pred} GROUP BY ({gkey}) AS g"
    )
    got = sorted(
        (r.g, int(r.a)) for r in compile_select(parse(sql), tables).collect()
    )
    want = sorted(
        (g, int(a))
        for g, a in con.execute(
            f"SELECT ({gkey}) AS g, {fn}({arg}) AS a FROM R "
            f"WHERE {pred} GROUP BY 1"
        ).fetchall()
    )
    assert got == want, sql


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=bool_expr, theta=st.sampled_from(["=", "<", "<="]))
def test_random_self_joins_match_duckdb(ptables, pred, theta):
    """Random self-join (equi or theta on the R fixture) with a random
    single-source residual — exercises the compiler's CNF split between
    join conditions and pushed filters on arbitrary predicates."""
    tables, con = ptables
    # qualify the residual against alias a only, without mangling 'fkey'
    resid = pred.replace("fkey", "@F@").replace("key", "a.key").replace("@F@", "a.fkey")
    sql = (
        f"SELECT a.key AS ak, b.key AS bk FROM R AS a, R AS b "
        f"WHERE a.fkey {theta} b.key AND {resid}"
    )
    got = sorted((r.ak, r.bk) for r in compile_select(parse(sql), tables).collect())
    want = sorted(tuple(w) for w in con.execute(sql).fetchall())
    assert got == want, sql


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    # column-anchored (col_arith, not arith_expr): a pure-literal key like
    # ORDER BY (2) is an ORDINAL in DuckDB but a constant in the dialect
    okey=col_arith,
    desc=st.booleans(),
    pred=bool_expr,
    limit=st.integers(min_value=1, max_value=30),
    offset=st.integers(min_value=0, max_value=10),
)
def test_random_order_limit_offset_match_duckdb(
    ptables, okey, desc, pred, limit, offset
):
    """Random ORDER BY expression (+ unique tiebreak so the order is
    total) with random LIMIT/OFFSET over a random WHERE — the
    sort+limit→top-k path under fuzz, compared POSITIONALLY against
    DuckDB (not as sorted sets: the row order itself is the contract)."""
    tables, con = ptables
    d = "DESC" if desc else "ASC"
    sql = (
        f"SELECT key AS k, fkey AS f FROM R WHERE {pred} "
        f"ORDER BY ({okey}) {d}, key LIMIT {limit} OFFSET {offset}"
    )
    got = [(r.k, r.f) for r in compile_select(parse(sql), tables).collect()]
    want = [tuple(w) for w in con.execute(sql).fetchall()]
    assert got == want, sql
