"""The reference's operator-correctness fixture (`test/ours/data/schema.sql`:
tables R,S,T with key/fkey/rfloat/rstring, D with dates — FIXTURES.md §1),
regenerated with our own seed and driven END-TO-END through the dialect
engine: CREATE TABLE → IMPORT DSV → dialect queries, each checked against
DuckDB running the translated ANSI SQL on the *same* CSV files.

This mirrors the reference's end2end-pos test layer (SURVEY §5): every
query below is shaped after a `test/ours/end2end-pos-select-*.yml` case
(binary joins, groupby variants, HAVING forms, aggregation without
grouping, order-by, float handling, date comparisons).
"""

from __future__ import annotations

import numpy as np
import pytest

from mutable_spark.dialect import Engine

ROWS = 100


def _gen(tmp_path):
    rng = np.random.default_rng(7)
    paths = {}
    for t in ("R", "S", "T"):
        lines = []
        for k in range(ROWS):
            fkey = int(rng.integers(0, ROWS))
            rfloat = round(float(rng.uniform(0, 10)), 4)
            rstring = "".join(
                rng.choice(list("abcdefghij XYZ"), size=15)
            )
            lines.append(f'{k},{fkey},{rfloat},"{rstring}"')
        p = tmp_path / f"{t}.csv"
        p.write_text("\n".join(lines) + "\n")
        paths[t] = p
    dlines = []
    for k in range(10):
        y, m, d = int(rng.integers(1971, 2030)), int(rng.integers(1, 13)), int(rng.integers(1, 28))
        hh, mm, ss = int(rng.integers(0, 24)), int(rng.integers(0, 60)), int(rng.integers(0, 60))
        dlines.append(f"{k},{y:04d}-{m:02d}-{d:02d},{y:04d}-{m:02d}-{d:02d} {hh:02d}:{mm:02d}:{ss:02d}")
    p = tmp_path / "D.csv"
    p.write_text("\n".join(dlines) + "\n")
    paths["D"] = p
    return paths


@pytest.fixture(scope="module")
def ours(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ours")
    paths = _gen(tmp)
    eng = Engine(spark)
    eng.execute("CREATE DATABASE ours")
    eng.execute("USE ours")
    for t in ("R", "S", "T"):
        eng.execute(
            f"CREATE TABLE {t} (key INT(2) NOT NULL PRIMARY KEY, "
            "fkey INT(2) NOT NULL, rfloat FLOAT NOT NULL, rstring CHAR(15) NOT NULL)"
        )
        eng.execute(f'IMPORT INTO {t} DSV "{paths[t]}"')
    eng.execute(
        "CREATE TABLE D (key INT(2) NOT NULL PRIMARY KEY, "
        "rdate DATE NOT NULL, rdatetime DATETIME NOT NULL)"
    )
    eng.execute(f'IMPORT INTO D DSV "{paths["D"]}"')

    import duckdb

    con = duckdb.connect()
    for t in ("R", "S", "T"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_csv('{paths[t]}', header=false, "
            "columns={'key':'SMALLINT','fkey':'SMALLINT','rfloat':'FLOAT','rstring':'VARCHAR'})"
        )
    con.execute(
        f"CREATE VIEW D AS SELECT * FROM read_csv('{paths['D']}', header=false, "
        "columns={'key':'SMALLINT','rdate':'DATE','rdatetime':'TIMESTAMP'})"
    )
    return eng, con


CASES = [
    # (name-after-reference-case, dialect SQL, duckdb SQL or None if same)
    (
        "join_binary",  # end2end-pos-select-join_binary-shj.yml
        "SELECT R.key, S.key FROM R, S WHERE R.key = S.fkey ORDER BY R.key, S.key",
        'SELECT R.key AS "key", S.key AS "key" FROM R, S WHERE R.key = S.fkey ORDER BY 1, 2',
    ),
    (
        "join_ternary",
        "SELECT COUNT(*) AS c FROM R, S, T WHERE R.key = S.fkey AND S.key = T.fkey",
        None,
    ),
    (
        "groupby_all_aggregations",  # end2end-pos-select-groupby_all_aggregations.yml
        "SELECT fkey, COUNT(*) AS c, MIN(rfloat) AS mn, MAX(rfloat) AS mx "
        "FROM R GROUP BY fkey ORDER BY fkey",
        None,
    ),
    (
        "aggregation_no_group",
        "SELECT COUNT(*) AS c, MIN(key) AS mn, MAX(key) AS mx FROM R",
        None,
    ),
    (
        "having_count",
        "SELECT fkey, COUNT(*) AS c FROM S GROUP BY fkey HAVING COUNT(*) > 1 ORDER BY fkey",
        None,
    ),
    (
        "order_by_float_desc",
        "SELECT key, rfloat FROM R ORDER BY rfloat DESC, key LIMIT 7",
        None,
    ),
    (
        "where_string_like",
        'SELECT key FROM R WHERE rstring LIKE "%X%" ORDER BY key',
        "SELECT key FROM R WHERE rstring LIKE '%X%' ORDER BY key",
    ),
    (
        "date_compare",
        "SELECT key FROM D WHERE rdate < d'2000-01-01' ORDER BY key",
        "SELECT key FROM D WHERE rdate < DATE '2000-01-01' ORDER BY key",
    ),
    (
        "datetime_compare",
        "SELECT key FROM D WHERE rdatetime >= d'1990-06-15 12:00:00' ORDER BY key",
        "SELECT key FROM D WHERE rdatetime >= TIMESTAMP '1990-06-15 12:00:00' ORDER BY key",
    ),
    (
        "arith_mix",
        "SELECT key, key % 7 AS m, -key AS n, key + fkey * 2 AS x FROM R ORDER BY key LIMIT 10",
        None,
    ),
]


@pytest.mark.parametrize("name,dialect_sql,duck_sql", CASES, ids=[c[0] for c in CASES])
def test_ours_case(ours, name, dialect_sql, duck_sql):
    eng, con = ours
    got = [tuple(r) for r in eng.execute(dialect_sql).collect()]
    want = con.execute(duck_sql or dialect_sql.replace('"', "'")).fetchall()
    # rfloat is FLOAT32 in both engines; compare with exact float equality
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=0, abs=0), f"{name}: {g} != {w}"
