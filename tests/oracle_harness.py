"""Local replica of the driver's oracle comparison: run a registered Spark
query and its DuckDB oracle on the same parquet tables, sort columns by
name, sort rows, and compare values exactly (our queries are engineered to
be bit-deterministic — see mutable_spark.functions)."""

from __future__ import annotations

import datetime as dt
import math


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _key(row):
    return tuple(
        (x is None, "" if x is None else str(type(x)), x if not isinstance(x, tuple) else str(x))
        for x in row
    )


def rows_sorted_by_colname(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=_key), [cols[i] for i in order]


def compare(name, spark, duck, sf_dir):
    """Returns (ok, message). Exact value comparison after column-name sort
    and row sort — the strictest reading of the driver's contract."""
    from mutable_spark import registry

    registry.load_all()
    df = registry.QUERIES[name](spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]

    oracle = registry.ORACLES.get(name)
    if oracle is None:
        return True, f"{name}: rows-only ({len(s_rows)} rows)"

    res = duck.execute(oracle)
    d_cols = [c[0] for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"

    s_sorted, _ = rows_sorted_by_colname(s_cols, s_rows)
    d_sorted, _ = rows_sorted_by_colname(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            return False, (
                f"{name}: first diff at sorted row {i}:\n  spark={a}\n  duck ={b}"
            )
    return True, f"{name}: OK ({len(s_rows)} rows)"
