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


def _type_family(t: str) -> str:
    """Normalize a type name (DuckDB or Spark dtype string) to the family
    the driver's value-hash distinguishes. Calibrated against
    CORRECTNESS_r07: int-width (Spark int vs DuckDB BIGINT) and decimal-
    precision (decimal(32,4) vs DECIMAL(38,4)) differences hash EQUAL
    (driver-green rows held them), but DuckDB's HUGEINT — the type its
    windowed/aggregate SUM(BIGINT) silently widens to — is not
    int64-representable and hash-diverged on value-identical rows (the
    one red r7 row, pipeline_pack_sequences). So: all ≤64-bit ints are
    one family, every decimal is one family, HUGEINT is its own and can
    never match."""
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{_type_family(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{_type_family(t[6:-1])}>"
    low = t.lower()
    if low in ("tinyint", "smallint", "integer", "int", "bigint", "long"):
        return "int64"
    if low == "hugeint":
        return "int128"
    if low.startswith("decimal"):
        return "decimal"
    if low in ("double", "float", "real"):
        return "float"
    if low in ("varchar", "string"):
        return "string"
    if low in ("timestamp", "timestamp_ntz"):
        return "timestamp"
    if low == "blob":
        return "binary"
    return low


def _type_mismatches(s_dtypes, d_cols, d_types):
    """Per-column (by name) Spark-vs-DuckDB hash-family misalignments."""
    spark_of = dict(s_dtypes)
    out = []
    for c, t in zip(d_cols, [str(x) for x in d_types]):
        if _type_family(t) != _type_family(spark_of.get(c, "<missing>")):
            out.append(f"{c}: duck={t} spark={spark_of.get(c)}")
    return out


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

    # The driver canonicalizes via pandas sort_values, which raises
    # `TypeError: unhashable type: 'list'` on array/map/struct columns
    # (r9's one red driver row, sim_quantize_embeddings). The pre-flight
    # must be AT LEAST as strict: hard-fail any non-scalar output column
    # so gate_sim catches the class before the driver does.
    complex_cols = [
        f"{c}:{t}"
        for c, t in df.dtypes
        if t.startswith(("array", "map", "struct"))
    ]
    if complex_cols:
        return False, (
            f"{name}: non-scalar output column(s) {complex_cols} — the "
            "driver's pandas canonicalizer cannot sort these "
            "(unhashable list). Serialize to a scalar "
            "(array_join / md5) on both engine and oracle sides."
        )

    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]

    oracle = registry.ORACLES.get(name)
    if oracle is None:
        return True, f"{name}: rows-only ({len(s_rows)} rows)"

    rel = duck.sql(oracle)
    d_cols, d_types = list(rel.columns), list(rel.types)
    d_rows = [tuple(r) for r in rel.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    bad_types = _type_mismatches(df.dtypes, d_cols, d_types)
    if bad_types:
        return False, (
            f"{name}: dtype misalignment (driver value-hash would diverge "
            f"even on identical values): " + "; ".join(bad_types)
        )
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
