"""Engine function library.

Two concerns live here:

1. **Deterministic aggregates** — the driver hash-compares our results
   against a DuckDB oracle. Floating-point SUM/AVG are order-dependent, and
   Spark's parallel partial aggregation sums in a different order than
   DuckDB. We therefore compute money-valued aggregates through exact
   DECIMAL arithmetic (cast each operand to DECIMAL first — a binary double
   is never exactly half-way between two 2-decimal values, so the rounding
   is unambiguous and both engines agree) and cast the exact result to
   DOUBLE at the end. Identical bits, any partitioning, any cluster size.

2. **Vector math** — fold-based dot products / norms over `array<float>`
   embedding columns using JVM-side higher-order functions (`aggregate`,
   `zip_with`) — no Python UDF in the hot path. Folds run left-to-right,
   matching DuckDB's `list_reduce`, so cosine scores are bit-identical too.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

DEC = "decimal(18,2)"


def dec(col: Column | str) -> Column:
    """Exact 2-decimal view of a money/measure column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str) -> Column:
    """SUM as exact decimal, surfaced as DOUBLE (order-independent)."""
    return F.sum(dec(col)).cast("double")


def davg(col: Column | str) -> Column:
    """AVG = exact-decimal SUM / COUNT, surfaced as DOUBLE.

    Matches the reference's rule that AVG is always DOUBLE
    (`src/parse/Sema.cpp:600-605`).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c)).cast("double") / F.count(c)


def dsum_expr(col: Column) -> Column:
    """SUM of an already-exact decimal expression, surfaced as DOUBLE."""
    return F.sum(col).cast("double")


# SQL-side twins for oracle strings (DuckDB dialect).
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({expr}))"


# --- vector math over array<float/double> columns ------------------------

def vec_dot(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product in DOUBLE (bit-matches list_reduce)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: Column) -> Column:
    return F.sqrt(vec_dot(a, a))


def vec_cosine(a: Column, b: Column) -> Column:
    """Cosine in DOUBLE; a zero-norm side yields NULL, not an error.

    Under Spark's ANSI mode a plain `/` raises DIVIDE_BY_ZERO, so ONE
    corrupt (all-zero) embedding row would kill an entire batch k-NN
    job. `try_divide` returns NULL instead — exactly what DuckDB's
    double division by zero produces — and NULL sorts last under the
    DESC orderings every consumer uses, so zero vectors can never rank
    as top neighbors in either engine. Pinned by
    tests/test_edge_embeddings.py."""
    return F.try_divide(vec_dot(a, b), vec_norm(a) * vec_norm(b))
