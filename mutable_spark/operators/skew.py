"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in `session.RUNTIME_CONFS`) handles
most runtime skew; these helpers are the *explicit* variants for the cases
AQE can't fix: a single aggregation key carrying a large fraction of all
rows (the "null key" / "empty string" / "bot user" problem at 100 TB), and
broadcast-impossible joins against a hot-keyed dimension.

Both are pure plan rewrites with identical results to their naive forms
(asserted in tests) — the salt only changes *where* the partial work runs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs``: output name → (fn, column) with fn ∈ {count, sum, min, max}
    (the algebraic aggregates — they re-combine losslessly; AVG callers
    compose sum/count).

    Phase 1 groups by (keys + salt): a hot key's rows split across
    ``n_salts`` reducers instead of one. Phase 2 re-combines the ≤ n_salts
    partials per key. For uniform data this adds one cheap extra shuffle;
    for skewed data it converts a straggler into parallel work. The salt
    is a hash of a per-row nondeterministic id — it never affects results,
    only placement.
    """
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (fn, col) in aggs.items():
        p = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported salted aggregate {fn!r}")
    return (
        df.withColumn(
            SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
        )
        .groupBy(*keys, SALT)
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side.

    Each big-side row gets a random salt in [0, n_salts); the small side
    is exploded ``n_salts``× with every salt value, so (key, salt) is an
    ordinary equi-join whose hot key now spreads over n_salts partitions.
    Cost: small side shuffles n_salts× bigger — use only when the small
    side is modest but over the broadcast threshold and the key is hot.
    """
    bs = big.withColumn(
        SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    ss = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return bs.join(ss, on=[key, SALT], how=how).drop(SALT)


# --------------------------------------------------------------------------
# Registry op: the explicit two-phase salted aggregation as a driver-gated
# query (this module was test-only until r9). event_type is the honest
# hot-key case — a handful of values carrying EVERY row, the shape where
# one reducer per key straggles at 100 TB no matter what AQE does
# (skew-split helps joins, not a 5-key aggregation).

from mutable_spark.catalog import load_tables  # noqa: E402
from mutable_spark.registry import query  # noqa: E402


@query(
    "op_agg_salted",
    oracle="""
    SELECT event_type,
           COUNT(user_id) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(user_id) AS min_user
    FROM events GROUP BY event_type
    """,
)
def op_agg_salted(spark, sf_dir):
    """Salted two-phase aggregation over a hot-keyed stream: phase 1
    groups by (event_type, salt) so each of the ~5 hot keys spreads
    across 16 reducers; phase 2 re-combines the ≤ 16 algebraic partials
    per key. Results are bit-identical to the plain groupBy (the salt
    only moves work — decimal partial sums re-combine exactly, COUNT
    and MIN are associative), which is exactly what the driver checks
    against the unsalted oracle.

    Scale note: this is the explicit guard for aggregation-key skew —
    AQE's skew handling splits JOIN partitions but cannot parallelize
    one aggregation key; with ~5 event types, an unsalted plan caps
    aggregation parallelism at 5 tasks regardless of cluster size,
    while the salted plan uses 5×16. The extra shuffle moves ≤
    keys×salts×aggs rows — nothing at any scale."""
    e = load_tables(spark, sf_dir).events.select(
        "event_type",
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    out = salted_aggregate(
        e,
        ["event_type"],
        {
            "n": ("count", "user_id"),
            "sum_v": ("sum", "v"),
            "min_user": ("min", "user_id"),
        },
    )
    return out.select(
        "event_type",
        "n",
        F.col("sum_v").cast("double").alias("sum_value"),
        F.col("min_user").alias("min_user"),
    )
