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


def _salt_col(salt_on: str | Column, n_salts: int) -> Column:
    """Deterministic per-row salt derived from ROW CONTENT.

    Never derive the salt from `monotonically_increasing_id()` / `rand()`:
    those are nondeterministic across task retries, so if a map stage is
    recomputed after some reducers already fetched its output (executor
    loss — routine at 1000-executor scale), rows re-salt into different
    partitions and the aggregate double-counts or drops them. Hashing a
    caller-supplied content expression (a unique id column is ideal; any
    high-cardinality expression works) makes every recomputation place
    every row identically."""
    c = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    return F.pmod(F.xxhash64(c), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_on: str | Column,
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
    is a deterministic hash of ``salt_on`` (row content — see `_salt_col`
    for why retry-safety forbids nondeterministic ids); it never affects
    results, only placement.
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
        df.withColumn(SALT, _salt_col(salt_on, n_salts))
        .groupBy(*keys, SALT)
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_on: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side.

    Each big-side row gets a content-derived salt in [0, n_salts) — a
    deterministic hash of ``salt_on``, retry-safe per `_salt_col` — and
    the small side is exploded ``n_salts``× with every salt value, so
    (key, salt) is an ordinary equi-join whose hot key now spreads over
    n_salts partitions. Cost: small side shuffles n_salts× bigger — use
    only when the small side is modest but over the broadcast threshold
    and the key is hot.
    """
    bs = big.withColumn(SALT, _salt_col(salt_on, n_salts))
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
        "event_id",
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
        salt_on="event_id",
    )
    return out.select(
        "event_type",
        "n",
        F.col("sum_v").cast("double").alias("sum_value"),
        F.col("min_user").alias("min_user"),
    )


@query(
    "op_join_salted",
    oracle="""
    WITH dim AS (
        SELECT event_type,
               MIN(event_id) AS first_id,
               CAST(COUNT(*) AS BIGINT) AS n_type
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(d.first_id) AS first_id,
           MIN(d.n_type) AS n_type,
           MIN(e.user_id) AS min_user
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
)
def op_join_salted(spark, sf_dir):
    """Salted equi-join against a hot-keyed dimension — the explicit
    companion to ``op_agg_salted`` (the `salted_join` helper was
    test-only until now). The big side (events — ~5 event types carrying
    EVERY row) takes a per-row salt; the dimension is exploded 16× with
    all salt values, so the (key, salt) equi-join spreads each hot key
    over 16 partitions. Results are bit-identical to the plain join
    (each big row still matches its one dimension row exactly once),
    which is what the driver checks against the unsalted oracle.

    Scale note: the shape this exists for is a dimension that is (a) too
    big to broadcast and (b) hot-keyed — there AQE's skew split helps
    only the probe side's partition sizes, while salting fixes the
    placement itself. The dimension explosion costs n_salts× ITS size
    (nothing — dimensions are the small side by definition); the probe
    side pays its one shuffle either way. At test scale the exploded
    80-row dimension would auto-broadcast, which would silently skip
    the very plan this op gates, so the dimension side carries a
    SHUFFLE_HASH hint pinning the salted-shuffle strategy
    (tests/test_plan_shape.py asserts no BroadcastHashJoin)."""
    e = load_tables(spark, sf_dir).events.select(
        "event_type", "event_id", "user_id"
    )
    dim = e.groupBy("event_type").agg(
        F.min("event_id").alias("first_id"),
        F.count(F.lit(1)).alias("n_type"),
    )
    joined = salted_join(
        e, dim.hint("shuffle_hash"), "event_type", salt_on="event_id", n_salts=16
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("first_id").alias("first_id"),
        F.min("n_type").alias("n_type"),
        F.min("user_id").alias("min_user"),
    )
