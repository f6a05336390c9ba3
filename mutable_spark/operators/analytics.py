"""Analytics operators beyond the reference's surface: DISTINCT, set
operations, top-k per group, pivot, cube — all absent from the reference
(SURVEY §2.6 no windows, §2.8 no set ops, no DISTINCT keyword) but table
stakes for an analytics engine — plus approximate sketches for the 100 TB
regime (rows-only checks: sketch internals are engine-specific).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from mutable_spark.catalog import load_tables
from mutable_spark.functions import dsum, sql_dsum
from mutable_spark.registry import query


@query(
    "op_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def op_distinct(spark, sf_dir):
    """DISTINCT (no keyword exists in the reference's grammar): hash
    aggregation without aggregates; map-side partial dedup keeps the
    shuffle tiny."""
    li = load_tables(spark, sf_dir).lineitem
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "op_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def op_count_distinct(spark, sf_dir):
    """Exact multi-column DISTINCT aggregates (Spark expands to two-phase
    aggregation per distinct column automatically)."""
    li = load_tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
    )


@query("op_approx_sketches")  # HLL/KLL internals are engine-specific → rows-only
def op_approx_sketches(spark, sf_dir):
    """Approximate sketches — the 100 TB substitutes for exact distinct/
    quantile: approx_count_distinct (HyperLogLog++) and percentile_approx.
    Deterministic for a fixed input/partitioning but not portable across
    engines, hence no SQL oracle."""
    li = load_tables(spark, sf_dir).lineitem
    # error knobs made EXPLICIT so the bounds are checkable claims
    # (tests/test_sketches.py sweeps them): HLL++ rsd 5%, KLL-style
    # percentile rank error 1/10000
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.05).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias(
            "approx_median_price"
        ),
    )


@query(
    "op_sketch_certification",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(l_extendedprice)    AS n_rows,
           CAST(1 AS BIGINT) AS hll_ok,
           CAST(1 AS BIGINT) AS rank_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def op_sketch_certification(spark, sf_dir):
    """The approximate sketches made fully driver-checkable (r15 —
    VERDICT r14 missing-item #5): `op_approx_sketches` itself is
    rows-only because HLL++/KLL internals are engine-specific, but the
    sketches' ERROR CONTRACTS are exact integers both engines can agree
    on. Per group this emits the exact distinct count and row count
    (oracle-pinned values) plus two bound flags the oracle pins to 1:

      hll_ok  — |approx_count_distinct(rsd=5%) − exact| within 4σ:
                5·|d| ≤ max(20, exact)  (the envelope
                tests/test_sketches.py sweeps; a sketch regression
                flips the flag to 0 and hash-mismatches the driver row)
      rank_ok — percentile_approx(0.5, acc=10000)'s returned value has
                exact rank within n/acc + 1 of the true median rank:
                10000·|2·rank − n| ≤ 2·n + 20000

    All arithmetic is integer (the 4·rsd = 1/5 and 1/acc bounds are
    exact rationals), so the row is hash-stable. Scale shape: two
    grouped aggregates over the fact table plus one rank pass with the
    |groups|-row sketch frame broadcast back — bounded by group count,
    never corpus size; nothing quadratic."""
    li = load_tables(spark, sf_dir).lineitem
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.05).alias("approx_parts"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(10000)
        ).alias("amed"),
    )
    rank = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                (F.col("l_extendedprice") <= F.col("amed")).cast("long")
            ).alias("n_le"),
            F.count("l_extendedprice").alias("n_rows"),
            F.first("approx_parts").alias("approx_parts"),
        )
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts")
    )
    return exact.join(rank, "l_returnflag").select(
        "l_returnflag",
        "n_parts",
        "n_rows",
        (
            F.abs(F.col("approx_parts") - F.col("n_parts")) * 5
            <= F.greatest(F.lit(20), F.col("n_parts"))
        )
        .cast("long")
        .alias("hll_ok"),
        (
            F.abs(2 * F.col("n_le") - F.col("n_rows")) * 10000
            <= 2 * F.col("n_rows") + 20000
        )
        .cast("long")
        .alias("rank_ok"),
    )


@query(
    "op_set_ops",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def op_set_ops(spark, sf_dir):
    """Set operation (INTERSECT; the grammar has no UNION/INTERSECT/EXCEPT
    at all, SURVEY §2.8): nation keys having both customers and
    suppliers."""
    t = load_tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("k")).intersect(
        t.supplier.select(F.col("s_nationkey").alias("k"))
    )


@query(
    "op_except",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def op_except(spark, sf_dir):
    """EXCEPT: nations with customers but no suppliers."""
    t = load_tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("k")).subtract(
        t.supplier.select(F.col("s_nationkey").alias("k"))
    )


@query(
    "op_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def op_topk_per_group(spark, sf_dir):
    """Top-3 orders by value per priority: row_number window + filter.
    One shuffle on the partition key; the unique o_orderkey tiebreak makes
    the result deterministic."""
    o = load_tables(spark, sf_dir).orders
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@query(
    "op_pivot",
    oracle="""
    SELECT l_returnflag,
           (CAST(CAST(SUM(CAST(round(l_quantity*100) AS BIGINT) // 100)
                      FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS DOUBLE)
            + CAST(CAST(SUM(CAST(round(l_quantity*100) AS BIGINT) % 100)
                        FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS DOUBLE)
              / 100.0) AS O,
           (CAST(CAST(SUM(CAST(round(l_quantity*100) AS BIGINT) // 100)
                      FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS DOUBLE)
            + CAST(CAST(SUM(CAST(round(l_quantity*100) AS BIGINT) % 100)
                        FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS DOUBLE)
              / 100.0) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def op_pivot(spark, sf_dir):
    """Pivot l_linestatus into columns (FILTERed aggregates are the ANSI
    equivalent — NULL for empty cells in both engines)."""
    li = load_tables(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )


@query(
    "op_unpivot",
    oracle="""
    SELECT o_orderkey, measure, value FROM (
        SELECT o_orderkey, 'totalprice' AS measure,
               CAST(o_totalprice AS DOUBLE) AS value FROM orders
        UNION ALL
        SELECT o_orderkey, 'custkey' AS measure,
               CAST(o_custkey AS DOUBLE) AS value FROM orders
    )
    """,
)
def op_unpivot(spark, sf_dir):
    """UNPIVOT/melt — the inverse of `op_pivot`, completing the
    reshaping pair (SURVEY §2.5 additive; neither exists in the
    reference grammar): wide measure columns become (measure, value)
    rows via Spark's native `unpivot` (the UNPIVOT relational operator,
    compiled to an Expand node — one map-side pass, NO shuffle and no
    per-row Python). The oracle states the same relation as the ANSI
    UNION ALL expansion, which DuckDB's UNPIVOT also desugars to.
    Scale: Expand multiplies rows map-side by the measure count; at
    100 TB this is the standard long-format feature extraction whose
    cost is output IO, not compute — nothing shuffles."""
    o = load_tables(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "op_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt, {sql_dsum('l_quantity')} AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def op_cube(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass (the reference has no grouping sets, SURVEY §2.5). Spark expands
    the cube before the shuffle, so it's still a single aggregation."""
    li = load_tables(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("l_quantity").alias("qty")
    )


@query(
    "op_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt, {sql_dsum('l_quantity')} AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def op_rollup(spark, sf_dir):
    """ROLLUP over (returnflag, linestatus): the hierarchical prefix of
    CUBE's grouping sets — (flag, status), (flag), () — completing the
    grouping-sets family beside ``op_cube`` and ``op_pivot`` (the
    reference has none, SURVEY §2.5). Same single-aggregation shape: Spark
    expands the 3 sets before the shuffle, partial aggregation intact."""
    li = load_tables(spark, sf_dir).lineitem
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("l_quantity").alias("qty")
    )


@query(
    "op_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt, {sql_dsum('l_extendedprice')} AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
    """,
)
def op_grouping_sets(spark, sf_dir):
    """Arbitrary GROUPING SETS — the general form rollup and cube are
    prefixes of (here: the pair, each single key, but NOT the grand
    total — a set no rollup/cube can express), completing the
    grouping-sets family beside ``op_cube`` and ``op_rollup``. Spark's
    `groupingSets` expands the 3 sets before the shuffle, so partial
    aggregation is intact and it remains a single aggregation pass."""
    li = load_tables(spark, sf_dir).lineitem
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"]],
        "l_returnflag",
        "l_linestatus",
    ).agg(F.count(F.lit(1)).alias("cnt"), dsum("l_extendedprice").alias("revenue"))


@query(
    "op_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT)
               AS order_seq
    FROM orders
    """,
)
def op_window_running_sum(spark, sf_dir):
    """Cumulative window aggregation (no windows exist in the reference at
    all, SURVEY §2.6): running spend per customer in order-date order.
    The window's (o_orderdate, o_orderkey) total order plus exact-decimal
    summation makes every prefix sum bit-identical to the oracle. One
    shuffle on o_custkey; within partitions this is a sorted streaming
    scan."""
    o = load_tables(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@query(
    "op_window_zscore",
    oracle="""
    WITH stats AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
               CAST(SUM(FLOOR(CAST(o_totalprice AS DECIMAL(18,2))
                              * CAST(o_totalprice AS DECIMAL(18,2)))) AS DOUBLE) AS ssq,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, o.o_orderpriority,
           ((o_totalprice - s / n)
            / sqrt((ssq - s * s / n) / (n - 1))) AS zscore
    FROM orders o JOIN stats ON o.o_orderpriority = stats.o_orderpriority
    """,
)
def op_window_zscore(spark, sf_dir):
    """Per-group standardization (z-score), the normalize-per-group pattern
    of feature pipelines. Mean and variance are derived from exact-decimal
    SUM and SUM-of-squares (order-independent), then the float arithmetic
    is the same expression tree in both engines — bit-identical zscores.
    Implemented as aggregate + broadcast join-back rather than two window
    passes: one shuffle instead of a per-row window state.

    Subtlety: each square is integerized with FLOOR before summing — two
    portability traps found the hard way: (a) a scale-4 sum of squares
    overflows 2^53 in its scaled representation, where DuckDB's
    decimal→double cast double-rounds while Spark's BigDecimal rounds
    once; (b) decimal *scale reduction* itself disagrees — Spark CAST
    rounds half-up, DuckDB CAST truncates. FLOOR is identical in both for
    the non-negative squares."""
    o = load_tables(spark, sf_dir).orders
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    stats = o.groupBy("o_orderpriority").agg(
        F.sum(dec).cast("double").alias("s"),
        F.sum(F.floor(dec * dec)).cast("double").alias("ssq"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = o.join(F.broadcast(stats), "o_orderpriority")
    mean = F.col("s") / F.col("n")
    var = (F.col("ssq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    return joined.select(
        "o_orderkey",
        "o_orderpriority",
        ((F.col("o_totalprice") - mean) / F.sqrt(var)).alias("zscore"),
    )


@query(
    "op_union",
    oracle="""
    SELECT k, src FROM (
        SELECT c_nationkey AS k, 'cust' AS src FROM customer
        UNION
        SELECT s_nationkey AS k, 'supp' AS src FROM supplier
    )
    """,
)
def op_union(spark, sf_dir):
    """UNION (distinct) of two sources with a provenance tag — the
    reference's grammar has no UNION at all (SURVEY §2.8)."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("k"), F.lit("cust").alias("src"))
        .unionByName(
            t.supplier.select(F.col("s_nationkey").alias("k"), F.lit("supp").alias("src"))
        )
        .distinct()
    )


@query(
    "op_window_time_range",
    oracle="""
    SELECT event_id, user_id,
           date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
               // 1000000 AS esec,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_1h
    FROM events
    WINDOW w AS (
        PARTITION BY user_id
        ORDER BY date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
                     // 1000000
        RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
)
def op_window_time_range(spark, sf_dir):
    """Time-interval (RANGE-frame) window aggregation: per event, the
    count and value-sum of the SAME USER's events in the trailing hour —
    the rate-limit / rolling-exposure query every event pipeline runs.
    Distinct from ``op_window_running_sum``'s ROWS frame: the frame
    boundary is a TIME offset, so same-timestamp ties are all included
    and gaps shrink the frame, which a row-count frame can't express.

    Cross-engine exactness: the ordering key is integer epoch seconds
    derived from the exact integer MICROSECOND difference to a naive
    epoch anchor (``timestampdiff(MICROSECOND, ...) div 1e6`` == DuckDB
    ``date_diff('microsecond', ...) // 1e6``) — timezone-free on the
    TIMESTAMP_NTZ column (a session-zone ``unix_micros`` cast would tie
    results to the driver's TZ), no float epoch, no rounding hazard —
    and the sliding sum runs in DECIMAL(18,2), so Spark's frame
    re-evaluation and DuckDB's segment tree associate differently but
    produce the identical exact total (the same trade
    ``op_window_running_sum`` documents; a DOUBLE sliding sum would
    hash-diverge on retraction rounding).

    Scale shape: ONE shuffle on user_id; within each partition a sorted
    streaming pass with a two-pointer frame. Range frames keep state
    bounded by the frame's row count (here: a user's events per hour),
    never the partition."""
    e = load_tables(spark, sf_dir).events
    esec = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        " div 1000000"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(esec)
        .rangeBetween(-3599, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        esec.alias("esec"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("v_1h"),
    )


@query(
    "op_window_rank_family",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS prio,
           CAST(month(o_orderdate) AS BIGINT) AS mth,
           CAST(rank() OVER wt AS BIGINT) AS rnk,
           CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
           percent_rank() OVER wt AS prnk,
           cume_dist() OVER wt AS cd,
           CAST(row_number() OVER wo AS BIGINT) AS rn,
           lag(o_orderkey) OVER wo AS prev_key,
           lead(o_orderkey) OVER wo AS next_key,
           first_value(o_orderkey) OVER wo AS first_key,
           CAST(ntile(4) OVER wo AS BIGINT) AS quartile,
           nth_value(o_orderkey, 3) OVER wo AS third_key
    FROM orders
    WINDOW wt AS (PARTITION BY o_orderpriority
                  ORDER BY month(o_orderdate)),
           wo AS (PARTITION BY o_orderpriority
                  ORDER BY month(o_orderdate), o_orderkey)
    """,
)
def op_window_rank_family(spark, sf_dir):
    """The complete ranking/navigation window-function surface in one
    driver-gated query (SURVEY §2.6 — absent in the reference, additive):
    rank / dense_rank / percent_rank / cume_dist over a TIED ordering
    (month of order date — ties are the whole point: rank skips, dense
    doesn't, percent_rank/cume_dist are peer-group functions and stay
    deterministic under ties because they depend only on key values),
    plus row_number / lag / lead / first_value / ntile(4) / nth_value(3)
    over the TOTAL order with
    the key tiebreak (navigation functions are only deterministic on a
    total order — putting them on the tied window would be a
    nondeterminism bug, which is exactly what this split documents).
    percent_rank's (rank−1)/(n−1) is one double division of exact ints —
    IEEE-identical in both engines.

    Scale: one hash exchange on o_orderpriority; both windows share it
    (same partition key), so Spark plans a single sort covering the
    two frames."""
    t = load_tables(spark, sf_dir).orders
    mth = F.month("o_orderdate").cast("long")
    wt = Window.partitionBy("o_orderpriority").orderBy(mth)
    wo = Window.partitionBy("o_orderpriority").orderBy(mth, "o_orderkey")
    return t.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        mth.alias("mth"),
        F.rank().over(wt).cast("long").alias("rnk"),
        F.dense_rank().over(wt).cast("long").alias("drnk"),
        F.percent_rank().over(wt).alias("prnk"),
        F.cume_dist().over(wt).alias("cd"),
        F.row_number().over(wo).cast("long").alias("rn"),
        F.lag("o_orderkey").over(wo).alias("prev_key"),
        F.lead("o_orderkey").over(wo).alias("next_key"),
        F.first_value("o_orderkey").over(wo).alias("first_key"),
        F.ntile(4).over(wo).cast("long").alias("quartile"),
        F.nth_value("o_orderkey", 3).over(wo).alias("third_key"),
    )
