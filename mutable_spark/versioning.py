"""Multi-versioning tables: MVCC-style hidden timestamp columns with
snapshot reads — the reference's `MultiVersioningTable`
(`include/mutable/catalog/Schema.hpp:813`: "a `Table` with additional
invisible timestamp attributes"; `src/catalog/DatabaseCommand.cpp:140-186`
stamps INSERT tuples with the transaction start time into hidden
``$ts_begin`` and ``-1`` (= infinity) into ``$ts_end``; its
UpdateRecords/DeleteRecords are declared but `M_unreachable`).

Spark re-expression: DataFrames are immutable, so versioning is
*copy-on-write* — every write returns a new logical table value; nothing
is mutated in place. That is exactly how a 100 TB lakehouse implements
MVCC (Delta/Iceberg snapshots): version metadata travels with the rows,
and a snapshot read is a plain filter the optimizer pushes into the scan
(zone maps / file stats prune old-version files for free). The hidden
columns use the reference's names; ``snapshot()`` strips them, so they
are invisible to queries exactly like the reference's hidden attributes
(excluded from ``SELECT *``).

Visibility rule: a row version is visible at time ``t`` iff
``$ts_begin <= t AND ($ts_end == -1 OR t < $ts_end)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from mutable_spark.catalog import load_tables
from mutable_spark.functions import dsum, sql_dsum
from mutable_spark.registry import query

TS_BEGIN, TS_END = "$ts_begin", "$ts_end"
INFINITY = -1  # the reference's special $ts_end value for "current"


class MultiVersioningTable:
    """A versioned logical table. All writes are copy-on-write: they
    return a NEW ``MultiVersioningTable``; the receiver is unchanged.

    ``df`` holds the payload columns plus the two hidden timestamp
    columns; each write stamps the given transaction time.
    """

    def __init__(self, df: DataFrame, *, _raw: bool = False, time: int = 0):
        if _raw:
            self.df = df
        else:
            self.df = df.select(
                "*",
                F.lit(int(time)).alias(TS_BEGIN),
                F.lit(INFINITY).alias(TS_END),
            )

    # -- hidden-attribute surface ------------------------------------------
    @property
    def columns(self) -> list[str]:
        """Visible columns only — the hidden timestamps are excluded, like
        the reference's hidden attributes are from ``SELECT *``."""
        return [c for c in self.df.columns if c not in (TS_BEGIN, TS_END)]

    def _visible_at(self, time: int):
        t = F.lit(int(time))
        return (F.col(TS_BEGIN) <= t) & (
            (F.col(TS_END) == INFINITY) | (t < F.col(TS_END))
        )

    # -- reads --------------------------------------------------------------
    def snapshot(self, time: int) -> DataFrame:
        """The table as of transaction time ``time`` — a filter + hidden
        column projection; at scale both push into the parquet scan."""
        return self.df.filter(self._visible_at(time)).select(*self.columns)

    def current(self) -> DataFrame:
        """Rows whose version is still open ($ts_end = -1)."""
        return self.df.filter(F.col(TS_END) == INFINITY).select(*self.columns)

    # -- writes (copy-on-write) ---------------------------------------------
    def insert(self, rows: DataFrame, time: int) -> "MultiVersioningTable":
        """INSERT at transaction time ``time`` (DatabaseCommand.cpp:174-180:
        $ts_begin = start time, $ts_end = -1)."""
        stamped = rows.select(
            *self.columns,
            F.lit(int(time)).alias(TS_BEGIN),
            F.lit(INFINITY).alias(TS_END),
        )
        return MultiVersioningTable(self.df.unionByName(stamped), _raw=True)

    def delete(self, predicate, time: int) -> "MultiVersioningTable":
        """DELETE WHERE predicate at time ``time``: open matching versions
        get $ts_end = time (they stay visible to older snapshots). The
        reference declares DeleteRecords but leaves it unimplemented —
        this completes the semantics its hidden columns exist for."""
        open_match = (F.col(TS_END) == INFINITY) & predicate
        return MultiVersioningTable(
            self.df.withColumn(
                TS_END,
                F.when(open_match, F.lit(int(time))).otherwise(F.col(TS_END)),
            ),
            _raw=True,
        )

    def update(self, predicate, assignments: dict, time: int) -> "MultiVersioningTable":
        """UPDATE ... SET assignments WHERE predicate at time ``time`` —
        MVCC update = close the old version + open a new one, both at
        ``time``, so time-travel sees exactly one version either side."""
        open_match = (F.col(TS_END) == INFINITY) & predicate
        closed = self.df.withColumn(
            TS_END,
            F.when(open_match, F.lit(int(time))).otherwise(F.col(TS_END)),
        )
        fresh = self.df.filter(open_match).select(
            *[
                assignments[c].alias(c) if c in assignments else F.col(c)
                for c in self.columns
            ],
            F.lit(int(time)).alias(TS_BEGIN),
            F.lit(INFINITY).alias(TS_END),
        )
        return MultiVersioningTable(closed.unionByName(fresh), _raw=True)


# --------------------------------------------------------------------------
@query(
    "op_mvcc_snapshot",
    oracle=f"""
    SELECT 0 AS t, COUNT(*) AS cnt, {sql_dsum("o_totalprice")} AS total
    FROM orders
    UNION ALL
    SELECT 1 AS t, COUNT(*) AS cnt, {sql_dsum("o_totalprice")} AS total
    FROM orders WHERE o_orderstatus <> 'F'
    UNION ALL
    SELECT 2 AS t, COUNT(*) AS cnt,
           {sql_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 10.0 ELSE o_totalprice END")} AS total
    FROM orders WHERE o_orderstatus <> 'F'
    """,
)
def op_mvcc_snapshot(spark, sf_dir):
    """Time-travel over a versioned orders table: load at t=0, DELETE the
    'F'-status rows at t=1, UPDATE urgent orders (+10.0, exact in double
    for 2-decimal money) at t=2 — then read snapshots at t=0/1/2. The
    oracle reconstructs each snapshot's visible row set declaratively,
    proving begin/end-timestamp visibility end-to-end."""
    orders = load_tables(spark, sf_dir).orders
    mvt = MultiVersioningTable(orders, time=0)
    mvt = mvt.delete(F.col("o_orderstatus") == "F", time=1)
    mvt = mvt.update(
        F.col("o_orderpriority") == "1-URGENT",
        {"o_totalprice": F.col("o_totalprice") + F.lit(10.0)},
        time=2,
    )
    # NOT cached (r12 scan audit follow-up): the three snapshot reads do
    # replay the delete→update chain (4 orders scans), but each replay is
    # COLUMN-PRUNED to the 3 columns the chain touches — measured A/B at
    # sf0.1: caching the full-width versioned relation costs 0.67 s vs
    # 0.46 s for the pruned replays. Same call at 100 TB: a versioned
    # STORE materializes versions as written storage (a sink concern);
    # a versioned QUERY over immutable parquet is cheapest replaying
    # pruned scans.

    def agg_at(t: int) -> DataFrame:
        return (
            mvt.snapshot(t)
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                dsum("o_totalprice").alias("total"),
            )
            .select(F.lit(t).alias("t"), "cnt", "total")
        )

    return agg_at(0).unionByName(agg_at(1)).unionByName(agg_at(2))
