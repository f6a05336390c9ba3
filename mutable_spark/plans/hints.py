"""Physical-implementation pinning — the analog of the reference's
per-test physical selection (`test/_schema.yml` cli_args like
`--join-implementations SimpleHash`, and the physical-optimizer
registration flags `src/backend/WasmOperator.cpp:542-640`).

On Spark the corresponding levers are join strategy *hints* — Catalyst
honors them over its own cost choice — plus a conf scope for the knobs
that have no hint form. Used by plan-shape tests to assert that a pinned
strategy actually materializes, exactly like the reference's end2end tests
pin SimpleHash/SortMerge variants.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

#: Spark hint name per reference join implementation
JOIN_HINTS = {
    "SimpleHash": "shuffle_hash",      # WasmOperator.cpp SimpleHashJoin
    "SortMerge": "merge",              # SortMergeJoin
    "Broadcast": "broadcast",          # build-side broadcast hash join
    "NestedLoops": "shuffle_replicate_nl",  # NestedLoopsJoin
}


def pin_join(df: DataFrame, implementation: str) -> DataFrame:
    """Pin the join strategy used when ``df`` is the build/probe side of a
    subsequent join (reference names accepted)."""
    hint = JOIN_HINTS.get(implementation, implementation)
    return df.hint(hint)


@contextmanager
def conf_scope(spark: SparkSession, **confs: str):
    """Temporarily set SQL confs (the per-test `cli_args` analog):

    >>> with conf_scope(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
    ...     df.collect()   # no broadcast joins in this scope
    """
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, str(v))
    try:
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
