"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``mutable_spark`` package; this module only
re-exports its registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mutable_spark import registry
from mutable_spark.session import apply_runtime_confs

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    apply_runtime_confs(spark)
    return registry.QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    beyond-reference pipeline operators). Each callable takes
    (spark, sf_dir) and returns a DataFrame."""

    def wrap(fn):
        def run(spark, sf_dir):
            apply_runtime_confs(spark)
            # queries are run sequentially by the driver; caches from a
            # previous query (LSH shingle/signature frames) are dead weight
            # by now — drop them so a 65-query session doesn't accumulate
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query.
    The one key absent here (op_approx_sketches: HLL/KLL sketch
    internals) is genuinely non-SQL-expressible → rows-only check, with
    accuracy pinned locally against exact answers in tests/test_sketches.py."""
    return dict(registry.ORACLES)
