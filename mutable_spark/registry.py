"""Query registry: every implemented operator/query from SURVEY.md §2 (and the
beyond-reference ops) registers a DataFrame builder and, where the semantics
are ANSI-SQL-expressible, a DuckDB oracle SQL string.

The driver contract (``__spark_entry__.py``) simply re-exports these dicts.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is equivalent DuckDB SQL.

    Pass ``oracle=None`` only for genuinely non-SQL-expressible operators
    (probabilistic LSH candidate generation, iterative algorithms); the driver
    then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name {name!r}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import mutable_spark.plans.queries  # noqa: F401
    import mutable_spark.plans.tpch  # noqa: F401
    import mutable_spark.plans.dialect_queries  # noqa: F401
    import mutable_spark.plans.dialect_tpch  # noqa: F401
    import mutable_spark.operators.dedup  # noqa: F401
    import mutable_spark.operators.similarity  # noqa: F401
    import mutable_spark.operators.text  # noqa: F401
    import mutable_spark.operators.multimodal  # noqa: F401
    import mutable_spark.operators.events  # noqa: F401
    import mutable_spark.operators.joins_ext  # noqa: F401
    import mutable_spark.operators.analytics  # noqa: F401
    import mutable_spark.operators.pipeline  # noqa: F401
