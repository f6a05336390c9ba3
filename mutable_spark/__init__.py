"""mutable_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mutable-org/mutable (reference surveyed in
SURVEY.md), re-expressed Spark-first, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layers
------
- ``session``    : tuned SparkSession factory (AQE, shuffle partitions, Arrow).
- ``catalog``    : load the driver testdata tables with type normalization.
- ``plans``      : the reference's relational operator surface (SURVEY §2)
                   expressed as DataFrame builders with DuckDB oracle SQL,
                   plus the 13 plan enumerators, heuristic search, and the
                   SPN cardinality estimator.
- ``operators``  : beyond-reference pipeline operators (dedup / similarity /
                   text / events / multimodal / pipeline compositions).
- ``streaming``  : Structured Streaming twins of the event-table ops.
- ``sources``    : DSV (CSV) import with the reference's IMPORT semantics,
                   learned indexes (ArrayIndex/RMI/ZoneIndex), bucketing.
- ``dialect``    : lexer/parser/sema for mutable's SQL dialect, compiled to
                   DataFrames (the parity frontend); ``dialect.Engine`` is
                   the statement-level session (DDL/DML/IMPORT/SELECT).
- ``versioning`` : MVCC MultiVersioningTable with snapshot reads.
- ``shell``      : the REPL (`python -m mutable_spark.shell`).

Everything here is built on public PySpark APIs only.

Typical library use::

    from mutable_spark import get_spark
    from mutable_spark.dialect import Engine

    spark = get_spark()
    eng = Engine(spark)
    eng.execute("CREATE DATABASE d"); eng.execute("USE d")
    df = eng.execute("SELECT 1 + 1 AS two")
"""

from mutable_spark.registry import QUERIES, ORACLES, query  # noqa: F401
from mutable_spark.session import get_spark, apply_runtime_confs  # noqa: F401

__version__ = "0.1.0"
