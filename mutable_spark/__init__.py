"""mutable_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mutable-org/mutable (reference surveyed in
SURVEY.md), re-expressed Spark-first, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layers
------
- ``session``    : tuned SparkSession factory (AQE, shuffle partitions, Arrow).
- ``catalog``    : load the driver testdata tables with type normalization.
- ``relational`` : the reference's relational operator surface (SURVEY §2)
                   expressed as DataFrame builders with DuckDB oracle SQL.
- ``ops``        : beyond-reference pipeline operators (dedup / similarity /
                   text / multimodal).
- ``streaming``  : Structured Streaming variants of the event-table ops.
- ``sources``    : DSV (CSV) import with the reference's IMPORT semantics.
- ``dialect``    : lexer/parser/sema for mutable's SQL dialect, compiled to
                   DataFrames (the parity frontend).

Everything here is built on public PySpark APIs only.
"""

from mutable_spark.registry import QUERIES, ORACLES, query  # noqa: F401

__version__ = "0.1.0"
