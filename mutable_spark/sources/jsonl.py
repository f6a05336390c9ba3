"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM training corpora (raw crawls, instruction sets, and eval suites all
ship as .jsonl[.gz]).

The reference has no JSON I/O at all (DSV is its only format,
`src/io/DSVReader.cpp` — SURVEY §2.2), so this module is additive
capability on the training-data-pipeline axis, built on Spark's native
json datasource:

- **Schema is always explicit, never inferred.** Schema inference is a
  full extra pass over the data — at 100 TB that is a second job before
  the first real one. Corpus schemas are known (they are this repo's
  table contracts), so readers take a StructType.
- **Malformed lines are quarantined, not fatal.** A web-scale corpus
  always contains truncated/garbled lines. PERMISSIVE mode routes them
  to a `_corrupt_record` column so the pipeline can count and sample
  them (the `bad` frame below); DROPMALFORMED silently loses the
  evidence and FAILFAST kills a 100 TB job for one bad line.
- **Round-trip is exact for the corpus types.** documents columns are
  BIGINT/STRING — JSON-safe. Spark writes one .json part per partition,
  so the sink parallelism is the frame's partitioning (the same knob as
  every other writer here).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

#: the documents table contract (catalog.load_table normalizes parquet to
#: exactly these types, so a JSONL round-trip is type-stable)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a frame as JSONL: one JSON object per line, one part file per
    partition (repartition/coalesce upstream to size output files; a
    100 TB export targets ~1 GB parts, same rule as the parquet
    writers)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL dataset with an explicit schema. Returns
    ``(good, bad)``: ``good`` holds the schema columns for parseable
    lines; ``bad`` holds the raw text of quarantined lines (parse
    failures — truncation, type mismatch, bare garbage), for the
    count-and-sample step a real ingest runs before trusting a crawl.

    Both views parse via the text datasource + ``from_json`` rather than
    the raw json datasource: Spark forbids plans whose only reference
    into a raw json scan is the internal corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — and column
    pruning makes even ``good.count()`` such a plan; the documented
    workaround is caching the whole relation, which at 100 TB is not an
    option). text + from_json is the same Jackson parse with no such
    restriction, still line-splittable and codec-aware."""
    corrupt = T.StructField("_corrupt_record", T.StringType())
    full_schema = T.StructType(list(schema.fields) + [corrupt])
    parsed = F.from_json(
        F.col("value"),
        full_schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    raw = spark.read.text(path).select("value", parsed.alias("j"))
    good = raw.filter(F.col("j._corrupt_record").isNull()).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = raw.filter(F.col("j._corrupt_record").isNotNull()).select(
        F.col("value").alias("line")
    )
    return good, bad
