"""DSV (delimiter-separated values) import with the reference's IMPORT
semantics.

Reference surface: `IMPORT INTO t DSV "file" [ROWS n] [DELIMITER c]
[ESCAPE c] [QUOTE c] [HAS HEADER] [SKIP HEADER]` — grammar
`doc/syntax-grammar.md` import-statement; reader `src/io/DSVReader.cpp:23-40`;
CLI wiring `src/mutable.cpp:263-292`. DSV is the reference's *only* I/O
format; on Spark this maps to the csv datasource with an explicit schema
(never inference — mutable schemas are declared, SURVEY §1.3).

Scale note: spark.read.csv parallelizes over file splits; ROWS n becomes a
limit, which Spark evaluates with an early-stop scan (LocalLimit), not a
full read.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

from mutable_spark.dialect import ast_nodes as A


def read_dsv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = "\\",
    header: bool = False,
    rows: int | None = None,
) -> DataFrame:
    df = (
        spark.read.schema(schema)
        .option("sep", delimiter)
        .option("quote", quote)
        .option("escape", escape)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    if rows is not None:
        df = df.limit(rows)
    return df


#: IMPORT-to-store staging. The reference's IMPORT copies the DSV into the
#: engine's own store layout (`src/mutable.cpp:263-292` appends to the
#: Store); queries never re-parse text. Our store layout is parquet: the
#: CSV parse runs once per (file identity, schema, options) and every
#: subsequent query scans splittable columnar files. Sources below the
#: threshold skip — for tiny fixtures the parse costs nothing and the
#: write would dominate.
_STAGE_DIR = Path(tempfile.gettempdir()) / "mutable_spark_import_stage"
_MATERIALIZE_MIN_BYTES = 4 * 1024 * 1024


def _source_files(path: str) -> list[Path]:
    p = Path(path)
    if p.is_dir():
        return sorted(f for f in p.iterdir() if f.is_file())
    return [p] if p.exists() else []


def materialize_import(
    spark: SparkSession, df: DataFrame, source_path: str, key_parts: str
) -> DataFrame:
    """Return a parquet-backed copy of the imported frame, built at most
    once per (source file identity, ``key_parts``) — the store-
    materialization step of IMPORT. Falls back to the CSV-backed frame for
    small sources or on any staging failure (materialization is a layout
    choice, never a correctness layer)."""
    files = _source_files(source_path)
    total = sum(f.stat().st_size for f in files)
    if not files or total < _MATERIALIZE_MIN_BYTES:
        return df
    h = hashlib.sha256()
    h.update(key_parts.encode())
    for f in files:
        st = f.stat()
        h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    dest = _STAGE_DIR / f"{Path(source_path).name}-{h.hexdigest()[:16]}"
    if not (dest / "_SUCCESS").exists():
        tmp = _STAGE_DIR / f".build-{dest.name}-{os.getpid()}"
        try:
            df.write.mode("overwrite").parquet(str(tmp))
            os.rename(tmp, dest)  # atomic: concurrent builders race, loser loses
        except Exception:
            shutil.rmtree(str(tmp), ignore_errors=True)
    if (dest / "_SUCCESS").exists():
        return spark.read.parquet(str(dest))
    return df


def import_dsv(spark: SparkSession, stmt: A.ImportDSVStmt, schema: T.StructType) -> DataFrame:
    """Execute an ImportDSVStmt: HAS HEADER and SKIP HEADER both consume
    the first line (with an explicit schema the header names are ignored,
    matching the reference where the declared table schema always wins)."""
    return read_dsv(
        spark,
        stmt.path,
        schema,
        delimiter=stmt.delimiter,
        quote=stmt.quote,
        escape=stmt.escape,
        header=stmt.has_header or stmt.skip_header,
        rows=stmt.rows,
    )
