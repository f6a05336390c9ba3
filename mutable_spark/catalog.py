"""Table loading + type normalization for the driver testdata.

Mirrors the reference's catalog role (`include/mutable/catalog/Schema.hpp:869`
Database→Table→Attribute) at the granularity Spark needs: named DataFrames
with normalized column types. Physical-layout concerns (Row/PAX/Column stores,
`src/storage/*Store.cpp`) have no semantic content on Spark — parquet is
already PAX-like — so they intentionally do not appear here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from mutable_spark.session import apply_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: (session id, sf_dir, table) → DataFrame. Re-reading parquet footers and
#: re-deriving the frame per query costs ~100 ms each on local runs; the
#: logical plan is immutable so sharing it is free.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with engine type normalization.

    - ``events.ts`` arrives as INT64 TIMESTAMP(NANOS) (Spark can't read it
      natively; `spark.sql.legacy.parquet.nanosAsLong` is set by
      ``apply_runtime_confs``). Convert nanos → TIMESTAMP_NTZ via exact
      integer division, matching DuckDB's ns→µs truncation.
    """
    apply_runtime_confs(spark)
    # applicationId (not id(spark)): a stopped session's address can be
    # reused by a new one, which would serve dead plans from the cache
    try:
        app = spark.sparkContext.applicationId
    except Exception:
        app = id(spark)
    key = (app, sf_dir.rstrip("/"), name)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """All testdata tables as attributes: ``t.lineitem``, ``t.orders``, …"""
    return SimpleNamespace(
        **{name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
    )


@dataclass
class Catalog:
    """Minimal multi-database catalog in the reference's shape
    (`Schema.hpp:869` Database / `Schema.hpp:387` Table): names → DataFrames,
    plus declared constraints that Spark does not enforce (the reference
    parses but does not enforce CHECK either, `src/mutable.cpp:238-256`)."""

    spark: SparkSession
    databases: dict[str, dict[str, DataFrame]] = field(default_factory=dict)
    #: per-database index metadata: db → index name → (table, attribute).
    #: Indexes are catalog objects with full existence/typing sema
    #: (`Sema.cpp:1611` CreateIndexStmt) but no physical structure — Spark
    #: has no secondary indexes; parquet min/max + predicate pushdown play
    #: that role (SURVEY §2.2).
    indexes: dict[str, dict[str, tuple[str, str]]] = field(default_factory=dict)
    current: str | None = None

    def create_database(self, name: str) -> None:
        if name in self.databases:
            raise ValueError(f"database {name!r} already exists")
        self.databases[name] = {}
        self.indexes[name] = {}

    def drop_database(self, name: str) -> None:
        if name not in self.databases:
            raise ValueError(f"database {name!r} does not exist")
        del self.databases[name]
        self.indexes.pop(name, None)
        if self.current == name:
            self.current = None

    def use(self, name: str) -> None:
        if name not in self.databases:
            raise ValueError(f"database {name!r} does not exist")
        self.current = name

    def _db(self) -> dict[str, DataFrame]:
        if self.current is None:
            raise ValueError("no database selected")
        return self.databases[self.current]

    def create_table(self, name: str, df: DataFrame) -> None:
        db = self._db()
        if name in db:
            raise ValueError(f"table {name!r} already exists")
        db[name] = df

    def drop_table(self, name: str) -> None:
        db = self._db()
        if name not in db:
            raise ValueError(f"table {name!r} does not exist")
        del db[name]
        idx = self.indexes.setdefault(self.current, {})
        for iname in [i for i, (t, _) in idx.items() if t == name]:
            del idx[iname]

    def db_indexes(self) -> dict[str, tuple[str, str]]:
        if self.current is None:
            raise ValueError("no database selected")
        return self.indexes.setdefault(self.current, {})

    def table(self, name: str) -> DataFrame:
        db = self._db()
        if name not in db:
            raise ValueError(f"table {name!r} does not exist")
        return db[name]
