"""mutable's SQL dialect, compiled to Spark DataFrames.

The reference pipeline is lex → parse → sema → QueryGraph → plan
(`src/mutable.cpp:67-95`); here the same dialect (grammar
`/root/reference/doc/syntax-grammar.md`) is lexed/parsed into a small AST,
type-checked with mutable's rules (`src/parse/Sema.cpp`), and compiled
directly to a DataFrame — Catalyst replaces the reference's QueryGraph
optimizer, plan enumerators, and Wasm backend entirely (SURVEY §3-4).

Public API:
    parse(sql)                      → ast.Stmt
    compile_select(stmt, tables)    → DataFrame
    Engine(spark).execute(sql)      → DataFrame | None  (full statement set)
"""

from mutable_spark.dialect.parser import parse  # noqa: F401
from mutable_spark.dialect.compiler import compile_select  # noqa: F401
from mutable_spark.dialect.engine import Engine  # noqa: F401
