"""Result sinks — the reference's three root operators (SURVEY §2.1):

- PrintOperator  (`include/mutable/IR/Operator.hpp:222-234`): prints
  CSV-ish rows to an ostream.
- CallbackOperator (`Operator.hpp:201-219`): invokes a callback per result
  tuple.
- NoOpOperator   (`Operator.hpp:237-249`): counts result tuples only
  (benchmarking sink).

On Spark these are driver-side terminal actions over a DataFrame. The
print format follows the reference's literal conventions: NULL prints as
"NULL", strings are double-quoted, booleans are TRUE/FALSE, dates/datetimes
print as d'YYYY-MM-DD[ HH:MM:SS]' (the dialect's literal syntax), floats
use repr-shortest form.

``to_local_iterator`` is the scale-safe callback path: it streams
partitions to the driver one at a time instead of materializing the whole
result (`collect`), which is what you want when the result itself is big.
"""

from __future__ import annotations

import datetime as dt
import sys
from collections.abc import Callable, Iterator
from typing import IO

from pyspark.sql import DataFrame, Row


def format_value(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return f'"{v}"'
    if isinstance(v, dt.datetime):
        return f"d'{v:%Y-%m-%d %H:%M:%S}'"
    if isinstance(v, dt.date):
        return f"d'{v:%Y-%m-%d}'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def print_result(df: DataFrame, out: IO[str] = sys.stdout) -> int:
    """PrintOperator: stream rows to ``out``; returns the row count."""
    n = 0
    for row in df.toLocalIterator():
        out.write(",".join(format_value(v) for v in row) + "\n")
        n += 1
    return n


def callback_result(df: DataFrame, fn: Callable[[Row], None]) -> int:
    """CallbackOperator: invoke ``fn`` per result row (streamed)."""
    n = 0
    for row in df.toLocalIterator():
        fn(row)
        n += 1
    return n


def noop_result(df: DataFrame) -> int:
    """NoOpOperator: count only. On Spark this is *better* than the
    reference's version: `count()` prunes every column and aggregates
    partially per partition — no result materialization at all."""
    return df.count()


def iter_result(df: DataFrame) -> Iterator[Row]:
    """The embeddable API surface (`m::execute_query` with a caller
    consumer, `src/mutable.cpp:322-383`)."""
    return df.toLocalIterator()
