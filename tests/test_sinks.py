from __future__ import annotations

import datetime as dt
import io

from mutable_spark.plans.sinks import (
    callback_result,
    format_value,
    noop_result,
    print_result,
)


def test_format_values():
    assert format_value(None) == "NULL"
    assert format_value(True) == "TRUE"
    assert format_value("a\"b") == '"a"b"'
    assert format_value(1.5) == "1.5"
    assert format_value(6.0) == "6"  # C++ to_chars: integral double, no .0
    assert format_value(0.7879999876022339, is_float32=True) == "0.78799999"  # %.8g
    assert format_value(dt.date(1996, 1, 2)) == "1996-01-02"
    assert format_value(dt.datetime(1996, 1, 2, 3, 4, 5)) == "1996-01-02 03:04:05"
    assert format_value(42) == "42"


def test_sinks_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.25), (2, None, None)], "a int, b string, c double"
    )
    buf = io.StringIO()
    n = print_result(df.orderBy("a"), buf)
    assert n == 2
    assert buf.getvalue() == '1,"x",1.25\n2,NULL,NULL\n'

    seen = []
    assert callback_result(df.orderBy("a"), seen.append) == 2
    assert seen[0].a == 1

    assert noop_result(df) == 2
