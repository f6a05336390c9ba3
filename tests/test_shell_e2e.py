"""End-to-end shell smoke: the actual `python -m mutable_spark.shell`
process driven over stdin (the reference's IntegrationTest.py drives its
shell binary the same way). One subprocess, several statements."""

from __future__ import annotations

import subprocess
import sys


def test_shell_stdin_roundtrip():
    script = (
        "CREATE DATABASE d;\n"
        "USE d;\n"
        "CREATE TABLE r (key INT(4) PRIMARY KEY, name CHAR(10));\n"
        'INSERT INTO r VALUES (1, "a"), (2, "b");\n'
        "SELECT key + 10 AS k FROM r WHERE key < 2;\n"
        ".tables\n"
        ".quit\n"
    )
    out = subprocess.run(
        [sys.executable, "-m", "mutable_spark.shell"],
        input=script,
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "11" in out.stdout          # the SELECT result
    assert "(1 rows)" in out.stdout
    assert "r" in out.stdout           # .tables listing
