"""sources/binary.py: the binaryFile ingestion surface detects exactly
the object-level failures it exists to catch."""

from __future__ import annotations

import pyspark.sql.functions as F

from mutable_spark.sources.binary import MAGIC, read_binary_dir


def test_corrupt_and_truncated_objects_flagged(spark, tmp_path):
    """A wrong-magic object and a truncated-header object read back with
    magic_ok = 0; the intact object reads magic_ok = 1 with the exact
    byte length — corruption surfaces per row, never silently."""
    (tmp_path / "doc_1.bin").write_bytes(MAGIC + b"payload")
    (tmp_path / "doc_2.bin").write_bytes(b"\x00BAD" + b"payload")
    (tmp_path / "doc_3.bin").write_bytes(MAGIC[:2])  # truncated header
    hexed = F.hex(F.col("content"))
    magic_hex = MAGIC.hex().upper()
    rows = {
        r.doc_id: r
        for r in read_binary_dir(spark, str(tmp_path))
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
            .cast("long")
            .alias("doc_id"),
            "length",
            (F.substring(hexed, 1, len(magic_hex)) == F.lit(magic_hex))
            .cast("long")
            .alias("magic_ok"),
        )
        .collect()
    }
    assert rows[1].magic_ok == 1 and rows[1].length == len(MAGIC) + 7
    assert rows[2].magic_ok == 0
    assert rows[3].magic_ok == 0 and rows[3].length == 2


def test_glob_prunes_non_matching_objects(spark, tmp_path):
    """pathGlobFilter prunes at LISTING time: a non-.bin object in the
    same prefix is never read (at 100 TB of media this is the line
    between one job and a full-store walk)."""
    (tmp_path / "doc_1.bin").write_bytes(MAGIC + b"x")
    (tmp_path / "junk.tmp").write_bytes(b"\xff" * 1024)
    got = read_binary_dir(spark, str(tmp_path)).collect()
    assert len(got) == 1 and got[0].path.endswith("doc_1.bin")
