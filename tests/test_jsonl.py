"""JSONL source/sink (`sources/jsonl.py`): exact round-trip of the
documents table, schema-explicit reads (no inference pass), and
quarantine — not loss, not job death — of malformed lines."""

from __future__ import annotations

from mutable_spark.catalog import load_tables
from mutable_spark.sources.jsonl import DOCUMENTS_SCHEMA, read_jsonl, write_jsonl
from tests.conftest import SF_DIR


def test_jsonl_round_trip_exact(spark, tmp_path):
    d = load_tables(spark, SF_DIR).documents
    path = str(tmp_path / "docs")
    write_jsonl(d, path)
    good, bad = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
    assert bad.count() == 0
    got = sorted(tuple(r) for r in good.collect())
    want = sorted(tuple(r) for r in d.collect())
    assert got == want
    assert good.columns == [f.name for f in DOCUMENTS_SCHEMA.fields]


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    """A type-mismatched object and a non-JSON line land in `bad` with
    their raw text; a valid line in the same file still parses into
    `good` — per-line isolation, the property a crawl ingest needs."""
    d = load_tables(spark, SF_DIR).documents
    path = str(tmp_path / "docs")
    write_jsonl(d, path)
    extra = tmp_path / "docs" / "zz-extra.json"
    extra.write_text(
        '{"doc_id": "not-a-number", "text": 3}\n'
        "totally not json\n"
        '{"doc_id": 999999, "text": "fine", "lang": "en",'
        ' "source": "srcX", "n_chars": 4}\n'
    )
    good, bad = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
    assert good.count() == d.count() + 1
    assert sorted(r.line for r in bad.collect()) == [
        "totally not json",
        '{"doc_id": "not-a-number", "text": 3}',
    ]
    assert good.filter("doc_id = 999999").count() == 1


def test_csv_round_trip_exact(spark, tmp_path):
    """Quoted-CSV write→read is bit-exact for the documents contract,
    including text containing the quote char, the delimiter, and unicode
    (the classic CSV mangling surfaces)."""
    import pyspark.sql.functions as F

    from mutable_spark.sources.jsonl import DOCUMENTS_SCHEMA

    rows = [
        (1, 'say "hi", ok', "en", "s1", 12),
        (2, "plain words only", "de", "s2", 16),
        (3, 'trailing quote"', "en", "s1", 15),
        (4, "unicode éß中", "fr", "s3", 10),
        (5, "", "en", "s1", 0),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    path = str(tmp_path / "csv")
    df.write.options(header=True, quote='"', escape='"').csv(path)
    back = (
        spark.read.options(header=True, quote='"', escape='"')
        .schema(DOCUMENTS_SCHEMA)
        .csv(path)
    )
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    # CSV has no empty-vs-null distinction for strings; normalize that one
    # documented lossy edge before comparing
    norm = lambda rs: [tuple("" if x is None else x for x in r) for r in rs]
    assert norm(a) == norm(b)


def test_jsonl_roundtrip_query_quarantine_is_zero(spark):
    """The registered source_jsonl_roundtrip surfaces the quarantine count
    as a checked column — a clean staged export must parse with zero
    corrupt lines."""
    from mutable_spark import registry

    registry.load_all()
    out = registry.QUERIES["source_jsonl_roundtrip"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out and all(r.n_quarantined == 0 for r in out)
