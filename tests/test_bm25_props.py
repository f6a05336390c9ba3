"""text_bm25_rank vs an independent pure-Python model of the same
integer-BM25 definition, over seeded random corpora — guards the Spark
expression translation (div precedence, guard branches, tie ordering)
independently of the DuckDB oracle, which shares SQL-ish structure with
the Spark side and could in principle mistranslate the same way."""

from __future__ import annotations

#: property suite (seeded random corpora vs an independent model) — opt-out of the default gate
#: (see pytest.ini); run everything with `pytest -m ""`
import pytest

pytestmark = pytest.mark.slow

import os
import random


from mutable_spark import registry
from tests.conftest import SF_DIR

registry.load_all()

_VOCAB = ["hash", "join", "scan", "table", "row", "x", "y", "z", "the", "a"]


def _model(docs, terms=("hash", "join", "scan"), topk=10):
    """Independent integer-BM25: k1=6/5, b=3/4 cross-multiplied —
    written from the definition, not from the operator's code."""
    toks = {i: t.strip().split() if t.strip() else [""] for i, t in docs}
    # NOTE: Spark's split(trim(x), '\\s+') of "" yields [""] (1 token)
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(docs)
    total = sum(dl.values())
    out = []
    for i, ts in toks.items():
        score = 0
        anytf = 0
        for t in terms:
            tf = ts.count(t)
            anytf += tf
            if tf == 0:
                continue
            df = sum(1 for ts2 in toks.values() if t in ts2)
            idf = (n * 1000) // df
            frac = (22 * tf * total * 1000) // (
                10 * tf * total + 3 * total + 9 * dl[i] * n
            )
            score += idf * frac
        if anytf > 0:
            out.append((i, dl[i], score))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:topk]


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_bm25_matches_independent_model(spark, tmp_path_factory, seed):
    rng = random.Random(seed)
    docs = []
    for i in range(120):
        n = rng.randint(0, 40)  # length-0 docs exercise the empty guard
        docs.append((i, " ".join(rng.choice(_VOCAB) for _ in range(n))))
    path = tmp_path_factory.mktemp(f"bm25_{seed}")
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(path / "documents.parquet")
    )
    for f in os.listdir(SF_DIR):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(SF_DIR, f), str(path / f))
    got = [
        (r.doc_id, r.dl, r.score_q)
        for r in registry.QUERIES["text_bm25_rank"](spark, str(path)).collect()
    ]
    assert got == _model(docs)
