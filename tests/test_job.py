"""Join Order Benchmark (JOB) q1–q10 as planner stress, run LITERALLY from
the reference's benchmark YAMLs (`/root/reference/benchmark/job/q*.yml`,
generated from the public JOB query set) against a deterministic generated
IMDB-shaped fixture — the reference downloads the real IMDB dump from an
external server, which this container cannot (and the driver's testdata
does not carry these tables), so a seeded generator stands in.

Coverage: every case of q1–q10 expressible in the mutable grammar — 19
cases across q1/q2/q4/q6/q8/q10. The remaining cases (all of q3/q5/q7/q9)
use ``x IN (...)`` / ``BETWEEN`` which the reference's own lexer has no
keywords for (`include/mutable/tables/Keywords.tbl`) — they are upstream
aspirations, not runnable dialect, and are excluded here exactly as
mutable's parser would reject them.

Checks per case:
- oracle rows: the same query text (string literals requoted for ANSI)
  over the same data in DuckDB, compared value-for-value;
- plan shape: 4–8-relation join graphs through JoinPlanner/DPccp — no
  CartesianProduct, no BroadcastNestedLoopJoin, dimension tables
  broadcast.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

yaml = pytest.importorskip("yaml")

from mutable_spark.dialect import parse
from mutable_spark.dialect.compiler import compile_select
from mutable_spark.plans.planner import Cardinalities, JoinPlanner
from tests.test_plan_shape import explain

JOB = Path("/root/reference/benchmark/job")

pytestmark = pytest.mark.skipif(
    not JOB.exists(), reason="reference benchmark corpus not available"
)

#: q → cases expressible in the mutable grammar (no IN / BETWEEN)
KEEP = {
    1: ["a", "c", "d"],
    2: ["a", "b", "c", "d"],
    4: ["a", "b", "c"],
    6: ["a", "c", "e"],
    8: ["a", "c", "d"],
    10: ["a", "b", "c"],
}


# --- deterministic IMDB-shaped fixture ------------------------------------
def _fixture_frames() -> dict[str, pd.DataFrame]:
    """Seeded generator sized so every predicate pool in q1–q10 is hit.
    Value pools mirror the public IMDB domains the queries select on."""
    rng = np.random.default_rng(7)

    company_type = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "kind": [
                "production companies",
                "distributors",
                "special effects companies",
                "miscellaneous companies",
            ],
        }
    )
    info_type = pd.DataFrame(
        {
            "id": list(range(1, 8)),
            "info": [
                "top 250 rank",
                "bottom 10 rank",
                "rating",
                "votes",
                "genres",
                "budget",
                "release dates",
            ],
        }
    )
    role_type = pd.DataFrame(
        {
            "id": list(range(1, 8)),
            "role": [
                "actor",
                "actress",
                "producer",
                "writer",
                "costume designer",
                "director",
                "cinematographer",
            ],
        }
    )

    n_title = 800
    title = pd.DataFrame(
        {
            "id": np.arange(1, n_title + 1),
            "title": [f"Movie {i:04d}" for i in range(1, n_title + 1)],
            "production_year": rng.integers(1990, 2016, n_title),
            "kind_id": rng.integers(1, 8, n_title),
        }
    )

    kw_pool = [
        "character-name-in-title",
        "marvel-cinematic-universe",
        "sequel",
        "based-on-novel",
        "superhero",
        "second-part-sequel",
    ] + [f"kw-{i}" for i in range(60)]
    keyword = pd.DataFrame(
        {"id": np.arange(1, len(kw_pool) + 1), "keyword": kw_pool}
    )

    cc_pool = ["[us]", "[de]", "[nl]", "[jp]", "[ru]", "[sm]", "[gb]", "[fr]"]
    n_cn = 120
    company_name = pd.DataFrame(
        {
            "id": np.arange(1, n_cn + 1),
            "name": [f"Company {i:03d}" for i in range(1, n_cn + 1)],
            "country_code": rng.choice(cc_pool, n_cn),
        }
    )

    chn_pool = ["Yoda", "Young Man", "Yolanda", "Tony Stark", "Queen"] + [
        f"Character {i:03d}" for i in range(120)
    ]
    char_name = pd.DataFrame(
        {"id": np.arange(1, len(chn_pool) + 1), "name": chn_pool}
    )

    name_pool = [
        "Downey, Robert Jr.",
        "Yoakam, Dwight",
        "Yorn, Pete",
        "Young, Sean",
        "Bale, Christian",
        "Blanchett, Cate",
    ] + [f"Person {i:03d}" for i in range(200)]
    name = pd.DataFrame(
        {"id": np.arange(1, len(name_pool) + 1), "name": name_pool}
    )

    n_an = 150
    aka_name = pd.DataFrame(
        {
            "id": np.arange(1, n_an + 1),
            "person_id": rng.integers(1, len(name_pool) + 1, n_an),
            "name": rng.choice(
                ["Yo-Yo", "R. Downey", "C. Bale", "Alias A", "Alias B"], n_an
            ),
        }
    )

    mc_notes = [
        "(co-production)",
        "(presents)",
        "(as Metro-Goldwyn-Mayer Pictures)",
        "(2006) (USA) (TV)",
        "(2007) (Japan) (DVD)",
        "(2009) (Japan) (theatrical)",
        "(uncredited)",
        None,
    ]
    n_mc = 2500
    movie_companies = pd.DataFrame(
        {
            "id": np.arange(1, n_mc + 1),
            "movie_id": rng.integers(1, n_title + 1, n_mc),
            "company_id": rng.integers(1, n_cn + 1, n_mc),
            "company_type_id": rng.integers(1, 5, n_mc),
            "note": rng.choice(mc_notes, n_mc),
        }
    )

    n_mi = 1800
    movie_info_idx = pd.DataFrame(
        {
            "id": np.arange(1, n_mi + 1),
            "movie_id": rng.integers(1, n_title + 1, n_mi),
            "info_type_id": rng.integers(1, 8, n_mi),
            "info": rng.choice(
                ["2.0", "3.4", "5.0", "6.5", "7.2", "8.1", "9.0", "990"], n_mi
            ),
        }
    )

    n_mk = 1800
    movie_keyword = pd.DataFrame(
        {
            "id": np.arange(1, n_mk + 1),
            "movie_id": rng.integers(1, n_title + 1, n_mk),
            "keyword_id": rng.integers(1, len(kw_pool) + 1, n_mk),
        }
    )

    ci_notes = [
        "(voice)",
        "(voice: English version)",
        "(voice) (uncredited)",
        "(producer)",
        "(uncredited)",
        None,
    ]
    n_ci = 3500
    cast_info = pd.DataFrame(
        {
            "id": np.arange(1, n_ci + 1),
            "person_id": rng.integers(1, len(name_pool) + 1, n_ci),
            "movie_id": rng.integers(1, n_title + 1, n_ci),
            "person_role_id": rng.integers(1, len(chn_pool) + 1, n_ci),
            "role_id": rng.integers(1, 8, n_ci),
            "note": rng.choice(ci_notes, n_ci),
        }
    )

    # --- planted witness rows: make every kept case non-trivial ---------
    # q6a/c/e: Downey (name id 1) cast on a marvel-keyword movie from 2015
    title.loc[789, "production_year"] = 2015  # movie id 790
    movie_keyword = pd.concat(
        [
            movie_keyword,
            pd.DataFrame({"id": [n_mk + 1], "movie_id": [790], "keyword_id": [2]}),
        ],
        ignore_index=True,
    )
    # q8a: 'Yoakam, Dwight' (id 2, %Yo% not %Yu%) voices the English
    # version as actress on movie 790, produced by a [jp] company with a
    # Japan-only note; an alias exists
    company_name.loc[4, "country_code"] = "[jp]"  # company id 5
    cast_info = pd.concat(
        [
            cast_info,
            pd.DataFrame(
                {
                    "id": [n_ci + 1, n_ci + 2],
                    "person_id": [1, 2],
                    "movie_id": [790, 790],
                    "person_role_id": [1, 2],
                    "role_id": [1, 2],
                    "note": ["(voice)", "(voice: English version)"],
                }
            ),
        ],
        ignore_index=True,
    )
    aka_name = pd.concat(
        [
            aka_name,
            pd.DataFrame({"id": [n_an + 1], "person_id": [2], "name": ["Yo-Yo"]}),
        ],
        ignore_index=True,
    )
    movie_companies = pd.concat(
        [
            movie_companies,
            pd.DataFrame(
                {
                    "id": [n_mc + 1],
                    "movie_id": [790],
                    "company_id": [5],
                    "company_type_id": [1],
                    "note": ["(2009) (Japan) (theatrical)"],
                }
            ),
        ],
        ignore_index=True,
    )

    return {
        "company_type": company_type,
        "info_type": info_type,
        "role_type": role_type,
        "title": title,
        "keyword": keyword,
        "company_name": company_name,
        "char_name": char_name,
        "name": name,
        "aka_name": aka_name,
        "movie_companies": movie_companies,
        "movie_info_idx": movie_info_idx,
        "movie_keyword": movie_keyword,
        "cast_info": cast_info,
    }


@pytest.fixture(scope="module")
def job_env(spark):
    frames = _fixture_frames()
    tables = {n: spark.createDataFrame(f) for n, f in frames.items()}
    import duckdb

    duck = duckdb.connect()
    for n, f in frames.items():
        duck.register(n, f)
    cards = Cardinalities(base={n: len(f) for n, f in frames.items()})
    planner = JoinPlanner(cards, broadcast_rows=1_000)
    return tables, duck, planner


def _cases():
    out = []
    for i, cs in KEEP.items():
        doc = yaml.safe_load((JOB / f"q{i}.yml").read_text())
        for c in cs:
            out.append(pytest.param(doc["cases"][c], id=f"q{i}{c}"))
    return out


def _ansi(q: str) -> str:
    """mutable string literals are double-quoted; ANSI/DuckDB wants single
    quotes (double quotes would be identifiers)."""
    return re.sub(r'"([^"]*)"', lambda m: "'" + m.group(1).replace("'", "''") + "'", q)


@pytest.mark.parametrize("query", _cases())
def test_job_oracle_rows(job_env, query):
    tables, duck, planner = job_env
    df = compile_select(parse(query), tables, planner=planner)
    got = sorted(tuple(r) for r in df.collect())
    exp = sorted(tuple(r) for r in duck.execute(_ansi(query)).fetchall())
    assert got == exp


@pytest.mark.parametrize("query", _cases())
def test_job_plan_shape(job_env, query):
    """4–8-relation graphs through DPccp: cross-product-free with the
    small dimension sides broadcast."""
    tables, duck, planner = job_env
    df = compile_select(parse(query), tables, planner=planner)
    p = explain(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p
