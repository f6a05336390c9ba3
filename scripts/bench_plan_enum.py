#!/usr/bin/env python
"""Optimization-time study — the reference's
`benchmark/plan-enumerators/cardinality-agnostic` charts, re-measured on
this engine's enumerators. Pure driver-side planning (no Spark jobs):
parses each topology case's SQL from the reference YAMLs in place and
times `enumerator(aliases, edges, cards)` (min-of-3, perf_counter).

Emits one JSON line {"suite": "plan-enumerators", "cases": {topology:
{n: {enum: seconds}}}} — recorded as PLANENUM.json; correctness of the
same grid is pinned in tests/test_plan_enum_study.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main() -> int:
    import yaml

    from mutable_spark.plans import planner as P
    from test_plan_enum_study import (
        _CLIQUE_CAP,
        _N_CAP,
        STUDY,
        TOPOLOGIES,
        _cards,
        graph_from_sql,
    )

    enums = {
        "DPccp": P.dpccp_plan,
        "DPsize": P.dpsize_plan,
        "DPsizeOpt": P.dpsizeopt_plan,
        "DPsizeSub": P.dpsizesub_plan,
        "DPsub": P.dpsub_plan,
        "DPsubOpt": P.dpsubopt_plan,
        "TDbasic": P.tdbasic_plan,
        "TDMinCutAGaT": P.tdmincut_plan,
        "IKKBZ": P.ikkbz_plan,
        "LinearizedDP": P.linearizeddp_plan,
        "GOO": lambda a, e, c: P.goo_order(a, e, c),
        "hs-A*": P.hs_astar_plan,
        "hs-anytime": P.hs_anytime_plan,
    }

    results: dict[str, dict] = {}
    for topo in TOPOLOGIES:
        doc = yaml.safe_load((STUDY / f"{topo}.yml").read_text())
        cases = doc["systems"]["mutable"]["cases"]
        cap = _CLIQUE_CAP if topo == "clique" else _N_CAP
        results[topo] = {}
        for n, sql in sorted(cases.items()):
            if int(n) > cap:
                continue
            aliases, edges = graph_from_sql(sql)
            cards = _cards(aliases)
            row = {}
            for name, fn in enums.items():
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(aliases, edges, cards)
                    ts.append(time.perf_counter() - t0)
                row[name] = round(min(ts), 6)
            results[topo][str(n)] = row
            print(f"# {topo} n={n}: " + " ".join(
                f"{k}={v * 1000:.1f}ms" for k, v in row.items()
            ), file=sys.stderr)
    print(json.dumps({"suite": "plan-enumerators", "cases": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
