#!/usr/bin/env python
"""Full-registry scan-count audit (r12 methodology, kept as a tool).

For every registered query, explain the physical plan and count how many
times each BIG table (documents / embeddings / events / lineitem / orders)
is scanned in the tree. Multi-scans are not automatically wrong — pair
self-joins, query-batch + corpus, exact-vs-tier certifications, and
column-pruned id re-reads are structural — but every ≥2 entry deserves an
explicit justification, because at 100 TB an unjustified extra scan of
the fact table is a full corpus pass. The r12 audit found four
double-build shapes this way (Spark inlines repeated CTE/DataFrame
references, and column pruning defeats ReuseExchange): see SCALE.md
§"Full-registry scan-count audit".

Counting is by the RELAYOUT FILE PATH in the plan's details section (one
`Location:` line per scan node), not by `Scan parquet` occurrences — the
formatted explain repeats node names in the detail block.

Usage: python scripts/scan_audit.py [sf_dir]   # prints flagged ops
"""
from __future__ import annotations

import json
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BIG = ("lineitem", "documents", "embeddings", "events", "orders")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from mutable_spark import registry
    from mutable_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in sorted(registry.QUERIES):
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            tree = p.partition("\n\n")[0]
            tbls = re.findall(
                r"Location: InMemoryFileIndex \[file:[^\]]*/([a-z]+)[-.][^\]]*\]",
                p,
            )
            tc = Counter(tbls)
            out[name] = {
                "scans": tree.count("Scan parquet"),
                "reused": tree.count("ReusedExchange"),
                "big_multi": {t: c for t, c in tc.items() if t in BIG and c >= 2},
            }
        except Exception as e:  # noqa: BLE001 — audit must finish the sweep
            out[name] = {"error": str(e)[:120]}
        finally:
            registry.release_caches(spark)
    flagged = {n: v for n, v in out.items() if v.get("big_multi")}
    for n, v in sorted(
        flagged.items(), key=lambda kv: -max(kv[1]["big_multi"].values())
    ):
        print(f"{n}: {v['big_multi']} reused={v['reused']}")
    print(json.dumps({"flagged": len(flagged), "total": len(out)}))


if __name__ == "__main__":
    main()
