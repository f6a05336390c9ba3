"""Planner parity knobs: injected cardinalities and Python-side join
ordering (SURVEY §4.1 "Join order search" / §7 phase 6).

The reference ships 13+ plan enumerators (`src/IR/PlanEnumerator.cpp:725-738`)
and a pluggable cardinality estimator with an *Injected* mode that reads
true cardinalities from a JSON file (`src/catalog/CardinalityEstimator.cpp:
801-804`, used by the TPC-H benchmarks via `--use-cardinality-file`).
On Spark the equivalent levers are (a) the order in which we build the
DataFrame join tree — Catalyst preserves a user-given join order unless
CBO reordering is enabled — and (b) `broadcast()` hints for sides we know
are small.

This module provides:
- ``Cardinalities``: subset-cardinality store in the reference's JSON
  shape (`benchmark/tpc-h/q1.json`: entries {"relations": [...],
  "size": n}), with parquet-footer row counts as the zero-cost fallback
  (metadata only — no scan).
- ``goo_order``: Greedy Operator Ordering (the reference's `GOO`
  enumerator, `PlanEnumerator.cpp`): repeatedly merge the connected pair
  with the smallest estimated result. O(n³) worst case, fine for the
  ≤ dozens of relations any sane query has.
- ``JoinPlanner``: plugs both into the dialect compiler (opt-in
  ``Compiler(tables, planner=...)``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


def parquet_row_count(path: str) -> int | None:
    """Row count from the parquet footer — metadata, not a scan."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


@dataclass
class Cardinalities:
    """Subset cardinalities: frozenset of relation aliases → size."""

    base: dict[str, int] = field(default_factory=dict)
    subsets: dict[frozenset, int] = field(default_factory=dict)

    @classmethod
    def from_json(cls, path: str) -> "Cardinalities":
        """Reference format: {"<db>": [{"relations": ["A","B"], "size": n},
        ...]} or a flat list of the same entries."""
        with open(path) as f:
            doc = json.load(f)
        entries = doc if isinstance(doc, list) else next(iter(doc.values()))
        c = cls()
        for e in entries:
            rels = frozenset(e["relations"])
            c.subsets[rels] = int(e["size"])
            if len(rels) == 1:
                c.base[next(iter(rels))] = int(e["size"])
        return c

    def est(self, aliases: frozenset) -> float:
        """Estimated cardinality of the join of ``aliases``. Exact if
        injected; otherwise the FK heuristic: a join is at most as large
        as its largest base relation (true for key/foreign-key joins,
        which is what star/snowflake queries are made of)."""
        if aliases in self.subsets:
            return float(self.subsets[aliases])
        sizes = [self.base.get(a, 1_000_000) for a in aliases]
        return float(max(sizes)) if sizes else 1.0


def goo_order(
    aliases: list[str],
    edges: set[frozenset],
    cards: Cardinalities,
) -> list[str]:
    """Greedy Operator Ordering: returns a left-deep join order. Each step
    merges the pair of partial joins with the smallest estimated result,
    preferring connected pairs (an edge between their alias sets) —
    cartesian products only when the graph is disconnected, mirroring the
    reference's GOO behavior."""
    parts: list[frozenset] = [frozenset([a]) for a in aliases]
    order_sets: list[frozenset] = []

    def connected(x: frozenset, y: frozenset) -> bool:
        return any(
            e <= (x | y) and e & x and e & y for e in edges
        )

    while len(parts) > 1:
        best = None
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                conn = connected(parts[i], parts[j])
                size = cards.est(parts[i] | parts[j])
                key = (not conn, size)  # connected pairs first, then size
                if best is None or key < best[0]:
                    best = (key, i, j)
        _, i, j = best
        merged = parts[i] | parts[j]
        order_sets.append(merged)
        parts = [p for k, p in enumerate(parts) if k not in (i, j)] + [merged]

    # linearize to a left-deep alias order: seed with the first merge,
    # then append whichever alias each subsequent merge introduces
    if not order_sets:
        return aliases
    out: list[str] = []
    for s in order_sets:
        new = sorted(s - set(out), key=lambda a: cards.base.get(a, 0))
        out.extend(new)
    return out


@dataclass
class JoinPlanner:
    """Join-order + broadcast decisions for the dialect compiler.

    ``broadcast_rows``: sides whose (estimated) base cardinality is below
    this are marked broadcast — the reference's hash-join build-side
    choice, expressed as Spark's broadcast hint.
    """

    cards: Cardinalities
    broadcast_rows: int = 1_000_000

    def _base(self, alias: str, alias_table: dict[str, str]) -> float:
        """Base-cardinality lookup: by query alias first (the reference's
        injected JSON is alias-keyed), then by underlying table name."""
        if alias in self.cards.base:
            return self.cards.base[alias]
        t = alias_table.get(alias)
        if t in self.cards.base:
            return self.cards.base[t]
        return float("inf")

    def order(
        self,
        aliases: list[str],
        edges: set[frozenset],
        alias_table: dict[str, str] | None = None,
    ) -> list[str]:
        at = alias_table or {}
        eff = Cardinalities(
            base={
                a: (self._base(a, at) if self._base(a, at) != float("inf") else 1_000_000)
                for a in aliases
            },
            subsets=dict(self.cards.subsets),
        )
        return goo_order(aliases, edges, eff)

    def should_broadcast(
        self, alias: str, alias_table: dict[str, str] | None = None
    ) -> bool:
        return self._base(alias, alias_table or {}) <= self.broadcast_rows


def footer_cardinalities(sf_dir: str, tables=None) -> Cardinalities:
    """True base cardinalities for a testdata dir from parquet footers
    (metadata reads only) — the zero-cost stand-in for ANALYZE TABLE."""
    from mutable_spark.catalog import TABLE_NAMES

    c = Cardinalities()
    for t in tables or TABLE_NAMES:
        n = parquet_row_count(f"{sf_dir.rstrip('/')}/{t}.parquet")
        if n is not None:
            c.base[t] = n
    return c
