"""Sum-Product-Network cardinality estimation (the reference's learned
estimator: `src/util/Spn.cpp`, `src/catalog/SpnWrapper.cpp`, SpnEstimator in
`include/mutable/catalog/CardinalityEstimator.hpp:321`).

Same learning recipe as the reference (which follows DeepDB / the classic
``learn_spn``):

- **Product node** (`Spn.cpp` vertical split): partition the attributes into
  groups that look pairwise independent (|Pearson r| below a threshold —
  the reference uses an RDC approximation; Pearson on rank-transformed
  columns is the same spirit without the random Fourier features).
- **Sum node** (`Spn.cpp` horizontal split): cluster the rows (seeded
  k-means, k=2) and recurse per cluster with the cluster fraction as the
  child weight.
- **Leaves** (`DiscreteLeaf` / `ContinuousLeaf`): per-attribute histograms
  — exact value:count bins when the attribute has few distinct values,
  equi-width interval bins otherwise.
- ``likelihood(filter)``: probability of a conjunction of
  ``attr (=, <, <=, >, >=) value`` predicates (`Spn::likelihood`,
  `Spn.cpp:898`); Sum nodes mix child likelihoods by weight, Product
  nodes multiply over attribute groups, leaves integrate their histogram.

Scale posture: the SPN trains on a **bounded driver-side sample**
(`SAMPLE_CAP` rows via ``df.sample``) — identical to how the reference
builds its SPNs from a table snapshot, and the only sane design at 100 TB
(DeepDB trains on ≤1% samples; estimator quality degrades gracefully).
Estimation itself is driver-side arithmetic on the tiny learned model —
it feeds the join planner, it is never on the data path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

#: rows collected to the driver for learning — the estimator's only data
#: contact. At 100 TB this is a fixed-size sample read, not a scan.
SAMPLE_CAP = 50_000
#: |Pearson r| below which two attributes are treated as independent
#: (vertical / Product split).
INDEP_THRESHOLD = 0.3
#: stop splitting below this many rows; fit leaves directly
MIN_SLICE = 64
#: distinct-value count at or below which a leaf stores exact value bins
DISCRETE_MAX = 32
#: interval bins for continuous leaves
N_BINS = 20
#: dictionary cap for string columns: up to this many distinct sample
#: values get rank codes (order-preserving, so range predicates work);
#: beyond it the column keeps only a distinct-count model (equality →
#: 1/d, ranges → selectivity 1) — the reference's SPNs likewise model
#: strings through discrete leaves over an id mapping (`Spn.cpp` discrete
#: leaves; `SpnWrapper` builds them from dictionary-encoded attributes)
DICT_MAX = 1024

EQUAL, LESS, LESS_EQUAL, GREATER, GREATER_EQUAL = (
    "=",
    "<",
    "<=",
    ">",
    ">=",
)


# --- nodes -----------------------------------------------------------------
@dataclass
class _Leaf:
    """Histogram over one attribute (Discrete/ContinuousLeaf,
    `Spn.cpp:214-341`)."""

    attr: int
    discrete: bool
    values: np.ndarray  # bin keys (discrete) or bin edges (continuous)
    probs: np.ndarray  # bin probabilities (sum ≤ 1; remainder = NULLs)
    n_distinct: int

    def likelihood(self, op: str, v: float) -> float:
        if self.discrete:
            if op == EQUAL:
                hit = self.values == v
                return float(self.probs[hit].sum())
            if op == LESS:
                return float(self.probs[self.values < v].sum())
            if op == LESS_EQUAL:
                return float(self.probs[self.values <= v].sum())
            if op == GREATER:
                return float(self.probs[self.values > v].sum())
            if op == GREATER_EQUAL:
                return float(self.probs[self.values >= v].sum())
            raise ValueError(op)
        # continuous: integrate the histogram, interpolating the boundary
        # bin linearly (ContinuousLeaf bins carry a cumulative fraction)
        edges, probs = self.values, self.probs
        if op == EQUAL:
            # a point query on a continuous domain: one "distinct value"
            # worth of mass (`Spn.cpp` estimates via distinct counts)
            total = probs.sum()
            return float(total / max(self.n_distinct, 1))
        lo, hi = edges[0], edges[-1]
        if op in (LESS, LESS_EQUAL):
            if v <= lo:
                return 0.0
            if v >= hi:
                return float(probs.sum())
            acc = 0.0
            for i in range(len(probs)):
                a, b = edges[i], edges[i + 1]
                if v >= b:
                    acc += probs[i]
                elif v > a:
                    acc += probs[i] * (v - a) / (b - a or 1.0)
            return float(acc)
        # GREATER / GREATER_EQUAL = total − LESS_EQUAL/LESS; on a
        # continuous histogram the boundary point has measure ~0
        return float(probs.sum()) - self.likelihood(LESS, v)

    def distinct(self) -> int:
        return self.n_distinct


@dataclass
class _Product:
    """Independent attribute groups (`Spn::Product`, `Spn.cpp:160`)."""

    children: list  # nodes over disjoint attribute sets
    scopes: list[frozenset]

    def likelihood(self, filt: dict) -> float:
        out = 1.0
        for child, scope in zip(self.children, self.scopes):
            sub = {a: c for a, c in filt.items() if a in scope}
            if sub:
                out *= _node_likelihood(child, sub)
        return out

    def distinct(self, attr: int) -> int:
        for child, scope in zip(self.children, self.scopes):
            if attr in scope:
                return _node_distinct(child, attr)
        return 1


@dataclass
class _Sum:
    """Weighted row clusters (`Spn::Sum`, `Spn.cpp:96`)."""

    weights: list[float]
    children: list

    def likelihood(self, filt: dict) -> float:
        return float(
            sum(
                w * _node_likelihood(c, filt)
                for w, c in zip(self.weights, self.children)
            )
        )

    def distinct(self, attr: int) -> int:
        # union bound, like `Sum::estimate_number_distinct_values`
        return sum(_node_distinct(c, attr) for c in self.children)


def _leaf_conjunction(leaf: _Leaf, conds: list[tuple[str, float]]) -> float:
    """P(AND of conds) on one attribute — evaluated against the histogram
    directly (an interval/point query), NOT as a product of marginals."""
    if leaf.discrete:
        if len(leaf.values) == 0:
            return 0.0
        mask = np.ones(len(leaf.values), dtype=bool)
        for op, v in conds:
            if op == EQUAL:
                mask &= leaf.values == v
            elif op == LESS:
                mask &= leaf.values < v
            elif op == LESS_EQUAL:
                mask &= leaf.values <= v
            elif op == GREATER:
                mask &= leaf.values > v
            elif op == GREATER_EQUAL:
                mask &= leaf.values >= v
            else:
                raise ValueError(op)
        return float(leaf.probs[mask].sum())
    eqs = [v for op, v in conds if op == EQUAL]
    if eqs:
        # point query: zero if any bound excludes it, else point mass
        v = eqs[0]
        for op, w in conds:
            if (
                (op == EQUAL and w != v)
                or (op == LESS and not v < w)
                or (op == LESS_EQUAL and not v <= w)
                or (op == GREATER and not v > w)
                or (op == GREATER_EQUAL and not v >= w)
            ):
                return 0.0
        return leaf.likelihood(EQUAL, v)
    lo = max(
        (v for op, v in conds if op in (GREATER, GREATER_EQUAL)),
        default=None,
    )
    hi = min(
        (v for op, v in conds if op in (LESS, LESS_EQUAL)),
        default=None,
    )
    mass_below_hi = (
        leaf.likelihood(LESS, hi) if hi is not None else float(leaf.probs.sum())
    )
    mass_below_lo = leaf.likelihood(LESS, lo) if lo is not None else 0.0
    return max(0.0, mass_below_hi - mass_below_lo)


def _node_likelihood(node, filt: dict) -> float:
    if isinstance(node, _Leaf):
        out = 1.0
        for a, conds in filt.items():
            if a == node.attr:
                out *= _leaf_conjunction(node, list(conds))
        return out
    return node.likelihood(filt)


def _node_distinct(node, attr: int) -> int:
    if isinstance(node, _Leaf):
        return node.distinct() if node.attr == attr else 1
    return node.distinct(attr)


# --- learning --------------------------------------------------------------
def _fit_leaf(col: np.ndarray, attr: int, n_total: int) -> _Leaf:
    valid = col[~np.isnan(col)]
    frac = len(valid) / max(n_total, 1)
    if len(valid) == 0:
        return _Leaf(attr, True, np.array([]), np.array([]), 0)
    uniq, counts = np.unique(valid, return_counts=True)
    if len(uniq) <= DISCRETE_MAX:
        return _Leaf(
            attr, True, uniq, counts / len(valid) * frac, len(uniq)
        )
    edges = np.linspace(valid.min(), valid.max(), N_BINS + 1)
    hist, _ = np.histogram(valid, bins=edges)
    return _Leaf(
        attr, False, edges, hist / len(valid) * frac, len(uniq)
    )


def _indep_groups(data: np.ndarray, attrs: list[int]) -> list[list[int]]:
    """Connected components of the |corr| > INDEP_THRESHOLD graph — the
    vertical-split test (`Spn.cpp` uses an RDC approximation; rank
    transform + Pearson is its cheap cousin)."""
    k = len(attrs)
    if k == 1:
        return [attrs]
    ranks = np.empty_like(data, dtype=float)
    for j in range(k):
        col = data[:, j]
        order = np.argsort(col, kind="stable")
        ranks[order, j] = np.arange(len(col))
    with np.errstate(invalid="ignore"):
        corr = np.corrcoef(ranks, rowvar=False)
    corr = np.nan_to_num(corr)
    parent = list(range(k))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(k):
        for j in range(i + 1, k):
            if abs(corr[i, j]) > INDEP_THRESHOLD:
                parent[find(i)] = find(j)
    groups: dict[int, list[int]] = {}
    for i in range(k):
        groups.setdefault(find(i), []).append(attrs[i])
    return list(groups.values())


def _kmeans2(data: np.ndarray, seed: int) -> np.ndarray:
    """Seeded 2-means over z-normalized rows (`Spn.cpp` horizontal split
    clustering) — labels per row."""
    x = np.nan_to_num(data.astype(float))
    std = x.std(axis=0)
    std[std == 0] = 1.0
    x = (x - x.mean(axis=0)) / std
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), size=2, replace=False)
    centers = x[idx]
    labels = np.zeros(len(x), dtype=int)
    for _ in range(10):
        d0 = ((x - centers[0]) ** 2).sum(axis=1)
        d1 = ((x - centers[1]) ** 2).sum(axis=1)
        new = (d1 < d0).astype(int)
        if (new == labels).all():
            break
        labels = new
        for c in (0, 1):
            if (labels == c).any():
                centers[c] = x[labels == c].mean(axis=0)
    return labels


def learn_spn(
    data: np.ndarray,
    attrs: list[int] | None = None,
    seed: int = 7,
    depth: int = 0,
):
    """`Spn::learn_spn` (`Spn.cpp:851`): alternate vertical (independence)
    and horizontal (clustering) splits; NaN encodes NULL."""
    n, k = data.shape
    if attrs is None:
        attrs = list(range(k))
    if k == 1:
        return _fit_leaf(data[:, 0], attrs[0], n)
    groups = _indep_groups(data, attrs)
    if len(groups) > 1:
        children, scopes = [], []
        for g in groups:
            cols = [attrs.index(a) for a in g]
            children.append(
                learn_spn(data[:, cols], g, seed + 1, depth + 1)
            )
            scopes.append(frozenset(g))
        return _Product(children, scopes)
    if n < MIN_SLICE or depth > 6:
        # give up splitting: model the group as independent anyway
        # (the reference's base case fits leaves per attribute too)
        children = [
            _fit_leaf(data[:, j], attrs[j], n) for j in range(k)
        ]
        return _Product(children, [frozenset([a]) for a in attrs])
    labels = _kmeans2(data, seed)
    if labels.min() == labels.max():  # clustering failed to split
        children = [
            _fit_leaf(data[:, j], attrs[j], n) for j in range(k)
        ]
        return _Product(children, [frozenset([a]) for a in attrs])
    weights, children = [], []
    for c in (0, 1):
        part = data[labels == c]
        weights.append(len(part) / n)
        children.append(learn_spn(part, attrs, seed + 13 + c, depth + 1))
    return _Sum(weights, children)


# --- table-level wrapper (SpnWrapper / SpnEstimator) -----------------------
class SpnTableModel:
    """One learned SPN per table (`SpnWrapper.cpp::learn_spn_table`):
    numeric/date columns as numerics, string columns as rank-dictionary
    discrete leaves, NULL→NaN, learned from a bounded sample.

    ``estimate_rows({col: [(op, value), ...]})`` returns the estimated
    cardinality of the conjunctive filter — the piece SpnEstimator feeds
    into join models. Values for date/timestamp columns are given as the
    column's numeric epoch (caller converts; tests show the pattern).
    """

    def __init__(
        self,
        columns: list[str],
        matrix: np.ndarray,
        n_rows: int,
        dicts: dict[str, dict[str, int] | None] | None = None,
        string_distinct: dict[str, int] | None = None,
    ):
        self.columns = columns
        self.pos = {c: i for i, c in enumerate(columns)}
        self.n_rows = n_rows
        #: string column → {value: rank code} (order-preserving), or None
        #: for a high-cardinality column modeled by distinct count only
        self.dicts = dicts or {}
        self.string_distinct = string_distinct or {}
        self._dict_keys = {
            c: sorted(d) for c, d in self.dicts.items() if d is not None
        }
        self.root = learn_spn(matrix)

    @classmethod
    def from_dataframe(cls, df, columns: list[str]) -> "SpnTableModel":
        """Learn from a Spark DataFrame: bounded sample of the numeric
        projection (driver-side contact is ≤ SAMPLE_CAP rows).

        DATE/DATETIME columns are modeled as numerics — uniformly epoch
        seconds (dates at midnight UTC) — matching the reference, whose
        DATE/DATETIME are 32/64-bit integers under the hood
        (`Type.hpp:334-389`) and flow into the SPN like any numeric
        attribute. Filter values must use the same encoding
        (`date_to_spn_value`; the dialect compiler converts its date
        literals with it).

        STRING columns become discrete leaves over an order-preserving
        rank dictionary (value → rank among the sample's sorted distinct
        values): equality integrates the exact value bin, and because
        ranks preserve lexicographic order, range predicates integrate
        rank ranges. Past ``DICT_MAX`` distinct sample values the column
        keeps a distinct-count model only (the reference's discrete
        leaves are likewise built over the catalog's dictionary codes)."""
        import pyspark.sql.functions as F

        n_rows = df.count()
        frac = min(1.0, SAMPLE_CAP / max(n_rows, 1))
        dtypes = dict(df.dtypes)
        str_cols = {c for c in columns if dtypes.get(c, "") == "string"}

        def numeric(c):
            dt = dtypes.get(c, "")
            if dt == "date":
                return (F.unix_date(F.col(c)) * 86400.0).alias(c)
            if dt.startswith("timestamp"):
                return (
                    F.unix_timestamp(F.col(c).cast("timestamp"))
                    .cast("double")
                    .alias(c)
                )
            if c in str_cols:
                return F.col(c).alias(c)
            return F.col(c).cast("double").alias(c)

        proj = df.select(*[numeric(c) for c in columns])
        sample = (
            proj.sample(fraction=frac, seed=7) if frac < 1.0 else proj
        )
        pdf = sample.toPandas()
        dicts: dict[str, dict[str, int] | None] = {}
        sdistinct: dict[str, int] = {}
        cols_data = []
        for c in columns:
            s = pdf[c]
            if c in str_cols:
                uniq = sorted(x for x in s.dropna().unique())
                sdistinct[c] = len(uniq)
                if len(uniq) > DICT_MAX:
                    dicts[c] = None
                    cols_data.append(np.full(len(s), np.nan))
                else:
                    d = {v: i for i, v in enumerate(uniq)}
                    dicts[c] = d
                    cols_data.append(
                        np.array(
                            [d[x] if isinstance(x, str) else np.nan for x in s],
                            dtype=float,
                        )
                    )
            else:
                cols_data.append(s.to_numpy(dtype=float))
        matrix = (
            np.column_stack(cols_data)
            if cols_data
            else np.empty((len(pdf), 0))
        )
        return cls(columns, matrix, n_rows, dicts, sdistinct)

    def _translate(self, c: str, conds: list) -> tuple[list | None, float]:
        """Map one column's conditions into SPN-leaf space. Returns
        (conds usable against the leaf histogram or None, extra
        selectivity factor). String values go through the rank
        dictionary; a value unseen in the sample maps to the fractional
        rank r−0.5 between its lexicographic neighbors, so ``=`` matches
        nothing while ranges stay correct. High-cardinality strings use
        the distinct-count model: equality → 1/d, ranges → 1."""
        if c not in self.dicts:
            return conds, 1.0
        d = self.dicts[c]
        if d is None:
            factor = 1.0
            for op, v in conds:
                if op == EQUAL:
                    factor *= 1.0 / max(self.string_distinct.get(c, 1), 1)
            return None, factor
        import bisect

        keys = self._dict_keys[c]
        out = []
        for op, v in conds:
            if isinstance(v, str):
                code = (
                    float(d[v])
                    if v in d
                    else bisect.bisect_left(keys, v) - 0.5
                )
                out.append((op, code))
            else:
                out.append((op, float(v)))
        return out, 1.0

    def selectivity(self, filt: dict) -> float:
        factor = 1.0
        f: dict[int, list] = {}
        for c, conds in filt.items():
            if c not in self.pos:
                continue
            translated, fac = self._translate(c, list(conds))
            factor *= fac
            if translated:
                f[self.pos[c]] = translated
        if not f:
            return max(0.0, min(1.0, factor))
        return max(0.0, min(1.0, _node_likelihood(self.root, f) * factor))

    def estimate_rows(self, filt: dict) -> float:
        return self.selectivity(filt) * self.n_rows

    def estimate_distinct(self, column: str) -> int:
        """`Spn::estimate_number_distinct_values` (`Spn.cpp:946`)."""
        return max(1, _node_distinct(self.root, self.pos[column]))


def date_to_spn_value(text: str) -> float:
    """The SPN encoding of a dialect date/datetime literal: epoch seconds
    (UTC-naive; plain dates at midnight) — the same numbers
    `SpnTableModel.from_dataframe` learns from DATE/DATETIME columns."""
    import datetime as dt

    text = text.strip()
    d = dt.datetime.fromisoformat(text)
    return float(d.replace(tzinfo=dt.timezone.utc).timestamp())


def spn_base_cardinalities(models: dict, filters: dict):
    """Filtered base cardinalities for the join planner: the SpnEstimator
    integration point — each table's base size becomes its SPN estimate
    under that table's local filter, which is what drives join ordering
    (`CardinalityEstimator.hpp:321` SpnDataModel).

    ``models``: alias → SpnTableModel; ``filters``: alias → filter dict.
    Returns a `Cardinalities` whose base sizes reflect the filters.
    """
    from mutable_spark.plans.planner import Cardinalities

    return Cardinalities(
        base={
            a: int(round(m.estimate_rows(filters.get(a, {}))))
            for a, m in models.items()
        }
    )
