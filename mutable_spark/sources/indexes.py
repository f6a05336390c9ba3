"""Index structures: sorted-array and learned (RMI), plus the Spark-side
integration that makes them mean something at 100 TB.

Parity surface (`include/mutable/storage/Index.hpp`):

- ``ArrayIndex`` (`Index.hpp:60-158`): sorted key→value array with
  ``add``/``finalize``/``lower_bound``/``upper_bound``.
- ``RecursiveModelIndex`` (`Index.hpp:161-310`, built in
  `src/storage/Index.cpp::finalize`): two linear layers — a spline root
  model routes a key to a segment, per-segment linear-regression leaf
  models predict the position, and an exponential search around the
  prediction corrects the error. Same training recipe (root spline with
  compression factor n_models/n_keys; regression leaves per predicted
  segment, empty segments covered by boundary-pair models).

Spark integration (this repo's design, not a port): Spark has no
tuple-id random access, so a secondary index's job here is **scan
pruning**. ``ZoneIndex`` builds min/max zones per parquet *file* from
footer metadata only (no data read) and answers range lookups with the
file subset that can match; ``read_pruned`` scans just those files.
Row-group-level skipping inside each file is already done by the parquet
reader from pushed-down filters — the file-level index is the layer
Spark does NOT get for free when a query planner wants to touch 100 of
100,000 files (e.g. a key-sorted 100 TB table laid out by
``repartitionByRange``). The RMI's role is holding the file→range map in
O(models) memory instead of O(files), exactly the learned-index pitch.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np


# --- linear models (`Index.hpp:171-229`) -----------------------------------
@dataclass
class LinearModel:
    slope: float
    intercept: float

    def __call__(self, x):
        return self.slope * np.asarray(x, dtype=float) + self.intercept

    @staticmethod
    def train_linear_spline(
        keys: np.ndarray, offset: int = 0, compression: float = 1.0
    ) -> "LinearModel":
        """Spline between first and last point (`train_linear_spline`,
        `Index.hpp:180-193`)."""
        n = len(keys)
        if n == 0:
            return LinearModel(0.0, 0.0)
        if n == 1:
            return LinearModel(0.0, float(offset) * compression)
        den = float(keys[-1]) - float(keys[0])
        slope = (n / den) * compression if den != 0 else 0.0
        return LinearModel(slope, offset * compression - slope * float(keys[0]))

    @staticmethod
    def train_linear_regression(
        keys: np.ndarray, offset: int = 0
    ) -> "LinearModel":
        """Least squares over (key, offset+i) (`train_linear_regression`,
        `Index.hpp:195-228`)."""
        n = len(keys)
        if n == 0:
            return LinearModel(0.0, 0.0)
        if n == 1:
            return LinearModel(0.0, float(offset))
        x = keys.astype(float)
        y = offset + np.arange(n, dtype=float)
        var = x.var(ddof=1)
        if var == 0:
            return LinearModel(0.0, float(y.mean()))
        cov = np.cov(x, y, ddof=1)[0, 1]
        slope = cov / var
        return LinearModel(slope, float(y.mean() - slope * x.mean()))


class ArrayIndex:
    """Sorted (key, value) array index (`Index.hpp:60`): values are
    whatever the caller wants positions to mean (the reference uses
    tuple ids; the Spark integration uses file ids)."""

    def __init__(self):
        self._keys: list = []
        self._values: list = []
        self.keys: np.ndarray | None = None
        self.values: np.ndarray | None = None
        self.finalized = False

    def add(self, key, value) -> None:
        self._keys.append(key)
        self._values.append(value)
        self.finalized = False

    def bulkload(self, keys, values) -> None:
        self._keys = list(keys)
        self._values = list(values)
        self.finalized = False

    def finalize(self) -> None:
        order = np.argsort(np.asarray(self._keys), kind="stable")
        self.keys = np.asarray(self._keys)[order]
        self.values = np.asarray(self._values)[order]
        self.finalized = True

    def _require(self) -> None:
        if not self.finalized:
            raise RuntimeError("Index is not finalized.")

    def lower_bound(self, key) -> int:
        """First position with keys[pos] >= key (`Index.hpp:128`)."""
        self._require()
        return int(np.searchsorted(self.keys, key, side="left"))

    def upper_bound(self, key) -> int:
        """First position with keys[pos] > key (`Index.hpp:136`)."""
        self._require()
        return int(np.searchsorted(self.keys, key, side="right"))

    def lookup_range(self, lo=None, hi=None, *, lo_open=False, hi_open=False):
        """Values for keys in [lo, hi] (open ends via flags)."""
        self._require()
        start = (
            0
            if lo is None
            else (self.upper_bound(lo) if lo_open else self.lower_bound(lo))
        )
        stop = (
            len(self.keys)
            if hi is None
            else (self.lower_bound(hi) if hi_open else self.upper_bound(hi))
        )
        return self.values[start:stop]

    def __len__(self) -> int:
        return len(self.keys) if self.finalized else len(self._keys)


class RecursiveModelIndex(ArrayIndex):
    """Two-layer RMI (`Index.hpp:161`, `src/storage/Index.cpp:163-220`)."""

    #: models per key, the reference's ``options::rmi_model_entry_ratio``
    MODEL_ENTRY_RATIO = 1.0 / 64

    def __init__(self):
        super().__init__()
        self.models: list[LinearModel] = []

    def finalize(self) -> None:
        super().finalize()
        n_keys = len(self.keys)
        n_models = max(1, int(n_keys * self.MODEL_ENTRY_RATIO))
        self.models = [
            LinearModel.train_linear_spline(
                self.keys, offset=0, compression=n_models / max(n_keys, 1)
            )
        ]
        # second layer: regression per predicted segment; runs of empty
        # segments are covered by boundary-pair spline models, exactly
        # like the reference's finalize loop
        seg_of = np.clip(self.models[0](self.keys), 0, n_models - 1).astype(int)
        boundaries = np.searchsorted(seg_of, np.arange(n_models + 1), "left")
        for s in range(n_models):
            a, b = boundaries[s], boundaries[s + 1]
            self.models.append(
                LinearModel.train_linear_regression(self.keys[a:b], offset=a)
            )

    def _predict(self, key) -> int:
        n_models = len(self.models) - 1
        seg = int(np.clip(self.models[0](key), 0, n_models - 1))
        pos = int(np.clip(self.models[seg + 1](key), 0, len(self.keys)))
        return pos

    def _exp_search_lower(self, pred: int, key) -> int:
        """Exponential search around the prediction
        (`Index.hpp:276-299`)."""
        keys, n = self.keys, len(self.keys)
        pred = min(pred, n - 1) if n else 0
        if n == 0:
            return 0
        bound = 1
        if keys[pred] < key:  # true position is to the right
            prev, curr = pred, pred + bound
            while curr < n and keys[curr] < key:
                bound *= 2
                prev, curr = curr, curr + bound
            lo, hi = prev, min(curr + 1, n)
        else:  # to the left
            prev, curr = pred, pred - bound
            while curr > 0 and keys[curr] >= key:
                bound *= 2
                prev, curr = curr, curr - bound
            lo, hi = max(0, curr), prev
        return lo + int(np.searchsorted(keys[lo:hi], key, side="left"))

    def lower_bound(self, key) -> int:
        self._require()
        return self._exp_search_lower(self._predict(key), key)

    def upper_bound(self, key) -> int:
        self._require()
        # reuse lower_bound then walk the (rare) duplicate run via the
        # right-biased binary search on a narrow window
        lo = self.lower_bound(key)
        return lo + int(
            np.searchsorted(self.keys[lo:], key, side="right")
        )


# --- Spark integration: file-zone index for scan pruning -------------------
def _key_num(v):
    """Numeric key-space for zone bounds: datetimes/dates normalize to
    epoch seconds (naive = UTC, matching the engine's session timezone),
    so the RMI's float arithmetic and range lookups work uniformly for
    numeric AND time columns — time-range pruning over a date-partitioned
    layout is the canonical 100 TB scan pattern.

    STRING keys (r7) map to their first-6-byte big-endian integer — the
    classic order-preserving prefix surrogate. 48 bits stay exact in the
    float64 key space, and `a <= b ⟹ prefix6(a) <= prefix6(b)`, so a
    range lookup through the surrogate can only OVER-read (prefix ties
    collapse to equal keys); the zone index is a pruning layer, never a
    correctness layer, so that is sound. This is how string-keyed scans
    (URL prefixes, domain ranges, id namespaces) prune at 100 TB."""
    import datetime as dt

    if isinstance(v, dt.datetime):
        return (v.replace(tzinfo=None) - dt.datetime(1970, 1, 1)).total_seconds()
    if isinstance(v, dt.date):
        return (
            dt.datetime(v.year, v.month, v.day) - dt.datetime(1970, 1, 1)
        ).total_seconds()
    if isinstance(v, (str, bytes)):
        b = v.encode("utf-8", "surrogatepass") if isinstance(v, str) else v
        return float(int.from_bytes(b[:6].ljust(6, b"\x00"), "big"))
    return v


class ZoneIndex:
    """Min/max zones per parquet file of a dataset directory, held in an
    (Array|RecursiveModel)Index keyed by zone minimum.

    Built from footer metadata only. ``files_for_range`` returns the
    files whose [min, max] intersects the predicate range;
    ``read_pruned`` scans just those (the filter is still applied — the
    index is a pruning layer, never a correctness layer, so a stale or
    approximate index can only over-read)."""

    def __init__(self, column: str, learned: bool = True):
        self.column = column
        self.index = RecursiveModelIndex() if learned else ArrayIndex()
        self.zones: list[tuple[float, float, str]] = []

    @classmethod
    def build(cls, path: str, column: str, learned: bool = True) -> "ZoneIndex":
        import pyarrow.parquet as pq

        z = cls(column, learned)
        p = Path(path)
        # recursive: a partitioned layout keeps its data files nested
        # (key=1/part-*.parquet) — a top-level-only glob would build an
        # empty (useless) index for it
        files = (
            sorted(p.glob("**/*.parquet")) if p.is_dir() else [p]
        )
        for f in files:
            meta = pq.ParquetFile(f).metadata
            schema_idx = {
                meta.schema.column(i).name: i
                for i in range(meta.num_columns)
            }
            if column not in schema_idx:
                raise KeyError(column)
            ci = schema_idx[column]
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = None, None
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins is None or not mins:
                # no stats: the file can never be pruned
                z.zones.append((-np.inf, np.inf, str(f)))
            else:
                z.zones.append(
                    (_key_num(min(mins)), _key_num(max(maxs)), str(f))
                )
        z.index.bulkload(
            [zmin for zmin, _, _ in z.zones], list(range(len(z.zones)))
        )
        z.index.finalize()
        return z

    def refresh(self, path: str) -> int:
        """Incremental maintenance under appends — the streaming-ingest
        tie-in: scan footers ONLY for files not yet mapped (new
        microbatch output in an append-mode parquet sink), add their
        zones, and rebuild the in-memory key index (zones are footer
        pairs — thousands per 100 TB dataset — so the rebuild is
        microseconds; the saved work is the footer I/O for the files
        already mapped, which dominates). Files that vanished
        (compaction rewrote them) are dropped: a deleted file must not
        be returned to the scan. Returns the number of added files."""
        import pyarrow.parquet as pq

        p = Path(path)
        files = sorted(p.glob("**/*.parquet")) if p.is_dir() else [p]
        known = {f for _, _, f in self.zones}
        current = {str(f) for f in files}
        self.zones = [z for z in self.zones if z[2] in current]
        added = 0
        for f in files:
            if str(f) in known:
                continue
            meta = pq.ParquetFile(f).metadata
            schema_idx = {
                meta.schema.column(i).name: i for i in range(meta.num_columns)
            }
            ci = schema_idx[self.column]
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = None, None
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins is None or not mins:
                self.zones.append((-np.inf, np.inf, str(f)))
            else:
                self.zones.append(
                    (_key_num(min(mins)), _key_num(max(maxs)), str(f))
                )
            added += 1
        self.index = type(self.index)()
        self.index.bulkload(
            [zmin for zmin, _, _ in self.zones], list(range(len(self.zones)))
        )
        self.index.finalize()
        return added

    def files_for_range(self, lo=None, hi=None) -> list[str]:
        # candidate zones: zone_min <= hi; then verify zone_max >= lo.
        # The index narrows by zone minimum in O(log) / O(model) time;
        # the residual check is linear in candidates only. Bounds may be
        # numeric or datetime/date (normalized like the zone keys).
        lo = _key_num(lo) if lo is not None else None
        hi = _key_num(hi) if hi is not None else None
        cand = self.index.lookup_range(None, hi)
        out = []
        for i in cand:
            zmin, zmax, f = self.zones[int(i)]
            if lo is None or zmax >= lo:
                out.append(f)
        return out

    def read_pruned(self, spark, lo=None, hi=None):
        """DataFrame over only the files that can contain
        ``column ∈ [lo, hi]``, with the residual bound filter applied.
        (The dialect compiler does NOT route through this method: it
        intersects file sets across every bounded indexed column and
        compiles its own residual predicates with dialect coercion rules
        — see `dialect/compiler.py::_zone_pruned_scan`.)"""
        import pyspark.sql.functions as F

        files = self.files_for_range(lo, hi)
        if not files:
            all_files = [f for _, _, f in self.zones]
            return (
                spark.read.parquet(*all_files)
                .filter(F.lit(False))
            )
        df = spark.read.parquet(*files)
        c = F.col(self.column)
        if lo is not None:
            df = df.filter(c >= F.lit(lo))
        if hi is not None:
            df = df.filter(c <= F.lit(hi))
        return df
