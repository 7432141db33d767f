"""Approximate / mergeable sketch aggregates.

Three mergeable sketch families, all following the same 100-TB shape —
each batch emits ONE small serialized sketch, a tiny final stage merges
them; the shuffle moves kilobytes per batch, never values:

* HyperLogLog approximate COUNT DISTINCT (Flajolet et al., with the
  small-range linear-counting correction).
* KLL-style quantile sketch (Karnin-Lang-Liberty, simplified): leveled
  buffers with weight-doubling compaction; rank error ~O(1/k).
* Theta/KMV distinct sketch (k minimum hash values): supports UNION /
  INTERSECTION / DIFFERENCE cardinality estimates across sketches —
  the standard way to ask "how many users did BOTH X and Y" without a
  distinct shuffle.

No reference counterpart (sous-chef has no sketches); all algorithms
from the public literature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


class HllSketch:
    """Plain HyperLogLog over uint64 hashes; registers = 2^p bytes."""

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 14:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = position of leftmost 1-bit in the remaining 64-p bits
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        rank = np.ones(len(h), dtype=np.uint8)
        for _ in range(64 - self.p + 1):
            top = (cur & mask) != 0
            done = top
            if done.all():
                break
            rank[~done] += 1
            cur = cur << np.uint64(1)
            cur[done] = mask  # freeze finished rows
        _ = lz
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert other.p == self.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = self.alpha * self.m * self.m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * self.m and zeros:
            return self.m * np.log(self.m / zeros)  # linear counting
        return raw


def approx_count_distinct(
    ds: "rd.Dataset", col: str, p: int = 14
) -> float:
    """Approximate global COUNT(DISTINCT col) as a constant-key
    ``Dataset.aggregate`` over the mergeable HLL accumulator: per-block
    partial registers (2^p bytes) tree-combine inside Ray's aggregate —
    no driver-side merge loop (round-3 review item; at 10^12 rows the
    old per-block ``iter_batches`` loop was millions of sequential
    driver merges). Register max-merge is associative+commutative, so
    the combine order Ray picks cannot change the estimate."""
    out = ds.aggregate(HllDistinct(on=col, p=p, alias_name="nd"))
    return float(out["nd"])


# ---------------------------------------------------------------------------
# KLL-style quantile sketch (Karnin, Lang, Liberty 2016 — simplified)
# ---------------------------------------------------------------------------

class KllSketch:
    """Mergeable approximate-quantile sketch. Level i holds items of
    weight 2^i; when a level overflows its capacity (k shrinking by 2/3
    per level above the top), it is sorted and every other item (random
    parity) is promoted to level i+1. Rank error is O(1/k)."""

    def __init__(self, k: int = 200, seed: int = 0):
        self.k = k
        self.levels: list = [np.empty(0, dtype=np.float64)]
        self.rng = np.random.default_rng(seed)

    def _cap(self, lvl: int) -> int:
        depth = len(self.levels)
        return max(int(np.ceil(self.k * (2.0 / 3.0) ** (depth - 1 - lvl))), 8)

    def add(self, vals: np.ndarray) -> None:
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._cap(i):
                buf = np.sort(self.levels[i])
                start = int(self.rng.integers(0, 2))
                promoted = buf[start::2]
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def merge(self, other: "KllSketch") -> "KllSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compress()
        return self

    def quantiles(self, qs) -> np.ndarray:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            items.append(lv)
            weights.append(np.full(len(lv), 1 << i, dtype=np.float64))
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="mergesort")
        it, wt = it[order], wt[order]
        cum = np.cumsum(wt)
        total = cum[-1] if len(cum) else 0.0
        out = np.empty(len(qs), dtype=np.float64)
        for j, q in enumerate(qs):
            target = q * total
            pos = int(np.searchsorted(cum, target, side="left"))
            out[j] = it[min(pos, len(it) - 1)] if len(it) else np.nan
        return out

    def serialize(self) -> bytes:
        import pickle

        return pickle.dumps([lv for lv in self.levels])

    @classmethod
    def deserialize(cls, blob: bytes, k: int = 200) -> "KllSketch":
        import pickle

        sk = cls(k)
        sk.levels = [np.asarray(lv, dtype=np.float64) for lv in pickle.loads(blob)]
        return sk


def approx_quantiles(ds: "rd.Dataset", col: str, qs, k: int = 200) -> np.ndarray:
    """Approximate quantiles of ``col``: per-block KLL sketches (each a
    few KB) tree-combined inside a constant-key ``Dataset.aggregate``
    (round-3 review item: no driver merge loop, no global sort, no value
    shuffle). The driver sees ONE final serialized sketch and reads all
    requested quantiles from it."""
    blob = ds.aggregate(KllQuantile(on=col, k=k, alias_name="kll",
                                    finalize_raw=True))["kll"]
    merged = KllSketch.deserialize(blob, k) if blob else KllSketch(k)
    return merged.quantiles(qs)


# ---------------------------------------------------------------------------
# Theta / KMV distinct sketch with set operations
# ---------------------------------------------------------------------------

class ThetaSketch:
    """K-minimum-values distinct sketch over uint64 hashes.

    estimate = (k-1) / theta where theta = k-th smallest hash / 2^64.
    Union: merge hash sets, keep k smallest. Intersection/difference:
    restrict both sets below min(theta_a, theta_b) and count overlap —
    the standard KMV set-operation estimators."""

    MAX_HASH = float(1 << 64)

    def __init__(self, k: int = 4096):
        self.k = k
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted, unique, ≤ k

    def add_hashes(self, h: np.ndarray) -> None:
        self.hashes = np.unique(np.concatenate([self.hashes, h]))[: self.k]

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        self.hashes = np.unique(np.concatenate([self.hashes, other.hashes]))[: self.k]
        return self

    @property
    def theta(self) -> float:
        if len(self.hashes) < self.k:
            return 1.0
        return float(self.hashes[-1]) / self.MAX_HASH

    def estimate(self) -> float:
        if len(self.hashes) < self.k:
            return float(len(self.hashes))
        return (self.k - 1) / self.theta

    @staticmethod
    def union(a: "ThetaSketch", b: "ThetaSketch") -> float:
        u = ThetaSketch(min(a.k, b.k))
        u.merge(a).merge(b)
        return u.estimate()

    @staticmethod
    def intersection(a: "ThetaSketch", b: "ThetaSketch") -> float:
        th = min(a.theta, b.theta)
        lim = np.uint64(int(th * ThetaSketch.MAX_HASH) - 1) if th < 1.0 else None
        ha = a.hashes if lim is None else a.hashes[a.hashes <= lim]
        hb = b.hashes if lim is None else b.hashes[b.hashes <= lim]
        inter = len(np.intersect1d(ha, hb, assume_unique=True))
        return inter / th if th > 0 else 0.0

    @staticmethod
    def difference(a: "ThetaSketch", b: "ThetaSketch") -> float:
        """|a \\ b| estimate."""
        th = min(a.theta, b.theta)
        lim = np.uint64(int(th * ThetaSketch.MAX_HASH) - 1) if th < 1.0 else None
        ha = a.hashes if lim is None else a.hashes[a.hashes <= lim]
        hb = b.hashes if lim is None else b.hashes[b.hashes <= lim]
        only = len(np.setdiff1d(ha, hb, assume_unique=True))
        return only / th if th > 0 else 0.0


def theta_sketch_of(ds: "rd.Dataset", col: str, k: int = 4096) -> ThetaSketch:
    """Build a distributed ThetaSketch of ``col``: per-block KMV sets
    (≤ k hashes each) tree-combined inside a constant-key
    ``Dataset.aggregate`` (round-3 review item: no driver merge loop).
    KMV union is associative+commutative — combine order can't change
    the sketch."""
    blob = ds.aggregate(ThetaAgg(on=col, k=k, alias_name="kmv"))["kmv"]
    merged = ThetaSketch(k)
    if blob:
        merged.hashes = np.frombuffer(blob, dtype=np.uint64).copy()
    return merged


# ---------------------------------------------------------------------------
# HLL as a NATIVE Ray Data grouped aggregate (AggregateFnV2)
# ---------------------------------------------------------------------------

try:  # AggregateFnV2 is the Ray 2.4x custom-aggregate interface
    from ray.data.aggregate import AggregateFnV2
    from ray.data.block import BlockAccessor

    class HllDistinct(AggregateFnV2):
        """Grouped approximate COUNT DISTINCT as a first-class Ray Data
        aggregate: per-block partial HLL registers (2^p bytes), register
        max-merge in ``combine``, estimate in ``finalize`` — the shuffle
        moves sketches, never values. Usable anywhere a built-in
        aggregate is: ``ds.groupby(k).aggregate(HllDistinct(on="col"))``."""

        def __init__(self, on: str, p: int = 12, alias_name: str | None = None,
                     ignore_nulls: bool = True):
            self._p = p
            super().__init__(
                alias_name if alias_name else f"approx_nd({on})",
                on=on,
                ignore_nulls=ignore_nulls,
                zero_factory=lambda: b"",
            )

        def aggregate_block(self, block) -> bytes:
            acc = BlockAccessor.for_block(block)
            tbl = acc.to_arrow()
            col = tbl[self._target_col_name]
            if self._ignore_nulls:
                col = col.drop_null()  # else each null group adds a phantom distinct
            sk = HllSketch(self._p)
            if len(col):
                h = pd.util.hash_pandas_object(
                    col.to_pandas(), index=False
                ).to_numpy()
                sk.add_hashes(h)
            return sk.registers.tobytes()

        def combine(self, current: bytes, new: bytes) -> bytes:
            if not current:
                return new
            if not new:
                return current
            a = np.frombuffer(current, dtype=np.uint8)
            b = np.frombuffer(new, dtype=np.uint8)
            return np.maximum(a, b).tobytes()

        def finalize(self, accumulator: bytes) -> float:
            sk = HllSketch(self._p)
            if accumulator:
                sk.registers = np.frombuffer(accumulator, dtype=np.uint8).copy()
            return float(sk.estimate())

except ImportError:  # pragma: no cover - older Ray without V2
    HllDistinct = None


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (frequent items) — mergeable
# ---------------------------------------------------------------------------

def mg_summarize(counts: dict, k: int) -> dict:
    """Reduce an exact {item: count} map to ≤ k Misra-Gries counters:
    repeatedly decrement all counters by the (k+1)-th largest and drop
    non-positives (equivalent closed form: subtract that pivot once).
    Guarantee: est(x) ≤ true(x) ≤ est(x) + (n_decremented / (k+1))."""
    if len(counts) <= k:
        return dict(counts)
    vals = np.fromiter(counts.values(), dtype=np.int64)
    pivot = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
    out = {item: c - pivot for item, c in counts.items() if c > pivot}
    if len(out) > k:  # ties at the pivot
        out = dict(sorted(out.items(), key=lambda kv: (-kv[1], str(kv[0])))[:k])
    return out


def mg_merge(a: dict, b: dict, k: int) -> dict:
    """Merge two MG summaries (Agarwal et al. 2012: pointwise add, then
    one more MG reduction) — associative up to the error bound, so
    per-block partials can combine in any tree shape."""
    merged = dict(a)
    for item, c in b.items():
        merged[item] = merged.get(item, 0) + c
    return mg_summarize(merged, k)


def frequent_items(
    ds: "rd.Dataset", col: str, k: int = 32, top: int | None = None
) -> pd.DataFrame:
    """Approximate top-``top`` heavy hitters of ``col``: per-block exact
    value_counts collapse to k Misra-Gries counters (the shuffle moves
    ≤ k (item, count) pairs per block, never values), tree-combined
    inside a constant-key ``Dataset.aggregate`` (round-3 review item: no
    driver merge loop). Any item with true frequency > n/(k+1) is
    guaranteed present. Useful at 100 TB as the hot-key detector feeding
    stages/salt.detect_hot_keys-style salting decisions."""

    blob = ds.aggregate(MisraGriesAgg(on=col, k=k, alias_name="mg"))["mg"]
    import pickle

    merged: dict = pickle.loads(blob) if blob else {}
    rows = sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))
    if top is not None:
        rows = rows[:top]
    return pd.DataFrame(rows, columns=["item", "est_count"])


try:
    from ray.data.aggregate import AggregateFnV2 as _AggV2

    class KllQuantile(_AggV2):
        """Grouped approximate quantile as a first-class Ray Data
        aggregate: per-block KLL sketches, level-concat merge in
        ``combine``, quantile read in ``finalize`` — the shuffle moves
        few-KB sketches, never values, and there is no per-group sort.
        ``ds.groupby(k).aggregate(KllQuantile(on="v", q=0.5))``."""

        def __init__(self, on: str, q: float = 0.5, k: int = 200,
                     alias_name: str | None = None, ignore_nulls: bool = True,
                     finalize_raw: bool = False):
            self._q = q
            self._k = k
            self._raw = finalize_raw  # finalize → serialized sketch bytes
            super().__init__(
                alias_name if alias_name else f"approx_p{int(q * 100)}({on})",
                on=on,
                ignore_nulls=ignore_nulls,
                zero_factory=lambda: b"",
            )

        def aggregate_block(self, block) -> bytes:
            from ray.data.block import BlockAccessor

            acc = BlockAccessor.for_block(block)
            tbl = acc.to_arrow()
            col = tbl[self._target_col_name]
            if self._ignore_nulls:
                col = col.drop_null()
            sk = KllSketch(self._k, seed=(len(col) * 2654435761) & 0x7FFFFFFF)
            if len(col):
                sk.add(col.to_numpy(zero_copy_only=False).astype(np.float64))
            return sk.serialize()

        def combine(self, current: bytes, new: bytes) -> bytes:
            if not current:
                return new
            if not new:
                return current
            a = KllSketch.deserialize(current, self._k)
            a.merge(KllSketch.deserialize(new, self._k))
            return a.serialize()

        def finalize(self, accumulator: bytes):
            if self._raw:
                return accumulator
            if not accumulator:
                return float("nan")
            sk = KllSketch.deserialize(accumulator, self._k)
            return float(sk.quantiles([self._q])[0])

except ImportError:  # pragma: no cover - older Ray without V2
    KllQuantile = None


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable approximate frequency counts
# ---------------------------------------------------------------------------

class CountMinSketch:
    """Count-Min (Cormode & Muthukrishnan 2005): ``d`` rows of ``w``
    int64 counters; an item maps to one counter per row via independent
    avalanched hashes, its estimate is the MIN over rows (always an
    OVERestimate, error ≤ n·e/w with prob 1-e^-d). Counter arrays add
    element-wise, so per-block partials merge in any tree shape — the
    mergeable-summary shape every sketch here follows.

    Hash probes use a per-row splitmix64 avalanche of the base key hash
    (NOT i·h2 double hashing, which produced lattice-correlated probes —
    see stages/bloom.py:_splitmix64)."""

    def __init__(self, w: int = 2048, d: int = 4):
        self.w = w
        self.d = d
        self.table = np.zeros((d, w), dtype=np.int64)

    @staticmethod
    def _splitmix64(z: np.ndarray) -> np.ndarray:
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def _positions(self, values: pd.Series) -> np.ndarray:
        """(d, n) column indices for each value."""
        h1 = pd.util.hash_pandas_object(values, index=False).to_numpy()
        seeds = self._splitmix64(
            np.arange(1, self.d + 1, dtype=np.uint64))[:, None]
        mixed = self._splitmix64(h1[None, :] ^ seeds)
        return (mixed % np.uint64(self.w)).astype(np.int64)

    def add_values(self, values: pd.Series, counts: np.ndarray) -> None:
        """Bulk add: ``counts[i]`` occurrences of ``values[i]``."""
        pos = self._positions(values)
        for r in range(self.d):
            np.add.at(self.table[r], pos[r], counts)

    def estimate(self, values: pd.Series) -> np.ndarray:
        pos = self._positions(values)
        ests = np.stack([self.table[r][pos[r]] for r in range(self.d)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.w, self.d) == (other.w, other.d)
        self.table += other.table
        return self

    def serialize(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes, w: int, d: int) -> "CountMinSketch":
        sk = cls(w, d)
        sk.table = np.frombuffer(blob, dtype=np.int64).reshape(d, w).copy()
        return sk


def countmin_of(
    ds: "rd.Dataset", col: str, w: int = 2048, d: int = 4
) -> CountMinSketch:
    """Distributed Count-Min build: each block collapses to exact
    value_counts then folds them into one (d×w×8)-byte partial; the
    partials tree-combine inside a constant-key ``Dataset.aggregate``
    (element-wise adds are order-independent — round-3 review item: no
    driver merge loop). Pair with
    ``frequent_items`` (Misra-Gries) for the candidate set — MG finds
    WHICH items are hot, Count-Min refines HOW hot (MG underestimates,
    CM overestimates, so [mg_est, cm_est] brackets the true count)."""

    blob = ds.aggregate(CountMinAgg(on=col, w=w, d=d, alias_name="cms"))["cms"]
    return CountMinSketch.deserialize(blob, w, d) if blob else CountMinSketch(w, d)


# ---------------------------------------------------------------------------
# Theta / Misra-Gries / Count-Min as native Ray Data aggregates — the
# constant-key global path reuses the exact machinery the grouped
# HllDistinct / KllQuantile variants already use: per-block partials,
# tree combine inside Ray's aggregate, finalize at the end.
# ---------------------------------------------------------------------------

try:
    from ray.data.aggregate import AggregateFnV2 as _AggV2Sets
    from ray.data.block import BlockAccessor as _BA

    class ThetaAgg(_AggV2Sets):
        """KMV/Theta distinct sketch as a Ray Data aggregate: per-block
        k-minimum-hash sets, sorted-unique-union combine, serialized
        hash array out (wrap with ``ThetaSketch`` for set operations)."""

        def __init__(self, on: str, k: int = 4096,
                     alias_name: str | None = None, ignore_nulls: bool = True):
            self._k = k
            super().__init__(alias_name if alias_name else f"theta({on})",
                             on=on, ignore_nulls=ignore_nulls,
                             zero_factory=lambda: b"")

        def aggregate_block(self, block) -> bytes:
            col = _BA.for_block(block).to_arrow()[self._target_col_name]
            if self._ignore_nulls:
                col = col.drop_null()
            sk = ThetaSketch(self._k)
            if len(col):
                h = pd.util.hash_pandas_object(col.to_pandas(),
                                               index=False).to_numpy()
                sk.add_hashes(np.unique(h))
            return sk.hashes.tobytes()

        def combine(self, current: bytes, new: bytes) -> bytes:
            if not current:
                return new
            if not new:
                return current
            a = np.frombuffer(current, dtype=np.uint64)
            b = np.frombuffer(new, dtype=np.uint64)
            return np.unique(np.concatenate([a, b]))[: self._k].tobytes()

        def finalize(self, accumulator: bytes) -> bytes:
            return accumulator

    class MisraGriesAgg(_AggV2Sets):
        """Misra-Gries heavy-hitter summary as a Ray Data aggregate:
        per-block exact value_counts reduced to ≤ k counters, pointwise
        add + re-reduce combine (Agarwal et al. 2012 — associative up to
        the error bound), pickled {item: count} map out."""

        def __init__(self, on: str, k: int = 32,
                     alias_name: str | None = None, ignore_nulls: bool = True):
            self._k = k
            super().__init__(alias_name if alias_name else f"mg({on})",
                             on=on, ignore_nulls=ignore_nulls,
                             zero_factory=lambda: b"")

        def aggregate_block(self, block) -> bytes:
            import pickle

            col = _BA.for_block(block).to_arrow()[self._target_col_name]
            if self._ignore_nulls:
                col = col.drop_null()
            vc = col.to_pandas().value_counts()
            summary = mg_summarize({i: int(c) for i, c in vc.items()}, self._k)
            return pickle.dumps(summary)

        def combine(self, current: bytes, new: bytes) -> bytes:
            import pickle

            if not current:
                return new
            if not new:
                return current
            return pickle.dumps(mg_merge(pickle.loads(current),
                                         pickle.loads(new), self._k))

        def finalize(self, accumulator: bytes) -> bytes:
            return accumulator

    class CountMinAgg(_AggV2Sets):
        """Count-Min frequency sketch as a Ray Data aggregate: per-block
        exact value_counts folded into one (d×w) int64 table, element-wise
        add combine, serialized table out."""

        def __init__(self, on: str, w: int = 2048, d: int = 4,
                     alias_name: str | None = None, ignore_nulls: bool = True):
            self._w = w
            self._d = d
            super().__init__(alias_name if alias_name else f"cms({on})",
                             on=on, ignore_nulls=ignore_nulls,
                             zero_factory=lambda: b"")

        def aggregate_block(self, block) -> bytes:
            col = _BA.for_block(block).to_arrow()[self._target_col_name]
            if self._ignore_nulls:
                col = col.drop_null()
            sk = CountMinSketch(self._w, self._d)
            if len(col):
                vc = col.to_pandas().value_counts()
                sk.add_values(pd.Series(vc.index), vc.to_numpy(dtype=np.int64))
            return sk.serialize()

        def combine(self, current: bytes, new: bytes) -> bytes:
            if not current:
                return new
            if not new:
                return current
            a = CountMinSketch.deserialize(current, self._w, self._d)
            a.merge(CountMinSketch.deserialize(new, self._w, self._d))
            return a.serialize()

        def finalize(self, accumulator: bytes) -> bytes:
            return accumulator

except ImportError:  # pragma: no cover - older Ray without V2
    ThetaAgg = MisraGriesAgg = CountMinAgg = None
