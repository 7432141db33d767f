"""Bloom-filter join pushdown — constant-size membership pre-filtering.

At 100 TB the broadcast EXACT key set of ``stages/join.semi_join`` can
itself get large (10⁹ keys × 8 B = 8 GB per worker). A Bloom filter
caps the broadcast at ``num_bits/8`` bytes regardless of key count, at
the price of a tunable false-positive rate: filter the big side with
the bloom BEFORE the shuffle join (drops ~all non-matching rows), then
let the exact join remove the few false positives. Classic pushdown
shape (runtime filters in Spark/Presto/DuckDB).

Build is distributed (per-batch partial bitmasks OR-reduce; only
``num_bits/8``-byte masks move); the probe is one vectorized
double-hashing pass per batch. Hashes come from
``pd.util.hash_pandas_object`` over NUL-escaped strings — the same
deterministic key hash the engine's partitioners use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from sous_chef_ray.stages._util import nul_safe_key_strings, pool


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — full avalanche so every output bit depends
    on every input bit. Plain i·h2 double hashing off pandas' integer
    hash produced lattice-correlated probe positions (measured 0.8% fp
    where theory says ~1e-9); independent avalanched probes fix it."""
    z = (z + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _key_hashes(col, num_bits: int, k: int):
    """(k, n) int64 bit positions: per-probe splitmix64 avalanche of the
    base key hash xor a per-probe seed — positions are pairwise
    independent across probes AND across keys (see _splitmix note)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    safe = nul_safe_key_strings(col)
    h1 = pd.util.hash_pandas_object(
        pd.Series(safe.to_numpy(zero_copy_only=False)), index=False
    ).to_numpy()
    seeds = _splitmix64(np.arange(1, k + 1, dtype=np.uint64))[:, None]
    mixed = _splitmix64(h1[None, :] ^ seeds)
    return (mixed % np.uint64(num_bits)).astype(np.int64)


def bloom_build(
    ds: "rd.Dataset", col: str, *, num_bits: int = 1 << 23, k: int = 7
) -> bytes:
    """Distributed Bloom build over ``ds[col]``: per-batch partial
    bitmasks (``num_bits/8`` bytes each), OR-merged — key bytes never
    leave their block. Returns the filter bitmask."""
    nbytes = num_bits // 8

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        if len(t):
            pos = _key_hashes(t[col], num_bits, k).reshape(-1)
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pa.table({"mask": pa.array([bits.tobytes()], type=pa.large_binary())})

    merged = np.zeros(nbytes, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for blob in b["mask"].to_pylist():
            merged |= np.frombuffer(blob, dtype=np.uint8)
    return merged.tobytes()


class _BloomProbe:
    def __init__(self, mask_ref, col: str, num_bits: int, k: int, keep: bool):
        self.bits = np.frombuffer(ray.get(mask_ref), dtype=np.uint8)
        self.col = col
        self.num_bits = num_bits
        self.k = k
        self.keep = keep

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        pos = _key_hashes(t[self.col], self.num_bits, self.k)  # (k, n)
        hit = np.ones(len(t), dtype=bool)
        for i in range(self.k):
            p = pos[i]
            hit &= (self.bits[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return t.filter(pa.array(hit if self.keep else ~hit))


def bloom_semi_filter(
    big: "rd.Dataset",
    small: "rd.Dataset",
    col: str,
    *,
    small_col: str | None = None,
    num_bits: int = 1 << 23,
    k: int = 7,
    concurrency: int | tuple = 4,
) -> "rd.Dataset":
    """``big`` rows whose ``col`` PROBABLY appears in ``small[small_col]``
    — a constant-size-broadcast superset of the exact semi join (false
    positives only, never false negatives: every true match survives).
    Compose with an exact join/filter downstream to remove the
    ~``(1-e^{-kn/m})^k`` false-positive residue."""
    mask = bloom_build(small, small_col or col, num_bits=num_bits, k=k)
    mask_ref = ray.put(mask)
    return big.map_batches(
        _BloomProbe,
        fn_constructor_kwargs=dict(mask_ref=mask_ref, col=col,
                                   num_bits=num_bits, k=k, keep=True),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool(concurrency),
    )
