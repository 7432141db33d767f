"""Approximate / mergeable sketch aggregates.

HyperLogLog approximate COUNT DISTINCT: each batch emits one serialized
register array (the sketches are mergeable by element-wise max), a tiny
final stage merges them — the canonical shape for sketch aggregation at
100 TB (shuffle moves 2^p bytes per batch, never values). No reference
counterpart (sous-chef has no sketches); standard Flajolet et al. HLL
with the usual small-range correction.
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
    """Approximate global COUNT(DISTINCT col): per-batch HLL sketches
    merged on the driver (each sketch is 2^p bytes)."""

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[col], index=False).to_numpy()
        sk = HllSketch(p)
        sk.add_hashes(h)
        return pd.DataFrame({"registers": [sk.registers.tobytes()]})

    merged = HllSketch(p)
    for batch in ds.map_batches(sketch_batch, batch_format="pandas").iter_batches(
        batch_size=None, batch_format="pandas"
    ):
        for blob in batch["registers"]:
            other = HllSketch(p)
            other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
            merged.merge(other)
    return merged.estimate()
