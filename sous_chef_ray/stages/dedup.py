"""Dedup operators.

* ``latest_per_key`` — Feast latest-row semantics (SURVEY §2.B4, reference:
  src/sous_chef/sous_chef.py:41 created_timestamp_column): keep, per key,
  the row with the greatest (order_by, tie_by). Two-phase: a vectorized
  per-batch partial reduce (drops everything but each batch's winners, so
  the shuffle moves ≤ one row per key per block) then a hash groupby final
  reduce. No full materialization.

* ``exact_dedup`` — exact content dedup: keep the first row (smallest
  keep_by) per content group. Same partial→final shape; at 100 TB the
  content column should be a precomputed hash/fingerprint so the shuffle
  moves hashes, not documents (see stages/text.py fingerprinting).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray.data as rd


def _last_per_group(df: pd.DataFrame, keys: List[str], order: List[str]) -> pd.DataFrame:
    df = df.sort_values(order, kind="mergesort")
    return df.drop_duplicates(subset=keys, keep="last")


def latest_per_key(
    ds: "rd.Dataset",
    keys: List[str] | str,
    order_by: str,
    tie_by: Optional[str] = None,
) -> "rd.Dataset":
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order_by] + ([tie_by] if tie_by else [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _last_per_group(df, keys, order)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return _last_per_group(g, keys, order)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .map_groups(final, batch_format="pandas")
    )


def _first_per_group(df: pd.DataFrame, keys: List[str], order: List[str]) -> pd.DataFrame:
    df = df.sort_values(order, kind="mergesort")
    return df.drop_duplicates(subset=keys, keep="first")


def exact_dedup(
    ds: "rd.Dataset",
    content_cols: List[str] | str,
    keep_by: str,
) -> "rd.Dataset":
    """Keep the row with the smallest ``keep_by`` per distinct content."""
    content_cols = (
        [content_cols] if isinstance(content_cols, str) else list(content_cols)
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _first_per_group(df, content_cols, [keep_by])

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return _first_per_group(g, content_cols, [keep_by])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(content_cols)
        .map_groups(final, batch_format="pandas")
    )


def hash_split(
    ds: "rd.Dataset",
    col: str,
    fractions: dict,
    name: str = "split",
    seed: int = 0,
) -> "rd.Dataset":
    """Deterministic dataset splitting (train/val/test) by key hash:
    each row's split depends ONLY on its key value and the seed — stable
    across runs, partitionings and cluster sizes, and all rows sharing a
    key (e.g. doc versions) land in the same split (no leakage).

    ``fractions``: {"train": 0.9, "val": 0.05, "test": 0.05} — must sum
    to ~1. One map_batches pass, no shuffle.
    """
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names])
    if not 0.999 <= bounds[-1] <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {bounds[-1]}")
    # modular 2^64 product (computed in Python ints to avoid the numpy
    # scalar-overflow RuntimeWarning — the wraparound is the point)
    salt = np.uint64((0x9E3779B97F4A7C15 * (seed + 1)) & 0xFFFFFFFFFFFFFFFF)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[col], index=False).to_numpy()
        with np.errstate(over="ignore"):
            u = (h * salt).astype(np.float64) / float(1 << 64)
        idx = np.searchsorted(bounds, u, side="right")
        idx = np.minimum(idx, len(names) - 1)
        df = df.copy()
        df[name] = np.array(names, dtype=object)[idx]
        return df

    return ds.map_batches(fn, batch_format="pandas")
