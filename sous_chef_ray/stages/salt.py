"""Hot-key salting (north-rule skew handling, SURVEY §4).

A Zipf-hot ``doc_id`` or ``source`` key turns any key-partitioned stage
into a straggler: one bucket gets the hot key's entire row mass. Salting
splits a hot key into ``factor`` pseudo-keys (``key\x00i``) so its rows
spread across buckets; the small side of a join replicates its hot-key
rows once per salt shard; after the keyed op the salt is stripped.

Detection samples the dataset (driver-side reservoir over block samples)
— at 10^12 rows the sample is a few blocks, not a scan.
"""

from __future__ import annotations

from typing import Dict, List, Set

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

# Separator between key and salt shard. MUST NOT be NUL:
# pd.util.hash_pandas_object is not value-deterministic for strings with
# embedded \x00 (its C fast path truncates at the NUL, its fallback does
# not, and which one runs depends on the OTHER values in the array) — a
# \x00 separator made the same pseudo-key hash to different buckets in
# different batches. \x1f (unit separator) hashes stably and is
# vanishingly rare in real keys.
SALT_SEP = "\x1f"


def detect_hot_keys(
    ds: "rd.Dataset",
    key: str,
    threshold: float = 0.01,
    sample_rows: int = 250_000,
) -> Set:
    """Keys whose sampled frequency exceeds ``threshold`` of all rows."""
    remaining = sample_rows
    counts: Dict = {}
    total = 0
    for batch in ds.select_columns([key]).iter_batches(
        batch_size=65536, batch_format="pandas"
    ):
        vc = batch[key].value_counts()
        for k, c in vc.items():
            counts[k] = counts.get(k, 0) + int(c)
        total += len(batch)
        remaining -= len(batch)
        if remaining <= 0:
            break
    if total == 0:
        return set()
    return {k for k, c in counts.items() if c / total >= threshold}


def salt_keys(
    ds: "rd.Dataset",
    key: str,
    hot_keys: Set,
    factor: int = 8,
    salted_name: str | None = None,
    seed: int = 17,
) -> "rd.Dataset":
    """Add a salted key column: hot keys fan out over ``factor`` shards
    (deterministic per-row assignment), cold keys pass through."""
    salted_name = salted_name or f"{key}__salted"
    hot = frozenset(hot_keys)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        kv = df[key].astype(str)
        is_hot = df[key].isin(hot).to_numpy()
        # deterministic shard from a per-row hash (stable across runs)
        shard = (
            pd.util.hash_pandas_object(df.reset_index(drop=True).index.to_series(), index=False)
            .to_numpy() % np.uint64(factor)
        ).astype(np.int64)
        salted = kv.to_numpy(dtype=object).copy()
        salted[is_hot] = [
            f"{v}{SALT_SEP}{s}" for v, s in zip(salted[is_hot], shard[is_hot])
        ]
        df[salted_name] = salted
        return df

    return ds.map_batches(fn, batch_format="pandas")


def replicate_for_salt(
    small: pd.DataFrame | pa.Table,
    key: str,
    hot_keys: Set,
    factor: int = 8,
    salted_name: str | None = None,
) -> pd.DataFrame:
    """Small-side counterpart: hot-key rows are replicated once per salt
    shard so every salted partition sees them; cold rows keep bare keys."""
    if isinstance(small, pa.Table):
        small = small.to_pandas()
    salted_name = salted_name or f"{key}__salted"
    hot_mask = small[key].isin(hot_keys)
    cold = small[~hot_mask].copy()
    cold[salted_name] = cold[key].astype(str)
    reps: List[pd.DataFrame] = [cold]
    hot_rows = small[hot_mask]
    for shard in range(factor):
        rep = hot_rows.copy()
        rep[salted_name] = rep[key].astype(str) + f"{SALT_SEP}{shard}"
        reps.append(rep)
    return pd.concat(reps, ignore_index=True)


def strip_salt(ds: "rd.Dataset", salted_name: str) -> "rd.Dataset":
    """Drop the salt suffix/column after the keyed operation."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=[salted_name], errors="ignore")

    return ds.map_batches(fn, batch_format="pandas")
