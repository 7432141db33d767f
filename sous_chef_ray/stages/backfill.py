"""Backfill: forward-fill the last-known feature value over a dense spine
(north-rule operator, SURVEY §2.D; generalizes the reference's TTL/null
semantics at sous_chef.py:227).

Given a sparse feature table (key, ts, value...) and a dense per-key grid
of query times (e.g. daily), emit one row per (key, grid_ts) carrying the
latest feature at-or-before grid_ts within TTL, else null. This IS an
as-of join of the dense spine against the features — we reuse the
streaming as-of machinery rather than a bespoke scan.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from sous_chef_ray.stages.asof import asof_join_broadcast


def dense_spine(
    keys: pa.Array | np.ndarray,
    start: np.datetime64,
    end: np.datetime64,
    step: pd.Timedelta,
    key_name: str = "key",
    ts_name: str = "grid_ts",
) -> pa.Table:
    """Cartesian key × time-grid spine (driver-side; grid is small —
    at scale generate per-key grids inside map_batches instead)."""
    ks = np.asarray(keys)
    step_us = int(pd.Timedelta(step).value // 1000)
    t0 = np.datetime64(start, "us").astype(np.int64)
    t1 = np.datetime64(end, "us").astype(np.int64)
    grid = np.arange(t0, t1 + 1, step_us, dtype=np.int64)
    kk = np.repeat(ks, len(grid))
    tt = np.tile(grid, len(ks))
    return pa.table(
        {
            key_name: pa.array(kk),
            ts_name: pa.array(tt, type=pa.timestamp("us")),
        }
    )


def backfill(
    features: "rd.Dataset",
    spine: pa.Table,
    *,
    key: str,
    spine_ts: str,
    feature_ts: str,
    payload_cols: List[str],
    ttl: Optional[pd.Timedelta] = None,
    tie_col: Optional[str] = None,
    concurrency: int | tuple = 4,
) -> pa.Table:
    """Forward-fill features onto the dense spine (TTL-bounded)."""
    return asof_join_broadcast(
        features,
        spine,
        key=key,
        spine_ts=spine_ts,
        feature_ts=feature_ts,
        tie_col=tie_col,
        payload_cols=payload_cols,
        ttl=ttl,
        concurrency=concurrency,
    )
