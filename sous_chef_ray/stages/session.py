"""Gap-based sessionization (north-rule operator, SURVEY §2.D).

Assign a session id per (key, ordered event): a new session starts when
ts - prev_ts > gap. Bucket-partitioned (a key's rows never straddle
buckets) and fully vectorized: one numpy pass per bucket, exact int64
timestamp arithmetic (no float round-trip — gap comparisons stay exact
at nanosecond resolution).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd

import ray.data as rd

from sous_chef_ray.stages.partition import partition_apply


def sessionize(
    ds: "rd.Dataset",
    key: List[str] | str,
    ts_col: str,
    gap: pd.Timedelta,
    tie_by: str | None = None,
    session_name: str = "session_id",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Add ``session_name``: 1-based session index within each key,
    ordered by (ts_col, tie_by); a gap > ``gap`` starts a new session."""
    keys = [key] if isinstance(key, str) else list(key)
    gap_ns = pd.Timedelta(gap).value

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        order = [ts_col] + ([tie_by] if tie_by else [])
        df = df.sort_values(keys + order, kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            df[session_name] = pd.Series([], dtype=np.int64)
            return df
        tsv = df[ts_col].to_numpy()
        if tsv.dtype.kind == "M":
            tsv = tsv.astype("datetime64[ns]").astype(np.int64)
        else:
            tsv = tsv.astype(np.int64)
        key_change = np.zeros(n, dtype=bool)
        key_change[0] = True
        for k in keys:
            kv = df[k].to_numpy()
            key_change[1:] |= kv[1:] != kv[:-1]
        diff = np.empty(n, dtype=np.int64)
        diff[0] = 0
        diff[1:] = tsv[1:] - tsv[:-1]
        is_new = key_change | (diff > gap_ns)
        sid = np.cumsum(is_new)
        base = np.where(key_change, sid, 0)
        base = np.maximum.accumulate(base)
        df[session_name] = (sid - base + 1).astype(np.int64)
        return df

    return partition_apply(ds, keys, fn, num_buckets)
