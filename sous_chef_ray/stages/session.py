"""Gap-based sessionization (north-rule operator, SURVEY §2.D).

Assign a session id per (key, ordered event): a new session starts when
ts - prev_ts > gap. Bucket-partitioned (a key's rows never straddle
buckets) and fully vectorized: one Arrow sort + numpy pass per bucket,
exact int64 timestamp arithmetic (no float round-trip — gap comparisons
stay exact at nanosecond resolution). Payload columns move by zero-copy
Arrow take, never through pandas object arrays.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from sous_chef_ray.stages.partition import partition_apply
from sous_chef_ray.stages.window import _sorted_with_bounds


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

    def fn(t: pa.Table) -> pa.Table:
        order = [ts_col] + ([tie_by] if tie_by else [])
        t, key_change, _, _ = _sorted_with_bounds(t, keys, order, False)
        n = len(t)
        c = t[ts_col].combine_chunks()
        if pa.types.is_timestamp(c.type):
            c = c.cast(pa.timestamp("ns"))
        tsv = c.cast(pa.int64()).to_numpy(zero_copy_only=False)
        diff = np.empty(n, dtype=np.int64)
        diff[0] = 0
        diff[1:] = tsv[1:] - tsv[:-1]
        is_new = key_change | (diff > gap_ns)
        sid = np.cumsum(is_new)
        base = np.maximum.accumulate(np.where(key_change, sid, 0))
        return t.append_column(session_name, pa.array((sid - base + 1).astype(np.int64)))

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")
