"""Event-time windows over a keyed event log (streaming-shaped workload
on a batch engine — the input is an ordered, partitioned log; Ray Data
has no watermarks, so windows close when the batch is complete).

* ``tumbling_window_agg`` — non-overlapping fixed windows: assign
  window_start = floor(ts / size) vectorized in the batch pass, then an
  ordinary hash aggregate. No custom shuffle.
* ``hopping_window_agg`` — overlapping windows (size, hop): each event
  belongs to ceil(size/hop) windows; the batch pass EXPLODES events into
  their windows (vectorized repeat) and the same hash aggregate runs.
  Shuffle volume multiplies by the overlap factor — callers pick
  size/hop accordingly.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    return (
        col.combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )


def tumbling_window_agg(
    ds: "rd.Dataset",
    keys: List[str] | str,
    ts_col: str,
    window: pd.Timedelta,
    value_int_col: str | None = None,
) -> "rd.Dataset":
    """COUNT(*) (+ exact SUM of an integer-scaled value column) per
    (keys, tumbling window). Windows are epoch-aligned."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w_us = int(pd.Timedelta(window).value // 1000)

    def assign(t: pa.Table) -> pa.Table:
        ts = _ts_us(t[ts_col])
        start = (ts // w_us) * w_us
        cols = {k: t[k] for k in keys}
        cols["window_start"] = pa.array(start, type=pa.timestamp("us"))
        if value_int_col:
            cols[value_int_col] = t[value_int_col]
        return pa.table(cols)

    aggs = [Count(alias_name="n_events")]
    if value_int_col:
        aggs.append(Sum(value_int_col, alias_name=f"sum_{value_int_col}"))
    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys + ["window_start"])
        .aggregate(*aggs)
    )


def hopping_window_agg(
    ds: "rd.Dataset",
    keys: List[str] | str,
    ts_col: str,
    window: pd.Timedelta,
    hop: pd.Timedelta,
    value_int_col: str | None = None,
) -> "rd.Dataset":
    """Overlapping (hopping/sliding) windows: an event at ts belongs to
    every window whose start is in (ts - window, ts] on the hop grid."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w_us = int(pd.Timedelta(window).value // 1000)
    h_us = int(pd.Timedelta(hop).value // 1000)
    fanout = int(np.ceil(w_us / h_us))

    def explode(t: pa.Table) -> pa.Table:
        ts = _ts_us(t[ts_col])
        n = len(ts)
        # candidate window starts: floor to hop grid, going back fanout hops
        last_start = (ts // h_us) * h_us
        starts = last_start[:, None] - np.arange(fanout)[None, :] * h_us
        valid = (starts > ts[:, None] - w_us) & (starts <= ts[:, None])
        rows = np.repeat(np.arange(n), fanout)[valid.reshape(-1)]
        wins = starts.reshape(-1)[valid.reshape(-1)]
        idx = pa.array(rows)
        cols = {k: t[k].combine_chunks().take(idx) for k in keys}
        cols["window_start"] = pa.array(wins, type=pa.timestamp("us"))
        if value_int_col:
            cols[value_int_col] = t[value_int_col].combine_chunks().take(idx)
        return pa.table(cols)

    aggs = [Count(alias_name="n_events")]
    if value_int_col:
        aggs.append(Sum(value_int_col, alias_name=f"sum_{value_int_col}"))
    return (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys + ["window_start"])
        .aggregate(*aggs)
    )
