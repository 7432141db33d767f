"""Interval (range) join: points ⋈ intervals on key AND
start ≤ point_ts < end.

Ray Data has no range-join operator; the scalable plan is GRANULE
BUCKETING (the standard time-bucketed interval join): each interval is
exploded to the coarse time granules it overlaps, each point carries its
single granule, and a hash equi-join on (key, granule) followed by the
exact range filter produces the result. Because a point belongs to
exactly ONE granule, no pair can appear twice — no dedup pass. The
equi-join blowup is bounded by interval_length/granule + 1 copies per
interval (pick ``granule`` near the typical interval length), instead of
the per-key |points|×|intervals| cross product a naive key join risks.

Many-to-many semantics: a point inside k overlapping intervals emits k
rows (SQL range-join behavior).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_GRANULE_COL = "__granule__"


def _ts_us(arr: pa.ChunkedArray) -> np.ndarray:
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp("us"))
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def interval_join(
    points: "rd.Dataset",
    intervals: "rd.Dataset",
    *,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    granule: pd.Timedelta,
    point_cols: Optional[List[str]] = None,
    interval_cols: Optional[List[str]] = None,
    num_partitions: int = 32,
) -> "rd.Dataset":
    """Rows = (key, point cols, interval cols) for every point falling in
    [start, end) of a same-key interval."""
    g_us = int(pd.Timedelta(granule).value // 1000)
    point_cols = point_cols or [c for c in points.schema().names if c != key]
    interval_cols = interval_cols or [
        c for c in intervals.schema().names if c != key
    ]

    def tag_points(t: pa.Table) -> pa.Table:
        ts = _ts_us(t[point_ts].combine_chunks())
        cols = {key: t[key], _GRANULE_COL: pa.array(ts // g_us)}
        for c in dict.fromkeys([point_ts, *point_cols]):
            cols[c] = t[c]
        return pa.table(cols)

    def explode_intervals(t: pa.Table) -> pa.Table:
        s = _ts_us(t[start_ts].combine_chunks())
        e = _ts_us(t[end_ts].combine_chunks())
        g0 = s // g_us
        # end is exclusive: the last granule containing any covered point
        g1 = np.maximum((e - 1) // g_us, g0)
        reps = (g1 - g0 + 1).astype(np.int64)
        row_idx = np.repeat(np.arange(len(t), dtype=np.int64), reps)
        offs = np.zeros(len(t), dtype=np.int64)
        np.cumsum(reps[:-1], out=offs[1:])
        within = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(offs, reps)
        gran = np.repeat(g0, reps) + within
        take = pa.array(row_idx)
        cols = {key: t[key].take(take), _GRANULE_COL: pa.array(gran)}
        for c in dict.fromkeys([start_ts, end_ts, *interval_cols]):
            cols[c] = t[c].take(take)
        return pa.table(cols)

    tagged_points = points.map_batches(tag_points, batch_format="pyarrow",
                                       zero_copy_batch=True)
    tagged_intervals = intervals.map_batches(explode_intervals,
                                             batch_format="pyarrow",
                                             zero_copy_batch=True)
    joined = tagged_points.join(
        tagged_intervals,
        join_type="inner",
        num_partitions=num_partitions,
        on=(key, _GRANULE_COL),
    )

    def exact_filter(t: pa.Table) -> pa.Table:
        ts = _ts_us(t[point_ts].combine_chunks())
        s = _ts_us(t[start_ts].combine_chunks())
        e = _ts_us(t[end_ts].combine_chunks())
        keep = (ts >= s) & (ts < e)
        out = t.filter(pa.array(keep))
        return out.drop_columns([_GRANULE_COL])

    return joined.map_batches(exact_filter, batch_format="pyarrow",
                              zero_copy_batch=True)
