"""Window functions over key partitions (SURVEY §2.C7-C11).

The reference recognizes RANK / ROW_NUMBER / LAG / LEAD / FIRST_VALUE /
LAST_VALUE / moving aggregates for warehouse pushdown (reference:
src/sous_chef/validators.py:15-16, tests/test_teradata_sources.py:58-69);
here they are native Ray Data operators: hash-bucket partition by key →
per-bucket ARROW kernels (``pc.sort_indices`` + numpy boundary masks +
zero-copy ``take``). One sort per bucket, no pandas conversion — list /
timestamp / string payload columns never leave Arrow. Ordering inside a
key is (order_by, tie_by...) ascending unless stated.

Group machinery: after the bucket-local sort, ``key_change[i]`` marks the
first row of each key run and ``group_start[i]`` is the row index where
row *i*'s key run begins (a ``np.maximum.accumulate`` over marked
indices). Every operator below is O(n) numpy arithmetic over those two
arrays — the same kernel shape as the fused flagship op
(pipelines/materialize.window_features), measured ~2× the pandas
groupby-transform path it replaces.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from sous_chef_ray.stages._util import adjacent_neq
from sous_chef_ray.stages.partition import partition_apply


def _as_list(x) -> List[str]:
    return [x] if isinstance(x, str) else list(x)


def _sort_keys(keys: List[str], order: List[str], desc) -> list:
    if isinstance(desc, bool):
        desc = [desc] * len(order)
    return [(k, "ascending") for k in keys] + [
        (o, "descending" if d else "ascending") for o, d in zip(order, desc)
    ]


def _sorted_with_bounds(
    t: pa.Table, keys: List[str], order: List[str], desc
) -> Tuple[pa.Table, np.ndarray, np.ndarray, np.ndarray]:
    """Sort a bucket by (keys, order) and return
    (sorted_table, key_change_mask, group_start_index, arange)."""
    idx = pc.sort_indices(t, sort_keys=_sort_keys(keys, order, desc))
    t = t.take(idx)
    n = len(t)
    arange = np.arange(n, dtype=np.int64)
    key_change = np.zeros(n, dtype=bool)
    if n:
        key_change[0] = True
        for k in keys:
            key_change[1:] |= adjacent_neq(t[k])
    group_start = np.maximum.accumulate(np.where(key_change, arange, 0))
    return t, key_change, group_start, arange


def _filled_values(t: pa.Table, col: str) -> Tuple[np.ndarray, np.ndarray]:
    """(values with nulls→0, non-null indicator int64) for prefix sums.

    A raw ``to_numpy`` turns a single null into NaN and poisons every
    later cumsum value in the bucket; SQL SUM/COUNT skip nulls instead.
    """
    c = t[col].combine_chunks()
    nn = np.asarray(pc.is_valid(c)).astype(np.int64)
    v = pc.fill_null(c, 0).to_numpy(zero_copy_only=False)
    return v, nn


def _take_with_validity(col: pa.ChunkedArray, idx: np.ndarray, valid: np.ndarray):
    """col.take(idx) with nulls where ``valid`` is False (any dtype)."""
    safe = np.where(valid, idx, 0)
    return col.take(pa.array(safe, type=pa.int64(), mask=~valid))


def with_row_number(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    descending: bool | List[bool] = False,
    name: str = "rn",
    num_buckets: int = 64,
) -> "rd.Dataset":
    keys, order = _as_list(partition_by), _as_list(order_by)

    def fn(t: pa.Table) -> pa.Table:
        t, _, group_start, arange = _sorted_with_bounds(t, keys, order, descending)
        return t.append_column(name, pa.array(arange - group_start + 1))

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def with_rank(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    descending: bool | List[bool] = False,
    name: str = "rank",
    dense: bool = False,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """SQL RANK() / DENSE_RANK() semantics (ties share a rank). Peers
    are rows equal on ALL order keys, with NULLs equal to each other
    (SQL ordering treats NULL as one value, not NaN != NaN)."""
    import pandas as pd

    keys, order = _as_list(partition_by), _as_list(order_by)

    def fn(t: pa.Table) -> pa.Table:
        t, key_change, group_start, arange = _sorted_with_bounds(
            t, keys, order, descending
        )
        n = len(t)
        value_change = key_change.copy()
        if n:
            for oc in order:
                ov = t[oc].to_numpy(zero_copy_only=False)
                na = pd.isna(ov)
                eq = (ov[1:] == ov[:-1]) | (na[1:] & na[:-1])
                value_change[1:] |= ~eq
        if dense:
            vc_cum = np.cumsum(value_change)
            base = np.maximum.accumulate(np.where(key_change, vc_cum, 0))
            rank = vc_cum - base + 1
        else:
            first_tie = np.maximum.accumulate(np.where(value_change, arange, 0))
            rank = first_tie - group_start + 1
        return t.append_column(name, pa.array(rank.astype(np.int64)))

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def with_lag_lead(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    col: str,
    lag: int = 1,
    lead: int = 1,
    lag_name: Optional[str] = None,
    lead_name: Optional[str] = None,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """LAG/LEAD of ``col`` within each key, ordered by ``order_by``.
    Arrow ``take`` with masked indices — works for any column dtype."""
    keys, order = _as_list(partition_by), _as_list(order_by)
    lag_name = lag_name or f"{col}_lag{lag}"
    lead_name = lead_name or f"{col}_lead{lead}"

    def fn(t: pa.Table) -> pa.Table:
        t, key_change, group_start, arange = _sorted_with_bounds(t, keys, order, False)
        n = len(t)
        key_end = np.zeros(n, dtype=bool)
        if n:
            key_end[-1] = True
            key_end[:-1] = key_change[1:]
        group_end = np.minimum.accumulate(np.where(key_end, arange, n)[::-1])[::-1]
        c = t[col].combine_chunks()
        if lag:
            li = arange - lag
            t = t.append_column(lag_name, _take_with_validity(c, li, li >= group_start))
        if lead:
            li = arange + lead
            t = t.append_column(lead_name, _take_with_validity(c, li, li <= group_end))
        return t

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def with_first_last(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    col: str,
    first_name: Optional[str] = None,
    last_name: Optional[str] = None,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """FIRST_VALUE / LAST_VALUE over the whole key partition."""
    keys, order = _as_list(partition_by), _as_list(order_by)
    first_name = first_name or f"{col}_first"
    last_name = last_name or f"{col}_last"

    def fn(t: pa.Table) -> pa.Table:
        t, key_change, group_start, arange = _sorted_with_bounds(t, keys, order, False)
        n = len(t)
        key_end = np.zeros(n, dtype=bool)
        if n:
            key_end[-1] = True
            key_end[:-1] = key_change[1:]
        group_end = np.minimum.accumulate(np.where(key_end, arange, n)[::-1])[::-1]
        c = t[col].combine_chunks()
        t = t.append_column(first_name, c.take(pa.array(group_start)))
        t = t.append_column(last_name, c.take(pa.array(group_end)))
        return t

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def with_last_value_peers(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    col: str,
    name: str = "last_value",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """LAST_VALUE under SQL's DEFAULT frame (``RANGE BETWEEN UNBOUNDED
    PRECEDING AND CURRENT ROW``): the frame ends at the current row's
    last ORDER-BY *peer*, so every row gets the column value at the last
    row sharing its (key, order) values. One sort per bucket; the peer
    run end is a reversed ``np.minimum.accumulate`` over value-change
    boundaries — same O(n) kernel family as ``with_first_last``."""
    keys, order = _as_list(partition_by), _as_list(order_by)

    def fn(t: pa.Table) -> pa.Table:
        t, key_change, _, arange = _sorted_with_bounds(t, keys, order, False)
        n = len(t)
        val_change = key_change.copy()
        for o in order:
            val_change[1:] |= adjacent_neq(t[o])
        run_end = np.zeros(n, dtype=np.int64)
        if n:
            last = np.zeros(n, dtype=bool)
            last[-1] = True
            last[:-1] = val_change[1:]
            run_end = np.minimum.accumulate(
                np.where(last, arange, n)[::-1])[::-1]
        c = t[col].combine_chunks()
        return t.append_column(name, c.take(pa.array(run_end)))

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def with_nth_value(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    col: str,
    n: int,
    out_name: Optional[str] = None,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """NTH_VALUE(col, n) OVER (PARTITION BY ... ORDER BY ...) with the
    whole-partition frame: every row of a key gets the key's n-th value
    in order (1-based), NULL when the key has fewer than n rows. Same
    bucketed one-sort plan as FIRST/LAST_VALUE — the n-th index is just
    group_start + (n-1), validity-masked against the group end."""
    keys, order = _as_list(partition_by), _as_list(order_by)
    out_name = out_name or f"{col}_nth{n}"

    def fn(t: pa.Table) -> pa.Table:
        t, key_change, group_start, arange = _sorted_with_bounds(t, keys, order, False)
        m = len(t)
        key_end = np.zeros(m, dtype=bool)
        if m:
            key_end[-1] = True
            key_end[:-1] = key_change[1:]
        group_end = np.minimum.accumulate(np.where(key_end, arange, m)[::-1])[::-1]
        nth_idx = group_start + (n - 1)
        valid = nth_idx <= group_end
        c = t[col].combine_chunks()
        taken = c.take(pa.array(np.where(valid, nth_idx, 0)))
        vals = pc.if_else(pa.array(valid), taken, pa.nulls(m, c.type))
        return t.append_column(out_name, vals)

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def with_rolling_sum_count(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    col: str,
    window: int,
    sum_name: str = "rolling_sum",
    cnt_name: str = "rolling_cnt",
    num_buckets: int = 64,
    following: int = 0,
) -> "rd.Dataset":
    """Moving-window ROWS BETWEEN (window-1) PRECEDING AND ``following``
    FOLLOWING (default 0 = CURRENT ROW; >0 gives a centered/lookahead
    frame): exact rolling sum + count of ``col`` via prefix sums
    (sum[i] = cs[hi] - cs[win_start-1], O(n) per bucket). Pass an
    integer-scaled column for exact float semantics (see queries.py
    determinism note)."""
    keys, order = _as_list(partition_by), _as_list(order_by)

    def fn(t: pa.Table) -> pa.Table:
        t, key_change, group_start, arange = _sorted_with_bounds(t, keys, order, False)
        n = len(t)
        v, nn = _filled_values(t, col)
        cs = np.cumsum(v)
        csn = np.cumsum(nn)
        win_start = np.maximum(group_start, arange - window + 1)
        if following:
            # group_end[i] = last row index of i's key run
            run_starts = np.nonzero(key_change)[0]
            run_ends = np.append(run_starts[1:], n) - 1 if n else run_starts
            group_end = np.repeat(run_ends, np.diff(np.append(run_starts, n)))
            hi = np.minimum(group_end, arange + following)
        else:
            hi = arange
        left = np.where(win_start > 0, cs[win_start - 1], 0)
        left_n = np.where(win_start > 0, csn[win_start - 1], 0)
        cnts = csn[hi] - left_n
        t = t.append_column(sum_name, pa.array(cs[hi] - left, mask=cnts == 0))
        t = t.append_column(cnt_name, pa.array(cnts))
        return t

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def with_rolling_time_sum(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    ts_col: str,
    col: str,
    interval,
    tie_by: Optional[str] = None,
    sum_name: str = "rolling_sum",
    cnt_name: str = "rolling_cnt",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Time-RANGE moving window: SUM/COUNT over
    ``RANGE BETWEEN interval PRECEDING AND CURRENT ROW`` — every row in
    the key whose ts ∈ [row_ts − interval, row_ts]. Per bucket: one
    sort, a prefix sum, and a vectorized ``np.searchsorted`` for each
    row's window start (no per-row loop). SQL RANGE semantics: rows with
    EQUAL ts share the same frame (all peers included)."""
    import pandas as pd

    keys = _as_list(partition_by)
    order = [ts_col] + ([tie_by] if tie_by else [])
    if (isinstance(interval, (int, np.integer))
            and not isinstance(interval, np.timedelta64)):
        # numeric RANGE over an integer ORDER BY column: the bound is
        # already in the column's own units (NB: np.timedelta64 IS an
        # np.integer subclass — exclude it or its raw ns count would be
        # read as µs)
        ivl_us = int(interval)
    else:
        ivl_us = int(pd.Timedelta(interval).value // 1000)

    def fn(t: pa.Table) -> pa.Table:
        t, key_change, group_start, arange = _sorted_with_bounds(t, keys, order, False)
        n = len(t)
        tsc = t[ts_col].combine_chunks()
        if pa.types.is_timestamp(tsc.type):
            tsc = tsc.cast(pa.timestamp("us"))
        ts = tsc.cast(pa.int64()).to_numpy(zero_copy_only=False)
        v, nn = _filled_values(t, col)
        cs = np.cumsum(v)
        csn = np.cumsum(nn)
        # ts is sorted only WITHIN each key run (bucket order is
        # key-major), so the binary searches run per key run — numpy
        # vector work per run, one python iteration per key in the bucket
        run_starts = np.nonzero(key_change)[0] if n else np.array([], dtype=np.int64)
        run_bounds = np.append(run_starts, n)
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(run_bounds[:-1], run_bounds[1:]):
            run_ts = ts[s:e]
            lo[s:e] = s + np.searchsorted(run_ts, run_ts - ivl_us, side="left")
            # RANGE frames include ts-PEERS ahead of the current row
            hi[s:e] = s + np.searchsorted(run_ts, run_ts, side="right") - 1
        left = np.where(lo > 0, cs[lo - 1], 0)
        left_n = np.where(lo > 0, csn[lo - 1], 0)
        cnts = csn[hi] - left_n
        t = t.append_column(sum_name, pa.array(cs[hi] - left, mask=cnts == 0))
        t = t.append_column(cnt_name, pa.array(cnts))
        return t

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def with_running_sum(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    col: str,
    name: str = "running_sum",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """SUM(col) OVER (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED
    PRECEDING) — exact for integer-scaled columns."""
    keys, order = _as_list(partition_by), _as_list(order_by)

    def fn(t: pa.Table) -> pa.Table:
        t, _, group_start, _ = _sorted_with_bounds(t, keys, order, False)
        v, nn = _filled_values(t, col)
        cs = np.cumsum(v)
        csn = np.cumsum(nn)
        left = np.where(group_start > 0, cs[group_start - 1], 0)
        left_n = np.where(group_start > 0, csn[group_start - 1], 0)
        return t.append_column(name, pa.array(cs - left, mask=(csn - left_n) == 0))

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def with_ntile_pct(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    n_tiles: int = 4,
    descending: bool | List[bool] = False,
    ntile_name: str = "ntile",
    pct_rank_name: str = "pct_rank",
    cume_dist_name: str = "cume_dist",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """NTILE(n) / PERCENT_RANK() / CUME_DIST() in one pass (SQL
    semantics: NTILE splits each partition into n groups, larger groups
    first; PERCENT_RANK = (rank-1)/(rows-1); CUME_DIST = #peers≤ / rows).
    Peers are rows equal on ALL order keys, NULLs equal to each other."""
    import pandas as pd

    keys, order = _as_list(partition_by), _as_list(order_by)

    def fn(t: pa.Table) -> pa.Table:
        t, key_change, group_start, arange = _sorted_with_bounds(
            t, keys, order, descending
        )
        n = len(t)
        key_end = np.zeros(n, dtype=bool)
        if n:
            key_end[-1] = True
            key_end[:-1] = key_change[1:]
        group_end = np.minimum.accumulate(np.where(key_end, arange, n)[::-1])[::-1]
        size = group_end - group_start + 1
        pos = arange - group_start  # 0-based row number within partition
        # NTILE: first (size % n) tiles get ceil(size/n) rows
        q, r = size // n_tiles, size % n_tiles
        big = (q + 1) * r  # rows covered by the larger tiles
        in_big = pos < big
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                in_big,
                pos // np.maximum(q + 1, 1),
                r + np.where(q > 0, (pos - big) // np.maximum(q, 1), 0),
            ) + 1
        # rank (ties share) for percent_rank; peer-group end for cume_dist
        value_change = key_change.copy()
        if n:
            for oc in order:
                ov = t[oc].to_numpy(zero_copy_only=False)
                na = pd.isna(ov)
                eq = (ov[1:] == ov[:-1]) | (na[1:] & na[:-1])
                value_change[1:] |= ~eq
        first_tie = np.maximum.accumulate(np.where(value_change, arange, 0))
        rank = first_tie - group_start + 1
        value_end = np.zeros(n, dtype=bool)
        if n:
            value_end[-1] = True
            value_end[:-1] = value_change[1:]
        peer_end = np.minimum.accumulate(np.where(value_end, arange, n)[::-1])[::-1]
        pct = np.where(size > 1, (rank - 1) / np.maximum(size - 1, 1), 0.0)
        cume = (peer_end - group_start + 1) / size
        t = t.append_column(ntile_name, pa.array(tile.astype(np.int64)))
        t = t.append_column(pct_rank_name, pa.array(pct.astype(np.float64)))
        t = t.append_column(cume_dist_name, pa.array(cume.astype(np.float64)))
        return t

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")


def topk_per_group(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    k: int,
    descending: bool | List[bool] = True,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """QUALIFY ROW_NUMBER() OVER (...) <= k (SURVEY §2.C11). Per-bucket
    mask filter after sort — only k rows per key survive the bucket
    stage, so downstream operators see k×n_keys rows, not the input."""
    keys, order = _as_list(partition_by), _as_list(order_by)

    def fn(t: pa.Table) -> pa.Table:
        t, _, group_start, arange = _sorted_with_bounds(t, keys, order, descending)
        return t.filter(pa.array(arange - group_start < k))

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")
