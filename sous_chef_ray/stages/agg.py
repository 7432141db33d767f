"""Grouped aggregation operators (SURVEY §2.C3-C6).

Built on Ray Data's hash aggregate (partial+final under the hood) where a
built-in exists; otherwise bucket-partitioned ARROW kernels (one stable
sort per bucket + vectorized run boundaries — COUNT DISTINCT, ARRAY_AGG,
exact quantiles) so no stage materializes the input and no value column
round-trips through pandas (the pandas string hashtable silently merges
NUL-containing keys — stages/partition.py:16)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray.data as rd

from sous_chef_ray.stages._util import adjacent_neq
from sous_chef_ray.stages.partition import partition_apply


def _sorted_runs(t, keys: List[str], extra_order: List[str]):
    """Stable-sort a bucket by (keys, extra_order) and return
    (sorted_table, run_starts) where run_starts marks each key run —
    null-aware (adjacent NULL keys are one group, SQL semantics)."""
    import pyarrow.compute as pc

    n = len(t)
    sort_keys = [(k, "ascending") for k in keys + extra_order]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    change = np.zeros(n, dtype=bool)
    if n:
        change[0] = True
        for k in keys:
            arr = t[k].combine_chunks()
            kv = arr.to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore"):
                neq = kv[1:] != kv[:-1]
            valid = np.asarray(pc.is_valid(arr))
            change[1:] |= np.asarray(neq) & ~(~valid[1:] & ~valid[:-1])
    return t, np.nonzero(change)[0]


def _keys_at(t, keys: List[str], starts: np.ndarray) -> dict:
    import pyarrow as pa

    idx = pa.array(starts, type=pa.int64())
    return {k: t[k].combine_chunks().take(idx) for k in keys}


def count_distinct(
    ds: "rd.Dataset",
    keys: List[str] | str,
    col: str,
    name: str = "n_distinct",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """COUNT(DISTINCT col) GROUP BY keys (SURVEY §2.C4). Per-batch Arrow
    hash-distinct first (combiner: the shuffle moves ≤ one row per
    distinct (key, col) pair per block), then one sorted boundary count
    per key inside its bucket — a key never straddles buckets so counts
    are final. SQL semantics: NULL values don't count."""
    import pyarrow as pa

    keys = [keys] if isinstance(keys, str) else list(keys)

    def batch_distinct(t: pa.Table) -> pa.Table:
        return t.select(keys + [col]).group_by(
            keys + [col]).aggregate([])

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch_distinct(t)  # distinct across the whole bucket
        t, starts = _sorted_runs(t, keys, [col])
        n = len(t)
        marks = np.zeros(n, dtype=bool)
        marks[starts] = True
        run_id = np.cumsum(marks) - 1
        valid = np.asarray(pc.is_valid(t[col].combine_chunks())) \
            if n else np.array([], dtype=bool)
        cnt = np.bincount(run_id[valid], minlength=len(starts)) \
            if n else np.array([], dtype=np.int64)
        cols = _keys_at(t, keys, starts)
        cols[name] = pa.array(cnt.astype(np.int64))
        return pa.table(cols)

    return partition_apply(
        ds.map_batches(batch_distinct, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys, fn, num_buckets, batch_format="pyarrow",
    )


def distinct_count_sum(
    ds: "rd.Dataset",
    keys: List[str] | str,
    col: str,
    cnt_name: str = "n_distinct",
    sum_name: Optional[str] = None,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """COUNT(DISTINCT col) and optionally SUM(DISTINCT col) GROUP BY keys
    in ONE pass — serves SUM/AVG(DISTINCT x) in the SQL compiler (AVG =
    sum/count post-agg). Same plan shape as count_distinct: per-batch
    Arrow hash-distinct combiner, then a sorted boundary reduce per key
    inside its bucket. The per-run sum uses np.add.reduceat over the
    null-dropped value array — exact for integer dtypes (no float
    round-trip), deterministic ascending order for floats. A run with no
    valid values reports count 0 / sum 0 (the caller maps count==0 →
    SQL NULL)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    keys = [keys] if isinstance(keys, str) else list(keys)

    def batch_distinct(t: pa.Table) -> pa.Table:
        return t.select(keys + [col]).group_by(
            keys + [col]).aggregate([])

    def fn(t: pa.Table) -> pa.Table:
        t = batch_distinct(t)  # distinct across the whole bucket
        t, starts = _sorted_runs(t, keys, [col])
        n = len(t)
        marks = np.zeros(n, dtype=bool)
        marks[starts] = True
        run_id = np.cumsum(marks) - 1
        arr = t[col].combine_chunks() if n else t[col]
        valid = np.asarray(pc.is_valid(arr)) \
            if n else np.array([], dtype=bool)
        cnt = np.bincount(run_id[valid], minlength=len(starts)) \
            if n else np.array([], dtype=np.int64)
        cols = _keys_at(t, keys, starts)
        cols[cnt_name] = pa.array(cnt.astype(np.int64))
        if sum_name is not None:
            rv = run_id[valid]
            if len(rv):
                # drop_null preserves order, so positions align with rv
                vals = arr.drop_null().to_numpy(zero_copy_only=False)
                seg = np.flatnonzero(np.r_[True, rv[1:] != rv[:-1]])
                sums = np.add.reduceat(vals, seg)
                out = np.zeros(len(starts), dtype=sums.dtype)
                out[rv[seg]] = sums
            else:
                out = np.zeros(len(starts), dtype=np.float64)
            cols[sum_name] = pa.array(out)
        return pa.table(cols)

    return partition_apply(
        ds.map_batches(batch_distinct, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys, fn, num_buckets, batch_format="pyarrow",
    )


def _group_quantile_impl(ds, keys, col, q, name, num_buckets, disc: bool):
    import pyarrow as pa
    import pyarrow.compute as pc

    keys = [keys] if isinstance(keys, str) else list(keys)

    def fn(t: pa.Table) -> pa.Table:
        # sort by (keys, col): nulls land at each key run's END, so the
        # first m_valid positions of a run are its sorted values
        t, starts = _sorted_runs(t, keys, [col])
        n = len(t)
        arr = t[col].combine_chunks()
        valid = np.asarray(pc.is_valid(arr))
        marks = np.zeros(n, dtype=bool)
        marks[starts] = True
        run_id = np.cumsum(marks) - 1
        m = np.bincount(run_id[valid], minlength=len(starts))
        has = m > 0
        safe_m = np.maximum(m, 1)
        cols = _keys_at(t, keys, starts)
        if disc:
            # an ACTUAL member: gather from the Arrow column directly so
            # the original dtype survives (int stays int)
            idx = np.maximum(np.ceil(q * safe_m).astype(np.int64) - 1, 0)
            gather = starts + np.where(has, idx, 0)
            cols[name] = arr.take(
                pa.array(gather, type=pa.int64(), mask=~has))
        else:
            vals = pc.cast(pc.fill_null(arr, 0), pa.float64()).to_numpy(
                zero_copy_only=False)
            pos = q * (safe_m - 1)
            lo = np.floor(pos).astype(np.int64)
            hi = np.ceil(pos).astype(np.int64)
            v_lo = vals[starts + np.where(has, lo, 0)]
            v_hi = vals[starts + np.where(has, hi, 0)]
            out = v_lo + (pos - lo) * (v_hi - v_lo)
            cols[name] = pa.array(out, mask=~has)
        return pa.table(cols)

    return partition_apply(ds, keys, fn, num_buckets,
                           batch_format="pyarrow")


def group_quantile(
    ds: "rd.Dataset",
    keys: List[str] | str,
    col: str,
    q: float = 0.5,
    name: str = "quantile",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Exact PERCENTILE_CONT(q) WITHIN GROUP — linear interpolation,
    matching ANSI/DuckDB semantics (SURVEY §2.C5). Bucket-partitioned by
    key; per bucket ONE sort, then all groups' interpolations in four
    numpy gathers (no per-group Python)."""
    return _group_quantile_impl(ds, keys, col, q, name, num_buckets,
                                disc=False)


def group_quantile_disc(
    ds: "rd.Dataset",
    keys: List[str] | str,
    col: str,
    q: float = 0.5,
    name: str = "quantile",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """PERCENTILE_DISC(q) WITHIN GROUP — the smallest value whose
    cumulative distribution ≥ q (an ACTUAL group member, no
    interpolation; ANSI/DuckDB semantics)."""
    return _group_quantile_impl(ds, keys, col, q, name, num_buckets,
                                disc=True)


def array_agg(
    ds: "rd.Dataset",
    keys: List[str] | str,
    col: str,
    order_by: Optional[List[str] | str] = None,
    distinct: bool = False,
    name: str = "arr",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """ARRAY_AGG [DISTINCT] (col) [WITHIN GROUP (ORDER BY ...)] — emits a
    native list column per key (SURVEY §2.C6; the reference collapses
    arrays to STRING at sql_sources.py:226-233 — limitation lifted).
    Same bucketed one-sort plan as struct_agg: ONE ListArray wraps the
    sorted value column via run-boundary offsets — no per-row Python."""
    import pyarrow as pa

    keys = [keys] if isinstance(keys, str) else list(keys)
    order = (
        [order_by] if isinstance(order_by, str) else list(order_by or [])
    )

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if distinct:
            # DISTINCT ignores order_by: one sort by (keys, col), drop
            # adjacent equal (key, col) pairs, recompute key runs on the
            # (still-sorted) survivors — no second sort
            t, pair_starts = _sorted_runs(t, keys + [col], [])
            keep = np.zeros(len(t), dtype=bool)
            keep[pair_starts] = True
            t = t.filter(pa.array(keep))
            n = len(t)
            change = np.zeros(n, dtype=bool)
            if n:
                change[0] = True
                for k in keys:
                    a2 = t[k].combine_chunks()
                    kv = a2.to_numpy(zero_copy_only=False)
                    with np.errstate(invalid="ignore"):
                        neq = kv[1:] != kv[:-1]
                    v2 = np.asarray(pc.is_valid(a2))
                    change[1:] |= np.asarray(neq) & ~(~v2[1:] & ~v2[:-1])
            starts = np.nonzero(change)[0]
        else:
            t, starts = _sorted_runs(t, keys, order)
        offsets = pa.array(np.append(starts, len(t)), type=pa.int32())
        cols = _keys_at(t, keys, starts)
        cols[name] = pa.ListArray.from_arrays(
            offsets, t[col].combine_chunks())
        return pa.table(cols)

    return partition_apply(ds, keys, fn, num_buckets,
                           batch_format="pyarrow")

def struct_agg(
    ds: "rd.Dataset",
    keys: List[str] | str,
    fields: "dict[str, str]",
    order_by: Optional[List[str] | str] = None,
    name: str = "obj",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """ARRAY_AGG(OBJECT_CONSTRUCT(...)) / collect_list(named_struct(...)):
    one native ``list<struct>`` column per key (SURVEY §2.C6 struct
    emission — the reference only *infers* these expressions and
    collapses them to STRING, ref tests/test_snowflake_sources.py:99-106,
    tests/test_spark_emr_sources.py:79-86; limitation lifted).

    ``fields`` maps output struct field name → source column. Same
    bucketed one-sort plan as the window stages: sort each bucket by
    (keys, order_by), detect group boundaries vectorized, build ONE
    StructArray and wrap it in a ListArray via the boundary offsets — no
    per-row Python objects anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order_by] if isinstance(order_by, str) else list(order_by or [])

    def fn(t: pa.Table) -> pa.Table:
        sort_keys = [(k, "ascending") for k in keys + order]
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        n = len(t)
        change = np.zeros(n, dtype=bool)
        if n:
            change[0] = True
            for k in keys:
                change[1:] |= adjacent_neq(t[k])
        starts = np.nonzero(change)[0]
        offsets = pa.array(np.append(starts, n), type=pa.int32())
        struct = pa.StructArray.from_arrays(
            [t[src].combine_chunks() for src in fields.values()],
            names=list(fields.keys()),
        )
        lists = pa.ListArray.from_arrays(offsets, struct)
        cols = {k: t[k].combine_chunks().take(pa.array(starts, type=pa.int64()))
                for k in keys}
        cols[name] = lists
        return pa.table(cols)

    return partition_apply(ds, keys, fn, num_buckets, batch_format="pyarrow")
