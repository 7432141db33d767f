"""Grouped aggregation operators (SURVEY §2.C3-C6).

Built on Ray Data's hash aggregate (partial+final under the hood) where a
built-in exists; otherwise two-stage groupbys (COUNT DISTINCT) or
bucket-partitioned vectorized pandas (ARRAY_AGG, exact quantiles) so no
stage materializes the input.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray.data as rd

from sous_chef_ray.stages.partition import partition_apply


def count_distinct(
    ds: "rd.Dataset",
    keys: List[str] | str,
    col: str,
    name: str = "n_distinct",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """COUNT(DISTINCT col) GROUP BY keys (SURVEY §2.C4). Per-batch
    drop_duplicates first (combiner: the shuffle moves ≤ one row per
    distinct (key, col) pair per block), then nunique per key inside its
    bucket — a key never straddles buckets so counts are final."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def batch_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df[keys + [col]].drop_duplicates()

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(keys, sort=False)[col].nunique().reset_index()
        return out.rename(columns={col: name})

    return partition_apply(
        ds.map_batches(batch_distinct, batch_format="pandas"), keys, fn, num_buckets
    )


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
    key; each key's values are gathered within its bucket only."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(keys, sort=False)[col]
            .quantile(q, interpolation="linear")
            .reset_index()
        )
        return out.rename(columns={col: name})

    return partition_apply(ds, keys, fn, num_buckets)


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
    keys = [keys] if isinstance(keys, str) else list(keys)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        def disc(s: pd.Series):
            v = np.sort(s.to_numpy())
            idx = max(int(np.ceil(q * len(v))) - 1, 0)
            return v[idx]

        out = df.groupby(keys, sort=False)[col].apply(disc).reset_index()
        return out.rename(columns={col: name})

    return partition_apply(ds, keys, fn, num_buckets)


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
    arrays to STRING at sql_sources.py:226-233 — limitation lifted)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = (
        [order_by] if isinstance(order_by, str) else list(order_by or [])
    )

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if order:
            df = df.sort_values(order, kind="mergesort")
        grouped = df.groupby(keys, sort=False)[col]
        if distinct:
            ser = grouped.apply(lambda s: sorted(set(s)))
        else:
            ser = grouped.apply(list)
        return ser.reset_index().rename(columns={col: name})

    return partition_apply(ds, keys, fn, num_buckets)

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
                kv = t[k].to_numpy(zero_copy_only=False)
                change[1:] |= kv[1:] != kv[:-1]
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
