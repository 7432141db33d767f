"""Window functions over key partitions (SURVEY §2.C7-C11).

The reference recognizes RANK / ROW_NUMBER / LAG / LEAD / FIRST_VALUE /
LAST_VALUE / moving aggregates for warehouse pushdown (reference:
src/sous_chef/validators.py:15-16, tests/test_teradata_sources.py:58-69);
here they are native Ray Data operators: hash-bucket partition by key →
per-bucket vectorized pandas groupby transforms (one Python call per
bucket; C-speed within). Ordering inside a key is (order_by, tie_by...)
ascending unless stated.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray.data as rd

from sous_chef_ray.stages.partition import partition_apply


def _sort(df: pd.DataFrame, keys: List[str], order: List[str], desc) -> pd.DataFrame:
    if isinstance(desc, bool):
        desc = [desc] * len(order)
    return df.sort_values(
        keys + order,
        ascending=[True] * len(keys) + [not d for d in desc],
        kind="mergesort",
    )


def with_row_number(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    descending: bool | List[bool] = False,
    name: str = "rn",
    num_buckets: int = 64,
) -> "rd.Dataset":
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sort(df, keys, order, descending)
        df[name] = df.groupby(keys, sort=False).cumcount() + 1
        return df

    return partition_apply(ds, keys, fn, num_buckets)


def with_rank(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: str,
    descending: bool = False,
    name: str = "rank",
    dense: bool = False,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """SQL RANK() / DENSE_RANK() semantics (ties share a rank)."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[name] = (
            df.groupby(keys, sort=False)[order_by]
            .rank(method="dense" if dense else "min", ascending=not descending)
            .astype(np.int64)
        )
        return df

    return partition_apply(ds, keys, fn, num_buckets)


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
    """LAG/LEAD of ``col`` within each key, ordered by ``order_by``."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    lag_name = lag_name or f"{col}_lag{lag}"
    lead_name = lead_name or f"{col}_lead{lead}"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sort(df, keys, order, False)
        g = df.groupby(keys, sort=False)[col]
        if lag:
            df[lag_name] = g.shift(lag)
        if lead:
            df[lead_name] = g.shift(-lead)
        return df

    return partition_apply(ds, keys, fn, num_buckets)


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
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    first_name = first_name or f"{col}_first"
    last_name = last_name or f"{col}_last"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sort(df, keys, order, False)
        g = df.groupby(keys, sort=False)[col]
        df[first_name] = g.transform("first")
        df[last_name] = g.transform("last")
        return df

    return partition_apply(ds, keys, fn, num_buckets)


def with_rolling_sum_count(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    col: str,
    window: int,
    sum_name: str = "rolling_sum",
    cnt_name: str = "rolling_cnt",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Moving-window ROWS BETWEEN (window-1) PRECEDING AND CURRENT ROW:
    exact rolling sum + count of ``col``. Pass an integer-scaled column
    for exact float semantics (see queries.py determinism note)."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sort(df, keys, order, False)
        g = df.groupby(keys, sort=False)[col]
        roll = g.rolling(window, min_periods=1)
        df[sum_name] = roll.sum().to_numpy()
        df[cnt_name] = roll.count().to_numpy().astype(np.int64)
        return df

    return partition_apply(ds, keys, fn, num_buckets)


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
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sort(df, keys, order, False)
        df[name] = df.groupby(keys, sort=False)[col].cumsum()
        return df

    return partition_apply(ds, keys, fn, num_buckets)


def topk_per_group(
    ds: "rd.Dataset",
    partition_by: List[str] | str,
    order_by: List[str] | str,
    k: int,
    descending: bool | List[bool] = True,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """QUALIFY ROW_NUMBER() OVER (...) <= k (SURVEY §2.C11). Per-bucket
    head(k) after sort — only k rows per key survive the bucket stage."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sort(df, keys, order, descending)
        return df.groupby(keys, sort=False).head(k)

    return partition_apply(ds, keys, fn, num_buckets)
