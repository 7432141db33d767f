"""Key-partitioned apply — the engine's workhorse for per-key ordered ops.

``partition_apply(ds, keys, fn)`` hash-buckets rows by key (deterministic
uint64 hash % num_buckets, so a key's rows never straddle buckets), then
runs ``fn`` once per bucket via ``groupby(bucket).map_groups``. ``fn``
receives one pandas DataFrame per bucket and is expected to do its own
vectorized per-key work (``df.groupby(keys)...`` — C-speed, one Python
call per BUCKET, not per key).

This is the scalable shape for window functions / sessionization /
backfill at 10^12 rows: the shuffle moves each row once to its bucket,
buckets stream independently, and skewed keys can be pre-salted
(stages/salt.py) before bucketing. num_buckets should be sized so a
bucket fits in a worker's heap (rows/num_buckets × row width).

NUL caveat: BUCKETING is safe for string keys with embedded ``\\x00``
(keys are escaped before hashing — see _util.nul_safe_key_strings and
the determinism bug it works around), and the ARROW path's per-bucket
kernels compare keys by value (numpy equality) so they are NUL-safe
end-to-end. A pandas ``df.groupby`` INSIDE a caller-supplied pandas-path
``fn`` is NOT — pandas' string hashtable truncates at NULs and silently
merges such groups; use ``batch_format="pyarrow"`` for NUL-capable keys.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np
import pandas as pd

import ray.data as rd
import sous_chef_ray.compat  # noqa: F401  (ray 2.49 hash-shuffle schema fix)


BUCKET_COL = "__bucket__"

# Target in-memory bytes per bucket: a whole bucket becomes ONE block /
# one map_batches call, so it must fit in a worker heap with headroom.
TARGET_BUCKET_BYTES = 512 << 20


def auto_num_buckets(
    input_bytes: int | None,
    *,
    target_bucket_bytes: int = TARGET_BUCKET_BYTES,
    min_buckets: int = 8,
    max_buckets: int = 1 << 20,
    expansion: float = 4.0,
) -> int:
    """Derive a bucket count from input size so each bucket stays under
    ``target_bucket_bytes`` IN MEMORY (``expansion`` ≈ parquet→Arrow blowup).

    Buckets scale linearly with data: a 10× input gets ~10× buckets, so
    the one-block-per-bucket plan in :func:`partition_apply` never asks a
    worker to hold more than ~512 MB regardless of total scale. A fixed
    constant (the round-1 ``num_buckets=16``) breaks at 100×.
    """
    import math

    if not input_bytes:
        return 64
    eff = input_bytes * expansion
    return max(min_buckets, min(max_buckets, math.ceil(eff / target_bucket_bytes)))


def _nul_safe_series(s: pd.Series) -> pd.Series:
    """hash_pandas_object is not value-deterministic for strs with
    embedded NULs (stages/_util.nul_safe_key_strings); escape when a
    string column contains any."""
    if s.dtype == object:
        import pyarrow as pa

        from sous_chef_ray.stages._util import nul_safe_key_strings

        try:
            arr = pa.array(s, type=pa.string())
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            return s
        safe = nul_safe_key_strings(arr)
        if safe is not arr:
            return safe.to_pandas()
    return s


def _composite_key_series(cols) -> pd.Series:
    """Vectorized injective multi-key → one hashable string series
    (replaces the per-row ``df[keys].apply(tuple, axis=1)`` /
    ``list(zip(...))`` paths — those build a Python object per ROW).
    composite escapes the separator; nul_safe then escapes \\x00 so
    ``hash_pandas_object``'s NUL-truncating fast path stays injective."""
    from sous_chef_ray.stages._util import (composite_key_strings,
                                            nul_safe_key_strings)

    comp = nul_safe_key_strings(composite_key_strings(cols))
    return pd.Series(comp.to_numpy(zero_copy_only=False))


def add_bucket(df: pd.DataFrame, keys: List[str], num_buckets: int) -> pd.DataFrame:
    import pyarrow as pa

    h = pd.util.hash_pandas_object(
        _nul_safe_series(df[keys[0]]) if len(keys) == 1
        else _composite_key_series([pa.array(df[k]) for k in keys]),
        index=False,
    ).to_numpy()
    df = df.copy()
    df[BUCKET_COL] = (h % np.uint64(num_buckets)).astype(np.int64)
    return df


def bucket_ids(t, keys: List[str], num_buckets: int) -> np.ndarray:
    """Deterministic bucket id per row of an Arrow table — THE bucketing
    function (partition_apply's tag stage and any stage that must agree
    with it, e.g. the resumable flagship writer recovering a block's
    bucket id, use this same hash)."""
    from sous_chef_ray.stages._util import nul_safe_key_strings

    h = pd.util.hash_pandas_object(
        pd.Series(
            nul_safe_key_strings(t[keys[0]]).to_numpy(zero_copy_only=False)
        )
        if len(keys) == 1
        else _composite_key_series([t[k] for k in keys]),
        index=False,
    ).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def partition_apply(
    ds: "rd.Dataset",
    keys: List[str] | str,
    fn: Callable,
    num_buckets: int = 64,
    batch_format: str = "pandas",
) -> "rd.Dataset":
    """Physical plan: tag bucket → range sort on the bucket id with
    EXPLICIT integer boundaries [1..num_buckets-1] (one output block per
    bucket, no sampling pass, no key straddling) → ``map_batches`` with
    ``batch_size=None`` so each call sees exactly one whole bucket.
    Measured ~2x faster than groupby().map_groups for the same shuffle
    (scripts/profile_window.py).

    ``batch_format="pyarrow"`` keeps list/token columns zero-copy Arrow
    end-to-end (use for wide payload rows); ``fn`` then receives/returns
    a pyarrow.Table.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    if batch_format == "pyarrow":
        import pyarrow as pa

        def tag_arrow(t: "pa.Table") -> "pa.Table":
            bucket = bucket_ids(t, keys, num_buckets)
            return t.append_column(BUCKET_COL, pa.array(bucket))

        def apply_arrow(t: "pa.Table") -> "pa.Table":
            t = t.drop_columns([BUCKET_COL])
            if len(t) == 0:
                return t
            return fn(t)

        return (
            ds.map_batches(tag_arrow, batch_format="pyarrow", zero_copy_batch=True)
            .sort(BUCKET_COL, boundaries=list(range(1, num_buckets)))
            .map_batches(apply_arrow, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
        )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return add_bucket(df, keys, num_buckets)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.drop(columns=[BUCKET_COL], errors="ignore")
        return fn(df.drop(columns=[BUCKET_COL]))

    return (
        ds.map_batches(tag, batch_format="pandas")
        .sort(BUCKET_COL, boundaries=list(range(1, num_buckets)))
        .map_batches(apply, batch_format="pandas", batch_size=None)
    )
