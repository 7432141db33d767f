"""Dedup operators.

* ``latest_per_key`` — Feast latest-row semantics (SURVEY §2.B4, reference:
  src/sous_chef/sous_chef.py:41 created_timestamp_column): keep, per key,
  the row with the greatest (order_by, tie_by). Two-phase: a vectorized
  per-batch partial reduce (drops everything but each batch's winners, so
  the shuffle moves ≤ one row per key per block) then a hash groupby final
  reduce. No full materialization.

* ``exact_dedup`` — exact content dedup: keep the first row (smallest
  keep_by) per content group. Same partial→final shape; at 100 TB the
  content column should be a precomputed hash/fingerprint so the shuffle
  moves hashes, not documents (see stages/text.py fingerprinting).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray.data as rd


def _keep_per_group(t, keys: List[str], order: List[str], keep_last: bool):
    """One stable Arrow sort by (keys, order) then a boundary-mask filter
    keeping each key run's first/last row — the Arrow-native equivalent
    of pandas sort_values + drop_duplicates, without the pandas
    round-trip (NUL-containing string keys compare exactly; pandas'
    string hashtable silently merges them — stages/partition.py:16)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(t)
    if n == 0:
        return t
    sort_keys = [(k, "ascending") for k in keys + order]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        arr = t[k].combine_chunks()
        kv = arr.to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            neq = kv[1:] != kv[:-1]
        # null-aware: adjacent NULL keys are the SAME group (SQL/pandas
        # dedup semantics; raw NaN != NaN would split them per row)
        valid = np.asarray(pc.is_valid(arr))
        change[1:] |= np.asarray(neq) & ~(~valid[1:] & ~valid[:-1])
    if keep_last:
        mask = np.zeros(n, dtype=bool)
        mask[-1] = True
        mask[:-1] = change[1:]
    else:
        mask = change
    return t.filter(pa.array(mask))


def latest_per_key(
    ds: "rd.Dataset",
    keys: List[str] | str,
    order_by: str,
    tie_by: Optional[str] = None,
    num_buckets: int = 64,
) -> "rd.Dataset":
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order_by] + ([tie_by] if tie_by else [])

    def reduce_fn(t):
        # one vectorized sort+boundary-filter per BUCKET (thousands of
        # keys), not one Python call per group — measured ~2x on the
        # same shuffle (see stages/partition.py); multi-key buckets via
        # the vectorized composite key
        return _keep_per_group(t, keys, order, keep_last=True)

    from sous_chef_ray.stages.partition import partition_apply

    return partition_apply(
        ds.map_batches(reduce_fn, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys, reduce_fn, num_buckets=num_buckets, batch_format="pyarrow",
    )


def exact_dedup(
    ds: "rd.Dataset",
    content_cols: List[str] | str,
    keep_by: str,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Keep the row with the smallest ``keep_by`` per distinct content."""
    content_cols = (
        [content_cols] if isinstance(content_cols, str) else list(content_cols)
    )

    def reduce_fn(t):
        return _keep_per_group(t, content_cols, [keep_by], keep_last=False)

    from sous_chef_ray.stages.partition import partition_apply

    return partition_apply(
        ds.map_batches(reduce_fn, batch_format="pyarrow",
                       zero_copy_batch=True),
        content_cols, reduce_fn, num_buckets=num_buckets,
        batch_format="pyarrow",
    )


def hash_split(
    ds: "rd.Dataset",
    col: str,
    fractions: dict,
    name: str = "split",
    seed: int = 0,
) -> "rd.Dataset":
    """Deterministic dataset splitting (train/val/test) by key hash:
    each row's split depends ONLY on its key value and the seed — stable
    across runs, partitionings and cluster sizes, and all rows sharing a
    key (e.g. doc versions) land in the same split (no leakage).

    ``fractions``: {"train": 0.9, "val": 0.05, "test": 0.05} — must sum
    to ~1. One map_batches pass, no shuffle.
    """
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names])
    if not 0.999 <= bounds[-1] <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {bounds[-1]}")
    # modular 2^64 product (computed in Python ints to avoid the numpy
    # scalar-overflow RuntimeWarning — the wraparound is the point)
    salt = np.uint64((0x9E3779B97F4A7C15 * (seed + 1)) & 0xFFFFFFFFFFFFFFFF)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[col], index=False).to_numpy()
        with np.errstate(over="ignore"):
            u = (h * salt).astype(np.float64) / float(1 << 64)
        idx = np.searchsorted(bounds, u, side="right")
        idx = np.minimum(idx, len(names) - 1)
        df = df.copy()
        df[name] = np.array(names, dtype=object)[idx]
        return df

    return ds.map_batches(fn, batch_format="pandas")


def mix_sources(
    ds: "rd.Dataset",
    strata_col: str,
    content_col: str,
    plan: dict,
    epoch_col: str = "epoch",
    default=("ff", 1),
) -> "rd.Dataset":
    """Training-mix assembly: per-stratum deterministic downsampling plus
    integer epoch repetition (the "Wikipedia x3, CommonCrawl 20%" data
    recipe). ``plan`` maps stratum -> (md5_hex_threshold, repeats): a row
    survives iff md5(content) < threshold (stateless, partitioning- and
    RNG-independent, like the md5-threshold sampler), then is emitted
    ``repeats`` times with a 1-based ``epoch_col``. One map_batches pass,
    no shuffle; the expansion is offset-arithmetic row take, no Python
    loop over rows (md5 itself is per-row, as in add_md5_fingerprint)."""
    import hashlib

    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        texts = t[content_col].to_pylist()
        md5s = np.array([hashlib.md5(v.encode("utf-8")).hexdigest()
                         if v is not None else "" for v in texts])
        strata = t[strata_col].to_pylist()
        thr = np.array([plan.get(s, default)[0] for s in strata])
        reps = np.array([plan.get(s, default)[1] for s in strata],
                        dtype=np.int64)
        keep = md5s < thr
        t2 = t.filter(pa.array(keep))
        reps = reps[keep]
        if len(reps) == 0:
            return t2.append_column(epoch_col,
                                    pa.array([], type=pa.int64()))
        idx = np.repeat(np.arange(len(reps)), reps)
        starts = np.cumsum(reps) - reps
        epoch = np.arange(len(idx)) - np.repeat(starts, reps) + 1
        return t2.take(pa.array(idx)).append_column(
            epoch_col, pa.array(epoch, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
