"""Join operators (SURVEY §2.C12).

* ``hash_join`` — both sides large: Ray Data's hash-partitioned
  ``Dataset.join`` (inner / left_outer / right_outer / full_outer).
* ``broadcast_join`` — small dimension side: ``ray.put`` the dim table
  ONCE, read it once per actor in ``__init__``, pandas-merge per batch.
  No shuffle of the big side — the correct shape for dim tables at
  100 TB fact scale.
* ``semi_join`` / ``anti_join`` — broadcast the key set and filter
  vectorized inside map_batches (no shuffle at all).
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from sous_chef_ray.stages._util import pool


def hash_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: List[str] | str,
    join_type: str = "inner",
    num_partitions: int = 32,
    right_on: Optional[List[str] | str] = None,
) -> "rd.Dataset":
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else (
        tuple(right_on) if right_on else None
    )
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


class _BroadcastMerge:
    def __init__(self, dim_ref, on, right_on, how, suffix):
        dim: pd.DataFrame = ray.get(dim_ref)
        self.dim = dim
        self.on = on
        self.right_on = right_on
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.how == "cross":
            return batch.merge(self.dim, how="cross", suffixes=("", self.suffix))
        return batch.merge(
            self.dim,
            how=self.how,
            left_on=self.on,
            right_on=self.right_on,
            suffixes=("", self.suffix),
        )


def broadcast_join(
    big: "rd.Dataset",
    dim: pd.DataFrame | pa.Table,
    on: List[str] | str,
    right_on: Optional[List[str] | str] = None,
    how: str = "inner",
    suffix: str = "_r",
    concurrency: int | tuple = 4,
) -> "rd.Dataset":
    """Join a streaming big side against a broadcast in-memory dim table."""
    if isinstance(dim, pa.Table):
        dim = dim.to_pandas()
    if how != "cross":
        on = [on] if isinstance(on, str) else list(on)
        right_on = (
            [right_on] if isinstance(right_on, str) else list(right_on or on)
        )
    dim_ref = ray.put(dim)
    return big.map_batches(
        _BroadcastMerge,
        fn_constructor_kwargs=dict(
            dim_ref=dim_ref, on=on, right_on=right_on, how=how, suffix=suffix
        ),
        batch_format="pandas",
        concurrency=pool(concurrency),
    )


class _KeyFilter:
    def __init__(self, keys_ref, col, keep):
        self.keys = ray.get(keys_ref)  # pa.Array of key values
        self.col = col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[self.col], value_set=self.keys)
        if not self.keep:
            mask = pc.invert(mask)
        return batch.filter(mask)


def _key_set_join(big, keys, col, keep, concurrency):
    if isinstance(keys, pa.Table):
        keys = keys[keys.column_names[0]]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if not isinstance(keys, pa.Array):
        keys = pa.array(keys)
    keys_ref = ray.put(pc.unique(keys))
    return big.map_batches(
        _KeyFilter,
        fn_constructor_kwargs=dict(keys_ref=keys_ref, col=col, keep=keep),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool(concurrency),
    )


def distinct_key_array(ds: "rd.Dataset", col: str) -> pa.Array:
    """Distributed distinct reduction of a key column: per-batch
    ``pc.unique`` inside map_batches shrinks each block to its distinct
    keys BEFORE the shuffle, then ``Dataset.unique`` finishes the
    reduction — only the (small) distinct set ever reaches the driver.
    This is the scale-correct way to build a semi/anti broadcast set
    from a big side (never ``iter_batches`` the raw table)."""

    def u(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t[col])})

    slim = ds.map_batches(u, batch_format="pyarrow", zero_copy_batch=True)
    return pa.array(slim.unique(col))


def semi_join(big: "rd.Dataset", keys, col: str, concurrency: int | tuple = 4):
    """big WHERE col IN (keys) — broadcast key-set filter, no shuffle."""
    return _key_set_join(big, keys, col, True, concurrency)


def anti_join(big: "rd.Dataset", keys, col: str, concurrency: int | tuple = 4):
    """big WHERE col NOT IN (keys) — broadcast key-set filter, no shuffle."""
    return _key_set_join(big, keys, col, False, concurrency)


def salted_hash_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    on: str,
    right_on: Optional[str] = None,
    join_type: str = "inner",
    factor: int = 8,
    threshold: float = 0.01,
    num_partitions: int = 32,
    sample_rows: int = 250_000,
) -> "rd.Dataset":
    """Skew-aware equi-join (the as-of salting plan generalized to
    ``Dataset.join``): a Zipf-hot key on the LEFT would land its entire
    row mass in one hash partition and turn the join into a straggler.

    Plan: sample-detect hot left keys; salt the left's hot rows over
    ``factor`` pseudo-keys (``key\\x1fshard``); REPLICATE the right
    side's hot-key rows once per shard (bounded: hot keys are few by
    definition and the right side is assumed dim-like per key — the
    replicated subset is collected driver-side, document the
    assumption); cold rows pass through with bare string keys; one hash
    join on the salted key; strip. With no hot keys detected this is
    exactly ``hash_join``. Matches the salted-vs-unsalted equivalence
    contract of stages/salt.py (NUL-safe separator — see SALT_SEP)."""
    import pyarrow.compute as pc_

    from sous_chef_ray.stages.salt import (
        SALT_SEP,
        detect_hot_keys,
        replicate_for_salt,
        salt_keys,
    )

    right_on = right_on or on
    hot = detect_hot_keys(left, on, threshold=threshold,
                          sample_rows=sample_rows)
    if not hot:
        return hash_join(left, right, on=on, right_on=right_on,
                         join_type=join_type, num_partitions=num_partitions)

    salted = f"{on}__salted"
    left_s = salt_keys(left, on, hot, factor=factor, salted_name=salted)

    hot_arr = pa.array(list(hot))
    right_hot_tbl = pa.concat_tables(
        semi_join(right, hot_arr, right_on, concurrency=2)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )  # bounded: rows of the few hot keys only
    right_salted = f"{right_on}__salted"
    rep = replicate_for_salt(right_hot_tbl, right_on, hot, factor=factor,
                             salted_name=right_salted)

    def cold_tag(t: pa.Table) -> pa.Table:
        keep = pc_.invert(pc_.is_in(t[right_on], value_set=hot_arr))
        t = t.filter(keep)
        return t.append_column(
            right_salted, pc_.cast(t[right_on], pa.string()))  # match from_pandas str type

    right_cold = right.map_batches(cold_tag, batch_format="pyarrow",
                                   zero_copy_batch=True)
    right_all = right_cold.union(rd.from_pandas(rep))
    joined = hash_join(left_s, right_all, on=salted, right_on=right_salted,
                       join_type=join_type, num_partitions=num_partitions)
    drop = [c for c in (salted, right_salted) if c != salted] + [salted]
    return joined.map_batches(
        lambda t: t.drop_columns([c for c in drop if c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
