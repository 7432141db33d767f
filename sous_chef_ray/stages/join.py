"""Join operators (SURVEY §2.C12).

* ``hash_join`` — both sides large: Ray Data's hash-partitioned
  ``Dataset.join`` (inner / left_outer / right_outer / full_outer).
* ``broadcast_join`` — small dimension side: ``ray.put`` the dim table
  ONCE, index it once per actor in ``__init__``, Arrow-native gather
  (``pc.index_in`` + null-masked ``Table.take``) per batch — zero
  pandas round-trip, so list/token columns cross the stage zero-copy.
  No shuffle of the big side — the correct shape for dim tables at
  100 TB fact scale.
* ``semi_join`` / ``anti_join`` — broadcast the key set and filter
  vectorized inside map_batches (no shuffle at all).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
import sous_chef_ray.compat  # noqa: F401  (ray 2.49 hash-shuffle schema fix)


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
    # Empty input blocks would consume Ray's one-shot schema broadcast
    # and leave sparse join partitions schemaless — worked around by the
    # bundle filter installed in sous_chef_ray.compat (ray 2.49).
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def _key_array(t: pa.Table, cols: List[str]) -> pa.Array:
    """ONE lookup key per row: the column itself (single key, any type,
    zero-copy) or the injective composite string (multi-key)."""
    from sous_chef_ray.stages._util import composite_key_strings

    if len(cols) == 1:
        a = t[cols[0]]
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    k = composite_key_strings([t[c] for c in cols])
    return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k


class DimIndex:
    """Hash index over a broadcast dim table for Arrow-native gather
    joins (built ONCE per actor in ``__init__`` of the merge stage).

    Layout: dim rows sorted by key-code; ``starts``/``counts`` give each
    unique key's run, so one-to-many matches expand with ``np.repeat``
    (no Python loop, no pandas).  Null-keyed dim rows are dropped up
    front — SQL equi-joins never match NULL = NULL."""

    def __init__(self, dim: pa.Table, right_on: Optional[List[str]],
                 how: str, drop_keys: frozenset = frozenset(),
                 suffix: str = "_r"):
        self.how = how
        self.suffix = suffix
        if how == "cross":
            self.payload = dim.combine_chunks()
            return
        key = _key_array(dim, right_on)
        valid = pc.is_valid(key)
        if not pc.all(valid).as_py():
            dim = dim.filter(valid)
            key = key.filter(valid)
        self.uniq = pc.unique(key)
        codes = pc.index_in(key, value_set=self.uniq).to_numpy(
            zero_copy_only=False).astype(np.int64)
        payload = dim.drop_columns(
            [c for c in right_on if c in drop_keys])
        self.unique_keys = len(self.uniq) == len(dim)
        if self.unique_keys:
            # common dim shape: key → exactly one row; row i of the
            # code-ordered payload is the row whose key has code i
            order = np.argsort(codes, kind="stable")
            self.payload = payload.take(pa.array(order)).combine_chunks()
            self.starts = self.counts = None
        else:
            order = np.argsort(codes, kind="stable")
            self.payload = payload.take(pa.array(order)).combine_chunks()
            self.counts = np.bincount(codes, minlength=len(self.uniq))
            self.starts = np.zeros(len(self.uniq) + 1, np.int64)
            np.cumsum(self.counts, out=self.starts[1:])

    def _codes(self, batch: pa.Table, on: List[str]) -> np.ndarray:
        bkey = _key_array(batch, on)
        if bkey.type != self.uniq.type:
            bkey = pc.cast(bkey, self.uniq.type)
        arr = pc.index_in(bkey, value_set=self.uniq)
        return pc.fill_null(arr, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)

    def merge(self, batch: pa.Table, on: Optional[List[str]],
              resid_mask=None) -> pa.Table:
        """Gather-join one fact batch. ``resid_mask(merged) -> bool
        ndarray`` is a non-equi ON residual: for INNER it just filters;
        for LEFT, matches failing it drop but their left row survives
        null-extended iff NO match passes (SQL ON semantics — the
        predicate decides matching, never left-row survival)."""
        if self.how == "cross":
            n, m = len(batch), len(self.payload)
            left = batch.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), m)))
            gather = pa.array(np.tile(np.arange(m, dtype=np.int64), n))
            return self._attach(left, self.payload.take(gather))
        code = self._codes(batch, on)
        matched = code >= 0
        if self.unique_keys and resid_mask is None:
            if self.how == "left":
                gather = pa.array(code, mask=~matched)
                return self._attach(batch, self.payload.take(gather))
            keep = np.nonzero(matched)[0]
            if len(keep) != len(batch):
                batch = batch.take(pa.array(keep))
                code = code[keep]
            return self._attach(batch, self.payload.take(pa.array(code)))
        if self.unique_keys:
            cnt = matched.astype(np.int64)
            base_of = np.where(matched, code, -1)
        else:
            cnt = np.where(matched, self.counts[np.where(matched, code, 0)], 0)
            base_of = np.where(matched, self.starts[np.where(matched, code, 0)], -1)
        out_cnt = np.where(matched, cnt, 1) if self.how == "left" else cnt
        total = int(out_cnt.sum())
        left_idx = np.repeat(np.arange(len(batch), dtype=np.int64), out_cnt)
        base = np.repeat(base_of, out_cnt)
        run_start = np.zeros(len(batch), np.int64)
        np.cumsum(out_cnt[:-1], out=run_start[1:])
        offs = np.arange(total, dtype=np.int64) - np.repeat(run_start, out_cnt)
        gidx = base + offs  # -1 stays -1: unmatched left rows (offs == 0)
        gather = pa.array(gidx, mask=gidx < 0)
        merged = self._attach(batch.take(pa.array(left_idx)),
                              self.payload.take(gather))
        if resid_mask is None:
            return merged
        passed = np.asarray(resid_mask(merged), dtype=bool) & (gidx >= 0)
        if self.how != "left":
            return merged.filter(pa.array(passed))
        any_pass = np.zeros(len(batch), dtype=bool)
        if passed.any():
            any_pass[left_idx[passed]] = True
        sel = np.nonzero(passed)[0]
        fail_rows = np.nonzero(~any_pass)[0]
        final_left = np.concatenate([left_idx[sel], fail_rows])
        final_g = np.concatenate(
            [gidx[sel], np.full(len(fail_rows), -1, np.int64)])
        order = np.argsort(final_left, kind="stable")
        final_left, final_g = final_left[order], final_g[order]
        return self._attach(
            batch.take(pa.array(final_left)),
            self.payload.take(pa.array(final_g, mask=final_g < 0)))

    def _attach(self, left: pa.Table, right: pa.Table) -> pa.Table:
        names = set(left.column_names)
        for c in right.column_names:
            col = right[c]
            left = left.append_column(
                c if c not in names else c + self.suffix, col)
        return left


class _BroadcastMerge:
    def __init__(self, dim_ref, on, right_on, how, suffix):
        dim = ray.get(dim_ref)
        if isinstance(dim, pd.DataFrame):
            dim = pa.Table.from_pandas(dim, preserve_index=False)
        drop = frozenset() if how == "cross" else frozenset(
            r for l_, r in zip(on, right_on) if l_ == r)
        self.idx = DimIndex(dim, right_on, how, drop_keys=drop,
                            suffix=suffix)
        self.on = on

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.idx.merge(batch, self.on)


def broadcast_join(
    big: "rd.Dataset",
    dim: pd.DataFrame | pa.Table,
    on: List[str] | str,
    right_on: Optional[List[str] | str] = None,
    how: str = "inner",
    suffix: str = "_r",
    concurrency: int | tuple = 4,
) -> "rd.Dataset":
    """Join a streaming big side against a broadcast in-memory dim table.

    Arrow-native: the dim side ships through the object store once; the
    per-batch work is ``pc.index_in`` (hash probe) + two ``Table.take``
    gathers — batches never convert to pandas, so nested/list columns
    stay zero-copy and NUL-containing string keys join exactly.  Same-
    named key columns collapse to the big side's copy (pandas-merge
    parity); differently-named dim keys are kept (null-extended under
    ``how="left"``, matching SQL)."""
    if isinstance(dim, pd.DataFrame):
        dim = pa.Table.from_pandas(dim, preserve_index=False)
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
        batch_format="pyarrow",
        zero_copy_batch=True,
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
