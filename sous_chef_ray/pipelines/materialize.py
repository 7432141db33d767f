"""Flagship pipeline: pre-tokenized sequence table → point-in-time features.

The 10^12-row design point (BASELINE.json north_star): read the token table
(doc_id, tokens:list<int32>, n_tok, source [, event_ts, created_ts]) →
derive event_ts from ingestion order when absent → as-of join a spine of
(doc_id, event_timestamp) queries with TTL + latest-created tie-break →
window features (lag/lead n_tok, rolling mean) per doc_id.

The big side streams once through stateless/actor map_batches stages; the
spine is broadcast. No full materialization of the token table ever.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from sous_chef_ray.stages.asof import asof_join_broadcast

BASE_TS_US = 1704067200_000_000  # 2024-01-01 UTC


def tokenize_documents(docs: "rd.Dataset", vocab: int = 50257) -> "rd.Dataset":
    """documents(doc_id,text,source,...) → flagship token-table shape.

    Deterministic, vectorized hash tokenizer (no model deps): each
    whitespace token hashes to [0, vocab). event_ts derives from ingestion
    order — here deterministically from doc_id so re-runs agree
    (testdata doc_ids are the ingestion order).
    """

    import pyarrow.compute as pc

    def tok(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        words = pc.utf8_split_whitespace(text)
        flat = pc.list_flatten(words)
        # utf8_split_whitespace keeps "" at leading/trailing whitespace
        # (unlike Python str.split()); drop them so semantics match.
        nonempty = pc.not_equal(flat, "")
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        if not pc.all(nonempty).as_py():
            keep = nonempty.to_numpy(zero_copy_only=False)
            flat = flat.filter(nonempty)
            parents = parents[keep]
        lengths = np.bincount(parents, minlength=len(t)).astype(np.int64)
        hashed = (
            pd.util.hash_pandas_object(flat.to_pandas(), index=False).to_numpy()
            % np.uint64(vocab)
        ).astype(np.int32)
        offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        tokens = pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(hashed)
        ).cast(pa.list_(pa.int32()))
        ids = pc.cast(t["doc_id"], pa.int64())
        id_str = pc.binary_join_element_wise(
            "doc", pc.utf8_lpad(pc.cast(ids, pa.string()), 8, "0"), ""
        )
        ids_np = ids.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": id_str,
                "tokens": tokens,
                "n_tok": pa.array(lengths.astype(np.int32)),
                "source": pc.cast(t["source"], pa.string()),
                "event_ts": pa.array(
                    BASE_TS_US + ids_np * 1_000_000, type=pa.timestamp("us")
                ),
                "created_ts": pa.array(
                    BASE_TS_US + ids_np * 1_000_000 + 1, type=pa.timestamp("us")
                ),
            }
        )

    return docs.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True)


def window_features(
    ds: "rd.Dataset",
    *,
    key: str = "doc_id",
    ts_col: str = "event_ts",
    tie_col: str = "created_ts",
    value_col: str = "n_tok",
    session_gap: pd.Timedelta = None,
    num_buckets: int = 128,
) -> "rd.Dataset":
    """Fused per-key window features in ONE shuffle: lag/lead of
    ``value_col`` + gap-based session ids. Arrow-native per bucket —
    token/list payload columns move by zero-copy take, never through
    pandas object arrays."""
    import pyarrow.compute as pc

    from sous_chef_ray.stages.partition import partition_apply

    gap_ns = pd.Timedelta(session_gap or pd.Timedelta(hours=6)).value

    def fn(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[(key, "ascending"), (ts_col, "ascending"), (tie_col, "ascending")],
        )
        t = t.take(idx)
        n = len(t)
        kv = t[key].to_numpy(zero_copy_only=False)
        vals = t[value_col].combine_chunks()
        vnp = vals.to_numpy(zero_copy_only=False)
        key_change = np.zeros(n, dtype=bool)
        key_change[0] = True
        key_change[1:] = kv[1:] != kv[:-1]
        key_end = np.zeros(n, dtype=bool)
        key_end[-1] = True
        key_end[:-1] = kv[1:] != kv[:-1]
        lag = pa.array(np.roll(vnp, 1), type=vals.type, mask=key_change)
        lead = pa.array(np.roll(vnp, -1), type=vals.type, mask=key_end)
        tsv = (
            t[ts_col].combine_chunks().cast(pa.timestamp("ns")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        diff = np.empty(n, dtype=np.int64)
        diff[0] = 0
        diff[1:] = tsv[1:] - tsv[:-1]
        is_new = key_change | (diff > gap_ns)
        sid = np.cumsum(is_new)
        base = np.maximum.accumulate(np.where(key_change, sid, 0))
        t = t.append_column(f"{value_col}_lag1", lag)
        t = t.append_column(f"{value_col}_lead1", lead)
        t = t.append_column("session_id", pa.array((sid - base + 1).astype(np.int64)))
        return t

    return partition_apply(ds, key, fn, num_buckets, batch_format="pyarrow")


def materialize_features(
    token_ds: "rd.Dataset",
    spine: pa.Table,
    *,
    ttl: Optional[pd.Timedelta] = None,
    concurrency: int | tuple = 4,
    batch_size: int = 262144,
    token_slim_ds: Optional["rd.Dataset"] = None,
) -> pa.Table:
    """Point-in-time feature materialization over the token table.

    Pass ``token_slim_ds`` as a ``columns=``-pruned read of the same table
    so the slim candidate pass never deserializes token arrays.
    """
    ttl = ttl if ttl is not None else pd.Timedelta(days=30)
    return asof_join_broadcast(
        token_ds,
        spine,
        key="doc_id",
        spine_ts="event_timestamp",
        feature_ts="event_ts",
        tie_col="created_ts",
        payload_cols=["tokens", "n_tok", "source"],
        ttl=ttl,
        concurrency=concurrency,
        batch_size=batch_size,
        slim_features=token_slim_ds,
    )


def flagship(sf_dir: str, concurrency: int | tuple = 4) -> pa.Table:
    """End-to-end flagship over driver testdata: tokenize documents →
    token table → window features (lag/lead + sessions, one shuffle) →
    point-in-time as-of join of a spine with TTL + tie-break."""
    import os

    from sous_chef_ray.stages.partition import auto_num_buckets

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    try:
        doc_bytes = os.path.getsize(f"{sf_dir}/documents.parquet")
    except OSError:
        doc_bytes = None
    token_ds = tokenize_documents(docs)
    feat_ds = window_features(
        token_ds,
        key="doc_id",
        ts_col="event_ts",
        tie_col="created_ts",
        value_col="n_tok",
        session_gap=pd.Timedelta(hours=6),
        num_buckets=auto_num_buckets(doc_bytes, min_buckets=16),
    )

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    rng = np.random.default_rng(7)
    pick = rng.integers(0, n_docs, max(64, n_docs // 2))
    ts = BASE_TS_US + pick * 1_000_000 + rng.integers(0, 10_000_000, len(pick))
    spine = pa.table(
        {
            "doc_id": pa.array([f"doc{i:08d}" for i in pick], type=pa.string()),
            "event_timestamp": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    from sous_chef_ray.stages.asof import asof_join_broadcast

    return asof_join_broadcast(
        feat_ds,
        spine,
        key="doc_id",
        spine_ts="event_timestamp",
        feature_ts="event_ts",
        tie_col="created_ts",
        payload_cols=["tokens", "n_tok", "source", "n_tok_lag1", "n_tok_lead1", "session_id"],
        ttl=pd.Timedelta(days=30),
        concurrency=concurrency,
    )


def window_features_resumable(
    ds_factory,
    out_dir: str,
    *,
    key: str = "doc_id",
    ts_col: str = "event_ts",
    tie_col: str = "created_ts",
    value_col: str = "n_tok",
    session_gap: pd.Timedelta = None,
    num_buckets: int = 128,
    manifest_path: str = None,
):
    """The flagship window-feature materialization written through the
    checkpoint manifest (north rule: the 10^12-row backfill itself must
    resume exactly-once). doc_ids straddle input shards, so the resume
    unit is the HASH BUCKET: completed buckets are skipped via the
    manifest; a resume scans the input once and processes only rows
    whose bucket is still missing (the same ``bucket_ids`` hash that
    partition_apply shuffles by, so filter and shuffle agree).

    ``ds_factory`` is a zero-arg callable returning a fresh input
    Dataset (a resume needs to rebuild the read). Returns the manifest's
    partition records; the features land in ``out_dir/part=<bucket>/``.
    """
    from sous_chef_ray.stages.partition import bucket_ids
    from sous_chef_ray.state.manifest import write_bucketed_resumable

    def build(missing):
        ds = ds_factory()
        if missing is not None:
            want = np.sort(np.fromiter(missing, dtype=np.int64))

            def flt(t: pa.Table) -> pa.Table:
                b = bucket_ids(t, [key], num_buckets)
                return t.filter(pa.array(np.isin(b, want)))

            ds = ds.map_batches(flt, batch_format="pyarrow",
                                zero_copy_batch=True)
        return window_features(
            ds, key=key, ts_col=ts_col, tie_col=tie_col,
            value_col=value_col, session_gap=session_gap,
            num_buckets=num_buckets)

    return write_bucketed_resumable(
        build, [key], out_dir, num_buckets,
        manifest_path=manifest_path, sort_by=[key, ts_col, tie_col])
