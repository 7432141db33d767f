"""Sequence packing: tokenized documents → fixed-length training rows.

The standard LLM pre-training step: concatenate each block's documents
(in block order, EOS token between docs), then slice the stream into
``seq_len``-token rows. Vectorized: one offset concatenation + one
reshape per batch, no Python loop over tokens.

Distribution contract: packing is PER BLOCK (``batch_size=None``), so
each input shard packs independently and deterministically — the
shard-parallel shape that scales to 10^12 tokens (a global pack order
would serialize the pipeline). The final partial sequence of each block
is emitted with ``complete=false`` (callers drop or pad it); token
conservation per block is exact and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def pack_sequences(
    ds: "rd.Dataset",
    tokens_col: str = "tokens",
    seq_len: int = 2048,
    eos_id: int = 0,
    emit_partial: bool = True,
) -> "rd.Dataset":
    """documents(tokens:list<int32>, ...) → (seq_id:int64 [block-local],
    tokens:list<int32> [len == seq_len when complete], n_tokens:int32,
    complete:bool)."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col].combine_chunks()
        if len(t) == 0:
            return pa.table({
                "seq_id": pa.array([], type=pa.int64()),
                "tokens": pa.array([], type=pa.list_(pa.int32())),
                "n_tokens": pa.array([], type=pa.int32()),
                "complete": pa.array([], type=pa.bool_()),
            })
        lengths = pa.compute.list_value_length(col).to_numpy(zero_copy_only=False)
        flat = np.asarray(col.flatten(), dtype=np.int32)
        # interleave an EOS after every document: build the output stream
        # by offset arithmetic (no per-token Python)
        n_docs = len(lengths)
        total = int(lengths.sum()) + n_docs  # + one EOS per doc
        stream = np.full(total, eos_id, dtype=np.int32)
        # positions: doc i occupies [src_off[i] + i, src_off[i] + i + len)
        src_off = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lengths[:-1], out=src_off[1:])
        dst_off = src_off + np.arange(n_docs, dtype=np.int64)
        idx = np.repeat(dst_off, lengths) + _within_doc_index(lengths)
        stream[idx] = flat
        n_full = total // seq_len
        rem = total - n_full * seq_len
        n_rows = n_full + (1 if emit_partial and rem else 0)
        offsets = np.arange(0, n_full * seq_len + 1, seq_len, dtype=np.int64)
        if emit_partial and rem:
            offsets = np.concatenate([offsets, [total]])
            flat_out = stream
        else:
            flat_out = stream[: n_full * seq_len]
        tokens_arr = pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(flat_out)
        ).cast(pa.list_(pa.int32()))
        n_tokens = np.full(n_rows, seq_len, dtype=np.int32)
        complete = np.ones(n_rows, dtype=bool)
        if emit_partial and rem:
            n_tokens[-1] = rem
            complete[-1] = False
        return pa.table({
            "seq_id": pa.array(np.arange(n_rows, dtype=np.int64)),
            "tokens": tokens_arr,
            "n_tokens": pa.array(n_tokens),
            "complete": pa.array(complete),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def chunk_token_windows(
    ds: "rd.Dataset",
    tokens_col: str = "tokens",
    window: int = 2048,
    stride: int = 2048,
    id_cols: "list[str] | None" = None,
) -> "rd.Dataset":
    """Per-document sliding-window chunking — the context-window prep
    step between tokenization and training: each document's token list
    is cut into chunks of ``window`` items starting every ``stride``
    (stride < window ⇒ overlapping chunks; the last chunk is the
    remainder). Zero-length docs emit zero chunks.

    Vectorized per batch: one ragged-arange index gather over the list
    child values (works for any list value type — int32 tokens or word
    strings); no Python loop over documents. Shard-parallel and
    deterministic, so it scales like pack_sequences.

    Output: id_cols + chunk_id:int64 (0-based within doc) + tokens_col
    (the slice) + n_<tokens_col>:int32."""
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")
    id_cols = list(id_cols) if id_cols is not None else []

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col].combine_chunks() if len(t) else t[tokens_col]
        out_type = pa.list_(col.type.value_type)
        if len(t) == 0:
            cols = {c: t[c] for c in id_cols}
            cols["chunk_id"] = pa.array([], type=pa.int64())
            cols[tokens_col] = pa.array([], type=out_type)
            cols[f"n_{tokens_col}"] = pa.array([], type=pa.int32())
            return pa.table(cols)
        offs = np.asarray(col.offsets)
        n = np.diff(offs).astype(np.int64)
        n_chunks = np.where(n > 0, (n - 1) // stride + 1, 0)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_chunks)
        chunk_id = _within_doc_index(n_chunks)
        start = chunk_id * stride
        length = np.minimum(window, n[doc_idx] - start)
        gstart = offs[:-1][doc_idx] + start
        lens_cum = np.zeros(len(length) + 1, dtype=np.int64)
        np.cumsum(length, out=lens_cum[1:])
        total = int(lens_cum[-1])
        idx = (np.repeat(gstart, length)
               + (np.arange(total, dtype=np.int64)
                  - np.repeat(lens_cum[:-1], length)))
        out_vals = col.values.take(pa.array(idx, type=pa.int64()))
        lists = pa.LargeListArray.from_arrays(
            pa.array(lens_cum), out_vals).cast(out_type)
        didx = pa.array(doc_idx)
        cols = {c: t[c].combine_chunks().take(didx) for c in id_cols}
        cols["chunk_id"] = pa.array(chunk_id)
        cols[tokens_col] = lists
        cols[f"n_{tokens_col}"] = pa.array(length.astype(np.int32))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _within_doc_index(lengths: np.ndarray) -> np.ndarray:
    """[0..len0), [0..len1), ... concatenated (vectorized)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.ones(total, dtype=np.int64)
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    nz = lengths > 0
    idx[starts[nz]] = np.concatenate([[0], -lengths[nz][:-1] + 1])
    return np.cumsum(idx)
