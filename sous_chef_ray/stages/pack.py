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
