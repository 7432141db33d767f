"""Deterministic synthetic generators for the flagship token table and spine.

Implements FIXTURES.md F1 (pre-tokenized sequence table per
BASELINE.json.input_hint: doc_id:string, tokens:list<int32>, n_tok:int32,
source:string, derived event_ts/created_ts) and F2 (entity spine). All
generation is a pure function of (seed, n) — no external data.

The token table is the 10^12-row design-point stand-in: doc_id drawn
Zipf-ish so some keys are hot (exercises salted repartitioning), ties
injected on (doc_id, event_ts) to exercise latest-per-(key,ts) dedup
(reference semantics: created_timestamp tie-break, SURVEY §2.B4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB_SIZE = 50257
SOURCES = np.array(["web", "books", "code", "wiki"])
SOURCE_P = np.array([0.7, 0.15, 0.1, 0.05])
BASE_TS_US = np.int64(1704067200_000_000)  # 2024-01-01T00:00:00Z in microseconds


def token_table(n: int, seed: int = 42, n_docs: int | None = None,
                ts_offset_rows: int = 0) -> pa.Table:
    """Generate the F1 pre-tokenized sequence table as one Arrow table.

    Columns: doc_id:string, tokens:list<int32>, n_tok:int32, source:string,
    event_ts:timestamp[us], created_ts:timestamp[us].
    event_ts is ingestion order (row_index seconds after 2024-01-01); every
    50th row duplicates the previous row's (doc_id, event_ts) to create a
    tie that only created_ts can break.
    """
    rng = np.random.default_rng(seed)
    k = n_docs or max(1, n // 20)
    # Zipf-ish hot keys: rank ~ floor(k * u^3) concentrates mass on low ranks
    u = rng.random(n)
    ranks = np.minimum((k * u**3).astype(np.int64), k - 1)
    doc_ids = np.array([f"doc{r:08d}" for r in ranks], dtype=object)

    lengths = np.clip(
        np.exp(rng.normal(4.0, 1.0, n)).astype(np.int64), 1, 2048
    ).astype(np.int32)
    total = int(lengths.sum())
    values = rng.integers(0, VOCAB_SIZE, total, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(values))

    source = SOURCES[rng.choice(len(SOURCES), n, p=SOURCE_P)]

    event_ts = BASE_TS_US + (
        np.int64(ts_offset_rows) + np.arange(n, dtype=np.int64)) * 1_000_000
    # inject ties: every 50th row copies the previous row's key AND ts
    tie_idx = np.arange(50, n, 50)
    if len(tie_idx):
        event_ts[tie_idx] = event_ts[tie_idx - 1]
        doc_ids[tie_idx] = doc_ids[tie_idx - 1]
    created_ts = event_ts + rng.integers(0, 1_000_000, n, dtype=np.int64)

    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": tokens.cast(pa.list_(pa.int32())),
            "n_tok": pa.array(lengths, type=pa.int32()),
            "source": pa.array(source, type=pa.string()),
            "event_ts": pa.array(event_ts, type=pa.timestamp("us")),
            "created_ts": pa.array(created_ts, type=pa.timestamp("us")),
        }
    )


def spine_table(features: pa.Table, n: int, seed: int = 43) -> pa.Table:
    """Generate the F2 entity spine against a token table.

    Mix of: (a) ts exactly equal to a feature row ts (tie: must match, not
    leak), (b) ts between rows (as-of picks earlier), (c) ts before the
    doc's first row (null), (d) unknown doc_ids (~5%, all-null features).
    """
    rng = np.random.default_rng(seed)
    fk = features["doc_id"].to_numpy(zero_copy_only=False)
    fts = features["event_ts"].cast(pa.int64()).to_numpy()
    m = len(fk)

    pick = rng.integers(0, m, n)
    doc_id = fk[pick].copy()
    kind = rng.random(n)
    ts = np.empty(n, dtype=np.int64)
    ts[:] = fts[pick]
    between = kind < 0.4
    ts[between] += rng.integers(1, 500_000_000, between.sum())  # after the row
    before = (kind >= 0.8) & (kind < 0.9)
    ts[before] = BASE_TS_US - rng.integers(1, 10_000_000_000, before.sum())
    unknown = kind >= 0.95
    doc_id[unknown] = np.array(
        [f"nodoc{j:06d}" for j in range(int(unknown.sum()))], dtype=object
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "event_timestamp": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def probe_docs(n: int, seed: int = 9, words_per_doc: int = 120, vocab: int = 2000) -> pa.Table:
    """Synthetic document table for the compute-bound scaling probe
    (MinHash signatures): deterministic, small bytes, heavy CPU per row."""
    rng = np.random.default_rng(seed)
    vocab_words = np.array([f"w{i:04d}" for i in range(vocab)])
    picks = rng.integers(0, vocab, (n, words_per_doc))
    texts = [" ".join(vocab_words[row]) for row in picks]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def write_token_dataset(path: str, n: int, seed: int = 42, shards: int = 8,
                        chunk_rows: int | None = None) -> None:
    """Write the F1 table as a sharded Parquet directory (bench input).

    Default (``chunk_rows=None``): one in-memory table sliced into
    ``shards`` files — kept byte-identical across rounds so headline
    numbers stay comparable at the 16M bench point.

    ``chunk_rows=K``: STREAMING generation for 10×+ scale points (the
    160M sf1 proof) — each chunk of K rows is generated independently
    (per-chunk seed, event_ts offset by global row index, doc-id space
    fixed at the GLOBAL n//20 so hot keys stay globally hot) and written
    as its own file, bounding driver memory at one chunk instead of the
    whole table."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    if chunk_rows is None:
        tbl = token_table(n, seed=seed)
        per = (len(tbl) + shards - 1) // shards
        for i in range(shards):
            part = tbl.slice(i * per, per)
            if len(part):
                pq.write_table(part, os.path.join(path, f"part-{i:05d}.parquet"))
        return
    k_global = max(1, n // 20)
    i = 0
    off = 0
    while off < n:
        m = min(chunk_rows, n - off)
        part = token_table(m, seed=seed + i, n_docs=k_global,
                           ts_offset_rows=off)
        pq.write_table(part, os.path.join(path, f"part-{i:05d}.parquet"))
        off += m
        i += 1
