"""Similarity search over an embedding column (list<float>).

* ``knn_brute_force`` — baseline: broadcast the query matrix once
  (``ray.put``), per-batch float64 numpy matmul against the streaming
  corpus, emit per-query local top-k, reduce to global top-k. One pass
  over the corpus, no shuffle of embeddings.
* ``knn_lsh_bucketed`` — scale path: random-hyperplane LSH buckets both
  sides; only same-bucket candidates are scored (multi-probe via several
  independent tables). Approximate; recall grows with num_tables.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from sous_chef_ray.stages._util import pool


def _emb_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = arr.offsets.to_numpy()
    dim = offsets[1] - offsets[0]
    return flat.reshape(len(t), dim)


class _ScoreBatch:
    """Per-batch cosine scores vs the broadcast query matrix; emits each
    query's local top-k within the batch."""

    def __init__(self, q_ref, id_col, emb_col, k):
        q: pd.DataFrame = ray.get(q_ref)
        self.qids = q["qid"].to_numpy()
        qm = np.stack(q["vec"].to_numpy())
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.id_col = id_col
        self.emb_col = emb_col
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, self.emb_col)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        sims = self.qm @ m.T  # (nq, batch)
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_n = ids[top.reshape(-1)]
        rows_s = np.take_along_axis(sims, top, axis=1).reshape(-1)
        return pa.table(
            {
                "qid": pa.array(rows_q),
                "neighbor_id": pa.array(rows_n),
                "cosine_sim": pa.array(rows_s, type=pa.float64()),
            }
        )


def knn_brute_force(
    corpus: "rd.Dataset",
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "vec_id",
    qemb_col: str = "embedding",
    k: int = 10,
    concurrency: int | tuple = 4,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Exact cosine top-k of each query against the corpus. Result is
    (qid, neighbor_id, cosine_sim) rows, k per query, deterministic
    tie-break by neighbor_id."""
    qdf = pd.DataFrame(
        {
            "qid": queries[qid_col].to_numpy(zero_copy_only=False),
            "vec": [np.asarray(v, dtype=np.float64) for v in queries[qemb_col].to_pylist()],
        }
    )
    q_ref = ray.put(qdf)
    cand = corpus.map_batches(
        _ScoreBatch,
        fn_constructor_kwargs=dict(q_ref=q_ref, id_col=id_col, emb_col=emb_col, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool(concurrency),
        batch_size=batch_size,
    )
    all_cand = pa.concat_tables(
        cand.iter_batches(batch_size=None, batch_format="pyarrow")
    ).to_pandas()
    all_cand = all_cand.sort_values(
        ["qid", "cosine_sim", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    return all_cand.groupby("qid", sort=False).head(k).reset_index(drop=True)


class _LshTag:
    def __init__(self, planes_ref, emb_col):
        self.planes = ray.get(planes_ref)  # (num_tables, bits, dim)
        self.emb_col = emb_col

    def bucket(self, m: np.ndarray) -> np.ndarray:
        # (rows, tables) int64 bucket codes
        codes = []
        for t in range(self.planes.shape[0]):
            bits = (m @ self.planes[t].T) > 0  # (rows, bits)
            code = np.zeros(len(m), dtype=np.int64)
            for b in range(bits.shape[1]):
                code = (code << 1) | bits[:, b]
            codes.append(code)
        return np.stack(codes, axis=1)


def knn_lsh_bucketed(
    corpus: "rd.Dataset",
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "vec_id",
    qemb_col: str = "embedding",
    k: int = 10,
    num_tables: int = 8,
    bits: int = 8,
    dim: Optional[int] = None,
    seed: int = 11,
    concurrency: int | tuple = 4,
) -> pd.DataFrame:
    """Approximate top-k: score only corpus rows sharing an LSH bucket
    with the query in ANY of ``num_tables`` hyperplane tables."""
    if dim is None:
        dim = len(queries[qemb_col][0].as_py())
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, bits, dim))
    planes_ref = ray.put(planes)

    tagger = _LshTag(planes_ref, emb_col)
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in queries[qemb_col].to_pylist()])
    qcodes = tagger.bucket(qm)  # (nq, tables)
    qids = queries[qid_col].to_numpy(zero_copy_only=False)
    # query bucket lookup: sorted unique code array per table (np.isin
    # binary-searches these — vectorized, no per-row Python membership)
    wanted = [np.unique(qcodes[:, t]) for t in range(num_tables)]
    wanted_ref = ray.put(wanted)

    class Filter:
        def __init__(self):
            self.tag = _LshTag(planes_ref, emb_col)
            self.wanted = ray.get(wanted_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _emb_matrix(t, emb_col)
            codes = self.tag.bucket(m)
            keep = np.zeros(len(t), dtype=bool)
            for tab in range(codes.shape[1]):
                keep |= np.isin(codes[:, tab], self.wanted[tab])
            return t.filter(pa.array(keep))

    filtered = corpus.map_batches(
        Filter, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool(concurrency)
    )
    return knn_brute_force(
        filtered, queries, id_col=id_col, emb_col=emb_col,
        qid_col=qid_col, qemb_col=qemb_col, k=k, concurrency=pool(concurrency),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + probed cells
# ---------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 12,
            seed: int = 13) -> np.ndarray:
    """Plain seeded Lloyd's k-means on L2-normalized vectors (spherical):
    assignment by max cosine, centroids renormalized each step. Runs on
    a driver-side SAMPLE only (a few MB at any corpus scale)."""
    rng = np.random.default_rng(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def knn_ivf(
    corpus: "rd.Dataset",
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "vec_id",
    qemb_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    sample_rows: int = 20000,
    concurrency: int | tuple = 4,
    seed: int = 13,
) -> pd.DataFrame:
    """IVF approximate top-k: train a coarse quantizer on a driver-side
    sample, broadcast the centroids, and score only corpus rows whose
    nearest centroid is among any query's ``nprobe`` closest cells.

    The scale shape: centroids are a (n_centroids × dim) broadcast, the
    corpus streams once through a vectorized cell-assignment filter
    (~corpus_fraction ≈ nprobe/n_centroids survives), and the surviving
    fraction goes through the exact brute-force scorer. Recall grows
    with nprobe; nprobe == n_centroids degenerates to exact search."""
    sample_tbl = pa.concat_tables(
        corpus.limit(sample_rows).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    sample = _emb_matrix(sample_tbl, emb_col)
    cent = _kmeans(sample, n_centroids, seed=seed)
    cent_ref = ray.put(cent)

    qm = np.stack([np.asarray(v, dtype=np.float64) for v in queries[qemb_col].to_pylist()])
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    qsims = qn @ cent.T  # (nq, n_centroids)
    np_probe = min(nprobe, cent.shape[0])
    probed = np.argpartition(-qsims, np_probe - 1, axis=1)[:, :np_probe]
    wanted = np.unique(probed.reshape(-1))
    wanted_ref = ray.put(wanted)

    class CellFilter:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.wanted = ray.get(wanted_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _emb_matrix(t, emb_col)
            norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cells = np.argmax((m / norms) @ self.cent.T, axis=1)
            return t.filter(pa.array(np.isin(cells, self.wanted)))

    filtered = corpus.map_batches(
        CellFilter, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool(concurrency),
    )
    return knn_brute_force(
        filtered, queries, id_col=id_col, emb_col=emb_col,
        qid_col=qid_col, qemb_col=qemb_col, k=k, concurrency=pool(concurrency),
    )


def cosine_pairs_above(
    corpus: "rd.Dataset",
    threshold: float,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_dp: int = 6,
    concurrency: int | tuple = 4,
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate PAIRS: all (id_a < id_b) with
    cosine ≥ threshold — the brute-force baseline for embedding dedup.

    Shape: normalize + ray.put the corpus matrix ONCE; every streaming
    batch computes its rows × corpus similarities (one matmul) and emits
    its above-threshold pairs, so the O(n²) similarity work distributes
    over batches and only pairs move. For corpora too big to broadcast
    (≫10⁶ rows) use the LSH (`knn_lsh_bucketed`) or IVF cell route to
    cut candidates first — this is the exact small/medium-corpus path.
    """
    all_tbl = pa.concat_tables(
        corpus.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids = all_tbl[id_col].to_numpy(zero_copy_only=False)
    m = _emb_matrix(all_tbl, emb_col)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, m))

    class PairFinder:
        def __init__(self):
            self.ids, self.m = ray.get(mat_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            bm = _emb_matrix(t, emb_col)
            bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
            bids = t[id_col].to_numpy(zero_copy_only=False)
            sims = np.round(bm @ self.m.T, round_dp)
            # id_a < id_b keeps each unordered pair exactly once
            mask = (sims >= threshold) & (bids[:, None] < self.ids[None, :])
            ai, bi = np.nonzero(mask)
            return pa.table({
                "id_a": pa.array(bids[ai]),
                "id_b": pa.array(self.ids[bi]),
                "cosine_sim": pa.array(sims[ai, bi], type=pa.float64()),
            })

    out = corpus.map_batches(
        PairFinder, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool(concurrency),
    ).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
