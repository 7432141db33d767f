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
    # Distributed final reduce: the per-batch local top-k stream is
    # nq × k × n_blocks rows — at 10⁵ queries × 10⁵ blocks a driver-side
    # concat would not fit (VERDICT r2 #4), so hash-partition by qid and
    # take each query's global top-k inside its bucket; only the final
    # nq × k rows reach the driver.
    from sous_chef_ray.stages.partition import partition_apply

    def topk(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("qid", "ascending"), ("cosine_sim", "descending"),
             ("neighbor_id", "ascending")]
        )
        q = t["qid"].to_numpy(zero_copy_only=False)
        n = len(q)
        arange = np.arange(n, dtype=np.int64)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = q[1:] != q[:-1]
        group_start = np.maximum.accumulate(np.where(change, arange, 0))
        return t.take(pa.array(np.nonzero(arange - group_start < k)[0]))

    nq = len(qdf)
    reduced = partition_apply(
        cand, "qid", topk,
        num_buckets=max(8, nq // 10_000),
        batch_format="pyarrow",
    )
    out = reduced.to_pandas()
    return out.sort_values(
        ["qid", "cosine_sim", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    ).reset_index(drop=True)


class _LshTag:
    def __init__(self, planes_ref, emb_col):
        self.planes = ray.get(planes_ref)  # (num_tables, bits, dim)
        self.emb_col = emb_col

    def bucket(self, m: np.ndarray) -> np.ndarray:
        return self.bucket_static(self.planes, m)

    @staticmethod
    def bucket_static(planes: np.ndarray, m: np.ndarray) -> np.ndarray:
        # (rows, tables) int64 bucket codes
        codes = []
        for t in range(planes.shape[0]):
            bits = (m @ planes[t].T) > 0  # (rows, bits)
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
    if "id_a" not in out.columns:  # zero pairs → schema-less empty frame
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def cosine_pairs_lsh(
    corpus: "rd.Dataset",
    threshold: float,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_tables: int = 32,
    bits: int = 8,
    dim: Optional[int] = None,
    seed: int = 11,
    round_dp: int = 6,
    bucket_cap: int = 4096,
    num_partitions: int = 32,
    concurrency: int | tuple = 4,
) -> pd.DataFrame:
    """Embedding-cosine near-dup PAIRS, bucketed — the 100-TB path.

    Unlike :func:`cosine_pairs_above` (which broadcasts the whole
    normalized corpus matrix), this never materializes the corpus on the
    driver. Plan (every step streams):

      1. hyperplane-LSH tag: each row emits ``num_tables`` slim
         (table, code, id) rows — embeddings do NOT ride along;
      2. groupby (table, code) → within-bucket candidate id pairs
         (``bucket_cap`` caps degenerate buckets with a sorted-id chain,
         same guard as ``neardup.minhash_lsh_candidates``);
      3. dedup pairs (a pair can collide in several tables);
      4. exact verify, fully distributed: ``semi_join`` the corpus to
         candidate ids, ship each candidate's NORMALIZED embedding as a
         binary blob (Arrow hash join rejects list payloads — same trick
         as ``neardup.jaccard_verify_distributed``), hash-join onto the
         pair set on id_a then id_b, one vectorized row-wise dot per
         batch, keep cosine ≥ threshold.

    Only (a) 24-byte bucket rows and (b) candidate embeddings shuffle;
    at 100 TB both are bounded by the candidate set, not the corpus.
    Approximate: a pair is found iff it shares a bucket in ≥1 table;
    recall at the threshold is 1-(1-p^bits)^num_tables with
    p = 1 - acos(threshold)/π — size ``num_tables`` accordingly
    (defaults give >0.999 at threshold 0.9).
    """
    from sous_chef_ray.stages.join import hash_join, semi_join

    rng = np.random.default_rng(seed)
    if dim is None:
        row = corpus.limit(1).take_all()
        dim = len(row[0][emb_col])
    planes = rng.standard_normal((num_tables, bits, dim))
    planes_ref = ray.put(planes)

    def tag(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, emb_col)
        codes = _LshTag.bucket_static(ray.get(planes_ref), m)  # (rows, tables)
        n = len(t)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "table": pa.array(
                    np.repeat(np.arange(num_tables, dtype=np.int32)[None, :], n,
                              axis=0).reshape(-1)
                ),
                "code": pa.array(codes.reshape(-1)),
                id_col: pa.array(np.repeat(ids, num_tables)),
            }
        )

    buckets = corpus.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        if len(ids) > bucket_cap:
            import logging

            logging.getLogger("sous_chef_ray.similarity").warning(
                "LSH cosine bucket of size %d exceeds cap %d; chain pairs",
                len(ids), bucket_cap,
            )
            return pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    from sous_chef_ray.stages.partition import partition_apply

    # dedup: hash-partition by pair, ONE drop_duplicates per bucket —
    # a groupby(pair).map_groups would make one Python call per PAIR
    cand = partition_apply(
        buckets.groupby(["table", "code"]).map_groups(pairs, batch_format="pandas")
        .map_batches(lambda df: df.drop_duplicates(), batch_format="pandas"),
        ["id_a", "id_b"],
        lambda df: df.drop_duplicates(),
        num_buckets=num_partitions,
    )

    return _verify_pairs_distributed(
        corpus, cand, threshold, id_col=id_col, emb_col=emb_col, dim=dim,
        round_dp=round_dp, num_partitions=num_partitions,
        concurrency=concurrency,
    )


def _verify_pairs_distributed(
    corpus: "rd.Dataset",
    cand: "rd.Dataset",
    threshold: float,
    *,
    id_col: str,
    emb_col: str,
    dim: int,
    round_dp: int,
    num_partitions: int,
    concurrency: int | tuple,
) -> pd.DataFrame:
    """Exact-cosine verification of a candidate-pair Dataset, fully
    distributed (shared by the LSH- and IVF-bucketed pairs paths):
    semi-join the corpus to candidate ids, ship each candidate's
    normalized embedding as a binary blob (Arrow hash join rejects list
    payloads), hash-join onto the pair set on id_a then id_b, one
    vectorized row-wise dot per batch, keep cosine ≥ threshold. Every
    intermediate is bounded by the CANDIDATE set, never the corpus."""
    from sous_chef_ray.stages.join import hash_join, semi_join

    pair_tbl = pa.concat_tables(
        cand.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if len(pair_tbl) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
    import pyarrow.compute as pc

    cand_ids = pc.unique(
        pa.chunked_array([pair_tbl["id_a"].combine_chunks(),
                          pair_tbl["id_b"].combine_chunks()]).combine_chunks()
    )

    def blobs(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, emb_col)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.table(
            {
                id_col: t[id_col],
                "emb": pa.array([r.tobytes() for r in m], type=pa.large_binary()),
            }
        )

    # Materialize the (candidate-bounded) blob set and the first join:
    # two PIPELINED JoinOperators each reserve num_partitions aggregator
    # actors — on a small cluster that over-reserves CPUs and deadlocks
    # (measured: chained joins hang at 8 cpus, barriers run in seconds).
    # Both intermediates are bounded by the candidate set, not the corpus.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(2, min(num_partitions, cpus))
    emb_blobs = semi_join(corpus, cand_ids, id_col,
                          concurrency=concurrency).map_batches(
        blobs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    pairs_ds = rd.from_arrow(pair_tbl)
    j1 = hash_join(
        pairs_ds, emb_blobs.rename_columns({id_col: "id_a", "emb": "emb_a"}),
        on="id_a", num_partitions=n_part,
    ).materialize()
    j2 = hash_join(
        j1, emb_blobs.rename_columns({id_col: "id_b", "emb": "emb_b"}),
        on="id_b", num_partitions=n_part,
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"id_a": pa.array([], pair_tbl.schema.field("id_a").type),
                             "id_b": pa.array([], pair_tbl.schema.field("id_b").type),
                             "cosine_sim": pa.array([], pa.float64())})
        a = np.frombuffer(b"".join(t["emb_a"].to_pylist()), dtype=np.float64
                          ).reshape(len(t), dim)
        b = np.frombuffer(b"".join(t["emb_b"].to_pylist()), dtype=np.float64
                          ).reshape(len(t), dim)
        sims = np.round(np.einsum("ij,ij->i", a, b), round_dp)
        keep = sims >= threshold
        return pa.table(
            {
                "id_a": t["id_a"].combine_chunks().filter(pa.array(keep)),
                "id_b": t["id_b"].combine_chunks().filter(pa.array(keep)),
                "cosine_sim": pa.array(sims[keep], type=pa.float64()),
            }
        )

    out = j2.map_batches(verify, batch_format="pyarrow").to_pandas()
    if "id_a" not in out.columns:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def cosine_pairs_ivf(
    corpus: "rd.Dataset",
    threshold: float,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_centroids: int = 64,
    n_assign: int = 4,
    sample_rows: int = 20000,
    dim: Optional[int] = None,
    seed: int = 13,
    round_dp: int = 6,
    bucket_cap: int = 4096,
    num_partitions: int = 32,
    concurrency: int | tuple = 4,
) -> pd.DataFrame:
    """Embedding-cosine near-dup PAIRS, IVF-cell-bucketed — the second
    scale path beside :func:`cosine_pairs_lsh`, trading LSH's random
    hyperplanes for data-adaptive k-means cells (tighter buckets when
    the corpus is clustered, as near-dup corpora are).

    Plan: train a spherical k-means quantizer on a bounded driver-side
    sample (few MB at any corpus scale), broadcast the centroids, then
    each row emits ``n_assign`` slim (cell, id) rows for its closest
    cells — multi-assignment so a near-dup pair straddling a cell
    boundary still co-occurs somewhere. groupby(cell) yields candidate
    pairs (``bucket_cap`` chain guard on degenerate cells), pairs dedup
    by hash partition, and the shared distributed verifier scores them
    exactly. Embeddings never ride the shuffle; the driver never sees
    the corpus. A pair is missed only if the two rows share none of
    their n_assign cells — raise n_assign (or n_centroids↓) for recall,
    n_assign == n_centroids degenerates to exact all-pairs."""
    from sous_chef_ray.stages.partition import partition_apply

    if dim is None:
        row = corpus.limit(1).take_all()
        dim = len(row[0][emb_col])
    sample_tbl = pa.concat_tables(
        corpus.limit(sample_rows).iter_batches(batch_size=None,
                                               batch_format="pyarrow")
    )
    cent = _kmeans(_emb_matrix(sample_tbl, emb_col), n_centroids, seed=seed)
    cent_ref = ray.put(cent)
    r = min(n_assign, cent.shape[0])

    def tag(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, emb_col)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ ray.get(cent_ref).T  # (rows, n_centroids)
        cells = np.argpartition(-sims, r - 1, axis=1)[:, :r]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "cell": pa.array(cells.reshape(-1).astype(np.int32)),
            id_col: pa.array(np.repeat(ids, r)),
        })

    buckets = corpus.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        if len(ids) > bucket_cap:
            import logging

            logging.getLogger("sous_chef_ray.similarity").warning(
                "IVF cosine cell of size %d exceeds cap %d; chain pairs",
                len(ids), bucket_cap,
            )
            return pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = partition_apply(
        buckets.groupby("cell").map_groups(pairs, batch_format="pandas")
        .map_batches(lambda df: df.drop_duplicates(), batch_format="pandas"),
        ["id_a", "id_b"],
        lambda df: df.drop_duplicates(),
        num_buckets=num_partitions,
    )
    return _verify_pairs_distributed(
        corpus, cand, threshold, id_col=id_col, emb_col=emb_col, dim=dim,
        round_dp=round_dp, num_partitions=num_partitions,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means: coarse init on a bounded sample, then
# full-corpus refinement where each iteration is ONE streaming pass
# ---------------------------------------------------------------------------

def kmeans_fit_distributed(
    corpus: "rd.Dataset",
    *,
    emb_col: str = "embedding",
    n_centroids: int = 8,
    iters: int = 10,
    sample_rows: int = 20000,
    seed: int = 13,
    tol: float = 1e-6,
    spherical: bool = True,
):
    """Fit k-means over the WHOLE corpus, not just a sample: initialize
    with the driver-sample quantizer (`_kmeans`), then run Lloyd
    iterations where each step is one map_batches pass emitting per-batch
    partial (cid, dim, sum, count) rows — (k x d) floats per block — that
    reduce IN-CLUSTER via groupby().Sum. The driver only ever sees the
    k x d aggregated table, so the fit streams at any corpus size; the
    corpus is materialized once and re-read per iteration from the object
    store. Returns (centroids ndarray, n_iters_run)."""
    from ray.data.aggregate import Sum as _Sum

    sample_tbl = pa.concat_tables(
        corpus.limit(sample_rows).iter_batches(batch_size=None,
                                               batch_format="pyarrow")
    )
    cent = _kmeans(_emb_matrix(sample_tbl, emb_col), n_centroids, seed=seed)
    corpus = corpus.materialize()
    k, d = cent.shape

    it = 0
    for it in range(1, iters + 1):
        cent_ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            x = _emb_matrix(t, emb_col)
            if spherical:
                x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                                   1e-12)
                assign = np.argmax(x @ c.T, axis=1)
            else:
                d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=k).astype(np.float64)
            cid = np.repeat(np.arange(k, dtype=np.int64), d)
            dim = np.tile(np.arange(d, dtype=np.int64), k)
            return pa.table({
                "cid": cid, "dim": dim, "s": sums.reshape(-1),
                "n": np.repeat(counts, d),
            })

        agg = (
            corpus.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["cid", "dim"])
            .aggregate(_Sum("s", alias_name="s"), _Sum("n", alias_name="n"))
            .to_pandas()
        )
        agg = agg.sort_values(["cid", "dim"])
        sums = agg["s"].to_numpy().reshape(k, d)
        counts = agg["n"].to_numpy().reshape(k, d)[:, 0]
        new_cent = cent.copy()
        nz = counts > 0
        new_cent[nz] = sums[nz] / counts[nz, None]
        if spherical:
            norms = np.maximum(
                np.linalg.norm(new_cent, axis=1, keepdims=True), 1e-12)
            new_cent = new_cent / norms
        shift = float(np.abs(new_cent - cent).max())
        cent = new_cent
        if shift < tol:
            break
    return cent, it


def kmeans_assign(
    corpus: "rd.Dataset",
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cluster_col: str = "cluster",
    spherical: bool = True,
) -> "rd.Dataset":
    """One streaming pass assigning every vector to its nearest centroid
    (broadcast (k x d) matrix, vectorized matmul per batch)."""
    cent_ref = ray.put(centroids)

    def fn(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _emb_matrix(t, emb_col)
        if spherical:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            assign = np.argmax(x @ c.T, axis=1)
        else:
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
        return pa.table({id_col: t[id_col],
                         cluster_col: pa.array(assign, type=pa.int64())})

    return corpus.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-vector ANN — the memory-scale path
# (codes are m bytes/vector instead of 4·dim; the codebook broadcasts once)
# ---------------------------------------------------------------------------


def _kmeans_l2(sample: np.ndarray, n_centroids: int, iters: int = 15,
               seed: int = 17) -> np.ndarray:
    """Plain Euclidean Lloyd's on a driver-side sample (PQ subspaces are
    NOT normalized, unlike the spherical quantizer above)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample),
                             size=min(n_centroids, len(sample)),
                             replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train(
    corpus: "rd.Dataset",
    emb_col: str = "embedding",
    *,
    m: int = 8,
    n_codes: int = 16,
    sample_rows: int = 20_000,
    seed: int = 17,
) -> np.ndarray:
    """Train an m-subspace product quantizer on a bounded corpus sample
    (vectors L2-normalized first so ADC inner products approximate
    cosine). Returns codebooks of shape (m, n_codes, dim//m) — a few KB
    at any corpus scale, broadcast once to every encode/search actor."""
    sample_t = pa.concat_tables(
        corpus.limit(sample_rows).iter_batches(batch_size=None,
                                               batch_format="pyarrow"))
    x = _emb_matrix(sample_t, emb_col)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.empty((m, n_codes, sub), dtype=np.float64)
    for s in range(m):
        books[s] = _kmeans_l2(x[:, s * sub:(s + 1) * sub], n_codes,
                              seed=seed + s)
    return books


class _PqEncode:
    def __init__(self, books_ref, id_col, emb_col):
        self.books = ray.get(books_ref)
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        x = _emb_matrix(t, self.emb_col)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        m, n_codes, sub = self.books.shape
        codes = np.empty((len(t), m), dtype=np.uint8)
        for s in range(m):
            xs = x[:, s * sub:(s + 1) * sub]
            # ||x−c||² = ||x||² − 2x·c + ||c||²; only the last two vary by c
            d = -2.0 * (xs @ self.books[s].T) + (
                self.books[s] ** 2).sum(axis=1)[None, :]
            codes[:, s] = np.argmin(d, axis=1).astype(np.uint8)
        return pa.table({
            self.id_col: t[self.id_col],
            "pq_code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m),
        })


def pq_encode(
    corpus: "rd.Dataset",
    books: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int | tuple = 4,
) -> "rd.Dataset":
    """Corpus → (id, pq_code fixed_size_list<uint8>[m]) — m bytes per
    vector; the stage streams, the codebook ships once per actor."""
    books_ref = ray.put(books)
    return corpus.map_batches(
        _PqEncode,
        fn_constructor_kwargs=dict(books_ref=books_ref, id_col=id_col,
                                   emb_col=emb_col),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool(concurrency),
    )


class _PqScore:
    """ADC (asymmetric distance computation): per-actor precomputed
    lookup tables LUT[q, s, code] = q_sub · centroid — scoring a coded
    batch is m numpy gathers + a sum, never touching float vectors."""

    def __init__(self, q_ref, books_ref, k):
        q: pd.DataFrame = ray.get(q_ref)
        books = ray.get(books_ref)
        self.qids = q["qid"].to_numpy()
        qm = np.stack(q["vec"].to_numpy()).astype(np.float64)
        qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True),
                             1e-12)
        m, n_codes, sub = books.shape
        self.m = m
        self.lut = np.empty((len(qm), m, n_codes), dtype=np.float64)
        for s in range(m):
            self.lut[:, s, :] = qm[:, s * sub:(s + 1) * sub] @ books[s].T
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = t["pq_code"].combine_chunks()
        codes = arr.flatten().to_numpy(zero_copy_only=False).reshape(
            len(t), self.m)
        sims = np.zeros((self.lut.shape[0], len(t)), dtype=np.float64)
        for s in range(self.m):
            sims += self.lut[:, s, codes[:, s]]
        ids = t["__pq_id"].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        return pa.table({
            "qid": pa.array(np.repeat(self.qids, k)),
            "neighbor_id": pa.array(ids[top.reshape(-1)]),
            "cosine_sim": pa.array(
                np.take_along_axis(sims, top, axis=1).reshape(-1),
                type=pa.float64()),
        })


def knn_pq(
    corpus: "rd.Dataset",
    queries: pa.Table,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    qid_col: str = "vec_id",
    qemb_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    sample_rows: int = 20_000,
    refine: int = 4,
    concurrency: int | tuple = 4,
) -> pd.DataFrame:
    """Approximate cosine top-k over PQ codes: train (bounded sample) →
    encode (streaming, m bytes/vector) → ADC score (LUT gathers) →
    distributed per-qid reduce to k·refine candidates → EXACT re-rank of
    the candidates (the standard PQ design: ADC recalls the
    neighborhood, the float rescore fixes the within-cluster order; the
    candidate set is nq·k·refine rows — output-sized, same driver-side
    contract as the returned frame). The compressed corpus is
    ~dim·4/m× smaller than the raw vectors — the path that keeps a
    100 TB embedding table ANN-searchable in RAM. ``refine=0`` returns
    raw ADC scores."""
    from sous_chef_ray.stages.partition import partition_apply

    books = pq_train(corpus, emb_col, m=m, n_codes=n_codes,
                     sample_rows=sample_rows)
    coded = pq_encode(corpus, books, id_col=id_col, emb_col=emb_col,
                      concurrency=concurrency).map_batches(
        lambda t, _i=id_col: t.rename_columns(
            ["__pq_id" if c == _i else c for c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)
    qdf = pd.DataFrame({
        "qid": queries[qid_col].to_numpy(zero_copy_only=False),
        "vec": [np.asarray(v, dtype=np.float64)
                for v in queries[qemb_col].to_pylist()],
    })
    q_ref = ray.put(qdf)
    books_ref = ray.put(books)
    kk = k * max(1, refine)
    cand = coded.map_batches(
        _PqScore,
        fn_constructor_kwargs=dict(q_ref=q_ref, books_ref=books_ref, k=kk),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool(concurrency),
    )

    def topk(t: pa.Table, _k=kk) -> pa.Table:
        t = t.sort_by([("qid", "ascending"), ("cosine_sim", "descending"),
                       ("neighbor_id", "ascending")])
        q = t["qid"].to_numpy(zero_copy_only=False)
        n = len(q)
        arange = np.arange(n, dtype=np.int64)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = q[1:] != q[:-1]
        group_start = np.maximum.accumulate(np.where(change, arange, 0))
        return t.take(pa.array(np.nonzero(arange - group_start < _k)[0]))

    reduced = partition_apply(cand, "qid", topk,
                              num_buckets=max(8, len(qdf) // 10_000),
                              batch_format="pyarrow")
    out = reduced.to_pandas()
    if refine:
        out = _pq_rerank(corpus, qdf, out, id_col=id_col, emb_col=emb_col,
                         k=k, concurrency=concurrency)
    return out.sort_values(["qid", "cosine_sim", "neighbor_id"],
                           ascending=[True, False, True],
                           kind="mergesort").reset_index(drop=True)


def _pq_rerank(corpus, qdf: pd.DataFrame, cand: pd.DataFrame, *,
               id_col: str, emb_col: str, k: int,
               concurrency) -> pd.DataFrame:
    """Exact-cosine rescore of the ADC candidate set: the corpus is
    semi-filtered to the candidate ids (broadcast key set — one
    streaming pass, no shuffle) and only those vectors are gathered
    (bounded: ≤ nq·k·refine rows by construction)."""
    from sous_chef_ray.stages.join import semi_join

    ids = pa.array(pd.unique(cand["neighbor_id"]))
    slim = semi_join(corpus, ids, id_col, concurrency=concurrency)
    vecs: dict = {}
    for t in slim.iter_batches(batch_size=None, batch_format="pyarrow"):
        m_ = _emb_matrix(t, emb_col)
        m_ = m_ / np.maximum(np.linalg.norm(m_, axis=1, keepdims=True),
                             1e-12)
        for i, vid in enumerate(t[id_col].to_numpy(zero_copy_only=False)):
            vecs[vid] = m_[i]
    rows = []
    by_q = cand.groupby("qid", sort=False)["neighbor_id"]
    qvec = {qid: v / max(np.linalg.norm(v), 1e-12)
            for qid, v in zip(qdf["qid"], qdf["vec"])}
    for qid, neigh in by_q:
        nid = neigh.to_numpy()
        mat = np.stack([vecs[n_] for n_ in nid])
        sims = mat @ qvec[qid]
        order = np.lexsort((nid, -sims))[:k]
        for j in order:
            rows.append((qid, nid[j], float(sims[j])))
    return pd.DataFrame(rows, columns=["qid", "neighbor_id", "cosine_sim"])


# ---------------------------------------------------------------------------
# SemDeDup: semantic (embedding-space) deduplication — cluster, then prune
# near-duplicates within each cluster (Abbas et al. 2023, arXiv:2303.09540)
# ---------------------------------------------------------------------------


def _greedy_keep_rows(x: np.ndarray, threshold: float,
                      chunk: int = 1024) -> "tuple[np.ndarray, np.ndarray]":
    """Deterministic greedy scan over L2-NORMALIZED rows (ascending-id
    order): row i is kept iff its max cosine to every EARLIER KEPT row
    is <= threshold. Returns (keep mask, max-sim-to-kept per row).

    The scan is inherently sequential, but each step is one vectorized
    matvec against the kept matrix; rows are chunked so the
    previously-kept similarities come from one (chunk x kept) matmul.
    """
    m, d = x.shape
    keep = np.zeros(m, dtype=bool)
    max_sim = np.zeros(m, dtype=np.float64)
    kept_mat = np.empty((0, d), dtype=x.dtype)
    for s in range(0, m, chunk):
        blk = x[s:s + chunk]
        prev = blk @ kept_mat.T if len(kept_mat) else None
        local: list = []
        for i in range(len(blk)):
            mx = float(prev[i].max()) if prev is not None and prev.shape[1] else 0.0
            if local:
                mx = max(mx, float((blk[local] @ blk[i]).max()))
            max_sim[s + i] = mx
            if mx <= threshold:
                local.append(i)
                keep[s + i] = True
        if local:
            kept_mat = np.concatenate([kept_mat, blk[local]])
    return keep, max_sim


def semdedup(
    corpus: "rd.Dataset",
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    iters: int = 8,
    sample_rows: int = 20000,
    seed: int = 13,
    num_buckets: int = 32,
) -> "rd.Dataset":
    """Semantic dedup over an embedding column (SemDeDup): spherical
    k-means over the whole corpus (distributed Lloyd, driver only sees
    the k x d table), one streaming assignment pass, then a per-cluster
    greedy prune — drop every vector whose cosine similarity to an
    earlier-id KEPT vector in the same cluster exceeds ``threshold``,
    so each semantic-duplicate group keeps exactly its lowest-id member.

    Scale shape: all-pairs work is confined WITHIN clusters (the paper's
    point — size ``n_clusters`` ~ corpus/expected-cluster-size so the
    per-cluster matrices stay bounded); clusters shuffle once via the
    bucketed partition_apply, embeddings never reach the driver, and the
    greedy order is ascending id so the result is partition-invariant.

    Returns (id_col, cluster:int64, keep:bool, max_kept_sim:float64).
    """
    from sous_chef_ray.stages.partition import partition_apply

    centroids, _ = kmeans_fit_distributed(
        corpus, emb_col=emb_col, n_centroids=n_clusters, iters=iters,
        sample_rows=sample_rows, seed=seed, spherical=True)
    cent_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        x = _emb_matrix(t, emb_col)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cid = np.argmax(x @ c.T, axis=1)
        return pa.table({id_col: t[id_col], emb_col: t[emb_col],
                         "cluster": pa.array(cid, type=pa.int64())})

    tagged = corpus.map_batches(assign, batch_format="pyarrow",
                                zero_copy_batch=True)

    def prune(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # one bucket may hold several clusters: sort by (cluster, id),
        # then scan each cluster run independently
        idx = pc.sort_indices(t, sort_keys=[("cluster", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        cid = t["cluster"].to_numpy(zero_copy_only=False)
        x = _emb_matrix(t, emb_col)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        n = len(t)
        starts = np.flatnonzero(np.r_[True, cid[1:] != cid[:-1]])
        ends = np.r_[starts[1:], n]
        keep = np.zeros(n, dtype=bool)
        sim = np.zeros(n, dtype=np.float64)
        for s, e in zip(starts, ends):
            keep[s:e], sim[s:e] = _greedy_keep_rows(x[s:e], threshold)
        return pa.table({
            id_col: t[id_col],
            "cluster": t["cluster"],
            "keep": pa.array(keep),
            "max_kept_sim": pa.array(sim),
        })

    return partition_apply(tagged, ["cluster"], prune, num_buckets,
                           batch_format="pyarrow")
