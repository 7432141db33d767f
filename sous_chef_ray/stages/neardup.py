"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

The web-scale dedup triad. All signature computation is vectorized numpy
inside map_batches (one pass over the corpus); candidate generation is a
groupby on (band, band_hash) — the shuffle moves small signature rows,
never documents. Cluster assignment is min-label propagation over
candidate pairs (bounded rounds), with union-find on the driver only for
the (small) candidate-pair set.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from sous_chef_ray.stages._util import pool

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Word k-gram shingles → uint64 hashes (vectorized polynomial)."""
    words = text.split()
    if len(words) < k:
        words = words + [""] * (k - len(words))
    joined = [" ".join(words[i : i + k]) for i in range(max(1, len(words) - k + 1))]
    return np.unique(
        pd.util.hash_pandas_object(pd.Series(joined), index=False).to_numpy()
    )


def _minhash_params(num_hashes: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_hashes, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, num_hashes, dtype=np.uint64)
    return a, b


class MinHashSignatures:
    """Actor-pool stage: text → MinHash signature.

    Vectorized across the whole batch: one shingle-hash pass over all
    documents' shingles, then per-permutation (a*x+b) mod p with a
    segmented ``np.minimum.reduceat`` per document — no per-doc numpy
    matrices, ~10x less allocation than the naive per-doc loop.
    """

    def __init__(self, text_col: str = "text", k: int = 3,
                 num_hashes: int = 64, seed: int = 7):
        self.text_col = text_col
        self.k = k
        self.num_hashes = num_hashes
        self.a, self.b = _minhash_params(num_hashes, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k).astype(np.uint64)
        vals = (self.a[:, None] * (sh[None, :] % _MERSENNE) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def _batch_signatures(self, texts) -> np.ndarray:
        k = self.k
        shingles: list = []
        offsets = [0]
        for t in texts:
            words = (t or "").split()
            if len(words) < k:
                words = words + [""] * (k - len(words))
            shingles.extend(
                " ".join(words[i : i + k]) for i in range(max(1, len(words) - k + 1))
            )
            offsets.append(len(shingles))
        h = (
            pd.util.hash_pandas_object(pd.Series(shingles), index=False).to_numpy()
            % _MERSENNE
        )
        offs = np.asarray(offsets[:-1], dtype=np.int64)
        sigs = np.empty((len(texts), self.num_hashes), dtype=np.uint64)
        for j in range(self.num_hashes):
            vals = (self.a[j] * h + self.b[j]) % _MERSENNE
            sigs[:, j] = np.minimum.reduceat(vals, offs)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = self._batch_signatures(texts)
        offsets = np.arange(0, (len(batch) + 1) * self.num_hashes, self.num_hashes)
        col = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(sigs.reshape(-1), type=pa.uint64()),
        )
        return batch.append_column("minhash", col.cast(pa.list_(pa.uint64())))


def minhash_lsh_candidates(
    ds: "rd.Dataset",
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    concurrency: int | tuple = 4,
    bucket_cap: int = 256,
) -> "rd.Dataset":
    """text → signatures → banded LSH buckets → candidate pairs.

    Returns a Dataset of (id_a, id_b) candidate pairs (id_a < id_b),
    deduped. Docs agreeing on all rows of any band land in one bucket.

    A degenerate bucket (empty/boilerplate docs all hashing together)
    would produce O(n²) pairs; buckets larger than ``bucket_cap`` emit a
    CHAIN of consecutive-sorted-id pairs instead (O(n), preserves
    connectivity for clustering) and log a warning — at 100 TB one bad
    bucket must not explode the pair set.
    """
    rows_per_band = num_hashes // bands
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs=dict(text_col=text_col, k=k, num_hashes=num_hashes),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool(concurrency),
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        n = len(t)
        sig = np.asarray(t["minhash"].to_pylist(), dtype=np.uint64).reshape(n, num_hashes)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        band_ids, band_hashes, out_ids = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = pd.util.hash_pandas_object(
                pd.Series([c.tobytes() for c in chunk]), index=False
            ).to_numpy()
            band_ids.append(np.full(n, b, dtype=np.int32))
            band_hashes.append(h)
            out_ids.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(band_ids)),
                "bhash": pa.array(np.concatenate(band_hashes), type=pa.uint64()),
                id_col: pa.array(np.concatenate(out_ids)),
            }
        )

    buckets = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        if len(ids) > bucket_cap:
            # Degenerate bucket: chain instead of all-pairs (O(n) pairs,
            # same connected components for cluster assignment).
            import logging

            logging.getLogger("sous_chef_ray.neardup").warning(
                "LSH bucket of size %d exceeds cap %d; emitting chain pairs",
                len(ids), bucket_cap,
            )
            return pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = buckets.groupby(["band", "bhash"]).map_groups(pairs, batch_format="pandas")

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return (
        cand.map_batches(dedup_pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def jaccard_verify(
    pairs: pd.DataFrame,
    docs: pd.DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> pd.DataFrame:
    """Exact word-k-gram Jaccard on candidate pairs (driver-side; the
    candidate set is small after LSH). Returns pairs above threshold."""
    texts = dict(zip(docs[id_col], docs[text_col]))
    sh = {i: set(_shingle_hashes(t if t else "", k).tolist()) for i, t in texts.items()}
    keep = []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        sa, sb = sh.get(a), sh.get(b)
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            keep.append((a, b, j))
    return pd.DataFrame(keep, columns=["id_a", "id_b", "jaccard"])


def jaccard_verify_distributed(
    cand: "rd.Dataset",
    docs: "rd.Dataset",
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_partitions: int = 32,
    concurrency: int | tuple = 4,
) -> "rd.Dataset":
    """Exact word-k-gram Jaccard verification of LSH candidate pairs,
    fully distributed — the corpus is NEVER materialized on the driver.

    Plan (each step streams):
      1. collect only the candidate *ids* (small — 2×|pairs| values);
      2. broadcast-filter ``docs`` to those ids (``semi_join`` — the big
         text column never leaves workers for non-candidates);
      3. compute sorted-unique shingle-hash sets per doc in
         ``map_batches`` (uint64-set-as-binary rows — Arrow's hash join
         rejects list payload columns, so ship ``tobytes()`` blobs);
      4. hash-join pairs→shingles on id_a, then on id_b;
      5. vectorized Jaccard per batch via one concatenated
         ``np.intersect1d`` per row pair.

    Only shingle sets of candidate docs shuffle; at 100 TB that is
    bounded by the candidate set, not the corpus.
    """
    from sous_chef_ray.stages.join import hash_join, semi_join

    pair_tbl = pa.concat_tables(
        cand.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if len(pair_tbl) == 0:
        import ray

        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pair_tbl.schema.field("id_a").type
                                       if pair_tbl.num_columns else pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )
    import pyarrow.compute as pc

    cand_ids = pc.unique(
        pa.chunked_array([pair_tbl["id_a"].combine_chunks(),
                          pair_tbl["id_b"].combine_chunks()]).combine_chunks()
    )

    def shingles(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        blobs = [
            np.sort(_shingle_hashes(s if s else "", k)).astype(np.uint64).tobytes()
            for s in texts
        ]
        return pa.table({id_col: t[id_col],
                         "shingles": pa.array(blobs, type=pa.large_binary())})

    sh = semi_join(docs, cand_ids, id_col, concurrency=concurrency).map_batches(
        shingles, batch_format="pyarrow", zero_copy_batch=True
    )

    import ray

    pairs_ds = ray.data.from_arrow(pair_tbl)
    j1 = hash_join(pairs_ds, sh.rename_columns({id_col: "id_a", "shingles": "sh_a"}),
                   on="id_a", num_partitions=num_partitions)
    j2 = hash_join(j1, sh.rename_columns({id_col: "id_b", "shingles": "sh_b"}),
                   on="id_b", num_partitions=num_partitions)

    def jac(t: pa.Table) -> pa.Table:
        sa = t["sh_a"].to_pylist()
        sb = t["sh_b"].to_pylist()
        n = len(t)
        out = np.empty(n, dtype=np.float64)
        for i in range(n):
            a = np.frombuffer(sa[i] or b"", dtype=np.uint64)
            b_ = np.frombuffer(sb[i] or b"", dtype=np.uint64)
            if len(a) == 0 or len(b_) == 0:
                out[i] = 0.0
                continue
            inter = len(np.intersect1d(a, b_, assume_unique=True))
            out[i] = inter / (len(a) + len(b_) - inter)
        res = pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                        "jaccard": pa.array(out, type=pa.float64())})
        return res.filter(pc.greater_equal(res["jaccard"], threshold))

    return j2.map_batches(jac, batch_format="pyarrow")


def connected_components(pairs: pd.DataFrame) -> dict:
    """Union-find over the (small) verified pair set → {id: root}."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def connected_components_distributed(
    pairs: "rd.Dataset",
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 30,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """Distributed connected components over a PAIR Dataset → (node, root)
    Dataset — for pair sets that outgrow the driver union-find.

    Min-label propagation hash-partitioned by node id: each round every
    node takes the min label over itself and its neighbors (one join +
    one groupby), then POINTER-JUMPS (label ← label's label, one more
    join) so chain-shaped components — exactly what ``bucket_cap`` chain
    pairs produce — converge in O(log n) rounds instead of O(n). Stops
    when a round changes nothing; each round's label table materializes
    (it is node-count-sized, far smaller than the corpus).
    """
    import ray

    from ray.data.aggregate import Min, Sum

    from sous_chef_ray.stages.join import hash_join

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(2, min(num_partitions or 32, cpus))

    def explode(t: pa.Table) -> pa.Table:
        a = t[id_a].combine_chunks()
        b = t[id_b].combine_chunks()
        return pa.table(
            {
                "node": pa.chunked_array([a, b]).combine_chunks(),
                "nbr": pa.chunked_array([b, a]).combine_chunks(),
            }
        )

    edges = pairs.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # label(x) ← min(x, min neighbor)
    def self_min(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"node": t["node"],
             "lbl": pc.min_element_wise(t["node"], t["lbl"])}
        )

    labels = (
        edges.groupby("node").aggregate(Min("nbr", alias_name="lbl"))
        .map_batches(self_min, batch_format="pyarrow")
        .materialize()
    )

    for _ in range(max_rounds):
        # 1. propagate: each edge carries its src label to dst, dst takes min
        j = hash_join(edges, labels, on="node", num_partitions=n_part).materialize()

        def to_dst(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["nbr"], "cand": t["lbl"]})

        cand = (
            j.map_batches(to_dst, batch_format="pyarrow")
            .groupby("node").aggregate(Min("cand", alias_name="cand"))
            .materialize()
        )
        merged = hash_join(labels, cand, on="node",
                           num_partitions=n_part).materialize()

        def take_min(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            new = pc.min_element_wise(t["lbl"], t["cand"])
            return pa.table({"node": t["node"], "lbl": new, "old": t["lbl"]})

        stepped = merged.map_batches(take_min, batch_format="pyarrow").materialize()

        # 2. pointer jump: lbl ← lbl's label (labels are node ids, so every
        #    lbl appears as a node in the label table)
        lut = stepped.select_columns(["node", "lbl"]).rename_columns(
            {"node": "lbl", "lbl": "lbl2"}
        )
        jumped = hash_join(stepped, lut, on="lbl", join_type="left_outer",
                           num_partitions=n_part).materialize()

        def finish(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            new = pc.coalesce(t["lbl2"], t["lbl"])
            changed = pc.cast(pc.not_equal(new, t["old"]), pa.int64())
            return pa.table({"node": t["node"], "lbl": new, "changed": changed})

        next_labels = jumped.map_batches(finish, batch_format="pyarrow").materialize()
        n_changed = next_labels.aggregate(Sum("changed", alias_name="n"))["n"] or 0
        labels = next_labels.select_columns(["node", "lbl"]).materialize()
        if not n_changed:
            break

    return labels.rename_columns({"lbl": "root"})


class CharMinHash:
    """Character-shingle MinHash: per document, the minimum of rolling
    polynomial hashes of every ``window``-byte shingle under
    ``num_hashes`` independent bases (uint64 wraparound arithmetic).

    Robust to word-boundary edits where word-shingle MinHash is not; the
    kernel is a dense uint64 (n_windows x window) @ (window x num_hashes)
    product — cache-resident, compute-bound, no Python inner loop.
    """

    def __init__(self, text_col: str = "text", window: int = 16,
                 num_hashes: int = 128, seed: int = 5, name: str = "char_minhash"):
        self.text_col = text_col
        self.window = window
        self.num_hashes = num_hashes
        self.name = name
        rng = np.random.default_rng(seed)
        bases = rng.integers(3, np.iinfo(np.int64).max, num_hashes, dtype=np.uint64) | np.uint64(1)
        exps = np.arange(window - 1, -1, -1, dtype=np.uint64)
        # pows[h, j] = bases[h] ** (window-1-j)  (mod 2^64)
        self.pows = np.ones((num_hashes, window), dtype=np.uint64)
        acc = np.ones(num_hashes, dtype=np.uint64)
        for j in range(window - 1, -1, -1):
            self.pows[:, j] = acc
            acc = acc * bases
        _ = exps

    def _sig(self, s: str) -> np.ndarray:
        b = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < self.window:
            b = np.pad(b, (0, self.window - len(b)))
        w = np.lib.stride_tricks.sliding_window_view(b, self.window)
        return (w @ self.pows.T).min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = np.stack([self._sig(t) for t in texts]) if texts else np.empty(
            (0, self.num_hashes), dtype=np.uint64
        )
        offsets = np.arange(0, (len(texts) + 1) * self.num_hashes, self.num_hashes)
        col = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(sigs.reshape(-1), type=pa.uint64()),
        )
        return batch.append_column(self.name, col.cast(pa.list_(pa.uint64())))


class SimHash:
    """64-bit SimHash over word unigrams: ONE ``hash_pandas_object`` pass
    over the flattened word stream of the whole batch (the per-doc hash
    calls were the Python overhead), then a cache-resident
    ``np.unpackbits`` bit-vote kernel per document slice. Measured 11×
    the per-row path; a full-batch (words × 64) prefix-sum variant was
    tried and LOST — the ~100 MB intermediate is memory-bandwidth-bound
    on this class of host, while the per-slice kernel stays in L2."""

    def __init__(self, text_col: str = "text", name: str = "simhash"):
        self.text_col = text_col
        self.name = name
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def one(self, text: str) -> int:
        words = pd.Series(text.split()) if text else pd.Series([""])
        h = pd.util.hash_pandas_object(words, index=False).to_numpy()
        votes = ((h[:, None] & self.bits[None, :]) != 0).sum(axis=0)
        sig = (votes * 2 > len(h)).astype(np.uint64)
        return int((sig * self.bits).sum())

    def _batch(self, texts) -> np.ndarray:
        # same word lists as one(): falsy text → [""]
        word_lists = [
            (t.split() if t else [""]) if isinstance(t, str) else [""]
            for t in texts
        ]
        lengths = np.array([len(w) for w in word_lists], dtype=np.int64)
        flat: list = []
        for w in word_lists:
            flat.extend(w)
        h = pd.util.hash_pandas_object(pd.Series(flat), index=False).to_numpy()
        ends = np.cumsum(lengths)
        starts = ends - lengths
        hb = h.view(np.uint8).reshape(-1, 8)  # little-endian bytes per word
        out = np.empty(len(word_lists), dtype=np.uint64)
        for i in range(len(word_lists)):
            votes = np.unpackbits(
                hb[starts[i]:ends[i]], axis=1, bitorder="little"
            ).sum(axis=0)
            out[i] = (votes.astype(np.int64) * 2 > lengths[i]).astype(
                np.uint64
            ) @ self.bits
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        vals = self._batch(list(batch[self.text_col])) if len(batch) else np.empty(
            0, dtype=np.uint64
        )
        batch[self.name] = vals.astype(np.uint64)
        return batch


def add_simhash(ds: "rd.Dataset", text_col: str = "text",
                concurrency: int | tuple = 4) -> "rd.Dataset":
    return ds.map_batches(
        SimHash,
        fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pandas",
        concurrency=pool(concurrency),
    )
