"""DSIR-style data selection: hashed-n-gram importance weights.

Data Selection via Importance Resampling (Xie et al., 2023, public
arXiv:2302.03169) scores every raw-corpus document by how much its
hashed n-gram features look like a TARGET domain versus the raw corpus
as a whole, then keeps the highest-weight documents. This module
implements the same structure Ray-Data-first, in two streaming passes:

1. **Feature counts** — each batch tokenizes (vectorized Arrow
   ``utf8_lower`` + ``split_pattern_regex``), hashes every gram into one
   of ``num_buckets`` md5-derived buckets, and emits per-bucket partial
   (target, raw) counts; ``groupby("b").sum`` tree-combines them. Only
   the BOUNDED bucket table (≤ num_buckets rows) reaches the driver —
   the corpus never does.
2. **Scoring** — the per-bucket importance weights broadcast ONCE via
   ``ray.put`` (an int64 array of ``num_buckets`` entries); each batch
   sums its grams' weights per document with ``np.add.at``.

Weights are integer-quantized likelihood ratios,
``t_b * scale // (r_b + 1)`` — exact integer math on both the Ray and
the DuckDB-oracle side (float log-ratios would drift across summation
orders and break the value-hash gate; the ranking they induce is the
same monotone ratio family DSIR uses). At 100-TB scale the int64 sum
holds while ``total_grams * scale < 2^63`` — raise ``num_buckets`` /
lower ``scale`` for larger corpora.

No counterpart in the reference repo (its pipeline ends at warehouse
SQL); this is a from-scratch LLM-data operator.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data as rd

_SPLIT = "[^a-z0-9]+"


def _gram_buckets(text: pa.ChunkedArray | pa.Array, num_buckets: int):
    """(bucket_id, parent_row) int64 arrays for every non-empty gram.

    Bucket = first 8 md5 hex digits of the gram, mod ``num_buckets`` —
    the same value DuckDB computes with
    ``CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT) % B``. md5 runs
    once per DISTINCT gram in the batch (hashlib at C speed); the
    occurrence mapping stays vectorized via ``pc.index_in``.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(text, "")), _SPLIT)
    flat = pc.list_flatten(words)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    uniq = pc.unique(flat)
    ub = np.fromiter(
        (int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % num_buckets
         for u in uniq.to_pylist()),
        dtype=np.int64, count=len(uniq))
    idx = pc.index_in(flat, value_set=uniq).to_numpy(zero_copy_only=False)
    return ub[idx], parent


def dsir_bucket_counts(
    ds: "rd.Dataset",
    target_values: Sequence[str],
    text_col: str = "text",
    domain_col: str = "source",
    num_buckets: int = 4096,
) -> "rd.Dataset":
    """Pass 1: per-bucket (target, raw) gram counts — ≤ num_buckets rows."""
    from ray.data.aggregate import Sum

    tset = set(target_values)

    def partial(t: pa.Table) -> pa.Table:
        b, parent = _gram_buckets(t[text_col], num_buckets)
        is_t = pc.is_in(
            t[domain_col], value_set=pa.array(sorted(tset))
        ).to_numpy(zero_copy_only=False)
        gt = is_t[parent]
        tc = np.bincount(b[gt], minlength=num_buckets)
        rc = np.bincount(b[~gt], minlength=num_buckets)
        nz = np.nonzero(tc + rc)[0]
        return pa.table({"b": nz.astype(np.int64),
                         "t_cnt": tc[nz].astype(np.int64),
                         "r_cnt": rc[nz].astype(np.int64)})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("b").aggregate(Sum("t_cnt", alias_name="t_cnt"),
                                    Sum("r_cnt", alias_name="r_cnt")))


def dsir_weights(
    ds: "rd.Dataset",
    target_values: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
    num_buckets: int = 4096,
    scale: int = 1_000_000,
) -> "rd.Dataset":
    """Per-document DSIR importance score: (id_col, dsir_score, n_grams).

    ``dsir_score = Σ_grams  t_b * scale // (r_b + 1)`` — documents whose
    grams concentrate in target-heavy buckets score high. Documents with
    zero grams are dropped (no features to score). Resample by sorting
    on (dsir_score / n_grams) or thresholding downstream.
    """
    import ray

    counts = dsir_bucket_counts(
        ds, target_values, text_col=text_col, domain_col=domain_col,
        num_buckets=num_buckets).to_pandas()
    w = np.zeros(num_buckets, dtype=np.int64)
    bb = counts["b"].to_numpy()
    w[bb] = (counts["t_cnt"].to_numpy() * scale
             ) // (counts["r_cnt"].to_numpy() + 1)
    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        lut = ray.get(w_ref)
        b, parent = _gram_buckets(t[text_col], num_buckets)
        s = np.zeros(len(t), dtype=np.int64)
        np.add.at(s, parent, lut[b])
        n = np.bincount(parent, minlength=len(t)).astype(np.int64)
        keep = n > 0
        return pa.table({id_col: t[id_col].combine_chunks().filter(
                             pa.array(keep)),
                         "dsir_score": pa.array(s[keep]),
                         "n_grams": pa.array(n[keep])})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
