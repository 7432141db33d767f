"""N-gram language-model quality scoring (train → broadcast → score).

The model-scoring pipeline shape for training-data curation: fit a
bigram word LM on the corpus DISTRIBUTEDLY (per-batch partial counts →
one groupby-sum shuffle of (gram, count) rows → bounded top-K model on
the driver), ``ray.put`` the model once, then stream the corpus through
a vectorized scorer (per-doc mean negative log-likelihood, add-k
smoothed with unigram backoff). Low NLL ≈ in-distribution fluent text —
the classic KenLM-style quality filter, with the model a pure function
of the corpus (no external data).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

_WS = r"\s+"
BOS = "\x02"  # sentence-start marker


def _doc_words(t: pa.Table, text_col: str):
    words = pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(t[text_col])), _WS
    ).combine_chunks()
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    return words.flatten().to_pandas().to_numpy(dtype=object), lens


def train_bigram_lm(
    ds: "rd.Dataset",
    text_col: str = "text",
    max_vocab: int = 30_000,
    max_bigrams: int = 300_000,
) -> dict:
    """Fit the model: distributed (gram, count) partial aggregation, one
    groupby-sum shuffle, bounded top-K tables on the driver. Returns a
    plain dict model (broadcastable with ray.put)."""

    def gram_counts(t: pa.Table) -> pa.Table:
        flat, lens = _doc_words(t, text_col)
        # bigrams within docs: prev word per position, BOS at doc starts
        prev = np.roll(flat, 1)
        starts = np.zeros(len(flat), dtype=bool)
        pos = np.cumsum(lens[:-1]) if len(lens) > 1 else []
        starts[0] = True
        starts[list(pos)] = True
        prev[starts] = BOS
        uni = pd.Series(flat).value_counts()
        big = pd.Series([f"{a}\x1f{b}" for a, b in zip(prev, flat)]).value_counts()
        return pa.table({
            "gram": pa.array(
                ["u\x1f" + str(g) for g in uni.index]
                + ["b\x1f" + str(g) for g in big.index]
            ),
            "n": pa.array(
                np.concatenate([uni.to_numpy(), big.to_numpy()]).astype(np.int64)
            ),
        })

    from ray.data.aggregate import Sum

    counts_ds = (
        ds.map_batches(gram_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def top(kind: str, k: int) -> pd.DataFrame:
        # top-K happens IN the cluster (filter → sort → limit); only the
        # bounded model rows reach the driver — at web scale the distinct
        # bigram table is itself huge
        return (
            counts_ds.map_batches(
                lambda t, kk=kind: t.filter(
                    pc.equal(pc.utf8_slice_codeunits(t["gram"], 0, 1), kk)
                ),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .sort("n", descending=True)
            .limit(k)
            .to_pandas()
        )

    uni = top("u", max_vocab)
    big = top("b", max_bigrams)
    unigrams = {g[2:]: int(n) for g, n in zip(uni["gram"], uni["n"])}
    bigrams = {g[2:]: int(n) for g, n in zip(big["gram"], big["n"])}
    total = sum(unigrams.values())
    return {
        "unigrams": unigrams,
        "bigrams": bigrams,
        "total": total,
        "vocab": len(unigrams),
    }


def score_nll(
    ds: "rd.Dataset",
    model: dict,
    text_col: str = "text",
    name: str = "lm_nll",
    k: float = 0.1,
) -> "rd.Dataset":
    """Per-doc mean negative log-likelihood under the bigram model:
    P(w|prev) = (c(prev,w) + k·Pu(w)) / (c(prev) + k), Pu add-k smoothed
    over the vocab. One pandas-merge-free pass: dict lookups through
    ``pd.Series.map`` (vectorized C loop), per-doc means via cumsum
    differencing at doc offsets."""
    model_ref = ray.put(model)

    class Scorer:
        def __init__(self):
            m = ray.get(model_ref)
            self.uni = pd.Series(m["unigrams"], dtype=np.float64)
            self.big = pd.Series(m["bigrams"], dtype=np.float64)
            self.total = float(m["total"])
            self.vocab = max(m["vocab"], 1)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            flat, lens = _doc_words(t, text_col)
            n = len(t)
            if len(flat) == 0:
                return t.append_column(name, pa.nulls(n, type=pa.float64()))
            prev = np.roll(flat, 1)
            starts = np.zeros(len(flat), dtype=bool)
            pos = np.cumsum(lens[:-1]) if len(lens) > 1 else []
            starts[0] = True
            starts[list(pos)] = True
            prev[starts] = BOS
            s_flat = pd.Series(flat, dtype=object)
            c_uni_w = s_flat.map(self.uni).fillna(0.0).to_numpy()
            c_uni_prev = pd.Series(prev, dtype=object).map(self.uni).fillna(0.0).to_numpy()
            grams = pd.Series([f"{a}\x1f{b}" for a, b in zip(prev, flat)])
            c_big = grams.map(self.big).fillna(0.0).to_numpy()
            pu = (c_uni_w + self.k) / (self.total + self.k * self.vocab)
            p = (c_big + self.k * pu * self.vocab) / (c_uni_prev + self.k * self.vocab)
            nll = -np.log(np.maximum(p, 1e-300))
            cum = np.concatenate([[0.0], np.cumsum(nll)])
            ends = np.cumsum(lens)
            starts_i = ends - lens
            doc_nll = (cum[ends] - cum[starts_i]) / np.maximum(lens, 1)
            out = np.where(lens > 0, doc_nll, np.nan)
            return t.append_column(name, pa.array(out, type=pa.float64()))

    from sous_chef_ray.stages._util import pool

    return ds.map_batches(
        Scorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool(4)
    )
