"""BPE tokenizer training + encoding over a document corpus.

The scale shape mirrors how production BPE vocabularies are actually
trained (GPT-2 style): the CORPUS never leaves the cluster — one
distributed word-count aggregate reduces 100 TB of text to a bounded
word-frequency table (unique words ≪ corpus bytes), and the iterative
merge loop runs over THAT table with numpy-vectorized pair counting
(flattened symbol arrays + run arithmetic, no Python loop over words).
Encoding broadcasts the learned merge ranks once per actor and memoizes
per distinct word, so repeated words cost a dict hit.

Determinism: ties on pair frequency break lexicographically on the
(left, right) symbol pair, so the merge list is a pure function of the
corpus — partition- and parallelism-invariant (tested).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

END = "</w>"  # word-end marker (keeps merges from crossing words)


def word_counts(ds: "rd.Dataset", text_col: str) -> pa.Table:
    """Distributed word-frequency table: per-batch explode+count partial
    (the shuffle moves one row per distinct (batch, word), never per
    occurrence), then one hash aggregate."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.utf8_split_whitespace(t[text_col].combine_chunks()))
        if len(words) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = words.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    slim = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    agg = slim.groupby("word").aggregate(Sum("n", alias_name="n"))
    out = pa.concat_tables(
        agg.iter_batches(batch_size=None, batch_format="pyarrow"))
    return out.filter(pc.not_equal(out["word"], ""))


def _pair_stats(flat: np.ndarray, bounds: np.ndarray,
                weights: np.ndarray) -> Dict[Tuple[str, str], int]:
    """Weighted adjacent-pair counts over the flattened symbol array.
    ``bounds[i]`` marks the LAST symbol of word i (pairs never cross)."""
    if len(flat) < 2:
        return {}
    ok = ~bounds[:-1]
    w = weights[:-1][ok]
    lv = pd.Series(flat[:-1][ok])
    rv = pd.Series(flat[1:][ok])
    # group identical pairs via an injective composed key (escape the
    # separator so symbols containing \x1f stay distinct; vectorized
    # pandas string kernels — no U<n> truncation of grown symbols)
    esc_l = lv.str.replace("\x1f", "\x1fE", regex=False)
    esc_r = rv.str.replace("\x1f", "\x1fE", regex=False)
    key = esc_l.str.cat(esc_r, sep="\x1fS")
    sums = pd.Series(w).groupby(key.to_numpy(), sort=False).sum()
    out = {}
    for k, s in sums.items():
        a, b = k.split("\x1fS", 1)
        out[(a.replace("\x1fE", "\x1f"),
             b.replace("\x1fE", "\x1f"))] = int(s)
    return out


def _apply_merge(flat: np.ndarray, bounds: np.ndarray, pair) -> tuple:
    """Greedy left-to-right non-overlapping merge of ``pair`` across all
    words at once: runs of consecutive matches accept every other
    position (exactly the sequential greedy outcome), via run-id
    arithmetic — no Python loop over words."""
    a, b = pair
    m = np.zeros(len(flat), dtype=bool)
    if len(flat) >= 2:
        m[:-1] = (flat[:-1] == a) & (flat[1:] == b) & ~bounds[:-1]
    if not m.any():
        return flat, bounds
    # run parity: within each maximal run of consecutive True, keep
    # positions at even offset from the run start
    starts = m & ~np.roll(m, 1)
    starts[0] = m[0]
    run_id = np.cumsum(starts)
    idx = np.arange(len(flat))
    run_start = np.zeros(len(flat), dtype=np.int64)
    run_start[starts] = idx[starts]
    run_start = np.maximum.accumulate(np.where(m, run_start, 0))
    accept = m & (((idx - run_start) % 2) == 0)
    out = flat.copy()
    out[accept] = a + b
    drop = np.roll(accept, 1)
    drop[0] = False
    keep = ~drop
    new_bounds = bounds.copy()
    # a merged symbol inherits the dropped right symbol's boundary flag
    new_bounds[accept] = bounds[np.minimum(idx[accept] + 1,
                                           len(flat) - 1)]
    return out[keep], new_bounds[keep]


def bpe_train_from_counts(wc: pa.Table, num_merges: int
                          ) -> List[Tuple[str, str]]:
    """Learn ``num_merges`` merges from a (word, n) frequency table.
    Pure numpy over flattened per-character symbol arrays; ties break
    lexicographically (deterministic)."""
    words = wc["word"].to_pylist()
    counts = wc["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sym_lists = [list(w) + [END] for w in words]
    lens = np.array([len(s) for s in sym_lists], dtype=np.int64)
    flat = np.array([s for ls in sym_lists for s in ls], dtype=object)
    bounds = np.zeros(len(flat), dtype=bool)
    ends = np.cumsum(lens) - 1
    bounds[ends] = True
    weights = np.repeat(counts, lens)
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        stats = _pair_stats(flat, bounds, weights)
        if not stats:
            break
        # deterministic: max count, then lexicographically SMALLEST pair
        top = max(stats.values())
        best_pair = min(p for p, c in stats.items() if c == top)
        merges.append(best_pair)
        n0 = len(flat)
        flat, bounds = _apply_merge(flat, bounds, best_pair)
        weights = _reweight(weights, n0, len(flat), lens, counts,
                            flat, bounds)
    return merges


def _reweight(_w, _n0, _n1, _lens, counts, flat, bounds):
    """Rebuild per-symbol weights from word boundaries after a merge
    (word membership is identified by boundary positions)."""
    word_id = np.zeros(len(flat), dtype=np.int64)
    if len(flat):
        word_id[1:] = np.cumsum(bounds[:-1])
    return counts[word_id]


def bpe_train(ds: "rd.Dataset", text_col: str, num_merges: int
              ) -> List[Tuple[str, str]]:
    """Distributed word count → driver merge loop over the BOUNDED
    frequency table (the standard production shape: unique words ≪
    corpus; the corpus itself never reaches the driver)."""
    return bpe_train_from_counts(word_counts(ds, text_col), num_merges)


def _encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        pairs = [(ranks.get((syms[i], syms[i + 1])), i)
                 for i in range(len(syms) - 1)]
        cands = [(r, i) for r, i in pairs if r is not None]
        if not cands:
            break
        r, i = min(cands)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


class BpeEncode:
    """Actor-pool encode stage: merge ranks broadcast ONCE (ray.put →
    __init__), per-distinct-word memo, emits a list<string> symbol
    column (map to ids with a vocab table downstream)."""

    def __init__(self, merges_ref, text_col: str,
                 out_col: str = "bpe_symbols"):
        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) \
            else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.out_col = out_col
        self.memo: Dict[str, List[str]] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        out: List[List[str]] = []
        for txt in texts:
            syms: List[str] = []
            for w in (txt or "").split():
                got = self.memo.get(w)
                if got is None:
                    got = _encode_word(w, self.ranks)
                    self.memo[w] = got
                syms.extend(got)
            out.append(syms)
        return t.append_column(
            self.out_col, pa.array(out, type=pa.list_(pa.string())))


def bpe_encode(ds: "rd.Dataset", text_col: str,
               merges: List[Tuple[str, str]],
               out_col: str = "bpe_symbols",
               concurrency: int | tuple = 4) -> "rd.Dataset":
    from sous_chef_ray.stages._util import pool

    ref = ray.put(list(merges))
    return ds.map_batches(
        BpeEncode,
        fn_constructor_kwargs=dict(merges_ref=ref, text_col=text_col,
                                   out_col=out_col),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool(concurrency),
    )
