"""BPE trainer/encoder (stages/bpe.py) vs a direct pure-Python
reference implementation with the same deterministic tie-break."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from sous_chef_ray.stages.bpe import (
    END, bpe_encode, bpe_train, bpe_train_from_counts, word_counts)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
]


def _ref_train(texts, num_merges):
    """Textbook BPE over a word-frequency dict; ties break on max count
    then lexicographically smallest pair — same rule as the engine."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split())
    vocab = {w: list(w) + [END] for w in wc}
    merges = []
    for _ in range(num_merges):
        stats = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += wc[w]
        if not stats:
            break
        top = max(stats.values())
        pair = min(p for p, c in stats.items() if c == top)
        merges.append(pair)
        a, b = pair
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_reference(ray_session):
    ds = rd.from_arrow(pa.table({"text": CORPUS}))
    got = bpe_train(ds, "text", num_merges=12)
    exp, _ = _ref_train(CORPUS, 12)
    assert got == exp


def test_bpe_train_partition_invariant(ray_session):
    t = pa.table({"text": CORPUS * 5})
    one = bpe_train(rd.from_arrow(t), "text", 8)
    many = bpe_train(rd.from_arrow(t).repartition(7), "text", 8)
    assert one == many


def test_bpe_encode_matches_training_segmentation(ray_session):
    ds = rd.from_arrow(pa.table({"text": CORPUS}))
    merges = bpe_train(ds, "text", 10)
    _, ref_vocab = _ref_train(CORPUS, 10)
    out = bpe_encode(ds, "text", merges, concurrency=2).to_pandas()
    for text, syms in zip(CORPUS, out["bpe_symbols"]):
        expect = [s for w in text.split() for s in ref_vocab[w]]
        assert list(syms) == expect
        # symbols reconstruct the text exactly
        rebuilt = "".join(syms).replace(END, " ").strip()
        assert rebuilt == " ".join(text.split())


def test_bpe_unseen_words_fall_back_to_chars(ray_session):
    merges = bpe_train(
        rd.from_arrow(pa.table({"text": CORPUS})), "text", 6)
    out = bpe_encode(
        rd.from_arrow(pa.table({"text": ["zq zq unseen"]})),
        "text", merges, concurrency=2).to_pandas()
    syms = list(out["bpe_symbols"][0])
    assert "".join(syms).replace(END, " ").strip() == "zq zq unseen"


def test_word_counts_exact(ray_session):
    wc = word_counts(
        rd.from_arrow(pa.table({"text": CORPUS})).repartition(3), "text")
    got = dict(zip(wc["word"].to_pylist(),
                   wc["n"].to_pylist()))
    from collections import Counter

    exp = Counter(w for t in CORPUS for w in t.split())
    assert got == dict(exp)
