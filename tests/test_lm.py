"""Bigram LM quality scoring (stages/lm.py): in-distribution text must
score lower NLL than out-of-distribution / shuffled text; scores finite
and deterministic."""

import numpy as np
import pandas as pd
import ray.data as rd

from sous_chef_ray.stages.lm import score_nll, train_bigram_lm


def _corpus():
    rng = np.random.default_rng(11)
    # structured 'language': sentences built from bigram-friendly templates
    subj = ["the cat", "a dog", "the bird", "my friend"]
    verb = ["sees", "likes", "chases", "finds"]
    obj = ["the ball", "a tree", "the house", "some food"]
    docs = [
        " ".join(
            f"{rng.choice(subj)} {rng.choice(verb)} {rng.choice(obj)} ."
            for _ in range(12)
        )
        for _ in range(120)
    ]
    return pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})


def test_lm_scores_in_distribution_lower():
    df = _corpus()
    ds = rd.from_pandas(df).repartition(4)
    model = train_bigram_lm(ds, "text", max_vocab=1000, max_bigrams=10_000)
    assert model["vocab"] > 5 and model["total"] > 0

    rng = np.random.default_rng(3)
    vocab = list(model["unigrams"])
    shuffled = " ".join(rng.choice(vocab, 120))
    probe = pd.DataFrame({
        "doc_id": [0, 1],
        "text": [df["text"].iloc[0], shuffled],
    })
    out = (
        score_nll(rd.from_pandas(probe), model, "text")
        .to_pandas().sort_values("doc_id")
    )
    nll_in, nll_shuf = out["lm_nll"].tolist()
    assert np.isfinite(nll_in) and np.isfinite(nll_shuf)
    assert nll_in < nll_shuf, (nll_in, nll_shuf)


def test_lm_deterministic():
    df = _corpus()
    ds = rd.from_pandas(df).repartition(4)
    m1 = train_bigram_lm(ds, "text", max_vocab=500, max_bigrams=5_000)
    m2 = train_bigram_lm(rd.from_pandas(df).repartition(2), "text",
                         max_vocab=500, max_bigrams=5_000)
    assert m1["unigrams"] == m2["unigrams"]
    assert m1["total"] == m2["total"]
    a = score_nll(rd.from_pandas(df.head(10)), m1, "text").to_pandas()
    b = score_nll(rd.from_pandas(df.head(10)), m2, "text").to_pandas()
    assert np.allclose(
        a.sort_values("doc_id")["lm_nll"], b.sort_values("doc_id")["lm_nll"]
    )
