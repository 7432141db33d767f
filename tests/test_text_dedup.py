"""Text analysis + dedup family: exact dedup semantics, minhash recall on
planted near-dups, simhash similarity, knn correctness vs numpy oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from sous_chef_ray.stages.dedup import exact_dedup
from sous_chef_ray.stages.neardup import (
    MinHashSignatures,
    connected_components,
    jaccard_verify,
    minhash_lsh_candidates,
)
from sous_chef_ray.stages.similarity import knn_brute_force
from sous_chef_ray.stages.text import add_md5_fingerprint, add_token_count


def test_exact_dedup_keeps_min_id():
    df = pd.DataFrame(
        {"doc_id": [5, 3, 1, 2, 4], "text": ["a", "a", "b", "b", "c"]}
    )
    out = (
        exact_dedup(rd.from_pandas(df), "text", keep_by="doc_id")
        .to_pandas().sort_values("text").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [3, 1, 4]


def test_token_count_and_md5():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["  a b   c ", "hello"]})
    out = add_token_count(rd.from_pandas(df), "text").to_pandas()
    assert list(out.sort_values("doc_id")["n_words"]) == [3, 1]
    fp = add_md5_fingerprint(rd.from_pandas(df), "text").to_pandas()
    import hashlib

    assert fp.sort_values("doc_id")["fingerprint"].iloc[1] == hashlib.md5(b"hello").hexdigest()


def _planted_docs():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    texts, ids = [], []
    for i in range(40):
        words = list(rng.choice(vocab, 60))
        texts.append(" ".join(words))
        ids.append(2 * i)
        # planted near-dup: same words with 3 substitutions
        dup = words.copy()
        for j in rng.choice(60, 3, replace=False):
            dup[j] = str(rng.choice(vocab))
        texts.append(" ".join(dup))
        ids.append(2 * i + 1)
    return pd.DataFrame({"doc_id": ids, "text": texts})


def test_minhash_lsh_finds_planted_pairs():
    docs = _planted_docs()
    cand = minhash_lsh_candidates(
        rd.from_pandas(docs), "doc_id", "text", k=3, num_hashes=64, bands=16,
        concurrency=2,
    ).to_pandas()
    verified = jaccard_verify(cand, docs, "doc_id", "text", k=3, threshold=0.5)
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    found = set(zip(verified["id_a"], verified["id_b"]))
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, f"recall {recall}"
    comp = connected_components(verified)
    # every planted pair in one cluster
    hits = sum(comp.get(a, a) == comp.get(b, b) for a, b in planted & found)
    assert hits == len(planted & found)


def test_distributed_verify_matches_driver_verify():
    docs = _planted_docs()
    from sous_chef_ray.stages.neardup import jaccard_verify_distributed

    cand = minhash_lsh_candidates(
        rd.from_pandas(docs), "doc_id", "text", k=3, num_hashes=64, bands=16,
        concurrency=2,
    )
    dist = (
        jaccard_verify_distributed(
            cand, rd.from_pandas(docs), "doc_id", "text", k=3, threshold=0.5,
            num_partitions=4, concurrency=2,
        )
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    local = (
        jaccard_verify(cand.to_pandas(), docs, "doc_id", "text", k=3, threshold=0.5)
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    assert list(dist["id_a"]) == list(local["id_a"])
    assert list(dist["id_b"]) == list(local["id_b"])
    assert np.allclose(dist["jaccard"], local["jaccard"])


def test_degenerate_bucket_is_capped():
    # 300 identical docs all land in every band's same bucket: all-pairs
    # would be 300*299/2 = 44850 pairs; the cap must keep it O(n).
    n = 300
    df = pd.DataFrame({"doc_id": np.arange(n), "text": ["same doc text here"] * n})
    cand = minhash_lsh_candidates(
        rd.from_pandas(df), "doc_id", "text", k=2, num_hashes=16, bands=4,
        concurrency=2, bucket_cap=100,
    ).to_pandas()
    assert len(cand) == n - 1, len(cand)  # chain pairs, deduped across bands
    comp = connected_components(cand)
    roots = {comp.get(i, i) for i in range(n)}
    assert len(roots) == 1  # connectivity preserved


def test_minhash_estimates_jaccard():
    sig = MinHashSignatures(num_hashes=256)
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox leaps over the lazy dog " * 5
    sa, sb = sig.signature(a), sig.signature(b)
    est = (sa == sb).mean()
    from sous_chef_ray.stages.neardup import _shingle_hashes

    xa = set(_shingle_hashes(a, 3).tolist())
    xb = set(_shingle_hashes(b, 3).tolist())
    true_j = len(xa & xb) / len(xa | xb)
    assert abs(est - true_j) < 0.15


def test_knn_vs_numpy_oracle():
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        }
    )
    q = tbl.slice(0, 5)
    out = knn_brute_force(
        rd.from_arrow(tbl).repartition(4), q, id_col="vec_id", emb_col="embedding",
        qid_col="vec_id", qemb_col="embedding", k=3, concurrency=2, batch_size=64,
    )
    m = emb.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m[:5] @ m.T
    for qi in range(5):
        order = np.lexsort((np.arange(200), -sims[qi]))[:3]
        got = out[out["qid"] == qi]["neighbor_id"].tolist()
        assert got == order.tolist(), (qi, got, order)


def test_simhash_batch_matches_scalar():
    """The batch-vectorized SimHash kernel must equal one() bit-for-bit."""
    from sous_chef_ray.stages.neardup import SimHash

    sh = SimHash()
    texts = [
        "the quick brown fox", "", "   ", "single",
        "a b c d e f g " * 20, None, "unicode ünïcödé wörds",
    ]
    got = sh._batch(texts)
    exp = [sh.one(t if isinstance(t, str) else "") for t in texts]
    assert [int(v) for v in got] == exp


def test_rolling_fingerprint_vectorized_golden():
    """Vectorized Rabin-Karp must equal the scalar recurrence definition."""
    from sous_chef_ray.stages.text import ROLL_BASE, _U64, rolling_fingerprint_one

    def scalar(s, window=16):
        b = s.encode("utf-8")
        if len(b) < window:
            h = 0
            for x in b:
                h = (h * ROLL_BASE + x) & _U64
            return h
        cur = 0
        for x in b[:window]:
            cur = (cur * ROLL_BASE + x) & _U64
        best = cur
        bw = pow(ROLL_BASE, window - 1, 1 << 64)
        for i in range(1, len(b) - window + 1):
            cur = ((cur - b[i - 1] * bw) * ROLL_BASE + b[i + window - 1]) & _U64
            best = min(best, cur)
        return best

    rng = np.random.default_rng(11)
    for s in ["", "short", "exactly16bytes!!", "a" * 100,
              "".join(chr(rng.integers(32, 1000)) for _ in range(300))]:
        assert rolling_fingerprint_one(s) == scalar(s), repr(s[:20])


def test_hash_split_deterministic_and_leakage_free():
    from sous_chef_ray.stages.dedup import hash_split

    rng = np.random.default_rng(8)
    # duplicate keys on purpose: versions of a doc must co-assign
    keys = rng.integers(0, 5000, 20_000)
    df = pd.DataFrame({"doc_id": keys, "v": rng.integers(0, 3, 20_000)})
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(rd.from_pandas(df).repartition(8), "doc_id", fr, seed=1).to_pandas()
    b = hash_split(rd.from_pandas(df).repartition(3), "doc_id", fr, seed=1).to_pandas()
    # deterministic across partitionings
    am = dict(zip(a["doc_id"], a["split"]))
    bm = dict(zip(b["doc_id"], b["split"]))
    assert am == bm
    # no leakage: each key maps to exactly one split
    assert (a.groupby("doc_id")["split"].nunique() == 1).all()
    # proportions approximately honored (per unique key)
    per_key = a.drop_duplicates("doc_id")["split"].value_counts(normalize=True)
    assert abs(per_key["train"] - 0.8) < 0.03
    assert abs(per_key["val"] - 0.1) < 0.02
    # different seed gives a different assignment
    c = hash_split(rd.from_pandas(df), "doc_id", fr, seed=2).to_pandas()
    cm = dict(zip(c["doc_id"], c["split"]))
    assert am != cm


def _cc_expected(pairs_df: pd.DataFrame) -> dict:
    from sous_chef_ray.stages.neardup import connected_components

    roots = connected_components(pairs_df)
    # canonical: every node maps to its component min
    return dict(roots)


def test_connected_components_distributed_matches_union_find():
    from sous_chef_ray.stages.neardup import connected_components_distributed

    rng = np.random.default_rng(17)
    for trial in range(3):
        n_nodes, n_edges = 120, 150
        a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        keep = a != b
        df = pd.DataFrame({"id_a": np.minimum(a, b)[keep],
                           "id_b": np.maximum(a, b)[keep]}).drop_duplicates()
        got = (
            connected_components_distributed(rd.from_pandas(df).repartition(4))
            .to_pandas().set_index("node")["root"].to_dict()
        )
        exp = _cc_expected(df)
        assert got == exp, f"trial {trial}: mismatch"


def test_connected_components_distributed_partition_invariance():
    from sous_chef_ray.stages.neardup import connected_components_distributed

    rng = np.random.default_rng(23)
    a = rng.integers(0, 60, 80).astype(np.int64)
    b = rng.integers(0, 60, 80).astype(np.int64)
    keep = a != b
    df = pd.DataFrame({"id_a": np.minimum(a, b)[keep],
                       "id_b": np.maximum(a, b)[keep]}).drop_duplicates()
    results = []
    for parts in (1, 3, 8):
        got = (
            connected_components_distributed(
                rd.from_pandas(df).repartition(parts), num_partitions=4)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        results.append(got)
    pd.testing.assert_frame_equal(results[0], results[1])
    pd.testing.assert_frame_equal(results[0], results[2])


def test_connected_components_distributed_chain_converges():
    """A 200-node chain (what bucket_cap emits for a degenerate bucket)
    must converge within the bounded rounds via pointer jumping."""
    from sous_chef_ray.stages.neardup import connected_components_distributed

    n = 200
    df = pd.DataFrame({"id_a": np.arange(n - 1, dtype=np.int64),
                       "id_b": np.arange(1, n, dtype=np.int64)})
    got = (
        connected_components_distributed(
            rd.from_pandas(df).repartition(4), max_rounds=12)
        .to_pandas()
    )
    assert (got["root"] == 0).all()
    assert len(got) == n


def test_langid_seventeen_languages():
    """Script ranges decide non-Latin scripts; distinctive stopwords
    separate ten Latin-script languages."""
    from sous_chef_ray.stages.text import LangId

    samples = {
        "en": "The quick brown fox is jumping over the lazy dog and that is fine with everyone.",
        "de": "Ich gehe heute nicht zur Arbeit, aber wir werden auch morgen eine Lösung finden.",
        "fr": "Nous allons dans les montagnes pour marcher avec vous, mais cette route est longue.",
        "es": "Los niños juegan en el parque, pero cuando llueve también quedan muy contentos porque sí.",
        "it": "Questo è il libro che mi piace, anche perché gli autori della storia sono bravi.",
        "pt": "Você não vai acreditar, mas isso é uma coisa que já aconteceu depois da festa.",
        "nl": "Het is een mooie dag, maar wij gaan niet naar het strand omdat deze week regen wordt.",
        "sv": "Det är en vacker dag och han vill inte stanna hemma, för solen är framme på himlen.",
        "id": "Buku ini adalah cerita yang bagus untuk dibaca dengan teman, tidak membosankan juga.",
        "tr": "Bu kitap çok güzel ve bir arkadaşım için aldım, daha sonra birlikte okuyacağız gibi.",
        "zh": "这是一本非常好的书，我们都喜欢读它，因为故事很有意思。",
        "ja": "これはとても面白い本です。私たちはみんなこの物語が大好きです。",
        "ko": "이것은 아주 재미있는 책입니다. 우리는 모두 이 이야기를 좋아합니다.",
        "ru": "Это очень интересная книга, мы все любим читать её по вечерам дома.",
        "ar": "هذا كتاب ممتع للغاية ونحن جميعا نحب قراءته في المساء.",
        "hi": "यह बहुत ही रोचक किताब है और हम सब इसे पढ़ना पसंद करते हैं।",
        "el": "Αυτό είναι ένα πολύ ενδιαφέρον βιβλίο και μας αρέσει να το διαβάζουμε.",
    }
    out = LangId()(pd.DataFrame({"text": list(samples.values())}))
    assert list(out["lang_pred"]) == list(samples.keys())
    # null/empty handling
    out2 = LangId()(pd.DataFrame({"text": [None, ""]}))
    assert list(out2["lang_pred"]) == [None, None]

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_bloom_no_false_negatives_and_low_fp():
    from sous_chef_ray.stages.bloom import bloom_build, bloom_semi_filter

    rng = np.random.default_rng(3)
    small_keys = rng.choice(100000, 500, replace=False).astype(np.int64)
    small = rd.from_pandas(pd.DataFrame({"k": small_keys})).repartition(3)
    big_keys = np.arange(20000, dtype=np.int64)
    big = rd.from_pandas(pd.DataFrame({"k": big_keys, "v": big_keys * 2})).repartition(5)

    out = bloom_semi_filter(big, small, "k", num_bits=1 << 16, k=7,
                            concurrency=2).to_pandas()
    got = set(out["k"])
    truth = set(small_keys[small_keys < 20000])
    assert truth <= got  # no false negatives, ever
    # false positives bounded: m=65536 bits, n=500 keys, k=7 → fp ~ 1e-7
    assert len(got - truth) <= 5, len(got - truth)


def test_bloom_nul_and_string_keys():
    from sous_chef_ray.stages.bloom import bloom_semi_filter

    keys = ["a", "b\x00c", "d\x1fe", "plain"]
    small = rd.from_arrow(pa.table({"k": pa.array(keys[:2], type=pa.string())}))
    big = rd.from_arrow(pa.table({"k": pa.array(keys, type=pa.string())}))
    out = bloom_semi_filter(big, small, "k", num_bits=1 << 12, concurrency=2
                            ).to_pandas()
    assert set(out["k"]) >= {"a", "b\x00c"}


def test_boilerplate_line_removal_end_to_end():
    """Planted boilerplate (a footer in 8/10 docs) is detected by the
    distributed counter and stripped exactly; unique lines survive;
    within-doc repeats of a non-boilerplate line do NOT count as
    multi-doc and are kept."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.text import (
        find_boilerplate_lines,
        remove_boilerplate_lines,
    )

    footer = "(c) example corp - all rights reserved"
    docs = []
    for i in range(10):
        body = [f"unique line {i} alpha", f"unique line {i} beta"]
        if i < 8:
            body = [footer] + body + [footer]
        if i == 9:  # same line repeated within ONE doc only
            body += ["repeat me", "repeat me", "repeat me"]
        docs.append("\n".join(body))
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(10)], "text": docs})
    ds = rd.from_pandas(df).repartition(4)

    hot = find_boilerplate_lines(ds, min_docs=3)
    out = (
        remove_boilerplate_lines(ds, hot)
        .to_pandas().set_index("doc_id").sort_index()
    )
    for i in range(8):
        txt = out.loc[f"d{i}", "text"]
        assert footer not in txt
        assert f"unique line {i} alpha" in txt
        assert out.loc[f"d{i}", "n_lines_removed"] == 2
    assert out.loc["d8", "n_lines_removed"] == 0
    assert out.loc["d9", "text"].count("repeat me") == 3  # in-doc repeat kept
    # reconstruction is exact for untouched docs
    assert out.loc["d8", "text"] == docs[8]


def test_decontaminate_planted_ngram_overlap():
    """A corpus doc sharing a word-4-gram with the benchmark is dropped;
    a doc sharing only a 3-gram survives; flag mode keeps all rows and
    marks the contaminated one."""
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.text import collect_benchmark_ngrams, decontaminate

    bench = rd.from_pandas(pd.DataFrame({
        "doc_id": [0],
        "text": ["the capital of france is paris obviously"],
    }))
    corpus = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "quiz answer capital of france is paris end",   # shares 4-gram
            "capital of france borders spain",               # only 3-gram
            "completely unrelated text here",
        ],
    })).repartition(2)

    grams = collect_benchmark_ngrams(bench, n=4)
    kept = decontaminate(corpus, grams, n=4).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 3]

    flagged = decontaminate(corpus, grams, n=4, flag_col="contaminated"
                            ).to_pandas().set_index("doc_id")
    assert len(flagged) == 3
    assert flagged.loc[1, "contaminated"] and not flagged.loc[2, "contaminated"]


def test_mix_sources_fraction_and_epochs():
    """Per-source md5-threshold fraction + epoch repetition: a 'ff'
    threshold keeps ~all rows, '00' drops everything; repeats emit
    1..r epochs per surviving row; unknown sources take the default."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.dedup import mix_sources

    df = pd.DataFrame({
        "doc_id": range(200),
        "source": ["a", "b", "c", "d"] * 50,
        "text": [f"doc number {i} text" for i in range(200)],
    })
    plan = {"a": ("ff", 3), "b": ("00", 1), "c": ("80", 2)}
    out = mix_sources(rd.from_pandas(df).repartition(4), "source", "text",
                      plan, default=("ff", 1)).to_pandas()

    assert (out[out["source"] == "a"].groupby("doc_id")["epoch"].apply(
        lambda s: sorted(s) == [1, 2, 3])).all()
    assert (out["source"] == "b").sum() == 0
    c_rows = out[out["source"] == "c"]
    c_src = df[df["source"] == "c"]
    want_c = {i for i, t in zip(c_src["doc_id"], c_src["text"])
              if hashlib.md5(t.encode()).hexdigest() < "80"}
    assert set(c_rows["doc_id"]) == want_c
    assert (c_rows.groupby("doc_id")["epoch"].apply(
        lambda s: sorted(s) == [1, 2])).all()
    d_src = df[df["source"] == "d"]
    want_d = {i for i, t in zip(d_src["doc_id"], d_src["text"])
              if hashlib.md5(t.encode()).hexdigest() < "ff"}
    d_rows = out[out["source"] == "d"]
    assert set(d_rows["doc_id"]) == want_d and (d_rows["epoch"] == 1).all()


def test_duplicate_substring_detection_planted_span():
    """Two docs sharing a verbatim 25-word passage are flagged with
    dup_span_words == 25 (run of 25-8+1 grams at n=8); a doc sharing
    only 7 words (< n) is clean; runs never cross doc boundaries."""
    import pandas as pd
    import ray.data as rd

    from sous_chef_ray.stages.text import (
        find_crossdoc_grams,
        flag_duplicate_substrings,
    )

    passage = " ".join(f"shared{i}" for i in range(25))
    short = " ".join(f"shared{i}" for i in range(7))
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            f"alpha beta {passage} gamma delta",
            f"intro words here {passage} outro",
            f"nothing in common {short} with others at all really",
            "totally unique document content here folks",
        ],
    })
    ds = rd.from_pandas(docs).repartition(2)
    dup = find_crossdoc_grams(ds, n=8, min_docs=2)
    out = (flag_duplicate_substrings(ds, dup, n=8)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[0, "dup_span_words"] == 25
    assert out.loc[1, "dup_span_words"] == 25
    assert out.loc[0, "max_dup_run"] == 18
    assert out.loc[2, "n_dup_grams"] == 0
    assert out.loc[3, "n_dup_grams"] == 0


def test_exact_dedup_nul_embedded_keys():
    """Round-5: content keys differing only by an embedded NUL byte are
    DISTINCT groups. The pandas groupby path silently merged them (its
    string hashtable truncates at \\x00 — stages/partition.py:16); the
    Arrow partition_apply path compares by value."""
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["ab", "a\x00b", "a\x00b", "ab"],
    })
    out = (
        exact_dedup(rd.from_pandas(df), "text", keep_by="doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2]
    assert sorted(out["text"]) == ["a\x00b", "ab"]


def test_latest_per_key_multikey_and_null_keys():
    """Round-5: multi-key latest now routes through the same bucketed
    Arrow reduce (vectorized composite keys), and NULL keys form ONE
    group instead of one per row."""
    from sous_chef_ray.stages.dedup import latest_per_key

    df = pd.DataFrame({
        "k1": ["a", "a", "b", "b", None, None],
        "k2": [1, 1, 1, 2, 1, 1],
        "ts": [10, 20, 5, 7, 1, 3],
        "v": [100, 200, 300, 400, 500, 600],
    })
    out = (
        latest_per_key(rd.from_pandas(df), ["k1", "k2"], order_by="ts")
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    assert list(out["v"]) == [200, 300, 400, 600]


def test_bm25_matches_reference():
    """Round-5 BM25 retrieval vs a textbook Okapi implementation."""
    import math

    from sous_chef_ray.stages.text import bm25_search

    docs = [
        "the cat sat on the mat",
        "the dog chased the cat",
        "dogs and cats living together",
        "a quiet evening with a book",
        "the book about dogs",
        "cat cat cat cat",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs)})
    queries = {"q_cat": "cat", "q_dogbook": "dogs book"}
    got = bm25_search(rd.from_arrow(tbl).repartition(3), queries,
                      k=3, concurrency=2)

    # textbook reference
    k1, b = 1.2, 0.75
    toks = [d.split() for d in docs]
    N = len(docs)
    avgdl = sum(len(t) for t in toks) / N
    def idf(term):
        df = sum(term in t for t in toks)
        return math.log((N - df + 0.5) / (df + 0.5) + 1.0)
    def score(term_list, t):
        s = 0.0
        for term in term_list:
            tf = t.count(term)
            s += idf(term) * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl))
        return s
    for qid, qtext in queries.items():
        exp = sorted(range(N),
                     key=lambda i: (-score(qtext.split(), toks[i]), i))[:3]
        sub = got[got["qid"] == qid]
        assert list(sub["doc_id"]) == exp, (qid, list(sub["doc_id"]), exp)
        for did, sc in zip(sub["doc_id"], sub["score"]):
            assert abs(sc - score(qtext.split(), toks[did])) < 1e-9


def test_compression_ratio_signal():
    """Repetitive text compresses well below 1; high-entropy text does
    not; empty text ratios 1.0 exactly; byte counts are exact zlib."""
    import zlib

    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.text import add_compression_ratio

    texts = ["spam " * 200, "the quick brown fox jumps over the lazy dog",
             "", "a9X#q!Zw7$Lp@3eRt^Yu&8iOo*4sDf(6gHj)1kLz"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    out = add_compression_ratio(rd.from_arrow(t), "text").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(texts):
        b = s.encode()
        assert out["raw_bytes"][i] == len(b)
        assert out["zlib_bytes"][i] == len(zlib.compress(b, 6))
    assert out["compression_ratio"][0] < 0.05      # repetitive
    assert out["compression_ratio"][3] > 0.8       # high entropy
    assert out["compression_ratio"][2] == 1.0      # empty


def test_dsir_weights_exact_and_partition_invariant():
    """DSIR importance scores (stages/dsir): integer-exact vs a direct
    single-process recomputation, invariant to block layout, zero-gram
    docs dropped."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.dsir import dsir_weights

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "42", "love", "data"]
    texts, srcs = [], []
    for i in range(60):
        k = int(rng.integers(0, 9))
        texts.append(" -- ".join(rng.choice(vocab, size=k)))
        srcs.append(f"src{int(rng.integers(0, 4))}")
    t = pa.table({"doc_id": pa.array(range(60), type=pa.int64()),
                  "text": pa.array(texts), "source": pa.array(srcs)})

    B, SCALE, TGT = 4096, 1_000_000, {"src0", "src1"}

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    tc, rc = np.zeros(B, np.int64), np.zeros(B, np.int64)
    grams_of = []
    for s, src in zip(texts, srcs):
        gs = [bucket(g) for g in
              __import__("re").split("[^a-z0-9]+", s.lower()) if g]
        grams_of.append(gs)
        for b in gs:
            (tc if src in TGT else rc)[b] += 1
    w = tc * SCALE // (rc + 1)
    exp = {i: (int(sum(w[b] for b in gs)), len(gs))
           for i, gs in enumerate(grams_of) if gs}

    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        out = dsir_weights(ds, ("src0", "src1")).to_pandas()
        got = {int(r.doc_id): (int(r.dsir_score), int(r.n_grams))
               for r in out.itertuples()}
        assert got == exp
