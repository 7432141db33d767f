"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All stages are vectorized map_batches transforms (pyarrow.compute / numpy);
the language-ID stage is an actor-pool class so its profiles are built once
per actor, not per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from sous_chef_ray.stages._util import pool

_WS = r"\s+"


def add_token_count(ds: "rd.Dataset", text_col: str = "text",
                    name: str = "n_words") -> "rd.Dataset":
    """Whitespace token count, matching DuckDB
    length(regexp_split_to_array(trim(text), '\\s+'))."""

    def fn(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t[text_col])
        n = pc.list_value_length(pc.split_pattern_regex(trimmed, _WS))
        return t.append_column(name, pc.cast(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_quality_score(ds: "rd.Dataset", text_col: str = "text") -> "rd.Dataset":
    """Length / punctuation / word-shape quality features:
    n_words, chars_per_word, alnum_ratio — the standard cheap quality
    gates for web-scale corpus filtering (C4/Gopher-style heuristics)."""

    def fn(t: pa.Table) -> pa.Table:
        text = t[text_col]
        trimmed = pc.utf8_trim_whitespace(text)
        n_words = pc.cast(
            pc.list_value_length(pc.split_pattern_regex(trimmed, _WS)), pa.int64()
        )
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        stripped = pc.replace_substring_regex(text, "[^a-zA-Z0-9 ]", "")
        n_alnum = pc.cast(pc.utf8_length(stripped), pa.int64())
        chars_per_word = pc.divide(
            pc.cast(n_chars, pa.float64()), pc.cast(n_words, pa.float64())
        )
        alnum_ratio = pc.divide(
            pc.cast(n_alnum, pa.float64()), pc.cast(n_chars, pa.float64())
        )
        t = t.append_column("n_words", n_words)
        t = t.append_column("chars_per_word", chars_per_word)
        t = t.append_column("alnum_ratio", alnum_ratio)
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_compression_ratio(ds: "rd.Dataset", text_col: str = "text",
                          level: int = 6) -> "rd.Dataset":
    """zlib compression ratio per document — the Gopher/RefinedWeb-style
    redundancy signal: highly repetitive or boilerplate text compresses
    far below ~0.4×, high-entropy gibberish stays near 1×.  Adds
    raw_bytes:int64, zlib_bytes:int64, compression_ratio:float64
    (zlib/raw; 1.0 for empty docs so they don't flag as redundant).

    The per-doc ``zlib.compress`` call is C-bound (one call per row, no
    per-byte Python); the stage is embarrassingly shard-parallel and
    deterministic (fixed level, no dict), so ratios are reproducible
    across runs and cluster sizes."""
    import zlib

    def fn(t: pa.Table) -> pa.Table:
        text = t[text_col].combine_chunks()
        raw = np.empty(len(t), dtype=np.int64)
        comp = np.empty(len(t), dtype=np.int64)
        for i, v in enumerate(text):
            b = v.as_py()
            b = b.encode("utf-8") if b is not None else b""
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, level))
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        t = t.append_column("raw_bytes", pa.array(raw))
        t = t.append_column("zlib_bytes", pa.array(comp))
        t = t.append_column("compression_ratio", pa.array(ratio))
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_md5_fingerprint(ds: "rd.Dataset", text_col: str = "text",
                        name: str = "fingerprint") -> "rd.Dataset":
    """Exact content fingerprint (md5 hex) — the dedup key for exact
    dedup at scale: shuffle 16-byte hashes, not documents."""

    def fn(t: pa.Table) -> pa.Table:
        vals = t[text_col].to_pylist()
        digests = [hashlib.md5(v.encode("utf-8")).hexdigest() if v is not None else None
                   for v in vals]
        return t.append_column(name, pa.array(digests, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


ROLL_BASE = 1000003
_U64 = (1 << 64) - 1


def _roll_pows(window: int) -> "np.ndarray":
    """[BASE^(window-1), ..., BASE^1, BASE^0] under uint64 wraparound."""
    pows = np.empty(window, dtype=np.uint64)
    acc = np.uint64(1)
    base = np.uint64(ROLL_BASE)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        for j in range(window - 1, -1, -1):
            pows[j] = acc
            acc = acc * base
    return pows


def rolling_fingerprint_one(s: str, window: int = 16,
                            pows: "np.ndarray | None" = None) -> int:
    """Rolling (Rabin-Karp) fingerprint: the MINIMUM of all windowed
    polynomial hashes of the byte stream (uint64 wraparound) — robust to
    small appends/prepends. Vectorized: all windows at once via
    ``sliding_window_view`` and ONE uint64 mat-vec per document (no
    per-byte Python loop; same kernel shape as CharMinHash)."""
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) == 0:
        return 0
    if pows is None or len(pows) != window:
        pows = _roll_pows(window)
    if len(b) < window:
        # polynomial hash of the whole (short) byte string
        return int(b @ pows[window - len(b):])
    w = np.lib.stride_tricks.sliding_window_view(b, window)
    return int((w @ pows).min())


def add_rolling_fingerprint(ds: "rd.Dataset", text_col: str = "text",
                            name: str = "rh_fingerprint",
                            window: int = 16) -> "rd.Dataset":
    pows = _roll_pows(window)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[name] = [
            rolling_fingerprint_one(s, window, pows) if isinstance(s, str) else None
            for s in df[text_col]
        ]
        df[name] = df[name].astype("UInt64")
        return df

    return ds.map_batches(fn, batch_format="pandas")


# Common-word profiles for a cheap n-gram/stopword language heuristic
# (public-knowledge frequent words; NOT trained on any data).
# Distinctive (low-collision) stopword profiles per Latin-script language;
# shared Romance/Germanic function words (le/la/un/de/com/para) are
# deliberately absent so one word never votes for two languages.
_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "that", "with", "have", "this", "from"},
    "de": {"der", "und", "nicht", "ich", "sie", "werden", "auch", "eine",
           "aber", "wir"},
    "fr": {"les", "dans", "pour", "avec", "vous", "cette", "sont", "être",
           "nous", "mais"},
    "es": {"los", "las", "pero", "más", "muy", "cuando", "entre", "también",
           "porque", "años"},
    "it": {"che", "della", "sono", "anche", "perché", "gli", "nel", "alla",
           "questo", "come"},
    "pt": {"não", "você", "uma", "são", "isso", "então", "já", "depois",
           "até", "coisa"},
    "nl": {"het", "een", "voor", "niet", "zijn", "maar", "ook", "deze",
           "naar", "worden"},
    "sv": {"och", "att", "det", "som", "för", "inte", "är", "på", "han",
           "eller"},
    "id": {"yang", "dengan", "untuk", "tidak", "dari", "adalah", "ini",
           "akan", "pada", "juga"},
    "tr": {"bir", "ve", "bu", "için", "ile", "olarak", "çok", "daha", "gibi",
           "sonra"},
}

# (lo, hi, lang) codepoint ranges: a prefix dominated by one script decides
# immediately (the marker vote only separates Latin-script languages)
_SCRIPT_RANGES = (
    (0x4E00, 0x9FFF, "zh"),
    (0x3040, 0x30FF, "ja"),  # hiragana + katakana (checked before zh)
    (0xAC00, 0xD7AF, "ko"),
    (0x0400, 0x04FF, "ru"),
    (0x0600, 0x06FF, "ar"),
    (0x0900, 0x097F, "hi"),
    (0x0370, 0x03FF, "el"),
)


class LangId:
    """Actor-pool language-ID stage: script-range detection (CJK, kana,
    Hangul, Cyrillic, Arabic, Devanagari, Greek) then distinctive-stopword
    voting across ten Latin-script languages; profiles compiled once per
    actor in __init__."""

    def __init__(self, text_col: str = "text", name: str = "lang_pred"):
        import re

        self.text_col = text_col
        self.name = name
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def _script_lang(self, s: str):
        prefix = s[:200]
        counts: dict = {}
        for ch in prefix:
            cp = ord(ch)
            if cp < 0x0370:
                continue
            for lo, hi, lang in _SCRIPT_RANGES:
                if lo <= cp <= hi:
                    counts[lang] = counts.get(lang, 0) + 1
                    break
        if not counts:
            return None
        # any kana at all marks Japanese even in CJK-heavy text
        if counts.get("ja", 0) >= 2:
            return "ja"
        best = max(counts, key=lambda k: (counts[k], k))
        return best if counts[best] > len(prefix) * 0.15 else None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for s in batch[self.text_col]:
            if not isinstance(s, str) or not s:
                preds.append(None)
                continue
            script = self._script_lang(s)
            if script is not None:
                preds.append(script)
                continue
            words = [w.lower() for w in self.word.findall(s[:1000])]
            scores = {
                lang: sum(w in mk for w in words)
                for lang, mk in self.markers.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            preds.append(best if scores[best] > 0 else "en")
        batch = batch.copy()
        batch[self.name] = preds
        return batch


def add_lang_id(ds: "rd.Dataset", text_col: str = "text",
                concurrency: int | tuple = 4) -> "rd.Dataset":
    return ds.map_batches(
        LangId,
        fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pandas",
        concurrency=pool(concurrency),
    )


# ---------------------------------------------------------------------------
# Normalization / redaction / sentence splitting (training-data cleaning)
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
_SENT_RE = r"[.!?]+\s+"


def normalize_text(ds: "rd.Dataset", text_col: str = "text",
                   name: str = "norm_text") -> "rd.Dataset":
    """Lowercase + collapse runs of whitespace to single spaces + trim.
    Pure pyarrow.compute (RE2) — matches DuckDB
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` exactly."""

    def fn(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t[text_col])
        x = pc.replace_substring_regex(x, _WS, " ")
        x = pc.utf8_trim_whitespace(x)
        return t.append_column(name, x)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def redact_pii(ds: "rd.Dataset", text_col: str = "text",
               name: str = "redacted") -> "rd.Dataset":
    """Replace email addresses and phone-number-shaped spans with
    [EMAIL] / [PHONE] markers (both engines use RE2, so the DuckDB
    oracle applies the identical patterns). The standard pre-training
    cleanup pass; patterns are deliberately simple and documented."""

    def fn(t: pa.Table) -> pa.Table:
        x = pc.replace_substring_regex(t[text_col], _EMAIL_RE, "[EMAIL]")
        x = pc.replace_substring_regex(x, _PHONE_RE, "[PHONE]")
        return t.append_column(name, x)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def explode_sentences(ds: "rd.Dataset", id_col: str = "doc_id",
                      text_col: str = "text") -> "rd.Dataset":
    """Split each document into sentences ([.!?]+ + whitespace
    boundaries) and emit one row per (doc, sentence, 1-based index) —
    vectorized split + Arrow list explode, no Python per row."""

    def fn(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(t[text_col], _SENT_RE)
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        n_out = int(lengths.sum())
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        sent_idx = np.concatenate(
            [np.arange(1, l + 1, dtype=np.int64) for l in lengths]
        ) if n_out else np.empty(0, dtype=np.int64)
        return pa.table({
            id_col: t[id_col].take(pa.array(doc_idx)),
            "sent_idx": pa.array(sent_idx),
            "sentence": pc.list_flatten(parts),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# GPT-2-style pre-tokenizer pattern, RE2-compatible (no lookahead):
# contractions, letter runs, digit runs, punctuation runs, whitespace runs.
BPE_PAT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def add_bpe_token_count(ds: "rd.Dataset", text_col: str = "text",
                        name: str = "n_bpe_tokens") -> "rd.Dataset":
    """BPE-ish token count: number of matches of the GPT-2-style
    pre-tokenizer regex (``pc.count_substring_regex`` — one RE2 pass,
    matching DuckDB ``length(regexp_extract_all(text, pat))`` exactly).
    A fast proxy for LLM token budgets without a tokenizer model dep."""

    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], BPE_PAT)
        return t.append_column(name, pc.cast(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def add_repetition_scores(ds: "rd.Dataset", text_col: str = "text") -> "rd.Dataset":
    """Gopher-style repetition quality gates: duplicate-LINE fraction and
    duplicate-WORD fraction per document. Vectorized: one split, one
    flattened hash pass, per-doc distinct counts via np.unique over
    (doc, hash) pairs — no Python loop over rows."""

    def counts(flat: pa.Array, lens: np.ndarray, n_docs: int) -> np.ndarray:
        h = pd.util.hash_pandas_object(flat.to_pandas(), index=False).to_numpy()
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        pairs = np.stack([doc_idx, h.astype(np.int64)], axis=1)
        uniq = np.unique(pairs, axis=0)
        return np.bincount(uniq[:, 0].astype(np.intp), minlength=n_docs)

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        lines = pc.split_pattern(t[text_col].combine_chunks(), "\n")
        line_lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        uniq_lines = counts(lines.flatten(), line_lens, n)
        words = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t[text_col]), _WS
        ).combine_chunks()
        word_lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        uniq_words = counts(words.flatten(), word_lens, n)
        t = t.append_column(
            "dup_line_fraction",
            pa.array(1.0 - uniq_lines / np.maximum(line_lens, 1), type=pa.float64()),
        )
        t = t.append_column(
            "dup_word_fraction",
            pa.array(1.0 - uniq_words / np.maximum(word_lens, 1), type=pa.float64()),
        )
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Cross-corpus boilerplate line removal (C4/RefinedWeb-style)
# ---------------------------------------------------------------------------

def _line_hashes(flat: pa.Array) -> np.ndarray:
    """Deterministic uint64 per line (pandas siphash — fixed key, stable
    across processes; the same hash the engine's partitioners use)."""
    h = pd.util.hash_pandas_object(
        pd.Series(flat.to_numpy(zero_copy_only=False)), index=False
    ).to_numpy()
    return h.view(np.int64)  # int64 view: uint64 overflows Arrow/pandas int paths


def find_boilerplate_lines(
    ds: "rd.Dataset",
    text_col: str = "text",
    min_docs: int = 3,
    min_chars: int = 1,
) -> np.ndarray:
    """Distributed pass 1: uint64 hashes of lines that appear in at
    least ``min_docs`` DISTINCT documents (navigation chrome, cookie
    banners, license footers). Each batch emits per-DOC-distinct line
    hashes with partial counts — the shuffle moves (hash, n) pairs, one
    per distinct (batch, line), never line text; the returned hot set is
    bounded by the number of boilerplate lines, not the corpus."""

    def partial(t: pa.Table) -> pa.Table:
        lines = pc.split_pattern(t[text_col], "\n")
        flat = pc.list_flatten(lines).combine_chunks()
        offsets = lines.combine_chunks().offsets.to_numpy()
        parents = np.repeat(np.arange(len(t)), np.diff(offsets))
        h = _line_hashes(flat)
        ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = ln >= min_chars
        # distinct per doc: a line repeated INSIDE one doc counts once
        pairs = np.unique(np.stack([parents[keep], h[keep]]), axis=1)
        vals, counts = np.unique(pairs[1], return_counts=True)
        return pa.table({"h": pa.array(vals, type=pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h").aggregate(Sum("n", alias_name="n"))
    )
    hot = agg.filter(expr=f"n >= {min_docs}").to_pandas()
    return hot["h"].to_numpy(dtype=np.int64)


def remove_boilerplate_lines(
    ds: "rd.Dataset",
    hot_hashes: np.ndarray,
    text_col: str = "text",
    out_col: str | None = None,
    removed_col: str = "n_lines_removed",
    concurrency: int | tuple = 4,
) -> "rd.Dataset":
    """Distributed pass 2: broadcast the (bounded) hot-line hash set and
    rewrite each document without its boilerplate lines — split, hash,
    vectorized isin mask, then an offset-arithmetic Arrow rebuild
    (`pc.binary_join` over the filtered ListArray; no per-row Python
    string assembly)."""
    import ray

    out_col = out_col or text_col
    hot_ref = ray.put(np.sort(hot_hashes))

    # plain task fn, not an actor pool: the only "state" is the broadcast
    # hot set, and ray.get of a plasma ref inside a task is a zero-copy
    # view — no actor startup cost per stage execution
    def strip(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        lines = pc.split_pattern(t[text_col], "\n").combine_chunks()
        flat = pc.list_flatten(lines)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        offsets = lines.offsets.to_numpy()
        h = _line_hashes(flat)
        keep = ~np.isin(h, hot)  # binary search: hot is sorted
        kept_flat = flat.filter(pa.array(keep))
        # prefix-sum segment counts (reduceat mishandles empty docs)
        csum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        per_doc_kept = csum[offsets[1:]] - csum[offsets[:-1]]
        new_offsets = np.concatenate([[0], np.cumsum(per_doc_kept)])
        rebuilt = pa.ListArray.from_arrays(
            pa.array(new_offsets, type=pa.int32()), kept_flat)
        joined = pc.binary_join(rebuilt, "\n")
        removed = np.diff(offsets) - per_doc_kept
        t = t.drop_columns([text_col]) if out_col == text_col else t
        t = t.append_column(out_col, joined)
        return t.append_column(removed_col,
                               pa.array(removed.astype(np.int32)))

    return ds.map_batches(strip, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Train-test decontamination (word-n-gram overlap vs a benchmark set)
# ---------------------------------------------------------------------------

def _gram_pows(n: int) -> np.ndarray:
    """Wraparound powers of an odd 64-bit multiplier (position mixing for
    the polynomial n-gram combine)."""
    mult, mask = 0x9E3779B97F4A7C15, (1 << 64) - 1
    acc, pows = 1, []
    for _ in range(n):
        pows.append(acc)
        acc = (acc * mult) & mask
    return np.array(pows, dtype=np.uint64)


def _word_gram_hashes(words: pa.Array, n: int):
    """Per-position word-n-gram hashes for a batch of tokenized docs.

    Returns ``(gram, parent)``: uint64 polynomial hashes of every n-gram
    that lies entirely inside one document, and the doc row index each
    gram belongs to. Fully vectorized: one siphash pass over the flat
    word array, then a sliding-window mat-vec in wraparound uint64 —
    no per-row Python."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offsets = words.offsets.to_numpy()
    h = _line_hashes(flat).view(np.uint64)
    L = len(h)
    if L < n:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64))
    parents = np.repeat(np.arange(len(words), dtype=np.int64),
                        np.diff(offsets))
    win = np.lib.stride_tricks.sliding_window_view(h, n)
    gram = (win * _gram_pows(n)).sum(axis=1, dtype=np.uint64)
    start_p = parents[: L - n + 1]
    valid = start_p == parents[n - 1:]
    return gram[valid], start_p[valid]


def collect_benchmark_ngrams(
    bench: "rd.Dataset", text_col: str = "text", n: int = 4,
    split_pattern: str = " ",
) -> np.ndarray:
    """Distinct word-n-gram hashes of a (small) benchmark set. Each batch
    emits its local distinct hashes; the cross-batch distinct runs as a
    Ray aggregate — only 8-byte hashes move, bounded by the benchmark's
    gram count, never the corpus."""

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t[text_col], split_pattern)
        gram, _ = _word_gram_hashes(words, n)
        return pa.table({"g": np.unique(gram).view(np.int64)})

    vals = (
        bench.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .unique("g")
    )
    return np.sort(np.asarray(vals, dtype=np.int64)).view(np.uint64)


def decontaminate(
    corpus: "rd.Dataset",
    bench_grams: np.ndarray,
    text_col: str = "text",
    n: int = 4,
    split_pattern: str = " ",
    flag_col: str | None = None,
    concurrency: int | tuple = 4,
) -> "rd.Dataset":
    """Drop (or flag, with ``flag_col``) every corpus document sharing at
    least one word-n-gram with the benchmark — the standard train-test
    decontamination pass. The benchmark gram set is broadcast once via
    ray.put and binary-searched per batch (sorted isin); a doc is
    contaminated if ANY of its grams hits."""
    import ray

    hot_ref = ray.put(np.sort(bench_grams.view(np.int64)))

    # plain task fn (no actor pool): the broadcast gram set is fetched
    # zero-copy from plasma per task — no per-stage actor startup
    def decon(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        words = pc.split_pattern(t[text_col], split_pattern)
        gram, parent = _word_gram_hashes(words, n)
        hit = np.isin(gram.view(np.int64), hot)
        bad = np.zeros(len(t), dtype=bool)
        bad[parent[hit]] = True
        if flag_col is not None:
            return t.append_column(flag_col, pa.array(bad))
        return t.filter(pa.array(~bad))

    return corpus.map_batches(decon, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Cross-document duplicated-substring detection (exact-substring dedup,
# the "deduplicating training data" shape: find long token runs shared
# verbatim across documents)
# ---------------------------------------------------------------------------

def find_crossdoc_grams(
    ds: "rd.Dataset", text_col: str = "text", n: int = 8,
    min_docs: int = 2, split_pattern: str = " ",
) -> np.ndarray:
    """Word-n-gram hashes appearing in >= ``min_docs`` DISTINCT docs.
    Same distributed shape as find_boilerplate_lines: each batch emits
    per-doc-distinct (hash, 1) pairs, the groupby sums in-cluster, and
    only the (bounded) duplicated-gram set returns to the driver."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t[text_col], split_pattern)
        gram, parent = _word_gram_hashes(words, n)
        pairs = np.unique(np.stack([parent, gram.view(np.int64)]), axis=1)
        vals, counts = np.unique(pairs[1], return_counts=True)
        return pa.table({"h": pa.array(vals, type=pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h").aggregate(Sum("n", alias_name="n"))
    )
    hot = agg.filter(expr=f"n >= {min_docs}").to_pandas()
    return np.sort(hot["h"].to_numpy(dtype=np.int64))


def flag_duplicate_substrings(
    ds: "rd.Dataset",
    dup_grams: np.ndarray,
    text_col: str = "text",
    n: int = 8,
    split_pattern: str = " ",
) -> "rd.Dataset":
    """Per document: how much of it is verbatim-duplicated elsewhere.
    Broadcasts the duplicated-gram set and, in one vectorized pass,
    marks gram positions that hit, groups consecutive hits into runs
    (never crossing doc boundaries), and emits per doc:

    - ``n_dup_grams``  — duplicated gram positions
    - ``max_dup_run``  — longest consecutive duplicated-gram run; a run
      of r grams is a verbatim-shared span of r + n - 1 words
    - ``dup_span_words`` — that longest span in words (0 if none)

    Downstream policy (drop doc, cut span, keep) stays with the caller."""
    import ray

    hot_ref = ray.put(np.sort(dup_grams))

    def fn(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        words = pc.split_pattern(t[text_col], split_pattern)
        gram, parent = _word_gram_hashes(words, n)
        hit = np.isin(gram.view(np.int64), hot)
        n_docs = len(t)
        n_dup = np.bincount(parent[hit], minlength=n_docs).astype(np.int64)
        max_run = np.zeros(n_docs, dtype=np.int64)
        if hit.any():
            # run starts: hit with no preceding hit in the SAME doc
            prev_hit = np.concatenate([[False], hit[:-1]])
            prev_parent = np.concatenate([[-1], parent[:-1]])
            starts = hit & (~prev_hit | (prev_parent != parent))
            run_id = np.cumsum(starts) - 1          # id per hit position
            run_len = np.bincount(run_id[hit])
            run_parent = parent[starts]
            np.maximum.at(max_run, run_parent, run_len)
        span = np.where(max_run > 0, max_run + n - 1, 0)
        t = t.append_column("n_dup_grams", pa.array(n_dup))
        t = t.append_column("max_dup_run", pa.array(max_run))
        return t.append_column("dup_span_words", pa.array(span))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# BM25 retrieval (SURVEY §2.F text analysis — ranked search over the corpus)
# ---------------------------------------------------------------------------


def _bm25_corpus_stats(ds, text_col: str, terms):
    """ONE streaming pass → (N, total_len, df per query term). Each
    batch emits a single tiny partial row (term dfs as a fixed-length
    vector), so the reduce is a driver-side sum of per-batch rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    term_arr = pa.array(list(terms), pa.string())

    def partial(t: pa.Table) -> pa.Table:
        words = pc.utf8_split_whitespace(t[text_col].combine_chunks())
        flat = pc.list_flatten(words)
        parents = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False)
        code = pc.index_in(flat, value_set=term_arr)
        valid = pc.is_valid(code)
        c = pc.fill_null(code, 0).to_numpy(zero_copy_only=False)
        v = np.asarray(valid)
        # df: count DOCS containing the term (dedupe (doc, term) pairs)
        key = parents[v] * len(term_arr) + c[v]
        uniq = np.unique(key)
        df = np.bincount((uniq % len(term_arr)).astype(np.int64),
                         minlength=len(term_arr))
        dl = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        return pa.table({
            "n_docs": pa.array([len(t)], pa.int64()),
            "total_len": pa.array([int(dl.sum())], pa.int64()),
            "df": pa.array([df.astype(np.int64)],
                           pa.list_(pa.int64())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    n_docs = int(parts["n_docs"].sum())
    total_len = int(parts["total_len"].sum())
    df = np.sum(np.stack([np.asarray(v) for v in parts["df"]]), axis=0)
    return n_docs, total_len, df


class _Bm25Score:
    """Per-batch BM25 scoring against broadcast query term stats: one
    Arrow tokenize, one index_in probe, one bincount → the (doc, term)
    tf matrix; per query a dense dot with its idf vector."""

    def __init__(self, spec_ref, id_col, text_col, k):
        import ray

        spec = ray.get(spec_ref)
        self.terms = spec["terms"]          # pa.array of query vocab
        self.idf = spec["idf"]              # (n_terms,) float64
        self.qmask = spec["qmask"]          # (nq, n_terms) bool
        self.qids = spec["qids"]
        self.k1, self.b = spec["k1"], spec["b"]
        self.avgdl = spec["avgdl"]
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, t):
        import pyarrow as pa
        import pyarrow.compute as pc

        words = pc.utf8_split_whitespace(t[self.text_col].combine_chunks())
        flat = pc.list_flatten(words)
        parents = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False)
        code = pc.index_in(flat, value_set=self.terms)
        v = np.asarray(pc.is_valid(code))
        c = pc.fill_null(code, 0).to_numpy(zero_copy_only=False)
        nt = len(self.terms)
        tf = np.bincount(parents[v] * nt + c[v],
                         minlength=len(t) * nt).reshape(len(t), nt)
        dl = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        denom = tf + self.k1 * (1 - self.b
                                + self.b * dl[:, None] / self.avgdl)
        comp = self.idf[None, :] * tf * (self.k1 + 1) / denom
        sims = self.qmask @ comp.T  # (nq, batch)
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        return pa.table({
            "qid": pa.array(np.repeat(self.qids, k)),
            "doc_id": pa.array(ids[top.reshape(-1)]),
            "score": pa.array(
                np.take_along_axis(sims, top, axis=1).reshape(-1),
                type=pa.float64()),
        })


def bm25_search(
    ds,
    queries,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    concurrency: int | tuple = 4,
):
    """Ranked BM25 retrieval: ``queries`` = {qid: "query text"}. Two
    streaming passes over the corpus (stats, then score+local-topk) and
    a distributed per-qid top-k reduce — document text never reaches
    the driver; only the query-vocabulary df vector and the final
    nq × k rows do. Okapi idf: ln((N − df + 0.5)/(df + 0.5) + 1)."""
    import pyarrow as pa

    import ray

    from sous_chef_ray.stages._util import pool
    from sous_chef_ray.stages.partition import partition_apply

    qids = list(queries)
    qterms = {q: queries[q].split() for q in qids}
    vocab = sorted({w for ts in qterms.values() for w in ts})
    terms = pa.array(vocab, pa.string())
    n_docs, total_len, df = _bm25_corpus_stats(ds, text_col, vocab)
    avgdl = total_len / max(n_docs, 1)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    qmask = np.zeros((len(qids), len(vocab)))
    pos = {w: i for i, w in enumerate(vocab)}
    for r, q in enumerate(qids):
        for w in qterms[q]:
            qmask[r, pos[w]] = 1.0
    spec_ref = ray.put(dict(terms=terms, idf=idf, qmask=qmask,
                            qids=np.array(qids), k1=k1, b=b,
                            avgdl=avgdl))
    cand = ds.map_batches(
        _Bm25Score,
        fn_constructor_kwargs=dict(spec_ref=spec_ref, id_col=id_col,
                                   text_col=text_col, k=k),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=pool(concurrency),
    )

    def topk(t: pa.Table) -> pa.Table:
        t = t.sort_by([("qid", "ascending"), ("score", "descending"),
                       ("doc_id", "ascending")])
        q = t["qid"].to_numpy(zero_copy_only=False)
        n = len(q)
        arange = np.arange(n, dtype=np.int64)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = q[1:] != q[:-1]
        start = np.maximum.accumulate(np.where(change, arange, 0))
        return t.take(pa.array(np.nonzero(arange - start < k)[0]))

    out = partition_apply(cand, "qid", topk, num_buckets=8,
                          batch_format="pyarrow").to_pandas()
    return out.sort_values(["qid", "score", "doc_id"],
                           ascending=[True, False, True],
                           kind="mergesort").reset_index(drop=True)
