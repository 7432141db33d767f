"""Sequence packing (stages/pack.py): token conservation, row lengths,
EOS placement, zero-length docs, partial-tail flagging."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from sous_chef_ray.stages.pack import pack_sequences

EOS = 50256


def _docs(lengths, seed=0):
    rng = np.random.default_rng(seed)
    toks = [rng.integers(1, 1000, l).astype(np.int32) for l in lengths]
    return pa.table({
        "doc_id": pa.array(np.arange(len(lengths), dtype=np.int64)),
        "tokens": pa.array([t.tolist() for t in toks], type=pa.list_(pa.int32())),
    }), toks


def test_pack_conserves_tokens_and_order():
    tbl, toks = _docs([100, 3, 0, 57, 260])
    out = pack_sequences(
        rd.from_arrow(tbl), "tokens", seq_len=64, eos_id=EOS,
    ).to_pandas().sort_values("seq_id")
    stream = np.concatenate([np.asarray(t, dtype=np.int32) for t in out["tokens"]])
    # expected stream: docs in order, one EOS after each
    exp = np.concatenate([np.concatenate([t, [EOS]]) for t in toks]).astype(np.int32)
    assert np.array_equal(stream, exp)
    # all but last row are exactly seq_len and complete
    assert (out["n_tokens"].iloc[:-1] == 64).all()
    assert out["complete"].iloc[:-1].all()
    total = sum(len(t) for t in toks) + len(toks)
    assert not out["complete"].iloc[-1] or total % 64 == 0
    assert stream.size == total


def test_pack_drop_partial():
    tbl, toks = _docs([100, 30])
    out = pack_sequences(
        rd.from_arrow(tbl), "tokens", seq_len=64, eos_id=EOS, emit_partial=False,
    ).to_pandas()
    assert (out["n_tokens"] == 64).all()
    assert out["complete"].all()
    total = sum(len(t) for t in toks) + len(toks)
    assert len(out) == total // 64


def test_pack_exact_multiple():
    # total = 126 + 2 EOS = 128 = 2 x 64: no partial row
    tbl, _ = _docs([63, 63])
    out = pack_sequences(rd.from_arrow(tbl), "tokens", seq_len=64, eos_id=EOS).to_pandas()
    assert len(out) == 2
    assert out["complete"].all()


def _chunk_ref(toks, window, stride):
    """Python reference: per-doc sliding windows."""
    out = []
    for i, t in enumerate(toks):
        t = list(map(int, t))
        cid = 0
        for s in range(0, len(t), stride):
            out.append((i, cid, tuple(t[s:s + window]), min(window, len(t) - s)))
            cid += 1
    return out


def test_chunk_windows_overlap_and_remainder():
    from sous_chef_ray.stages.pack import chunk_token_windows

    tbl, toks = _docs([10, 3, 0, 7, 1, 41])
    out = chunk_token_windows(
        rd.from_arrow(tbl), "tokens", window=5, stride=3, id_cols=["doc_id"],
    ).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    got = [(int(r.doc_id), int(r.chunk_id),
            tuple(int(x) for x in r.tokens), int(r.n_tokens))
           for r in out.itertuples()]
    assert got == _chunk_ref(toks, 5, 3)
    # zero-length doc emits no chunks
    assert 2 not in set(out["doc_id"])


def test_chunk_windows_non_overlapping_conserves_tokens():
    from sous_chef_ray.stages.pack import chunk_token_windows

    tbl, toks = _docs([100, 64, 5, 0, 129])
    out = chunk_token_windows(
        rd.from_arrow(tbl), "tokens", window=64, stride=64, id_cols=["doc_id"],
    ).to_pandas().sort_values(["doc_id", "chunk_id"])
    # stride == window: chunks partition each doc exactly
    for i, t in enumerate(toks):
        rows = out[out["doc_id"] == i]
        stream = [x for v in rows["tokens"] for x in v]
        assert stream == list(map(int, t))
    assert int(out["n_tokens"].sum()) == sum(len(t) for t in toks)


def test_chunk_windows_string_lists():
    from sous_chef_ray.stages.pack import chunk_token_windows

    tbl = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "tokens": pa.array([["a", "b", "c", "d"], ["x"]],
                           type=pa.list_(pa.string())),
    })
    out = chunk_token_windows(
        rd.from_arrow(tbl), "tokens", window=3, stride=3, id_cols=["doc_id"],
    ).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert [list(v) for v in out["tokens"]] == [["a", "b", "c"], ["d"], ["x"]]
