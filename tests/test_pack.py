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
