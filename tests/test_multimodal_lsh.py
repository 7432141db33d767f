"""Multimodal plumbing + LSH-approximate similarity tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from sous_chef_ray.stages.multimodal import (
    DecodeImages,
    decode_images,
    sample_frames,
    synth_image_table,
)
from sous_chef_ray.stages.similarity import knn_brute_force, knn_lsh_bucketed


def test_decode_images_schema_and_determinism():
    imgs = synth_image_table(64, seed=42)
    out = decode_images(rd.from_arrow(imgs), fake=True, concurrency=2, batch_size=16)
    df = out.to_pandas().sort_values("media_id").reset_index(drop=True)
    assert list(df.columns) == [
        "media_id", "width", "height", "checksum",
        "mean_px", "std_px", "min_px", "max_px", "thumbnail",
    ]
    assert len(df) == 64
    # deterministic: same input → same checksums
    df2 = (
        decode_images(rd.from_arrow(imgs), fake=True, concurrency=2, batch_size=16)
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    assert (df["checksum"] == df2["checksum"]).all()


def test_decode_unknown_mime_is_stubbed():
    """Real-decode mode works for PNG/JPEG; any other codec remains the
    declared NotImplementedError boundary."""
    import pyarrow as pa

    dec = DecodeImages(fake=False)
    batch = pa.table({
        "media_id": pa.array(["x"]),
        "payload": pa.array([b"\x00\x01"], type=pa.large_binary()),
        "mime": pa.array(["video/mp4"]),
        "width": pa.array([1], type=pa.int32()),
        "height": pa.array([1], type=pa.int32()),
    })
    with pytest.raises(NotImplementedError):
        dec(batch)


def test_png_codec_roundtrip_all_filters():
    """encode->decode is pixel-exact; hand-built Sub/Up/Average/Paeth
    filtered PNGs also decode exactly (reference: RFC 2083 filters)."""
    import struct
    import zlib

    import numpy as np

    from sous_chef_ray.stages.png import _chunk, _SIG, decode_png, encode_png

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    gray = rng.integers(0, 256, (9, 31), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(gray)), gray)

    # hand-roll each filter type on a known image and verify exact decode
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8).astype(np.int64)
    for ftype in (1, 2, 3, 4):
        h, w, ch = img.shape
        raw = bytearray()
        prev = np.zeros(w * ch, dtype=np.int64)
        for y in range(h):
            line = img[y].reshape(-1)
            filt = np.zeros(w * ch, dtype=np.int64)
            for x in range(w * ch):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                filt[x] = (line[x] - pred) & 0xFF
            raw.append(ftype)
            raw.extend(int(v) for v in filt)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _chunk(b"IEND", b""))
        assert np.array_equal(decode_png(data), img.astype(np.uint8)), ftype


def test_decode_real_png_pixel_stats():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.multimodal import decode_images, synth_png_table

    imgs, pixel_truth = synth_png_table(24, seed=5, return_pixels=True)
    out = decode_images(rd.from_arrow(imgs), fake=False, concurrency=2,
                        batch_size=8).to_pandas().sort_values("media_id")
    for (_, row), truth in zip(out.iterrows(), pixel_truth):
        px = truth.astype(np.float64)
        assert row["width"] == truth.shape[1] and row["height"] == truth.shape[0]
        assert abs(row["mean_px"] - px.mean()) < 1e-9
        assert abs(row["std_px"] - px.std()) < 1e-9
        assert len(row["thumbnail"]) == 32 * 32 * 3


def test_jpeg_codec_roundtrip_variants():
    """Baseline JPEG encode→decode stays within lossy tolerances across
    quality, subsampling, grayscale and restart-interval variants."""
    from sous_chef_ray.stages.jpeg import decode_jpeg, encode_jpeg

    h, w = 50, 70
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 100 * np.sin(xx / 9) * np.cos(yy / 7),
        xx * 255 / w,
        yy * 255 / h,
    ], axis=-1).clip(0, 255).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        for ri in (0, 3):
            data = encode_jpeg(img, quality=90, subsampling=sub,
                               restart_interval=ri)
            assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
            out = decode_jpeg(data)
            assert out.shape == img.shape
            err = np.abs(out.astype(float) - img.astype(float))
            assert err.mean() < 3.5 and err.max() <= 20, (sub, ri)
    gray = (xx * 255 / w).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=92))
    assert out.shape == gray.shape
    assert np.abs(out.astype(float) - gray.astype(float)).max() <= 3


def test_jpeg_progressive_is_declared_boundary():
    from sous_chef_ray.stages.jpeg import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(np.zeros((16, 16), dtype=np.uint8)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_decode_real_jpeg_pixel_stats():
    import ray.data as rd

    from sous_chef_ray.stages.jpeg import decode_jpeg
    from sous_chef_ray.stages.multimodal import decode_images, synth_jpeg_table

    imgs, pixel_truth = synth_jpeg_table(12, seed=5, return_pixels=True)
    out = decode_images(rd.from_arrow(imgs), fake=False, concurrency=2,
                        batch_size=4).to_pandas().sort_values("media_id")
    payloads = imgs["payload"].to_pylist()
    for (_, row), truth, payload in zip(out.iterrows(), pixel_truth, payloads):
        assert row["width"] == truth.shape[1] and row["height"] == truth.shape[0]
        # stage stats must equal a direct decode exactly...
        px = decode_jpeg(payload).astype(np.float64)
        assert abs(row["mean_px"] - px.mean()) < 1e-9
        assert abs(row["std_px"] - px.std()) < 1e-9
        # ...and track the pre-encode truth within lossy tolerance
        assert abs(row["mean_px"] - truth.astype(np.float64).mean()) < 3.0
        assert len(row["thumbnail"]) == 32 * 32 * 3


def test_sample_frames_layout():
    imgs = synth_image_table(8, seed=1)
    out = sample_frames(rd.from_arrow(imgs), every_nth=2, batch_size=4).to_pandas()
    assert set(out.columns) == {"media_id", "frame_index", "byte_offset"}
    assert (out["byte_offset"] == out["frame_index"] * 1024).all()
    assert (out["frame_index"] % 2 == 0).all()


def test_lsh_knn_recall_vs_brute_force():
    rng = np.random.default_rng(12)
    emb = rng.standard_normal((400, 32)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(400, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        }
    )
    q = tbl.slice(0, 8)
    exact = knn_brute_force(
        rd.from_arrow(tbl), q, id_col="vec_id", emb_col="embedding",
        qid_col="vec_id", qemb_col="embedding", k=5, concurrency=2,
    )
    approx = knn_lsh_bucketed(
        rd.from_arrow(tbl), q, id_col="vec_id", emb_col="embedding",
        qid_col="vec_id", qemb_col="embedding", k=5,
        num_tables=16, bits=5, concurrency=2,
    )
    recalls = []
    for qid in range(8):
        e = set(exact[exact["qid"] == qid]["neighbor_id"])
        a = set(approx[approx["qid"] == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_recall_vs_brute_force():
    """IVF with generous nprobe recovers most exact neighbors on a
    clustered corpus; nprobe == n_centroids is exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.similarity import knn_brute_force, knn_ivf

    rng = np.random.default_rng(2)
    centers = rng.standard_normal((8, 24)) * 4
    pts = np.concatenate([
        centers[i] + rng.standard_normal((150, 24)) for i in range(8)
    ]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
        "embedding": pa.array(list(pts), type=pa.list_(pa.float32())),
    })
    q = tbl.slice(0, 8)
    ds = rd.from_arrow(tbl).repartition(4)
    exact = knn_brute_force(ds, q, k=5, concurrency=2)
    approx = knn_ivf(ds, q, k=5, n_centroids=16, nprobe=6,
                     sample_rows=1200, concurrency=2)
    hits = 0
    for qid in range(8):
        e = set(exact[exact["qid"] == qid]["neighbor_id"])
        a = set(approx[approx["qid"] == qid]["neighbor_id"])
        hits += len(e & a)
    assert hits / (8 * 5) >= 0.9, hits

    full = knn_ivf(ds, q, k=5, n_centroids=16, nprobe=16,
                   sample_rows=1200, concurrency=2)
    pd_exact = exact.reset_index(drop=True)
    pd_full = full.reset_index(drop=True)
    assert list(pd_exact["neighbor_id"]) == list(pd_full["neighbor_id"])


def test_cosine_pairs_lsh_planted_clusters():
    """Planted near-dup clusters (cosine ≥ 0.9 within a cluster): the
    bucketed LSH pairs path must recover ≥0.95 of the brute-force pairs
    at default high-threshold params; here it recovers them exactly."""
    from sous_chef_ray.stages.similarity import cosine_pairs_above, cosine_pairs_lsh

    rng = np.random.default_rng(7)
    dim = 32
    bases = rng.standard_normal((10, dim))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows = []
    for b in bases:
        for _ in range(4):  # tight cluster: tiny perturbation keeps cos>0.9
            v = b + 0.05 * rng.standard_normal(dim)
            rows.append(v / np.linalg.norm(v))
    noise = rng.standard_normal((160, dim))
    rows.extend(noise / np.linalg.norm(noise, axis=1, keepdims=True))
    pts = np.asarray(rows, dtype=np.float64)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
        "embedding": pa.array(list(pts), type=pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    bf = cosine_pairs_above(ds, 0.9, id_col="vec_id", emb_col="embedding",
                            concurrency=2)
    lsh = cosine_pairs_lsh(ds, 0.9, id_col="vec_id", emb_col="embedding",
                           concurrency=2)
    assert len(bf) >= 10  # sanity: clusters actually planted pairs
    truth = set(zip(bf["id_a"], bf["id_b"]))
    got = set(zip(lsh["id_a"], lsh["id_b"]))
    assert got <= truth  # exact verify: no false positives, ever
    assert len(got & truth) / len(truth) >= 0.95


def test_cosine_pairs_lsh_matches_brute_force_low_threshold():
    """With few bits and many tables the LSH path degenerates to exact
    all-pairs — equality with the brute-force baseline end to end."""
    from sous_chef_ray.stages.similarity import cosine_pairs_above, cosine_pairs_lsh

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((120, 16))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
        "embedding": pa.array(list(pts), type=pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    bf = cosine_pairs_above(ds, 0.3, id_col="vec_id", emb_col="embedding",
                            concurrency=2)
    lsh = cosine_pairs_lsh(ds, 0.3, id_col="vec_id", emb_col="embedding",
                           bits=2, num_tables=64, concurrency=2)
    assert bf.reset_index(drop=True).equals(lsh.reset_index(drop=True))


def test_wav_roundtrip_and_decode_stage():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.multimodal import decode_audio, decode_wav, encode_wav

    rng = np.random.default_rng(7)
    t = np.arange(16000) / 16000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)[:, None]  # 1s 440Hz @ -6dB
    noise = rng.uniform(-0.1, 0.1, (8000, 2))          # 0.5s stereo noise
    wavs = [encode_wav(tone, 16000), encode_wav(noise, 16000)]
    x, r = decode_wav(wavs[0])
    assert r == 16000 and x.shape == (16000, 1)
    assert np.allclose(x[:, 0], tone[:, 0], atol=1e-4)

    tbl = pa.table({
        "media_id": pa.array(["a", "b"]),
        "payload": pa.array(wavs, type=pa.large_binary()),
    })
    out = decode_audio(rd.from_arrow(tbl), concurrency=2).to_pandas().sort_values("media_id")
    assert abs(out["duration_sec"].iloc[0] - 1.0) < 1e-9
    assert abs(out["duration_sec"].iloc[1] - 0.5) < 1e-9
    assert abs(out["rms"].iloc[0] - 0.5 / np.sqrt(2)) < 1e-3  # sine RMS = A/sqrt(2)
    assert out["peak"].iloc[0] <= 0.5001


def test_cosine_pairs_ivf_planted_clusters():
    """IVF-cell-bucketed pairs recover ≥0.95 of brute-force pairs on
    planted clusters and never emit a false positive (exact verify)."""
    from sous_chef_ray.stages.similarity import cosine_pairs_above, cosine_pairs_ivf

    rng = np.random.default_rng(17)
    dim = 32
    bases = rng.standard_normal((10, dim))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows = []
    for b in bases:
        for _ in range(4):
            v = b + 0.05 * rng.standard_normal(dim)
            rows.append(v / np.linalg.norm(v))
    noise = rng.standard_normal((160, dim))
    rows.extend(noise / np.linalg.norm(noise, axis=1, keepdims=True))
    pts = np.asarray(rows, dtype=np.float64)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
        "embedding": pa.array(list(pts), type=pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    bf = cosine_pairs_above(ds, 0.9, id_col="vec_id", emb_col="embedding",
                            concurrency=2)
    ivf = cosine_pairs_ivf(ds, 0.9, id_col="vec_id", emb_col="embedding",
                           n_centroids=16, n_assign=4, concurrency=2)
    assert len(bf) >= 10
    truth = set(zip(bf["id_a"], bf["id_b"]))
    got = set(zip(ivf["id_a"], ivf["id_b"]))
    assert got <= truth
    assert len(got & truth) / len(truth) >= 0.95


def test_cosine_pairs_ivf_full_assign_matches_brute_force():
    """n_assign == n_centroids puts every row in every cell → the IVF
    path degenerates to exact all-pairs equality with brute force."""
    from sous_chef_ray.stages.similarity import cosine_pairs_above, cosine_pairs_ivf

    rng = np.random.default_rng(23)
    pts = rng.standard_normal((120, 16))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
        "embedding": pa.array(list(pts), type=pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    bf = cosine_pairs_above(ds, 0.3, id_col="vec_id", emb_col="embedding",
                            concurrency=2)
    ivf = cosine_pairs_ivf(ds, 0.3, id_col="vec_id", emb_col="embedding",
                           n_centroids=8, n_assign=8, concurrency=2)
    pd.testing.assert_frame_equal(
        bf.reset_index(drop=True), ivf.reset_index(drop=True)
    )


def test_gif_codec_roundtrips():
    """GIF encode/decode: single + multi frame, custom palette,
    interlace, and BOTH LZW paths (real growing-dictionary compressor
    and the fixed-width clear-per-symbol stream)."""
    from sous_chef_ray.stages.gif import decode_gif, encode_gif

    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    a = rng.integers(0, 16, (19, 27)).astype(np.uint8)
    b = rng.integers(0, 16, (19, 27)).astype(np.uint8)

    for trivial in (False, True):
        fr = decode_gif(encode_gif([a, b], palette=pal, trivial_lzw=trivial))
        assert len(fr) == 2
        assert (fr[0] == pal[a]).all() and (fr[1] == pal[b]).all()

    inter = decode_gif(encode_gif(a, palette=pal, interlace=True))
    assert (inter[0] == pal[a]).all()


def test_gif_lzw_growing_dictionary_compresses():
    """The real LZW path must actually compress repetitive data and
    roundtrip exactly (exercises width bumps and the 4096 clear)."""
    from sous_chef_ray.stages.gif import _lzw_decode, _lzw_encode_full

    rng = np.random.default_rng(37)
    repet = np.tile(np.arange(8, dtype=np.uint8), 4000)
    enc = _lzw_encode_full(repet, 3)
    assert len(enc) < len(repet) / 4
    assert (_lzw_decode(enc, 3, len(repet)) == repet).all()

    wide = rng.integers(0, 256, 50_000).astype(np.uint8)
    enc2 = _lzw_encode_full(wide, 8)
    assert (_lzw_decode(enc2, 8, len(wide)) == wide).all()


def test_gif_transparency_composites_over_previous_frame():
    """A transparent index in frame 2 must show frame 1's pixels."""
    from sous_chef_ray.stages.gif import decode_gif, encode_gif

    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], dtype=np.uint8)
    f1 = np.zeros((6, 6), dtype=np.uint8)          # all red
    f2 = np.full((6, 6), 2, dtype=np.uint8)        # all blue...
    f2[2:4, 2:4] = 1                               # ...with transparent hole
    fr = decode_gif(encode_gif([f1, f2], palette=pal, transparent_idx=1))
    assert (fr[0] == pal[0]).all()
    assert (fr[1][0, 0] == pal[2]).all()           # opaque blue
    assert (fr[1][2:4, 2:4] == pal[0]).all()       # hole shows red


def test_gif_frame_sampling_stage_real_frames():
    """sample_gif_frames decodes REAL animated GIFs in an actor pool and
    emits one row per sampled frame with true pixel stats."""
    from sous_chef_ray.stages.multimodal import sample_gif_frames, synth_gif_table

    tbl, truth = synth_gif_table(6, return_frames=True)
    out = (
        sample_gif_frames(rd.from_arrow(tbl).repartition(2), every_nth=2)
        .to_pandas().sort_values(["media_id", "frame_index"])
    )
    for i in range(6):
        mid = f"gif_{i:05d}"
        rows = out[out["media_id"] == mid]
        want = list(range(0, len(truth[i]), 2))
        assert rows["frame_index"].tolist() == want
        for _, r in rows.iterrows():
            px = truth[i][int(r["frame_index"])].astype(np.float64)
            assert abs(r["mean_px"] - px.mean()) < 1e-9
            assert abs(r["std_px"] - px.std()) < 1e-9


def test_gif_through_decode_images_stage():
    """image/gif payloads flow through the generic DecodeImages actor
    stage (features from the first composited frame)."""
    from sous_chef_ray.stages.gif import decode_gif
    from sous_chef_ray.stages.multimodal import decode_images, synth_gif_table

    tbl = synth_gif_table(4)
    # DecodeImages expects width/height metadata columns
    first = [decode_gif(p.as_py())[0] for p in tbl["payload"]]
    tbl = tbl.append_column("width", pa.array([f.shape[1] for f in first], pa.int32()))
    tbl = tbl.append_column("height", pa.array([f.shape[0] for f in first], pa.int32()))
    out = decode_images(rd.from_arrow(tbl), fake=False).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    for i in range(4):
        px = first[i].astype(np.float64)
        assert abs(out.loc[i, "mean_px"] - px.mean()) < 1e-9
        assert out.loc[i, "width"] == first[i].shape[1]


def test_kmeans_distributed_recovers_blobs_and_is_partition_invariant():
    """Distributed Lloyd refinement recovers 3 well-separated blobs
    exactly (up to label permutation) and the assignment is invariant to
    input partitioning."""
    from sous_chef_ray.stages.similarity import (
        kmeans_assign,
        kmeans_fit_distributed,
    )

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(3, 8))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X, truth = [], []
    for c in range(3):
        pts = centers[c] + 0.05 * rng.normal(size=(200, 8))
        X.append(pts)
        truth += [c] * 200
    X = np.concatenate(X)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(X)), type=pa.int64()),
        "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
    })

    outs = []
    for parts in (1, 8):
        ds = rd.from_arrow(tbl).repartition(parts)
        cent, n_it = kmeans_fit_distributed(
            ds, emb_col="embedding", n_centroids=3, iters=10,
            sample_rows=50)
        assert cent.shape == (3, 8) and n_it >= 1
        out = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
        outs.append(out["cluster"].to_numpy())

    for got in outs:
        # perfect blob separation up to label permutation
        for c in range(3):
            blob = got[np.array(truth) == c]
            assert (blob == blob[0]).all()
        assert len(set(got[::200])) == 3
    assert (outs[0] == outs[1]).all()


def test_pq_recall_and_compression():
    """Round-5 PQ ANN: ADC over m-byte codes recovers most exact cosine
    neighbors on a clustered corpus; the coded table is m bytes/vector
    (fixed_size_list<uint8>)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.similarity import (knn_brute_force, knn_pq,
                                                 pq_encode, pq_train)

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 24)) * 4
    qpts = centers + rng.standard_normal((8, 24)) * 0.2
    planted = np.concatenate([
        qpts[i] + rng.standard_normal((5, 24)) * 0.05 for i in range(8)
    ])  # each query's true top-5: tight near-duplicates
    noise = np.concatenate([
        centers[i] + rng.standard_normal((120, 24)) * 2.0
        for i in range(8)
    ])
    pts = np.concatenate([qpts, planted, noise]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
        "embedding": pa.array(list(pts), type=pa.list_(pa.float32())),
    })
    q = tbl.slice(0, 8)
    ds = rd.from_arrow(tbl).repartition(4)

    exact = knn_brute_force(ds, q, k=5, concurrency=2)
    approx = knn_pq(ds, q, k=5, m=8, n_codes=32, sample_rows=1200,
                    concurrency=2)
    hits = 0
    for qid in range(8):
        e = set(exact[exact["qid"] == qid]["neighbor_id"])
        a = set(approx[approx["qid"] == qid]["neighbor_id"])
        hits += len(e & a)
    assert hits / (8 * 5) >= 0.7, hits

    books = pq_train(ds, m=8, n_codes=32, sample_rows=1200)
    coded = pq_encode(ds, books, concurrency=2)
    t = pa.concat_tables(coded.iter_batches(batch_size=None,
                                            batch_format="pyarrow"))
    f = t.schema.field("pq_code").type
    assert pa.types.is_fixed_size_list(f) and f.list_size == 8
    assert f.value_type == pa.uint8()
    assert len(t) == len(pts)


def test_semdedup_keeps_one_per_semantic_group():
    """SemDeDup: within-cluster greedy prune keeps exactly the lowest-id
    member of each planted near-duplicate group; far-apart groups are
    untouched; result is partition-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sous_chef_ray.stages.similarity import semdedup

    rng = np.random.default_rng(7)
    d = 16
    # 6 well-separated anchor directions, 5 near-copies of each
    anchors = rng.normal(size=(6, d))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    rows, gids = [], []
    for g, a in enumerate(anchors):
        for _ in range(5):
            v = a + rng.normal(scale=0.01, size=d)  # cosine ~0.9999
            rows.append(v / np.linalg.norm(v))
            gids.append(g)
    vecs = np.asarray(rows)
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })

    def run(nparts):
        out = semdedup(rd.from_arrow(t).repartition(nparts),
                       n_clusters=6, threshold=0.99,
                       sample_rows=30, num_buckets=4).to_pandas()
        return out.sort_values("vec_id").reset_index(drop=True)

    out = run(3)
    gid = np.asarray(gids)
    # contract: within each (semantic group, assigned cluster) exactly
    # ONE member survives and it is the lowest id — dedup happens inside
    # clusters, so a group split across clusters keeps one per cluster
    # (the SemDeDup trade-off), never two inside the same cluster
    for g in range(6):
        sub = out[gid[out["vec_id"]] == g]
        for c, grp in sub.groupby("cluster"):
            kept = grp[grp["keep"]]
            assert len(kept) == 1
            assert kept["vec_id"].iloc[0] == grp["vec_id"].min()
    # clustering pruned most of the 5x redundancy
    assert out["keep"].sum() <= 12
    # dropped rows record a near-1 similarity to their kept twin
    assert (out.loc[~out["keep"], "max_kept_sim"] > 0.99).all()
    # partition invariance
    out2 = run(7)
    assert out.equals(out2)
