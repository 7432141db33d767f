"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Image decode is REAL for PNG and baseline JPEG: ``stages/png.py`` is a
pure-stdlib (zlib + numpy) PNG codec and ``stages/jpeg.py`` a pure-numpy
baseline JFIF codec (Huffman + IDCT, 4:4:4 / 4:2:0, restart markers), so
``decode_images(..., fake=False)`` decodes genuine payloads to pixels
and emits true pixel statistics + thumbnails with zero external
dependencies. Remaining codecs (progressive JPEG, video) are a declared
stub: ``mime`` values without a decoder raise NotImplementedError at the
exact plug-in point (Pillow/libvips/ffmpeg). ``fake=True`` keeps the
deterministic byte-stream fake for tests that don't care about pixels.

Design notes for 100 TB: binary payloads dominate block size — these
stages run with small ``batch_size`` and ``target_max_block_size`` should
be raised so Ray doesn't split blocks absurdly small; decode is an actor
pool so codec setup happens once per actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from sous_chef_ray.stages._util import pool

IMAGE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("payload", pa.large_binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def synth_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake binary payloads with typed metadata."""
    rng = np.random.default_rng(seed)
    widths = rng.integers(16, 256, n).astype(np.int32)
    heights = rng.integers(16, 256, n).astype(np.int32)
    payloads = [rng.integers(0, 256, int(w) * int(h) // 64, dtype=np.uint8).tobytes()
                for w, h in zip(widths, heights)]
    return pa.table(
        {
            "media_id": pa.array([f"img{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(["image/fake"] * n),
            "width": pa.array(widths),
            "height": pa.array(heights),
        }
    )


class DecodeImages:
    """Actor-pool decode stage. Decoder wiring goes in __init__
    (codec/model load happens once per actor); __call__ handles a small
    batch of binary rows and emits fixed-width feature columns.

    ``fake=False``: real decode — PNG payloads (mime image/png) through
    the pure-stdlib codec in stages/png.py, baseline JPEG (image/jpeg)
    through stages/jpeg.py; any other mime raises NotImplementedError
    (the declared stub boundary for codecs this container lacks).
    ``fake=True``: deterministic byte-stream fake."""

    def __init__(self, fake: bool = True, resize_to: int = 32):
        self.fake = fake
        self.resize_to = resize_to
        if not fake:
            from sous_chef_ray.stages.gif import decode_gif
            from sous_chef_ray.stages.jpeg import decode_jpeg
            from sous_chef_ray.stages.png import decode_png, nn_resize

            self.decoders = {
                "image/png": decode_png,
                "image/jpeg": decode_jpeg,
                # animated GIF: image features come from the FIRST frame
                # (frame-level access goes through sample_gif_frames)
                "image/gif": lambda p: decode_gif(p)[0],
            }
            self.resize = nn_resize

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        n = len(payloads)
        feats = np.zeros((n, 4), dtype=np.float64)
        widths = np.zeros(n, dtype=np.int32)
        heights = np.zeros(n, dtype=np.int32)
        checksums = []
        thumbs: list = []
        for i, (p, mime) in enumerate(zip(payloads, mimes)):
            checksums.append(hashlib.sha1(p).digest().hex())
            if self.fake:
                arr = np.frombuffer(p, dtype=np.uint8)
                feats[i] = (
                    [arr.mean(), arr.std(), arr.min(), arr.max()]
                    if len(arr) else [0, 0, 0, 0]
                )
                widths[i] = batch["width"][i].as_py()
                heights[i] = batch["height"][i].as_py()
                thumbs.append(b"")
                continue
            dec = self.decoders.get(mime)
            if dec is None:
                raise NotImplementedError(
                    f"no decoder for {mime!r} in this environment; plug "
                    "Pillow/libvips/ffmpeg into DecodeImages.decoders"
                )
            img = dec(p)
            px = img.astype(np.float64)
            feats[i] = [px.mean(), px.std(), px.min(), px.max()]
            heights[i], widths[i] = img.shape[0], img.shape[1]
            thumbs.append(self.resize(img, self.resize_to).tobytes())
        out = pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(widths),
                "height": pa.array(heights),
                "checksum": pa.array(checksums, type=pa.string()),
                "mean_px": pa.array(feats[:, 0]),
                "std_px": pa.array(feats[:, 1]),
                "min_px": pa.array(feats[:, 2]),
                "max_px": pa.array(feats[:, 3]),
                "thumbnail": pa.array(thumbs, type=pa.large_binary()),
            }
        )
        return out


def decode_images(
    ds: "rd.Dataset",
    fake: bool = True,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
) -> "rd.Dataset":
    """Binary image column → per-image feature row (fake decode)."""
    return ds.map_batches(
        DecodeImages,
        fn_constructor_kwargs=dict(fake=fake),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,  # small: payload rows are wide
        concurrency=pool(concurrency),
    )


def sample_frames(
    ds: "rd.Dataset",
    every_nth: int = 10,
    concurrency: int | tuple = 2,
    batch_size: int = 16,
) -> "rd.Dataset":
    """Frame-sampling plumbing for video rows: treats the payload as a
    frame container, emits one row per sampled frame index. Decode is the
    same stub boundary as DecodeImages."""

    def fn(t: pa.Table) -> pa.Table:
        ids, frames, offs = [], [], []
        for mid, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            n_frames = max(1, len(p) // 1024)  # fake container index
            for f in range(0, n_frames, every_nth):
                ids.append(mid)
                frames.append(f)
                offs.append(f * 1024)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "frame_index": pa.array(frames, type=pa.int32()),
                "byte_offset": pa.array(offs, type=pa.int64()),
            }
        )

    # plain function → task pool; concurrency must be an int cap
    cap = concurrency if isinstance(concurrency, int) else max(concurrency)
    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        concurrency=cap,
    )


class SampleGifFrames:
    """REAL frame sampling over animated-GIF payloads: actor-pool stage
    (codec import once per actor), decodes each payload's composited
    frames through stages/gif.py and emits one feature row per sampled
    frame — the genuine multi-frame path the fake container in
    sample_frames stands in for when the format has no local codec."""

    def __init__(self, every_nth: int = 2):
        from sous_chef_ray.stages.gif import decode_gif

        self.decode = decode_gif
        self.every_nth = every_nth

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, means, stds = [], [], [], []
        for mid, p in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            frames = self.decode(p)
            for f in range(0, len(frames), self.every_nth):
                px = frames[f].astype(np.float64)
                ids.append(mid)
                fidx.append(f)
                means.append(px.mean())
                stds.append(px.std())
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "frame_index": pa.array(fidx, type=pa.int32()),
                "mean_px": pa.array(means, type=pa.float64()),
                "std_px": pa.array(stds, type=pa.float64()),
            }
        )


def sample_gif_frames(
    ds: "rd.Dataset",
    every_nth: int = 2,
    concurrency: int | tuple = 2,
    batch_size: int = 16,
) -> "rd.Dataset":
    """Animated-GIF payload column → one row per sampled decoded frame."""
    return ds.map_batches(
        SampleGifFrames,
        fn_constructor_kwargs=dict(every_nth=every_nth),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=pool(concurrency),
    )


def synth_gif_table(n: int, seed: int = 42, return_frames: bool = False):
    """Deterministic REAL animated-GIF payloads (encoded with
    stages/gif.py, real LZW) with typed metadata."""
    from sous_chef_ray.stages.gif import encode_gif

    rng = np.random.default_rng(seed)
    payloads, mids, n_frames, pixel_truth = [], [], [], []
    for i in range(n):
        h = int(rng.integers(8, 24))
        w = int(rng.integers(8, 24))
        k = int(rng.integers(2, 6))
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        frames = [rng.integers(0, 16, (h, w)).astype(np.uint8) for _ in range(k)]
        payloads.append(encode_gif(frames, palette=pal))
        mids.append(f"gif_{i:05d}")
        n_frames.append(k)
        if return_frames:
            pixel_truth.append([pal[f] for f in frames])
    tbl = pa.table(
        {
            "media_id": pa.array(mids, type=pa.string()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(["image/gif"] * n),
            "n_frames": pa.array(n_frames, type=pa.int32()),
        }
    )
    return (tbl, pixel_truth) if return_frames else tbl


def synth_png_table(n: int, seed: int = 42, return_pixels: bool = False):
    """Deterministic REAL PNG payloads (encoded with stages/png.py) with
    typed metadata — the multimodal fixture for true decode tests."""
    from sous_chef_ray.stages.png import encode_png

    rng = np.random.default_rng(seed)
    widths = rng.integers(16, 96, n).astype(np.int32)
    heights = rng.integers(16, 96, n).astype(np.int32)
    pixels = [
        rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8)
        for w, h in zip(widths, heights)
    ]
    tbl = pa.table(
        {
            "media_id": pa.array([f"img{i:06d}" for i in range(n)]),
            "payload": pa.array([encode_png(p) for p in pixels],
                                type=pa.large_binary()),
            "mime": pa.array(["image/png"] * n),
            "width": pa.array(widths),
            "height": pa.array(heights),
        }
    )
    return (tbl, pixels) if return_pixels else tbl


def synth_jpeg_table(n: int, seed: int = 42, return_pixels: bool = False):
    """Deterministic REAL baseline-JPEG payloads (encoded with
    stages/jpeg.py) — smooth gradients so the lossy roundtrip stays
    within tight pixel tolerances; alternates 4:4:4 and 4:2:0."""
    from sous_chef_ray.stages.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    widths = rng.integers(16, 96, n).astype(np.int32)
    heights = rng.integers(16, 96, n).astype(np.int32)
    pixels = []
    for w, h in zip(widths, heights):
        yy, xx = np.mgrid[0:int(h), 0:int(w)]
        phase = rng.uniform(0, 6.0, 3)
        img = np.stack([
            128 + 100 * np.sin(xx / 11 + phase[0]),
            128 + 100 * np.cos(yy / 13 + phase[1]),
            128 + 100 * np.sin((xx + yy) / 17 + phase[2]),
        ], axis=-1).clip(0, 255).astype(np.uint8)
        pixels.append(img)
    payloads = [
        encode_jpeg(p, quality=92, subsampling="4:2:0" if i % 2 else "4:4:4")
        for i, p in enumerate(pixels)
    ]
    tbl = pa.table(
        {
            "media_id": pa.array([f"img{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(["image/jpeg"] * n),
            "width": pa.array(widths),
            "height": pa.array(heights),
        }
    )
    return (tbl, pixels) if return_pixels else tbl


def decode_wav(data: bytes):
    """Minimal RIFF/WAVE PCM parser (pure stdlib): returns
    (samples float64 in [-1,1] shaped (n, channels), sample_rate)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (fmt={audio_fmt} bits={bits})")
    if bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels), rate


def encode_wav(samples: "np.ndarray", rate: int = 16000) -> bytes:
    """(n, channels) float64 in [-1,1] → 16-bit PCM WAV bytes (tests)."""
    import struct

    samples = np.atleast_2d(np.asarray(samples, dtype=np.float64))
    if samples.shape[0] < samples.shape[1]:
        samples = samples.T
    n, ch = samples.shape
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


class DecodeAudio:
    """Actor-pool WAV decode: true duration / RMS / peak per clip."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rms, peak, rates = [], [], [], []
        for p in batch["payload"].to_pylist():
            x, rate = decode_wav(p)
            durs.append(len(x) / rate)
            rms.append(float(np.sqrt((x ** 2).mean())) if len(x) else 0.0)
            peak.append(float(np.abs(x).max()) if len(x) else 0.0)
            rates.append(rate)
        return pa.table({
            "media_id": batch["media_id"],
            "sample_rate": pa.array(rates, type=pa.int32()),
            "duration_sec": pa.array(durs, type=pa.float64()),
            "rms": pa.array(rms, type=pa.float64()),
            "peak": pa.array(peak, type=pa.float64()),
        })


def decode_audio(ds: "rd.Dataset", concurrency: int | tuple = 2,
                 batch_size: int = 64) -> "rd.Dataset":
    return ds.map_batches(
        DecodeAudio, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=pool(concurrency),
    )
