"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Ray-side plumbing (schema, actor-pool signature, small batch sizes for
wide binary rows, output layout) is real and tested; the actual codec work
is STUBBED because no image/audio libraries exist in this container —
``decode_images(..., fake=True)`` produces a deterministic fake decode
(shape + checksum features) and ``fake=False`` raises NotImplementedError
at the exact point a real decoder (Pillow/libvips/ffmpeg) would plug in.

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
    """Actor-pool decode stage. Real decoder wiring goes in __init__
    (codec/model load happens once per actor); __call__ handles a small
    batch of binary rows and emits fixed-width feature columns."""

    def __init__(self, fake: bool = True, resize_to: int = 32):
        self.fake = fake
        self.resize_to = resize_to
        if not fake:
            raise NotImplementedError(
                "No image codec in this environment. Plug Pillow/libvips here: "
                "self.decode = PIL.Image.open; keep __call__ unchanged."
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.zeros((len(payloads), 4), dtype=np.float64)
        checksums = []
        for i, p in enumerate(payloads):
            digest = hashlib.sha1(p).digest()
            checksums.append(digest.hex())
            # deterministic fake "pixel statistics" from the byte stream
            arr = np.frombuffer(p, dtype=np.uint8)
            feats[i] = [arr.mean(), arr.std(), arr.min(), arr.max()] if len(arr) else [0, 0, 0, 0]
        out = pa.table(
            {
                "media_id": batch["media_id"],
                "width": batch["width"],
                "height": batch["height"],
                "checksum": pa.array(checksums, type=pa.string()),
                "mean_px": pa.array(feats[:, 0]),
                "std_px": pa.array(feats[:, 1]),
                "min_px": pa.array(feats[:, 2]),
                "max_px": pa.array(feats[:, 3]),
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
