"""Minimal pure-stdlib PNG codec (zlib + numpy — no Pillow/libvips).

Supports 8-bit RGB (color type 2) and grayscale (color type 0),
non-interlaced — enough to make the multimodal decode stage REAL in an
environment with no image libraries: the bytes on the wire are genuine
PNG files, and decode reconstructs exact pixels (all five PNG scanline
filters implemented; None/Sub/Up vectorized, Average/Paeth per-pixel —
encoders here only emit filter 0, other producers' files still decode).

PNG spec is public (RFC 2083 / W3C PNG). Encoder exists for tests and
synthetic data generation; decoder is the production path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 → PNG bytes (filter 0 scanlines)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        color_type, channels = 0, 1
        body = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        color_type, channels = 2, 3
        body = arr
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = body.reshape(h, w * channels)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    rows = raw.reshape(h, 1 + stride)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        f = filters[y]
        line = data[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:  # None
            out[y] = line
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-ch] → per-channel cumsum
            out[y] = line
            cols = out[y].reshape(w, ch)
            np.cumsum(cols, axis=0, out=cols)
            out[y] = cols.reshape(-1)
        elif f == 2:  # Up
            out[y] = line + prev
        elif f == 3:  # Average (sequential in x; mask per element — the
            # floor-shift is not linear mod 256, operands must be recon bytes)
            for x in range(stride):
                left = out[y, x - ch] if x >= ch else 0
                out[y, x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth (sequential in x; same per-element masking)
            for x in range(stride):
                a = out[y, x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                out[y, x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] &= 0xFF  # None/Sub/Up paths: modular sums mask correctly here
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) or (H, W) uint8. Raises ValueError on
    unsupported variants (palette, 16-bit, interlaced, alpha)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color_type not in (0, 2) or interlace:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth} color={color_type} "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR")
    ch = 3 if color_type == 2 else 1
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if len(raw) != h * (1 + w * ch):
        raise ValueError("PNG payload size mismatch")
    px = _unfilter(raw, h, w, ch)
    return px.reshape(h, w, ch)[:, :, 0] if ch == 1 else px.reshape(h, w, ch)


def nn_resize(img: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbor resize to (size, size) — numpy index trick."""
    h, w = img.shape[:2]
    yi = (np.arange(size) * h // size).clip(0, h - 1)
    xi = (np.arange(size) * w // size).clip(0, w - 1)
    return img[yi][:, xi]
