"""Minimal pure-stdlib GIF codec (LZW + numpy — no Pillow/ffmpeg).

Decodes GIF87a/GIF89a: global/local color tables, interlaced images,
multi-frame animations with graphic-control transparency and
restore-to-background disposal — enough to make the multimodal
FRAME-SAMPLING stage real: the bytes on the wire are genuine animated
GIFs and decode reconstructs exact composited RGB frames. The GIF
spec is public (CompuServe GIF89a specification, 1990).

Encoder exists for tests and synthetic data: it emits a CLEAR code
before every pixel code so the LZW dictionary never grows — valid
(if uncompressed) LZW any conforming decoder accepts, and it keeps
the encoder ~20 lines. The decoder is the production path and
implements the full growing-dictionary algorithm.

Follows the stages/png.py pattern (see that module's docstring for
the decode-stage wiring rationale); reference has no multimodal
counterpart (control-plane only, `/root/reference/src` throughout).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index array of length n_pixels."""
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader: GIF packs codes LSB-first
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8)[:, None], axis=1, bitorder="little"
    ).ravel()
    pos = 0
    total = len(bits)

    out = bytearray()
    table: list[bytes] = []
    code_size = next_code = running = 0

    def reset_table():
        nonlocal table, code_size, next_code, running
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1
        next_code = end + 1
        running = end + 1

    reset_table()
    prev: bytes | None = None

    while pos + code_size <= total and len(out) < n_pixels:
        code = 0
        for i in range(code_size):
            code |= int(bits[pos + i]) << i
        pos += code_size
        if code == clear:
            reset_table()
            prev = None
            continue
        if code == end:
            break
        if code < next_code and (code < clear or code >= end + 1):
            entry = table[code]
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        prev = entry
        # width timing counts CODES CONSUMED (giflib's RunningCode), not
        # entries added — the decoder's table lags the encoder's by one,
        # so an entries-based bump desynchronizes one code early
        running += 1
        if running >= (1 << code_size) and code_size < 12:
            code_size += 1
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode_trivial(indices: np.ndarray, min_code_size: int) -> bytes:
    """CLEAR before every literal code — dictionary never grows, so the
    code width is fixed at min_code_size+1. Valid LZW, zero compression."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    codes = np.empty(2 * len(indices) + 2, dtype=np.int64)
    codes[0] = clear
    codes[1:-1:2] = indices
    codes[2:-1:2] = clear
    codes[-1] = end
    # pack LSB-first
    bit_arr = ((codes[:, None] >> np.arange(width)) & 1).astype(np.uint8)
    packed = np.packbits(bit_arr.ravel(), bitorder="little")
    return packed.tobytes()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _lzw_encode_full(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real greedy-longest-match GIF LZW (growing dictionary, width
    bumps, clear at 4096) — exercises the decoder's production path."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()

    def fresh():
        return {bytes([i]): i for i in range(clear)}, min_code_size + 1, end + 1

    table, width, nxt = fresh()
    bw.write(clear, width)
    w = b""
    for c in indices.ravel().tobytes():
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        bw.write(table[w], width)
        table[wc] = nxt
        nxt += 1
        # mirror the decoder's bump rule exactly: it widens after its
        # next_code (== this nxt) reaches 1 << code_size
        if nxt >= (1 << width) and width < 12:
            width += 1
        if nxt >= 4096:
            bw.write(clear, width)
            table, width, nxt = fresh()
            w = bytes([c])
            continue
        w = bytes([c])
    if w:
        bw.write(table[w], width)
    bw.write(end, width)
    return bw.done()


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# Encode (tests / synthetic data)
# ---------------------------------------------------------------------------

def encode_gif(
    frames: "list[np.ndarray] | np.ndarray",
    palette: np.ndarray | None = None,
    delay_cs: int = 4,
    interlace: bool = False,
    trivial_lzw: bool = False,
    transparent_idx: int | None = None,
) -> bytes:
    """frames: list of (H, W) uint8 PALETTE-INDEX arrays (all same
    shape); palette: (n≤256, 3) uint8 RGB (default 256-gray ramp).
    ``trivial_lzw=True`` emits the clear-per-symbol stream (tests the
    decoder's fixed-width path; default is the real compressor)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    n_colors = len(palette)
    gct_bits = max(1, int(np.ceil(np.log2(max(2, n_colors)))))
    pal = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    pal[:n_colors] = palette
    min_code = max(2, gct_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1), 0, 0)
    out += pal.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(b"\x01\x00\x00")[:-1] + b"\x00"
    for fr in frames:
        assert fr.shape == (h, w)
        gce_flags = 1 if transparent_idx is not None else 0
        out += b"\x21\xf9" + _sub_blocks(
            struct.pack("<BHB", gce_flags, delay_cs, transparent_idx or 0))
        packed = (0x40 if interlace else 0)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, packed)
        idx = fr
        if interlace:
            rows = [idx[start::step] for start, step in _INTERLACE_PASSES]
            idx = np.concatenate(rows, axis=0)
        out.append(min_code)
        enc = _lzw_encode_trivial if trivial_lzw else _lzw_encode_full
        out += _sub_blocks(enc(idx.ravel(), min_code))
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def decode_gif(data: bytes) -> "list[np.ndarray]":
    """GIF bytes → list of (H, W, 3) uint8 COMPOSITED RGB frames
    (transparency resolved against the running canvas; disposal
    none/keep and restore-to-background supported)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, bg_idx, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    frames: list[np.ndarray] = []
    transparent_idx = -1
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload = bytearray()
            while data[pos]:
                ln = data[pos]
                payload += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # terminator
            if label == 0xF9 and len(payload) >= 4:
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent_idx = payload[3] if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(lzw), min_code, fw * fh).reshape(-1)
        if len(idx) < fw * fh:
            idx = np.pad(idx, (0, fw * fh - len(idx)))
        idx = idx.reshape(fh, fw)
        if fpacked & 0x40:  # deinterlace
            out_rows = np.empty((fh, fw), dtype=np.uint8)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, fh, step))
                out_rows[start::step] = idx[src:src + n_rows]
                src += n_rows
            idx = out_rows
        region = canvas[top:top + fh, left:left + fw]
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent_idx >= 0:
            opaque = idx != transparent_idx
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            bg = ct[bg_idx] if bg_idx < len(ct) else 0
            canvas[top:top + fh, left:left + fw] = bg
        transparent_idx = -1
        disposal = 0
    return frames
