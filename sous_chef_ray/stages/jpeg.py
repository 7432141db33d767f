"""Minimal pure-stdlib baseline JPEG codec (numpy — no Pillow/libjpeg).

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0), standard or custom
DQT/DHT tables, restart markers (DRI/RSTn). Progressive (SOF2) and
arithmetic coding raise NotImplementedError — the declared boundary.

Encoder exists for tests and synthetic-fixture generation: 4:4:4 (or
grayscale), Annex-K quantization tables scaled by a quality factor,
standard Huffman tables. The bytes on the wire are genuine JFIF files
(verified against DCT round-trip pixel tolerances in tests).

The JPEG spec is public (ITU-T T.81 / ISO 10918-1); the constant tables
below are its Annex K examples. Follows the pattern of stages/png.py:
pure stdlib + numpy, vectorized where it matters (batched IDCT/DCT,
vectorized byte unstuffing), per-symbol Huffman loop only.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables ---------------------------------------------------------

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II matrix C: forward F = C @ B @ C.T, inverse
    B = C.T @ F @ C."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0) / 2.0
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _canonical_codes(bits, vals):
    """JPEG canonical Huffman assignment → {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits, vals):
    """16-bit-peek LUT: lut_sym[peek16] = symbol, lut_len[peek16] = bits
    consumed (0 where no code matches)."""
    lut_sym = np.zeros(1 << 16, dtype=np.int16)
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut_sym[lo:hi] = vals[k]
            lut_len[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return lut_sym, lut_len


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# --- encoder ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if not length:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim (no stuffing); caller must have
        padded to a byte boundary."""
        assert self.nbits == 0
        self.buf += b

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


def _magnitude(v: int):
    """(category, raw bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_blocks(writer, blocks_zz, dc_tbl, ac_tbl, pred: int) -> int:
    """Huffman-encode zigzag-quantized blocks (n, 64); returns new DC pred."""
    for blk in blocks_zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s, bits = _magnitude(diff)
        code, ln = dc_tbl[s]
        writer.put(code, ln)
        writer.put(bits, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tbl[0xF0]  # ZRL
                writer.put(code, ln)
                run -= 16
            s, bits = _magnitude(v)
            code, ln = ac_tbl[(run << 4) | s]
            writer.put(code, ln)
            writer.put(bits, s)
            run = 0
        if last < 63:
            code, ln = ac_tbl[0x00]  # EOB
            writer.put(code, ln)
    return pred


def _component_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) → zigzag-quantized int32
    blocks (n, 64), raster block order. Batched DCT, no Python math."""
    h, w = plane.shape
    b = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8).astype(np.float64) - 128.0
    )
    f = np.einsum("ux,nxy,vy->nuv", _C, b, _C)
    qt_nat = qt.reshape(8, 8)
    q = np.round(f / qt_nat).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) RGB or (H, W) grayscale uint8 → baseline JFIF bytes.
    ``subsampling``: "4:4:4" or "4:2:0" (2×2 box-mean chroma);
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if not gray and arr.shape[2] != 3:
        raise ValueError(f"unsupported array shape {arr.shape}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub = subsampling == "4:2:0" and not gray
    hmax = vmax = 2 if sub else 1
    mcu = 8 * hmax
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    padded = np.pad(arr, [(0, ph - h), (0, pw - w)] + ([(0, 0)] if not gray else []),
                    mode="edge")
    if gray:
        raw_planes = [padded.astype(np.float64)]
    else:
        rgb = padded.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub:  # 2×2 box-mean chroma downsample
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        raw_planes = [y, cb, cr]
    planes = [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in raw_planes]

    qt_l = _scale_qt(QT_LUM, quality)
    qt_c = _scale_qt(QT_CHROM, quality)
    qts = [qt_l] if gray else [qt_l, qt_c]
    qt_of = [0] if gray else [0, 1, 1]
    hv = [(1, 1)] if gray else ([(2, 2), (1, 1), (1, 1)] if sub else
                                [(1, 1), (1, 1), (1, 1)])
    mcus_x, mcus_y = pw // mcu, ph // mcu

    # _component_blocks divides by the NATURAL-order table; the Annex-K
    # arrays above are natural-order (DQT emission zigzags them).
    # Block arrays are raster order within each component's own grid.
    blocks = [_component_blocks(p, qts[qt_of[i]]) for i, p in enumerate(planes)]
    bws = [mcus_x * hv[i][0] for i in range(len(planes))]

    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)
    tbls = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    writer = _BitWriter()
    preds = [0] * len(planes)
    n_mcu = mcus_x * mcus_y
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            writer.pad_to_byte()
            writer.raw(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            preds = [0] * len(planes)
        my, mx = divmod(m, mcus_x)
        for ci in range(len(planes)):
            ch, cv = hv[ci]
            for v in range(cv):
                for hh in range(ch):
                    bi = (my * cv + v) * bws[ci] + (mx * ch + hh)
                    preds[ci] = _encode_blocks(
                        writer, blocks[ci][bi:bi + 1], *tbls[ci], preds[ci]
                    )
    scan = writer.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for tq, qt in enumerate(qts):
        out += seg(0xDB, bytes([tq]) + bytes(qt[ZIGZAG].astype(np.uint8)))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        ch, cv = hv[cid - 1]
        sof += bytes([cid, (ch << 4) | cv, qt_of[cid - 1]])
    out += seg(0xC0, sof)
    for tc_th, bits, vals in (
        ((0x00, DC_LUM_BITS, DC_LUM_VALS),) + ((0x10, AC_LUM_BITS, AC_LUM_VALS),)
        + (() if gray else (
            (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
            (0x11, AC_CHROM_BITS, AC_CHROM_VALS),
        ))
    ):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += b"\x00\x3F\x00"
    out += seg(0xDA, sos)
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy byte array."""

    def __init__(self, data: np.ndarray):
        self.data = data
        self.pos = 0  # bit position

    def peek16(self) -> int:
        byte = self.pos >> 3
        chunk = self.data[byte:byte + 4].tobytes().ljust(4, b"\x00")
        word = int.from_bytes(chunk, "big")
        return (word >> (16 - (self.pos & 7))) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _parse_segments(data: bytes):
    """Yield (marker, payload_bytes, next_offset) for header segments;
    stops after SOS returning the scan start offset."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return
        (size,) = struct.unpack(">H", data[pos + 2:pos + 4])
        payload = data[pos + 4:pos + 2 + size]
        pos += 2 + size
        yield marker, payload, pos
        if marker == 0xDA:
            return


def _unstuff_scan(data: bytes, start: int):
    """Entropy-coded bytes from ``start``: remove 0x00 after 0xFF, split
    at RSTn markers. Returns list of np.uint8 segments (one per restart
    interval). Vectorized: one pass of numpy masks."""
    raw = np.frombuffer(data, dtype=np.uint8)[start:]
    ff = np.nonzero(raw == 0xFF)[0]
    end = len(raw)
    rst_at = []
    drop = np.zeros(len(raw), dtype=bool)
    for i in ff:
        if i + 1 >= len(raw):
            end = min(end, i)
            break
        nxt = raw[i + 1]
        if nxt == 0x00:
            drop[i + 1] = True  # stuffed zero
        elif 0xD0 <= nxt <= 0xD7:
            rst_at.append(i)
            drop[i] = drop[i + 1] = True
        else:  # real marker (EOI / next scan) — scan ends here
            end = min(end, i)
            break
    keep = ~drop
    keep[end:] = False
    segments = []
    prev = 0
    for r in rst_at:
        if r >= end:
            break
        segments.append(raw[prev:r][keep[prev:r]])
        prev = r + 2
    segments.append(raw[prev:end][keep[prev:end]])
    return segments


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (H, W, 3) RGB uint8 (or (H, W) grayscale).
    Raises NotImplementedError for progressive/arithmetic streams."""
    qts = {}
    huff_dc = {}
    huff_ac = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan_comps = None
    scan_start = None
    for marker, payload, nxt in _parse_segments(data):
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = zz
                qts[tq] = nat
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_lut(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = payload[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported SOF marker 0xFF{marker:02X} (progressive/"
                "extended/arithmetic); baseline sequential only"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = []
            for ci in range(ns):
                cid, tdta = payload[1 + ci * 2:3 + ci * 2]
                scan_comps.append({"id": cid, "td": tdta >> 4, "ta": tdta & 0xF})
            scan_start = nxt
    if comps is None or scan_start is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan_comps]
    for c, s in zip(order, scan_comps):
        c["td"], c["ta"] = s["td"], s["ta"]
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["bh"] = mcus_y * c["v"]
        c["zz"] = np.zeros((c["bw"] * c["bh"], 64), dtype=np.int32)

    segments = _unstuff_scan(data, scan_start)
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = {c["id"]: 0 for c in comps}
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c in order:
            dc_sym, dc_len = huff_dc[c["td"]]
            ac_sym, ac_len = huff_ac[c["ta"]]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int32)
                    p16 = reader.peek16()
                    s = int(dc_sym[p16])
                    ln = int(dc_len[p16])
                    if ln == 0:
                        raise ValueError("bad Huffman code (DC)")
                    reader.skip(ln)
                    diff = _extend(reader.read(s), s) if s else 0
                    preds[c["id"]] += diff
                    blk[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        p16 = reader.peek16()
                        rs = int(ac_sym[p16])
                        ln = int(ac_len[p16])
                        if ln == 0:
                            raise ValueError("bad Huffman code (AC)")
                        reader.skip(ln)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _extend(reader.read(s), s)
                        k += 1
                    bx = mx * c["h"] + hh
                    by = my * c["v"] + v
                    c["zz"][by * c["bw"] + bx] = blk

    # batched dequantize + inverse zigzag + IDCT per component
    planes = []
    for c in order:
        qt = qts[c["tq"]]
        nat = np.zeros_like(c["zz"])
        nat[:, ZIGZAG] = c["zz"]
        f = (nat * qt).reshape(-1, 8, 8).astype(np.float64)
        b = np.einsum("xu,nuv,yv->nxy", _C.T, f, _C.T) + 128.0
        bw, bh = c["bw"], c["bh"]
        plane = (
            b.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample subsampled chroma to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[: h, : w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
