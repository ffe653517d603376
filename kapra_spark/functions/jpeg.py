"""Baseline JPEG codec in pure stdlib + NumPy (ITU-T T.81).

The container has no image codec libraries, so — like the PNG/WAV/AVI
codecs in ``operators/multimodal.py`` — this implements the published
algorithm from scratch: 8x8 type-II DCT, Annex-K quantization tables
with the IJG quality scaling, zigzag + (run, size) entropy coding with
canonical Huffman tables, JFIF markers, byte stuffing, and restart
markers.  Everything here is public knowledge: ITU-T T.81 (the JPEG
spec, incl. Annex K's example tables), the JFIF 1.02 note, and the
IJG/libjpeg quality->scale formula.

Scope (honestly bounded):

- **Encoder**: baseline sequential, 8-bit, grayscale or YCbCr 4:4:4 /
  4:2:0, optional restart interval.  Emits SOI/APP0/DQT/SOF0/DHT/
  [DRI]/SOS/EOI with the standard tables.
- **Decoder**: baseline sequential (SOF0/SOF1), 8-bit, 1- or
  3-component scans, any sampling factors in {1, 2} (4:4:4, 4:2:2,
  4:2:0, ...), restart markers, 8- or 16-bit DQT.  Progressive
  (SOF2), arithmetic coding, 12-bit precision, and hierarchical modes
  raise ``NotImplementedError`` loudly.
- **MJPG quirk**: motion-JPEG AVI frames routinely omit DHT segments
  (the OpenDML spec says decoders must assume the Annex-K tables);
  ``jpeg_decode`` falls back to those tables when a scan references an
  undefined one.

Used by ``operators/multimodal.py`` to extend ``avi_decode`` /
``avi_encode`` to MJPG streams; reference parity context:
/root/reference has no media path at all — this is engine surface for
the training-data pipeline (SURVEY.md §2.12).
"""
from __future__ import annotations

import struct

import numpy as np

# --- Annex K example tables (ITU-T T.81, public) ---------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64).reshape(8, 8)

# (bits-per-length[1..16], symbol values) — K.3..K.6
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Orthonormal 8x8 DCT-II matrix: coefs = D @ block @ D.T
_k = np.arange(8.0)
DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
DCT_M[0, :] = 1.0 / np.sqrt(8.0)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG/libjpeg quality scaling (public): q<50 -> 5000/q, else
    200-2q; table = clip((base*scale+50)/100, 1, 255)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = np.floor((base * scale + 50) / 100)
    return np.clip(t, 1, 255)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, i = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-by-bit decoder."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


_LUT_CACHE: dict[tuple, list] = {}


def _decode_lut(bits: list[int], vals: list[int]) -> list:
    """Flat 65536-entry decode table: the 16-bit peek window indexes
    straight to (symbol, code_length) — one list read per symbol
    instead of a shortest-prefix walk. Prefix-free canonical codes
    partition the index space exactly, so unfilled slots mean an
    invalid code. Cached per (bits, vals) — MJPG streams reuse the
    Annex-K tables across every frame."""
    key = (tuple(bits), tuple(vals))
    lut = _LUT_CACHE.get(key)
    if lut is None:
        if len(_LUT_CACHE) >= 64:
            # bound the cache (~1 MB/entry): evict oldest — a long-lived
            # executor decoding many distinct optimized-Huffman streams
            # must not grow without limit
            _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
        lut = [None] * 65536
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                entry = (vals[k], ln)
                k += 1
                start = code << (16 - ln)
                lut[start:start + (1 << (16 - ln))] = \
                    [entry] * (1 << (16 - ln))
                code += 1
            code <<= 1
        _LUT_CACHE[key] = lut
    return lut


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0xFF, 8 - self.nbits)  # pad with 1s to byte edge


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, value bits) for DC diffs / AC coefs (F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw: _BitWriter, coefs: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-encode one zigzagged, quantized 64-coef block; returns
    the new DC predictor."""
    dc = int(coefs[0])
    size, bits = _magnitude(dc - pred)
    c, ln = dc_codes[size]
    bw.write(c, ln)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(coefs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return dc


def _plane_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a (bh*8, bw*8) plane -> (bh*bw, 64) zigzagged
    quantized int32 coefs, DCT done as one batched matmul."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    coefs = DCT_M @ blocks @ DCT_M.T
    q = np.round(coefs / qtbl).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _pad_edge(plane: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return np.pad(plane, ((0, h8 - plane.shape[0]),
                          (0, w8 - plane.shape[1])), mode="edge")


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601 (float64, same shape)."""
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def jpeg_encode(img: np.ndarray, quality: int = 75,
                subsample: str = "444", restart_interval: int = 0,
                include_dht: bool = True) -> bytes:
    """Encode a (H, W, 3) uint8 RGB or (H, W) grayscale array as a
    baseline JFIF JPEG.

    ``subsample``: "444" (no chroma subsampling) or "420" (2x2 box
    mean on Cb/Cr — the common MJPG/photo layout, exercises the
    decoder's interleaved-MCU path).  ``restart_interval``: MCUs per
    restart segment (0 = none).  ``include_dht=False`` omits the DHT
    segments — the MJPG-in-AVI convention where the Annex-K tables are
    implied (OpenDML)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3), got {img.shape}")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qly = _scaled_quant(QUANT_LUMA, quality)
    qlc = _scaled_quant(QUANT_CHROMA, quality)

    if gray:
        comps = [(img.astype(np.float64), 1, 1, qly, 0)]
    else:
        ycc = rgb_to_ycbcr(img)
        if subsample == "444":
            comps = [(ycc[..., 0], 1, 1, qly, 0),
                     (ycc[..., 1], 1, 1, qlc, 1),
                     (ycc[..., 2], 1, 1, qlc, 1)]
        else:
            # 2x2 box mean; odd edges padded by replication first
            he, we = h + (h % 2), w + (w % 2)
            full = np.pad(ycc, ((0, he - h), (0, we - w), (0, 0)),
                          mode="edge")
            cb = full[..., 1].reshape(he // 2, 2, we // 2, 2).mean((1, 3))
            cr = full[..., 2].reshape(he // 2, 2, we // 2, 2).mean((1, 3))
            comps = [(ycc[..., 0], 2, 2, qly, 0),
                     (cb, 1, 1, qlc, 1),
                     (cr, 1, 1, qlc, 1)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # Per component: pad plane to the MCU grid, DCT+quantize all blocks
    comp_blocks, comp_bw = [], []
    for plane, hi, vi, qtbl, _tid in comps:
        bw_i, bh_i = mcux * hi, mcuy * vi
        padded = _pad_edge(plane, bh_i * 8, bw_i * 8)
        comp_blocks.append(_plane_blocks(padded, qtbl).reshape(
            bh_i, bw_i, 64))
        comp_bw.append((bw_i, hi, vi))

    dc_tabs = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    ac_tabs = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]

    bw = _BitWriter()
    preds = [0] * len(comps)
    scan = bytearray()
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            scan += bw.out
            scan += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (_plane, hi, vi, _q, tid) in enumerate(comps):
            blocks = comp_blocks[ci]
            for by in range(vi):
                for bx in range(hi):
                    preds[ci] = _encode_block(
                        bw, blocks[my * vi + by, mx * hi + bx],
                        preds[ci], dc_tabs[tid], ac_tabs[tid])
    bw.flush()
    scan += bw.out

    # --- markers ---
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")                      # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00])
               + bytes(qly.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([0x01])
                   + bytes(qlc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for ci, (_p, hi, vi, _q, tid) in enumerate(comps):
        sof += bytes([ci + 1, (hi << 4) | vi, tid])
    out += seg(0xFFC0, bytes(sof))
    if include_dht:
        for cls, tid, (bits, vals) in ((0, 0, DC_LUMA), (1, 0, AC_LUMA),
                                       (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)):
            if gray and tid == 1:
                continue
            out += seg(0xFFC4, bytes([(cls << 4) | tid])
                       + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(comps)])
    for ci, (_p, _hi, _vi, _q, tid) in enumerate(comps):
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, bytes(sos))
    out += scan
    out += b"\xFF\xD9"                                # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over an unstuffed entropy segment. Reads go
    through a 16-bit peek window (one int.from_bytes per call instead
    of a per-bit Python loop — ~4x on the decode hot path); peeking
    past the segment end yields zero bits, which cannot form a valid
    code, so truncated streams still fail loudly in _read_huff."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        byte_pos = self.pos >> 3
        chunk = self.data[byte_pos:byte_pos + 4]
        if len(chunk) < 4:
            chunk = chunk + b"\x00" * (4 - len(chunk))
        return (int.from_bytes(chunk, "big")
                >> (16 - (self.pos & 7))) & 0xFFFF

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise IndexError("bit read past end of entropy segment")
        b = self.peek16() >> 15
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise IndexError("bit read past end of entropy segment")
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, size: int) -> int:
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _read_huff(br: _BitReader, lut: list) -> int:
    # flat LUT: prefix-free canonical codes partition the 16-bit peek
    # space, so one list read yields (symbol, length) — identical
    # semantics to the bit-at-a-time walk
    e = lut[br.peek16()]
    if e is None:
        raise ValueError("invalid Huffman code in scan")
    sym, length = e
    if br.pos + length > br.nbits:
        raise IndexError("bit read past end of entropy segment")
    br.pos += length
    return sym


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8: (H, W, 3) RGB for 3-component
    scans, (H, W) for grayscale.  Supports SOF0/SOF1, sampling factors
    in {1, 2}, restart markers, 8/16-bit DQT, and the MJPG missing-DHT
    convention (Annex-K tables assumed).  Progressive / arithmetic /
    12-bit inputs raise ``NotImplementedError``."""
    if len(data) < 4 or data[0:2] != b"\xFF\xD8":
        raise NotImplementedError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    restart = 0
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    scan_comps = None
    scan_start = None

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede the
        # marker id (real muxers emit them); skip to the last 0xFF
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (TEM, RSTn outside a scan): no length
            pos += 2
            continue
        if pos + 4 > len(data):
            break
        (size,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:  # DQT — may hold several tables
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                if pq:
                    vals = np.frombuffer(body[b:b + 128],
                                         dtype=">u2").astype(np.float64)
                    b += 128
                else:
                    vals = np.frombuffer(body[b:b + 64],
                                         dtype=np.uint8).astype(np.float64)
                    b += 64
                qtabs[tq] = vals[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT — may hold several tables
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                htabs[(cls, tid)] = _decode_lut(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} unsupported (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                           body[2 + 2 * i] & 0x0F) for i in range(ns)]
            scan_start = pos
            break
        # APPn / COM / others: skipped

    if frame is None or scan_comps is None:
        raise NotImplementedError("no baseline frame/scan found")
    h, w, comps = frame

    # Entropy segment: unstuff 0xFF00, split on RSTn, stop at other marker
    segments: list[bytes] = []
    cur = bytearray()
    p = scan_start
    while p < len(data):
        b = data[p]
        if b == 0xFF and p + 1 < len(data):
            nxt = data[p + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError(
            f"sampling factors up to 2 supported (got {hmax}x{vmax})")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def huff(cls: int, tid: int) -> dict:
        t = htabs.get((cls, tid))
        if t is None:  # MJPG convention: Annex-K tables implied
            std = {(0, 0): DC_LUMA, (1, 0): AC_LUMA,
                   (0, 1): DC_CHROMA, (1, 1): AC_CHROMA}[(cls, tid)]
            t = htabs[(cls, tid)] = _decode_lut(*std)
        return t

    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    order = []  # (comp index, dc table, ac table, blocks-per-MCU, qtbl)
    planes: list[np.ndarray] = []
    for ci, (cid, dc_id, ac_id) in enumerate(scan_comps):
        hi, vi, tq = by_id[cid]
        if tq not in qtabs:
            raise ValueError(f"missing quant table {tq}")
        planes.append(np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32))
        order.append((ci, huff(0, dc_id), huff(1, ac_id), hi, vi,
                      qtabs[tq]))

    nmcu = mcux * mcuy
    seg_i = 0
    br = _BitReader(segments[0])
    preds = [0] * len(scan_comps)
    for m in range(nmcu):
        if restart and m and m % restart == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("scan ended before all MCUs decoded")
            br = _BitReader(segments[seg_i])
            preds = [0] * len(scan_comps)
        my, mx = divmod(m, mcux)
        for ci, dc_t, ac_t, hi, vi, _q in order:
            for by in range(vi):
                for bx in range(hi):
                    size = _read_huff(br, dc_t)
                    diff = _extend(br.bits(size), size) if size else 0
                    preds[ci] += diff
                    coefs = planes[ci][my * vi + by, mx * hi + bx]
                    coefs[0] = preds[ci]
                    k = 1
                    while k < 64:
                        sym = _read_huff(br, ac_t)
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if run != 15:
                                raise ValueError(f"bad AC symbol {sym:#x}")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coefs[k] = _extend(br.bits(size), size)
                        k += 1

    # Dequantize + batched IDCT per component, then upsample and crop
    out_planes = []
    for (ci, _dc, _ac, hi, vi, qtbl), zz in zip(order, planes):
        bh, bwid = zz.shape[0], zz.shape[1]
        c = np.zeros((bh * bwid, 64), dtype=np.float64)
        c[:, ZIGZAG] = zz.reshape(-1, 64)
        c = c.reshape(-1, 8, 8) * qtbl
        pix = DCT_M.T @ c @ DCT_M + 128.0
        plane = (pix.reshape(bh, bwid, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bwid * 8))
        if hi < hmax or vi < vmax:
            plane = np.repeat(np.repeat(plane, vmax // vi, axis=0),
                              hmax // hi, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) == 3:
        ycc = np.stack(out_planes, axis=-1)
        ycc[..., 0] = np.clip(ycc[..., 0], 0, 255)
        return ycbcr_to_rgb(ycc)
    raise NotImplementedError(
        f"{len(out_planes)}-component JPEG unsupported")
