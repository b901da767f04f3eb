"""Baseline JPEG (JFIF) codec from scratch — the last compressed image
format in the multimodal family (reference scope: pholcus downloads and
stores arbitrary page media; a training-data pipeline must decode it).

No image library exists in this environment, so like the PNG (zlib +
filter reversal) and GIF (from-scratch LZW) codecs in multimodal.py this
is spec-derived: ITU-T T.81 baseline sequential DCT with the Annex K
quantization/Huffman tables, JFIF headers, byte stuffing, restart-marker
handling, 8-bit precision.  Supported honestly:

- encode: grayscale or RGB, 4:4:4 or 4:2:0 chroma subsampling, quality
  1..100 (libjpeg's Annex-K scaling rule), standard Huffman tables;
- decode: baseline SOF0, 1 or 3 components, sampling factors 1..2 (covers
  4:4:4 / 4:2:2 / 4:2:0), custom DQT/DHT from the stream, DRI/RSTn.

Raises NotImplementedError for progressive (SOF2), arithmetic coding,
12-bit, and 4-component (CMYK) streams — stated scope, same contract as
png_decode's palette/interlace guard.

Numerics: encode uses the orthonormal float DCT-II (one matrix multiply
over all blocks at once); decode mirrors it.  The roundtrip is lossy by
construction (quantization); tests pin exact DC-only cases (flat blocks
with quant=1 roundtrip bit-exactly) and bounded error on textured
blocks.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K — public spec tables) -------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# (bits-per-length[1..16], symbol values) for the four standard tables
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: T @ block @ T.T  (and T.T @ coef @ T back)
_DCT_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_T[_k, _n] = (np.sqrt(0.125 if _k == 0 else 0.25)
                          * np.cos(np.pi * (2 * _n + 1) * _k / 16.0))


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's Annex-K scaling: q<50 scales up, q>50 down, clamp 1..255."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _build_huff_encode(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) via the canonical T.81 code assignment."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huff_decode(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol for the bit-serial decoder."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing (T.81 B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise ValueError(
                    f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Skip to and consume the next RSTn marker, resetting bit state
        (unread pad bits / stuffed bytes may precede it)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                if 0xD0 <= d[self.pos + 1] <= 0xD7:
                    self.pos += 2
                    return
                raise ValueError("expected restart marker")
            self.pos += 1
        raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, byte: int):
        self.byte = byte


def _magnitude(v: int) -> tuple[int, int]:
    """(category, offset-coded value) — T.81 F.1.2.1 variable-length ints."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    return cat, v if v > 0 else v + (1 << cat) - 1


def _extend(v: int, cat: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial (level-shifted) -> (n, 8, 8) DCT coefficients."""
    return _DCT_T @ blocks @ _DCT_T.T


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return _DCT_T.T @ coefs @ _DCT_T


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (nby*nbx, 8, 8) with edge replication padding."""
    h, w = plane.shape
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(plane, ((0, nby * 8 - h), (0, nbx * 8 - w)),
                    mode="edge")
    return (padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
            .reshape(nby * nbx, 8, 8)), nby, nbx


def _encode_component_blocks(coefs_q: np.ndarray, order: np.ndarray,
                             dc_tab: dict, ac_tab: dict,
                             writer: _BitWriter, pred: int) -> int:
    """Entropy-encode quantized blocks (in ``order``) for one component
    slice of the MCU stream; returns the updated DC predictor."""
    for bi in order:
        zz = coefs_q[bi].reshape(-1)[ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        cat, val = _magnitude(diff)
        code, ln = dc_tab[cat]
        writer.write(code, ln)
        if cat:
            writer.write(val, cat)
        run = 0
        nz = np.flatnonzero(zz[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]      # ZRL
                writer.write(code, ln)
                run -= 16
            cat, val = _magnitude(v)
            code, ln = ac_tab[(run << 4) | cat]
            writer.write(code, ln)
            writer.write(val, cat)
            run = 0
        if last < 63:
            code, ln = ac_tab[0x00]          # EOB
            writer.write(code, ln)
    return pred


def jpeg_encode(pixels: np.ndarray, quality: int = 85,
                subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a real
    baseline JFIF JPEG (Annex K tables, quality-scaled quantization).

    ``subsample``: "444" (no chroma subsampling) or "420" (2x2 — the
    web-dominant layout); ignored for grayscale. ``restart_interval`` N
    emits a DRI segment and an RSTn marker every N MCUs (predictors
    reset), the resync structure real encoders add for error recovery."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8 pixels")
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expects (h, w) gray or (h, w, 3) RGB")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            # pad to even then 2x2 box average
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            def _ds(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return (p.reshape(ph // 2, 2, pw // 2, 2)
                        .mean(axis=(1, 3)))
            planes = [y, _ds(cb), _ds(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsample {subsample!r}: use '444'/'420'")
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # per-component quantized blocks + block-grid geometry
    comp_blocks, comp_grid = [], []
    for plane, (sh, sv), qi in zip(planes, samp, qsel):
        blocks, nby, nbx = _to_blocks(plane)
        # MCU grid dimensions in this component's blocks
        mcx = (w + 8 * hmax - 1) // (8 * hmax)
        mcy = (h + 8 * vmax - 1) // (8 * vmax)
        need_bx, need_by = mcx * sh, mcy * sv
        if nbx < need_bx or nby < need_by:
            g = blocks.reshape(nby, nbx, 8, 8)
            g = np.pad(g, ((0, need_by - nby), (0, need_bx - nbx),
                           (0, 0), (0, 0)), mode="edge")
            blocks = g.reshape(need_by * need_bx, 8, 8)
            nby, nbx = need_by, need_bx
        q = ql if qi == 0 else qc
        coefs = _fdct_blocks(blocks - 128.0)
        coefs_q = np.round(coefs / q).astype(np.int64)
        comp_blocks.append(coefs_q)
        comp_grid.append((nby, nbx, sh, sv))

    # headers
    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    for tid, q in ((0, ql),) + (((1, qc),) if not gray else ()):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in q.reshape(-1)[ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w,
                                     ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
              (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])

    # entropy-coded MCU stream
    enc_dc_l = _build_huff_encode(DC_LUMA_BITS, DC_LUMA_VALS)
    enc_ac_l = _build_huff_encode(AC_LUMA_BITS, AC_LUMA_VALS)
    enc_dc_c = _build_huff_encode(DC_CHROMA_BITS, DC_CHROMA_VALS)
    enc_ac_c = _build_huff_encode(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                out += writer.flush()
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                nby, nbx, sh, sv = comp_grid[ci]
                dc_tab = enc_dc_l if ci == 0 else enc_dc_c
                ac_tab = enc_ac_l if ci == 0 else enc_ac_c
                order = [
                    (my * sv + by) * nbx + (mx * sh + bx)
                    for by in range(sv) for bx in range(sh)
                ]
                preds[ci] = _encode_component_blocks(
                    comp_blocks[ci], np.array(order), dc_tab, ac_tab,
                    writer, preds[ci])
    out += writer.flush()
    out += b"\xFF\xD9"                                  # EOI
    return bytes(out)


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG to (h, w) or (h, w, 3) uint8.

    Baseline sequential only; progressive/arithmetic/12-bit/CMYK raise
    NotImplementedError (stated scope)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                      # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                      # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                vals = np.frombuffer(seg, np.uint8, 64, sp + 1)
                q = np.zeros(64, np.int64)
                q[ZIGZAG] = vals
                qtables[tq] = q.reshape(8, 8)
                sp += 65
        elif marker == 0xC4:                    # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1:sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + n])
                (dc_dec if tc == 0 else ac_dec)[th] = \
                    _build_huff_decode(bits, vals)
                sp += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component stream")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                sh, sv = hv >> 4, hv & 0xF
                if not (1 <= sh <= 2 and 1 <= sv <= 2):
                    raise NotImplementedError(
                        f"sampling factors {sh}x{sv}")
                comps.append({"id": cid, "sh": sh, "sv": sv, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                    # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si:3 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            pos += seglen
            return _decode_scan(data, pos, frame, scan, qtables,
                                dc_dec, ac_dec, restart_interval)
        pos += seglen
    raise ValueError("no scan data found")


def _huff_read(reader: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _decode_scan(data, pos, frame, scan, qtables, dc_dec, ac_dec,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["sh"] for c in comps)
    vmax = max(c["sv"] for c in comps)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcy * c["sv"] * 8, mcx * c["sh"] * 8),
                               np.float64))
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.sync_restart()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, (comp, tdc, tac) in enumerate(scan):
                q = qtables[comp["tq"]]
                for by in range(comp["sv"]):
                    for bx in range(comp["sh"]):
                        zz = np.zeros(64, np.int64)
                        try:
                            sym = _huff_read(reader, dc_dec[tdc])
                        except _RestartMarker:
                            raise ValueError(
                                "unexpected restart marker") from None
                        diff = _extend(reader.bits(sym), sym)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_read(reader, ac_dec[tac])
                            run, cat = sym >> 4, sym & 0xF
                            if cat == 0:
                                if run == 15:
                                    k += 16      # ZRL
                                    continue
                                break            # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.bits(cat), cat)
                            k += 1
                        coef = np.zeros(64, np.int64)
                        coef[ZIGZAG] = zz
                        block = _idct_blocks(
                            (coef.reshape(8, 8) * q).astype(np.float64))
                        y0 = (my * comp["sv"] + by) * 8
                        x0 = (mx * comp["sh"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block + 128.0
    # upsample to full resolution and crop
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["sv"], hmax // c["sh"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
