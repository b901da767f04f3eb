"""FLAC codec from scratch — lossless compressed audio goes real.

Like the PNG/GIF/JPEG codecs in this package, this is spec-derived (the
public xiph.org format spec / RFC 9639): no audio library exists in the
sandbox, and FLAC's compression is pure algorithm — fixed/LPC linear
prediction plus Rice-coded residuals — so a genuine implementation needs
nothing beyond the spec. Because FLAC is LOSSLESS the roundtrip gate is
BIT-EXACT sample equality (stronger than the JPEG codec's bounded-error
contract), and both frame CRCs (CRC-8 header, CRC-16 frame) plus the
STREAMINFO MD5 of the unencoded audio are computed and verified, so any
external FLAC tool would accept these files byte-for-byte.

Supported honestly:

- decode: fixed-blocking streams, CONSTANT / VERBATIM / FIXED(0-4) /
  LPC subframes, 4-bit Rice partitions with escape codes, wasted bits,
  all four channel assignments (independent, left/side, right/side,
  mid/side), 8/16/24-bit samples; CRC-8/CRC-16/MD5 verified.
- encode: 16-bit mono/stereo independent channels, fixed predictors
  (order chosen 0-2 per block by residual magnitude), one Rice
  partition with an exhaustively chosen parameter, UTF-8-coded frame
  numbers, correct CRCs and STREAMINFO MD5.

Variable blocking, 5-bit Rice (method 1) encode, and ogg-FLAC raise
ValueError/NotImplementedError — stated scope.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0b11111111111110

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc8_table() -> list[int]:
    tbl = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
        tbl.append(crc)
    return tbl


def _make_crc16_table() -> list[int]:
    tbl = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
        tbl.append(crc)
    return tbl


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x^1+1 (0x07), init 0 — frame header."""
    crc = 0
    tbl = _CRC8_TABLE
    for b in data:
        crc = tbl[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial 0x8005, init 0 — whole frame."""
    crc = 0
    tbl = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tbl[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a 1

    def write_big(self, v: int, bits: int) -> None:
        """Append an arbitrarily wide bit chunk (a whole Rice partition
        accumulated as one Python int) — flushed via int.to_bytes, so
        the per-sample Python loop cost moves to one C call."""
        self.acc = (self.acc << bits) | v
        self.n += bits
        drop = self.n & 7
        whole = self.n - drop
        if whole:
            self.out += (self.acc >> drop).to_bytes(whole >> 3, "big")
            self.acc &= (1 << drop) - 1
            self.n = drop

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos            # byte position
        self.bit = 0              # bit offset within byte (MSB first)

    def read(self, bits: int) -> int:
        v = 0
        d = self.data
        while bits:
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = d[self.pos]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            bits -= take
        return v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index, up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                         (6, 0xFC), (7, 0xFE)):
        if n < (1 << (5 * nbytes + 1)) or nbytes == 7:
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = lead | n
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for k in range(7, 0, -1):
        if (b0 >> k) & 1:
            nbytes += 1
        else:
            break
    v = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8-coded number")
        v = (v << 6) | (c & 0x3F)
    return v


def _zigzag(v: np.ndarray) -> np.ndarray:
    return ((v << 1) ^ (v >> 63)).astype(np.int64)


def _rice_cost(res_z: np.ndarray, p: int) -> int:
    return int((res_z >> p).sum()) + len(res_z) * (1 + p)


def flac_encode(samples: np.ndarray, sample_rate: int = 8000,
                block_size: int = 4096) -> bytes:
    """Encode int16 PCM — shape (n,) mono or (n, 2) stereo — as a real
    FLAC stream (fixed predictors, Rice residuals, full CRC/MD5)."""
    x = np.asarray(samples)
    if x.dtype != np.int16:
        raise ValueError("flac_encode expects int16 samples")
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2):
        raise ValueError("expects (n,) mono or (n, 2) stereo")
    n, nch = x.shape
    if n == 0:
        raise ValueError("empty signal")
    bps = 16

    # STREAMINFO MD5: channel-interleaved little-endian sample bytes
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()

    frames = bytearray()
    min_fs = max_fs = None
    for fi, lo in enumerate(range(0, n, block_size)):
        blk = x[lo:lo + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(_SYNC, 14)
        w.write(0, 1)           # reserved
        w.write(0, 1)           # fixed blocking
        w.write(0b0111, 4)      # block size: 16-bit value at header end
        w.write(0, 4)           # sample rate: from STREAMINFO
        w.write(nch - 1, 4)     # independent channels
        w.write(0b100, 3)       # 16 bits per sample
        w.write(0, 1)           # reserved
        hdr_tail = _utf8_number(fi)
        w.align()
        head = w.bytes() + hdr_tail + struct.pack(">H", bs - 1)
        head += bytes([_crc8(head)])

        w = _BitWriter()
        for ch in range(nch):
            sig = blk[:, ch].astype(np.int64)
            # pick the fixed order 0-2 with the smallest |residual| sum
            best_o, best_res, best_cost = 0, sig, None
            for o in range(0, 3):
                if bs <= o:
                    break
                res = sig.copy()
                for _ in range(o):
                    res = np.diff(res)
                cost = int(np.abs(res).sum())
                if best_cost is None or cost < best_cost:
                    best_o, best_res, best_cost = o, res, cost
            o, res = best_o, best_res
            w.write(0, 1)                    # padding
            w.write(0b001000 | o, 6)         # FIXED, order o
            w.write(0, 1)                    # no wasted bits
            for i in range(o):               # warmup, verbatim
                w.write(int(sig[i]), bps)
            # residual: method 0 (4-bit Rice), partition order 0
            w.write(0, 2)
            w.write(0, 4)
            rz = _zigzag(res)
            p = min(range(15), key=lambda q: _rice_cost(rz, q))
            w.write(p, 4)
            # accumulate the whole partition's codes into one big int
            # (flushed in ~4 KBit chunks so shifts stay cheap)
            acc, nb = 0, 0
            mask = (1 << p) - 1
            one = 1 << p
            for u in rz.tolist():
                width = (u >> p) + 1 + p
                acc = (acc << width) | one | (u & mask)
                nb += width
                if nb >= 4096:
                    w.write_big(acc, nb)
                    acc, nb = 0, 0
            if nb:
                w.write_big(acc, nb)
        w.align()
        frame = head + w.bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
        fs = len(frame)
        min_fs = fs if min_fs is None else min(min_fs, fs)
        max_fs = fs if max_fs is None else max(max_fs, fs)

    si = _BitWriter()
    # fixed blocking: min == max == the nominal block size (the final
    # partial block is conventionally excluded, as in libFLAC)
    bs_nominal = min(block_size, n)
    si.write(bs_nominal, 16)
    si.write(bs_nominal, 16)
    si.write(min_fs, 24)
    si.write(max_fs, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + md5
    header = (b"fLaC"
              + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
              + streaminfo)
    return header + bytes(frames)


def flac_decode(data: bytes, verify: bool = True
                ) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to (samples int32 of shape (n, channels),
    sample_rate). ``verify`` checks CRC-8/CRC-16 per frame and the
    STREAMINFO MD5 over the whole signal."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + length]
        if btype == 0:
            streaminfo = body
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    r = _BitReader(streaminfo)
    r.read(16)  # min block size
    r.read(16)  # max block size
    r.read(24)
    r.read(24)
    sample_rate = r.read(20)
    nch = r.read(3) + 1
    bps_si = r.read(5) + 1
    total = r.read(36)
    md5_expect = streaminfo[18:34]

    out = [[] for _ in range(nch)]
    got = 0
    while got < total and pos < len(data):
        try:
            pos, got = _decode_frame(data, pos, nch, bps_si, verify,
                                     out, got)
        except (IndexError, struct.error):
            # a corrupted quotient can walk the reader off the buffer
            raise ValueError("truncated or corrupt FLAC frame") from None

    sig = np.stack([np.concatenate(c) for c in out], axis=1)[:total]
    if verify:
        if bps_si == 16:
            raw = sig.astype("<i2").tobytes()
        elif bps_si == 8:
            raw = sig.astype("<i1").tobytes()
        else:
            raw = b"".join(
                int(v).to_bytes(3, "little", signed=True)
                for v in sig.reshape(-1))
        if hashlib.md5(raw).digest() != md5_expect:
            raise ValueError("STREAMINFO MD5 mismatch")
    return sig.astype(np.int32), sample_rate


def _decode_frame(data: bytes, pos: int, nch: int, bps_si: int,
                  verify: bool, out: list, got: int) -> tuple[int, int]:
    frame_start = pos
    r = _BitReader(data, pos)
    if r.read(14) != _SYNC:
        raise ValueError("lost frame sync")
    if r.read(1):
        raise ValueError("reserved bit set")
    if r.read(1):
        raise NotImplementedError("variable blocking")
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_asgn = r.read(4)
    ss_code = r.read(3)
    r.read(1)
    _read_utf8_number(r)
    if bs_code == 0b0110:
        bs = r.read(8) + 1
    elif bs_code == 0b0111:
        bs = r.read(16) + 1
    elif bs_code == 0b0001:
        bs = 192
    elif 0b0010 <= bs_code <= 0b0101:
        bs = 576 << (bs_code - 2)
    elif bs_code >= 0b1000:
        bs = 256 << (bs_code - 8)
    else:
        raise ValueError("reserved block size code")
    if sr_code == 0b1100:
        r.read(8)
    elif sr_code in (0b1101, 0b1110):
        r.read(16)
    elif sr_code == 0b1111:
        raise ValueError("invalid sample rate code")
    bps = {0: bps_si, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24,
           }.get(ss_code)
    if bps is None:
        raise ValueError("reserved sample size code")
    r.align()
    # the next byte IS the header CRC-8 (over everything before it)
    if verify and _crc8(data[frame_start:r.pos]) != data[r.pos]:
        raise ValueError("frame header CRC-8 mismatch")
    r.pos += 1

    if ch_asgn < 8:
        fch = ch_asgn + 1
        extra = [0] * fch
    elif ch_asgn in (8, 9, 10):
        fch = 2
        # the SIDE channel carries one extra bit
        extra = [0, 1] if ch_asgn in (8, 10) else [1, 0]
    else:
        raise ValueError("reserved channel assignment")
    if (fch != nch) and not (nch == 2 and fch == 2):
        raise ValueError("channel count mismatch")

    chans = []
    for ci in range(fch):
        chans.append(_decode_subframe(r, bs, bps + extra[ci]))
    r.align()
    if verify:
        crc = struct.unpack_from(">H", data, r.pos)[0]
        if _crc16(data[frame_start:r.pos]) != crc:
            raise ValueError("frame CRC-16 mismatch")
    pos = r.pos + 2

    if ch_asgn < 8:
        dec = chans
    elif ch_asgn == 8:      # left/side
        left = chans[0]
        side = chans[1]
        dec = [left, left - side]
    elif ch_asgn == 9:      # right/side
        side = chans[0]
        right = chans[1]
        dec = [side + right, right]
    else:                   # mid/side
        mid, side = chans
        m2 = (mid << 1) | (side & 1)
        dec = [(m2 + side) >> 1, (m2 - side) >> 1]
    for ci in range(nch):
        out[ci].append(dec[ci])
    got += bs
    return pos, got


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
        bps -= wasted

    def signed(v: int, bits: int) -> int:
        return v - (1 << bits) if v >> (bits - 1) else v

    if stype == 0:                       # CONSTANT
        v = signed(r.read(bps), bps)
        sig = np.full(bs, v, np.int64)
    elif stype == 1:                     # VERBATIM
        sig = np.array([signed(r.read(bps), bps) for _ in range(bs)],
                       np.int64)
    elif 8 <= stype <= 12:               # FIXED order 0-4
        order = stype - 8
        warm = np.array([signed(r.read(bps), bps)
                         for _ in range(order)], np.int64)
        res = _decode_residual(r, bs, order)
        # invert the order-k difference with k cumulative sums (the
        # prediction is polynomial, so reconstruction is C-level)
        cur = res
        for j in range(order, 0, -1):
            first = int(np.diff(warm, j - 1)[0]) if j > 1 \
                else int(warm[0])
            cur = first + np.concatenate(
                [np.zeros(1, np.int64), np.cumsum(cur)])
        sig = cur
    elif stype >= 32:                    # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [signed(r.read(bps), bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = signed(r.read(5), 5)
        coefs = [signed(r.read(prec), prec) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        sig = np.empty(bs, np.int64)
        sig[:order] = warm
        for i in range(order, bs):
            acc = sum(c * int(sig[i - 1 - j])
                      for j, c in enumerate(coefs))
            sig[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return sig << wasted if wasted else sig


def _decode_residual(r: _BitReader, bs: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if bs % nparts:
        raise ValueError("partition order does not divide block size")
    out = np.empty(bs - order, np.int64)
    k = 0
    for pi in range(nparts):
        cnt = bs // nparts - (order if pi == 0 else 0)
        p = r.read(pbits)
        if p == esc:
            raw = r.read(5)
            for _ in range(cnt):
                v = r.read(raw) if raw else 0
                out[k] = v - (1 << raw) if raw and v >> (raw - 1) else v
                k += 1
        else:
            k = _rice_partition(r, p, cnt, out, k)
    return out


def _rice_partition(r: _BitReader, p: int, cnt: int, out: np.ndarray,
                    k: int) -> int:
    """Decode ``cnt`` Rice(p) codes with a local-variable bit loop —
    the decoder's hot path (per-sample method calls through _BitReader
    were ~5x slower; bit_length() finds each unary terminator in one C
    call instead of bit-by-bit reads)."""
    if cnt == 0:
        return k
    data = r.data
    i = r.pos
    nb = 8 - r.bit        # valid low bits of acc
    acc = data[i] & ((1 << nb) - 1) if r.bit else data[i]
    if r.bit == 0:
        nb = 8
    i += 1
    pmask = (1 << p) - 1
    for j in range(cnt):
        q = 0
        while True:
            if nb == 0:
                acc = data[i]
                i += 1
                nb = 8
            if acc == 0:
                q += nb
                nb = 0
                continue
            top = acc.bit_length()
            q += nb - top
            nb = top - 1          # consume the zeros AND the 1 bit
            acc &= (1 << nb) - 1
            break
        while nb < p:
            acc = (acc << 8) | data[i]
            i += 1
            nb += 8
        nb -= p
        u = (q << p) | (acc >> nb)
        acc &= (1 << nb) - 1
        out[k + j] = (u >> 1) ^ -(u & 1)   # un-zigzag
    bitpos = (i << 3) - nb
    r.pos = bitpos >> 3
    r.bit = bitpos & 7
    return k + cnt
