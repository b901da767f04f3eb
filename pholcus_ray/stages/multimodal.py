"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata struct
columns; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. Container formats the stdlib can parse are decoded
FOR REAL: WAV via the ``wave`` module (DecodeWav), Sun/NeXT .au
(DecodeAu), binary netpbm (DecodePpm), uncompressed BMP (DecodeBmp),
PNG (DecodePng — DEFLATE is stdlib zlib, so the full chunk/CRC/filter
pipeline needs no image lib), GIF (DecodeGif — from-scratch
variable-width LZW + palette + interlace; it reads CPython's own shipped
icons), and baseline JPEG (DecodeJpeg — from-scratch T.81: Annex-K
tables, Huffman + DCT + YCbCr, 4:4:4/4:2:0, restart markers; it reads the
JPEGs in CPython's test data) — genuine bytes any external tool would
accept. Only codecs whose compression needs formats beyond that
(progressive jpeg, webp/VP8, mp3/ogg/flac, h264) raise
NotImplementedError; the deterministic fake backend keeps the Ray-side
plumbing — schemas, batch sizing for wide binary rows, actor signature,
output layout — testable for them too.

Scale notes: binary payloads dominate block size; these stages must run
with small ``batch_size`` (tens of rows) and the payload column must be
dropped before any shuffle (same html rule as the crawl fetch stage,
SURVEY.md §7.4.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_array

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.int64()),
        ("payload", pa.binary()),
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_image_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic fake image rows: payload = seeded pseudo-bytes with a
    12-byte header encoding (format, width, height)."""
    rng = np.random.default_rng(seed)
    ids, payloads, fmts, ws, hs = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        fmt = ["png", "jpg", "webp"][i % 3]
        body = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        header = fmt.encode().ljust(4, b"\0") + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        ids.append(i)
        payloads.append(header + body)
        fmts.append(fmt)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(fmts, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        },
        schema=IMAGE_SCHEMA,
    )


class DecodeImage:
    """Actor-pool stage: binary payload -> decoded feature columns.

    backend="fake": parse the deterministic synthetic header + derive
    features from the payload bytes (mean intensity, content hash).
    backend="real": would use PIL/cv2 — not available in this container.
    """

    def __init__(self, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError(
                "image codecs (PIL/cv2) are not available in this environment; "
                "use backend='fake' (deterministic) — the stage contract is "
                "identical"
            )
        self.backend = backend

    # source-metadata columns replaced by their decoded counterparts
    _CONSUMED = ("payload", "format", "width", "height")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        fmts, ws, hs, means = [], [], [], []
        for p in payloads:
            fmts.append(p[:4].rstrip(b"\0").decode())
            ws.append(int.from_bytes(p[4:8], "big"))
            hs.append(int.from_bytes(p[8:12], "big"))
            body = np.frombuffer(p[12:], dtype=np.uint8)
            means.append(round(float(body.mean()) if len(body) else 0.0, 4))
        # pass through every non-consumed column (video_id/frame_idx when
        # composed after SampleFrames), so upstream lineage survives decode
        out = t.drop_columns([c for c in self._CONSUMED if c in t.column_names])
        for name, arr in (
            ("decoded_format", pa.array(fmts, pa.string())),
            ("decoded_width", pa.array(ws, pa.int32())),
            ("decoded_height", pa.array(hs, pa.int32())),
            ("mean_intensity", pa.array(means, pa.float64())),
            ("content_hash", pa.array(
                hash64_array([p.hex() for p in payloads]), pa.uint64())),
        ):
            out = out.append_column(name, arr)
        return out


AUDIO_SCHEMA = pa.schema(
    [
        ("audio_id", pa.int64()),
        ("payload", pa.binary()),   # "pcm\0" + sample_rate(4) + n_samples(4) + int16 LE body
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
    ]
)


def synth_audio_table(n: int, seed: int = 9) -> pa.Table:
    """Deterministic fake audio rows: header-framed int16 PCM payloads."""
    rng = np.random.default_rng(seed)
    ids, payloads, srs, nss = [], [], [], []
    for i in range(n):
        sr = [8000, 16000, 44100][i % 3]
        ns = int(rng.integers(256, 4096))
        body = rng.integers(-(1 << 14), 1 << 14, size=ns, dtype=np.int16)
        header = b"pcm\0" + sr.to_bytes(4, "big") + ns.to_bytes(4, "big")
        ids.append(i)
        payloads.append(header + body.tobytes())
        srs.append(sr)
        nss.append(ns)
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(nss, pa.int32()),
        },
        schema=AUDIO_SCHEMA,
    )


class DecodeAudio:
    """Actor-pool stage: PCM payload -> per-clip acoustic features
    (duration, RMS, zero-crossing count). backend="real" would use
    soundfile/librosa — not available in this container; the fake backend
    parses the deterministic header + int16 body so the Ray-side contract
    (binary column in, feature columns out, payload dropped before any
    shuffle) is real and tested."""

    def __init__(self, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError(
                "audio codecs (soundfile/librosa) are not available in this "
                "environment; use backend='fake' — the stage contract is "
                "identical"
            )
        self.backend = backend

    def __call__(self, t: pa.Table) -> pa.Table:
        durs, rmss, zcs = [], [], []
        payloads = t["payload"].to_pylist()
        for p in payloads:
            sr = int.from_bytes(p[4:8], "big")
            ns = int.from_bytes(p[8:12], "big")
            body = np.frombuffer(p[12:], dtype=np.int16)[:ns].astype(np.float64)
            durs.append(round(ns / sr, 6))
            rmss.append(round(float(np.sqrt((body * body).mean())) if ns else 0.0, 4))
            zcs.append(int((np.signbit(body[1:]) != np.signbit(body[:-1])).sum())
                       if ns > 1 else 0)
        return pa.table(
            {
                "audio_id": t["audio_id"],
                "duration_sec": pa.array(durs, pa.float64()),
                "rms": pa.array(rmss, pa.float64()),
                "zero_crossings": pa.array(zcs, pa.int64()),
                "content_hash": pa.array(
                    hash64_array([p.hex() for p in payloads]), pa.uint64()
                ),
            }
        )


VIDEO_SCHEMA = pa.schema(
    [
        ("video_id", pa.int64()),
        ("payload", pa.binary()),   # "vid\0" + w(4) + h(4) + n_frames(4) + frames
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synth_video_table(n: int, seed: int = 13) -> pa.Table:
    """Deterministic fake video rows: n_frames contiguous w*h byte frames."""
    rng = np.random.default_rng(seed)
    ids, payloads, ws, hs, nfs = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 24))
        h = int(rng.integers(8, 24))
        nf = int(rng.integers(4, 32))
        frames = rng.integers(0, 256, size=nf * w * h, dtype=np.uint8).tobytes()
        header = b"vid\0" + w.to_bytes(4, "big") + h.to_bytes(4, "big") + nf.to_bytes(4, "big")
        ids.append(i)
        payloads.append(header + frames)
        ws.append(w)
        hs.append(h)
        nfs.append(nf)
    return pa.table(
        {
            "video_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(nfs, pa.int32()),
        },
        schema=VIDEO_SCHEMA,
    )


class SampleFrames:
    """Actor-pool stage: video payload -> one row per sampled frame
    (every ``stride``-th frame, always including frame 0), each framed as a
    DecodeImage-compatible payload ("raw\\0" header) so the stages COMPOSE:
    videos -> SampleFrames -> DecodeImage is the frame-feature pipeline.
    backend="real" would use pyav/ffmpeg — not in this container."""

    def __init__(self, stride: int = 4, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError("no video codecs in this environment")
        self.stride = max(1, stride)

    def __call__(self, t: pa.Table) -> pa.Table:
        vids, fidx, out = [], [], []
        for vid, p in zip(t["video_id"].to_pylist(), t["payload"].to_pylist()):
            w = int.from_bytes(p[4:8], "big")
            h = int.from_bytes(p[8:12], "big")
            nf = int.from_bytes(p[12:16], "big")
            frames = p[16:]
            fsz = w * h
            for k in range(0, nf, self.stride):
                vids.append(vid)
                fidx.append(k)
                out.append(
                    b"raw\0" + w.to_bytes(4, "big") + h.to_bytes(4, "big")
                    + frames[k * fsz:(k + 1) * fsz]
                )
        return pa.table(
            {
                "video_id": pa.array(vids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "image_id": pa.array(
                    [v * 100_000 + f for v, f in zip(vids, fidx)], pa.int64()
                ),
                "payload": pa.array(out, pa.binary()),
            }
        )


class ResizeImage:
    """Actor-pool stage: deterministic 'resize' of the fake payload
    (subsampling the byte grid) -> new payload, preserving the header
    contract so stages compose."""

    def __init__(self, max_side: int = 16, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError("no image codecs in this environment")
        self.max_side = max_side

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for p in t["payload"].to_pylist():
            fmt = p[:4]
            w = int.from_bytes(p[4:8], "big")
            h = int.from_bytes(p[8:12], "big")
            body = np.frombuffer(p[12:], dtype=np.uint8)[: w * h].reshape(h, w)
            sw = max(1, w // max(1, (w + self.max_side - 1) // self.max_side))
            sh = max(1, h // max(1, (h + self.max_side - 1) // self.max_side))
            small = body[:: max(1, h // sh), :: max(1, w // sw)]
            nh, nw = small.shape
            out.append(fmt + nw.to_bytes(4, "big") + nh.to_bytes(4, "big") + small.tobytes())
        return pa.table(
            {
                "image_id": t["image_id"],
                "payload": pa.array(out, pa.binary()),
            }
        )


# ---------------------------------------------------------------------------
# REAL container-format decoders (stdlib/numpy only — no PIL/librosa needed)
# ---------------------------------------------------------------------------

def synth_wav_table(n: int, seed: int = 21) -> pa.Table:
    """Deterministic REAL WAV files (RIFF containers written by the stdlib
    ``wave`` module) — genuine bytes a real audio tool would accept, not
    header-framed fakes."""
    import io
    import wave

    rng = np.random.default_rng(seed)
    ids, payloads, srs, nss = [], [], [], []
    for i in range(n):
        sr = [8000, 16000, 44100][i % 3]
        ns = int(rng.integers(256, 4096))
        body = rng.integers(-(1 << 14), 1 << 14, size=ns, dtype=np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(body.tobytes())
        ids.append(i)
        payloads.append(buf.getvalue())
        srs.append(sr)
        nss.append(ns)
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(nss, pa.int32()),
        },
        schema=AUDIO_SCHEMA,
    )


class DecodeWav:
    """Actor-pool stage: REAL WAV (RIFF) decode via the stdlib ``wave``
    module — same feature contract as DecodeAudio (duration, RMS,
    zero-crossings), so the two backends are drop-in interchangeable.
    This is the honest 'real' half of the audio story: container parsing
    is genuinely exercised; only compressed codecs (mp3/ogg/flac) remain
    library-gated."""

    def __init__(self, backend: str = "wav"):
        if backend != "wav":
            raise NotImplementedError(
                "compressed audio codecs (mp3/ogg/flac) need "
                "soundfile/librosa, absent in this environment; WAV decode "
                "is real (stdlib wave)")

    def __call__(self, t: pa.Table) -> pa.Table:
        import io
        import wave

        durs, rmss, zcs = [], [], []
        payloads = t["payload"].to_pylist()
        for p in payloads:
            with wave.open(io.BytesIO(p), "rb") as w:
                sr = w.getframerate()
                ns = w.getnframes()
                raw = w.readframes(ns)
            body = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
            durs.append(round(ns / sr, 6))
            rmss.append(round(float(np.sqrt((body * body).mean()))
                              if ns else 0.0, 4))
            zcs.append(int((np.signbit(body[1:])
                            != np.signbit(body[:-1])).sum()) if ns > 1 else 0)
        return pa.table(
            {
                "audio_id": t["audio_id"],
                "duration_sec": pa.array(durs, pa.float64()),
                "rms": pa.array(rmss, pa.float64()),
                "zero_crossings": pa.array(zcs, pa.int64()),
                "content_hash": pa.array(
                    hash64_array([p.hex() for p in payloads]), pa.uint64()
                ),
            }
        )


def _mulaw_encode(x: np.ndarray) -> np.ndarray:
    """G.711 µ-law compression of int16 PCM to uint8 (ITU-T G.711) —
    the exact inverse pair of :func:`_mulaw_decode` (tested round-trip
    on the full reconstruction lattice)."""
    BIAS, CLIP = 0x84, 32635
    x = x.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), CLIP) + BIAS
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant)).astype(np.uint8)


def _mulaw_decode(u: np.ndarray) -> np.ndarray:
    """G.711 µ-law expansion of uint8 bytes to int16 PCM."""
    BIAS = 0x84
    u = (~u.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + BIAS) << exp) - BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


def synth_au_table(n: int, seed: int = 27) -> pa.Table:
    """Deterministic REAL Sun/NeXT .au files: genuine big-endian '.snd'
    headers (magic, data offset, data size, encoding, rate, channels),
    alternating encoding 1 (G.711 µ-law bytes) and 3 (16-bit linear PCM,
    big-endian) — the two classic .au payloads."""
    import struct

    rng = np.random.default_rng(seed)
    ids, payloads, srs, nss = [], [], [], []
    for i in range(n):
        sr = [8000, 16000, 44100][i % 3]
        ns = int(rng.integers(256, 4096))
        pcm = rng.integers(-(1 << 14), 1 << 14, size=ns, dtype=np.int16)
        if i % 2 == 0:
            enc, body = 1, _mulaw_encode(pcm).tobytes()
        else:
            enc, body = 3, pcm.astype(">i2").tobytes()
        hdr = struct.pack(">4sIIIII", b".snd", 24, len(body), enc, sr, 1)
        ids.append(i)
        payloads.append(hdr + body)
        srs.append(sr)
        nss.append(ns)
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(nss, pa.int32()),
        },
        schema=AUDIO_SCHEMA,
    )


class DecodeAu:
    """Actor-pool stage: REAL Sun/NeXT .au decode — manual big-endian
    header parse (struct, no deprecated stdlib module) + G.711 µ-law
    expansion in numpy for encoding 1, '>i2' view for encoding 3.
    Same feature contract as DecodeWav/DecodeAudio (duration, RMS,
    zero-crossings); everything here is a genuine byte-level parse."""

    def __init__(self, backend: str = "au"):
        if backend != "au":
            raise NotImplementedError(
                "compressed audio codecs (mp3/ogg/flac) need "
                "soundfile/librosa, absent in this environment; .au decode "
                "(mu-law + PCM16BE) is real")

    def __call__(self, t: pa.Table) -> pa.Table:
        import struct

        durs, rmss, zcs = [], [], []
        payloads = t["payload"].to_pylist()
        for p in payloads:
            magic, off, size, enc, sr, ch = struct.unpack(">4sIIIII", p[:24])
            if magic != b".snd":
                raise ValueError(f"not a .au payload: {magic!r}")
            raw = p[off:off + size]
            if enc == 1:
                body = _mulaw_decode(
                    np.frombuffer(raw, np.uint8)).astype(np.float64)
            elif enc == 3:
                body = np.frombuffer(raw, ">i2").astype(np.float64)
            else:
                raise NotImplementedError(f"au encoding {enc}")
            ns = len(body) // ch
            durs.append(round(ns / sr, 6))
            rmss.append(round(float(np.sqrt((body * body).mean()))
                              if ns else 0.0, 4))
            zcs.append(int((np.signbit(body[1:])
                            != np.signbit(body[:-1])).sum()) if ns > 1 else 0)
        return pa.table(
            {
                "audio_id": t["audio_id"],
                "duration_sec": pa.array(durs, pa.float64()),
                "rms": pa.array(rmss, pa.float64()),
                "zero_crossings": pa.array(zcs, pa.int64()),
                "content_hash": pa.array(
                    hash64_array([p.hex() for p in payloads]), pa.uint64()
                ),
            }
        )


def synth_ppm_table(n: int, seed: int = 23) -> pa.Table:
    """Deterministic REAL PPM (P6) images — the binary netpbm format any
    image tool reads; header is genuine ASCII 'P6 <w> <h> 255'."""
    rng = np.random.default_rng(seed)
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        body = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
        ids.append(i)
        payloads.append(f"P6\n{w} {h}\n255\n".encode() + body.tobytes())
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["ppm"] * n, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        },
        schema=IMAGE_SCHEMA,
    )


class DecodePpm:
    """Actor-pool stage: REAL PPM/PGM (P6/P5 binary netpbm) decode — pure
    header parse + numpy reshape, no image library. Same output contract
    as DecodeImage; progressive-jpeg/webp stay library-gated."""

    def __init__(self, backend: str = "ppm"):
        if backend != "ppm":
            raise NotImplementedError(
                "webp needs PIL/cv2, absent in this environment; PPM/BMP/PNG/"
                "GIF/baseline-JPEG decode is real "
                "in this environment; netpbm decode is real")

    _CONSUMED = ("payload", "format", "width", "height")

    @staticmethod
    def _parse(p: bytes):
        # netpbm header: magic, whitespace/comment-separated w, h, maxval,
        # ONE whitespace byte, then the raster
        magic = p[:2]
        if magic not in (b"P5", b"P6"):
            raise ValueError(f"not a binary netpbm payload: {magic!r}")
        fields, pos = [], 2
        while len(fields) < 3:
            while p[pos:pos + 1].isspace():
                pos += 1
            if p[pos:pos + 1] == b"#":
                while p[pos:pos + 1] not in (b"\n", b""):
                    pos += 1
                continue
            start = pos
            while not p[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(p[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, _maxval = fields
        ch = 3 if magic == b"P6" else 1
        body = np.frombuffer(p, dtype=np.uint8,
                             count=w * h * ch, offset=pos)
        return magic.decode(), w, h, body

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        fmts, ws, hs, means = [], [], [], []
        for p in payloads:
            magic, w, h, body = self._parse(p)
            fmts.append("ppm" if magic == "P6" else "pgm")
            ws.append(w)
            hs.append(h)
            means.append(round(float(body.mean()) if len(body) else 0.0, 4))
        out = t.drop_columns(
            [c for c in self._CONSUMED if c in t.column_names])
        for name, arr in (
            ("decoded_format", pa.array(fmts, pa.string())),
            ("decoded_width", pa.array(ws, pa.int32())),
            ("decoded_height", pa.array(hs, pa.int32())),
            ("mean_intensity", pa.array(means, pa.float64())),
            ("content_hash", pa.array(
                hash64_array([p.hex() for p in payloads]), pa.uint64())),
        ):
            out = out.append_column(name, arr)
        return out


def synth_bmp_table(n: int, seed: int = 29) -> pa.Table:
    """Deterministic REAL Windows BMP images (BITMAPINFOHEADER, uncompressed
    24-bit BGR, 4-byte-padded bottom-up rows) — the stdlib-parseable
    container every image tool reads."""
    import struct

    rng = np.random.default_rng(seed)
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = int(rng.integers(4, 48))
        h = int(rng.integers(4, 48))
        stride = (w * 3 + 3) & ~3
        raster = b""
        for _row in range(h):
            raster += rng.integers(0, 256, size=w * 3,
                                   dtype=np.uint8).tobytes()
            raster += b"\x00" * (stride - w * 3)
        off = 14 + 40
        size = off + len(raster)
        hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(raster), 2835, 2835, 0, 0)
        ids.append(i)
        payloads.append(hdr + dib + raster)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["bmp"] * n, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        },
        schema=IMAGE_SCHEMA,
    )


class DecodeBmp:
    """Actor-pool stage: REAL BMP decode (BITMAPINFOHEADER, uncompressed
    24-bit) — pure struct parse + numpy de-padding, no image library. Same
    output contract as DecodePpm; compressed/palette BMP variants raise."""

    def __init__(self, backend: str = "bmp"):
        if backend != "bmp":
            raise NotImplementedError(
                "only uncompressed 24-bit BITMAPINFOHEADER BMP is decoded "
                "natively; other variants need PIL/cv2, absent in this env")

    _CONSUMED = ("payload", "format", "width", "height")

    @staticmethod
    def _parse(p: bytes):
        import struct

        if p[:2] != b"BM":
            raise ValueError(f"not a BMP payload: {p[:2]!r}")
        off = struct.unpack_from("<I", p, 10)[0]
        (hdr_sz, w, h, _planes, bpp, comp) = struct.unpack_from(
            "<IiiHHI", p, 14)
        if hdr_sz < 40 or bpp != 24 or comp != 0:
            raise ValueError(
                f"unsupported BMP variant (hdr={hdr_sz} bpp={bpp} "
                f"comp={comp}); only uncompressed 24-bit is native")
        flipped = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(p, dtype=np.uint8, count=stride * h,
                             offset=off).reshape(h, stride)[:, : w * 3]
        if flipped:
            rows = rows[::-1]
        return w, h, rows

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        ws, hs, means = [], [], []
        for p in payloads:
            w, h, rows = self._parse(p)
            ws.append(w)
            hs.append(h)
            means.append(round(float(rows.mean()) if rows.size else 0.0, 4))
        out = t.drop_columns(
            [c for c in self._CONSUMED if c in t.column_names])
        for name, arr in (
            ("decoded_format", pa.array(["bmp"] * len(ws), pa.string())),
            ("decoded_width", pa.array(ws, pa.int32())),
            ("decoded_height", pa.array(hs, pa.int32())),
            ("mean_intensity", pa.array(means, pa.float64())),
            ("content_hash", pa.array(
                hash64_array([p.hex() for p in payloads]), pa.uint64())),
        ):
            out = out.append_column(name, arr)
        return out


# --- REAL PNG codec (stdlib zlib; no image library) -------------------------
#
# PNG is "compressed", but its compression is DEFLATE — which the Python
# stdlib ships (zlib) — so unlike jpg/webp (DCT/VP8 entropy coders) a
# genuine PNG decode needs no external library at all: chunk walk with
# CRC-32 verification, IHDR parse, concatenated-IDAT inflate, then the
# five per-row filter reversals (None/Sub/Up/Average/Paeth) from the spec
# (RFC 2083 §6). Supported: bit depth 8, color types 0 (gray), 2 (RGB),
# 6 (RGBA), non-interlaced — the shapes ML image corpora actually carry;
# palette/16-bit/Adam7 raise with a precise message.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _z

    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", _z.crc32(tag + data) & 0xFFFFFFFF))


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PaethPredictor over int32 lane vectors (one pixel's channels)."""
    p = a + b - c
    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))


def png_encode(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Encode an (h, w) or (h, w, ch) uint8 array as a real PNG. ``filters``
    picks the per-row filter type (default: cycle 0..4 so every decoder
    path gets exercised); any PNG tool decodes the result identically."""
    import struct
    import zlib as _z

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    rows = px.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, dtype=np.int32)
    out = bytearray()
    for y in range(h):
        f = (filters[y % len(filters)] if filters else y % 5)
        cur = rows[y]
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        upleft = np.zeros_like(prev)
        upleft[ch:] = prev[:-ch]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        else:
            filt = cur - _paeth_vec(left, prev, upleft)
        out.append(f)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(bytes(out), 6))
            + _png_chunk(b"IEND", b""))


def png_decode(p: bytes) -> np.ndarray:
    """Decode a real PNG payload to an (h, w, ch) uint8 array, verifying
    every chunk CRC. Raises NotImplementedError for palette/16-bit/Adam7
    variants (honest scope: those are rare in ML corpora)."""
    import struct
    import zlib as _z

    if p[:8] != _PNG_SIG:
        raise ValueError(f"not a PNG payload: {p[:8]!r}")
    pos, idat, meta = 8, [], None
    while pos < len(p):
        (length,) = struct.unpack_from(">I", p, pos)
        tag = p[pos + 4:pos + 8]
        data = p[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", p, pos + 8 + length)
        if _z.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or color not in (0, 2, 6) or interlace:
                raise NotImplementedError(
                    f"PNG variant (depth={depth} color={color} "
                    f"interlace={interlace}) not decoded natively; only "
                    "8-bit gray/RGB/RGBA non-interlaced is supported")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
            meta = (w, h, {0: 1, 2: 3, 6: 4}[color])
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = _z.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (stride + 1) + 1).astype(np.int32)
        if f == 0:
            cur = row
        elif f == 2:
            cur = (row + prev) % 256
        elif f == 1:
            # Sub unfilter = per-lane cumulative sum (mod distributes)
            cur = np.cumsum(row.reshape(w, ch), axis=0).reshape(-1) % 256
        elif f in (3, 4):
            cur = np.empty(stride, dtype=np.int32)
            zero = np.zeros(ch, dtype=np.int32)
            for x in range(0, stride, ch):
                a = cur[x - ch:x] if x else zero
                b = prev[x:x + ch]
                if f == 3:
                    cur[x:x + ch] = (row[x:x + ch] + (a + b) // 2) % 256
                else:
                    c = prev[x - ch:x] if x else zero
                    cur[x:x + ch] = (row[x:x + ch]
                                     + _paeth_vec(a, b, c)) % 256
        else:
            raise ValueError(f"PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def synth_png_table(n: int, seed: int = 31) -> pa.Table:
    """Deterministic REAL PNG images — mixed gray/RGB/RGBA, per-row filter
    types cycling through all five spec filters."""
    rng = np.random.default_rng(seed)
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = int(rng.integers(6, 40))
        h = int(rng.integers(6, 40))
        ch = (1, 3, 4)[i % 3]
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        ids.append(i)
        payloads.append(png_encode(px))
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["png"] * n, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        },
        schema=IMAGE_SCHEMA,
    )


class DecodePng:
    """Actor-pool stage: REAL PNG decode — chunk walk + CRC verify + zlib
    inflate + all five filter reversals, no image library (DEFLATE is
    stdlib). Same output contract as DecodePpm/DecodeBmp; progressive
    jpeg / webp (VP8) stay honestly library-gated."""

    def __init__(self, backend: str = "png"):
        if backend != "png":
            raise NotImplementedError(
                "progressive jpeg / webp need PIL/cv2; PNG "
                "decode is real (stdlib zlib)")

    _CONSUMED = ("payload", "format", "width", "height")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        ws, hs, chans, means = [], [], [], []
        for p in payloads:
            px = png_decode(p)
            h, w, ch = px.shape
            ws.append(w)
            hs.append(h)
            chans.append(ch)
            means.append(round(float(px.mean()) if px.size else 0.0, 4))
        out = t.drop_columns(
            [c for c in self._CONSUMED if c in t.column_names])
        for name, arr in (
            ("decoded_format", pa.array(["png"] * len(ws), pa.string())),
            ("decoded_width", pa.array(ws, pa.int32())),
            ("decoded_height", pa.array(hs, pa.int32())),
            ("decoded_channels", pa.array(chans, pa.int32())),
            ("mean_intensity", pa.array(means, pa.float64())),
            ("content_hash", pa.array(
                hash64_array([p.hex() for p in payloads]), pa.uint64())),
        ):
            out = out.append_column(name, arr)
        return out


# --- REAL GIF codec (from-scratch LZW; no library at all) --------------------
#
# GIF's compression is LZW with variable 3..12-bit codes — pure algorithm,
# no entropy tables — so a genuine decoder needs nothing beyond the spec
# (GIF89a; code-width growth mirrors giflib's RunningCode > MaxCode1 rule,
# which is algebraically table_len == 1<<code_size). Covered: global/local
# color tables, extension-block skipping, Adam-style 4-pass interlacing,
# table-full (4096) handling, KwKwK first-use codes. The paired encoder
# exists so synthetic fixtures are REAL files; tests also decode the
# third-party GIFs that ship inside CPython (idlelib icons).

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, mcs: int, expected: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    code_size = mcs + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    pos, total = 0, len(data) * 8
    while pos + code_size <= total and len(out) < expected:
        bi, bo = divmod(pos, 8)
        code = (int.from_bytes(data[bi:bi + 3], "little") >> bo) & (
            (1 << code_size) - 1)
        pos += code_size
        if code == clear:
            table = list(base)
            code_size = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK first-use case
        else:
            raise ValueError(f"bad LZW code {code} (table {len(table)})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < expected:
        raise ValueError(f"LZW stream short: {len(out)} < {expected}")
    return bytes(out[:expected])


def _gif_lzw_encode(data: bytes, mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code, code_size = clear + 2, mcs + 1
    emit(clear, code_size)
    w = b""
    for ch in data:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code <= 4095:
            table[wk] = next_code
            next_code += 1
            # decoder bumps when ITS table hits 1<<size; it trails this
            # encoder's next_code by one, hence the +1 here
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:  # table full: reset, as reference encoders do
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code, code_size = clear + 2, mcs + 1
        w = bytes([ch])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for off, step in _GIF_INTERLACE_PASSES
             for y in range(off, h, step)]
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def gif_encode(indices: np.ndarray, palette: np.ndarray,
               interlaced: bool = False) -> bytes:
    """Encode an (h, w) uint8 index raster + (n, 3) palette as a real
    GIF89a (graphic-control extension included so decoders exercise the
    extension-skip path)."""
    import struct

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    bits = max(2, int(np.ceil(np.log2(max(2, len(pal))))))
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[: len(pal)] = pal
    if interlaced:
        order = [y for off, step in _GIF_INTERLACE_PASSES
                 for y in range(off, h, step)]
        idx = idx[np.asarray(order)]
    mcs = bits
    lzw = _gif_lzw_encode(idx.reshape(-1).tobytes(), mcs)
    blocks = b"".join(
        bytes([min(255, len(lzw) - i)]) + lzw[i:i + 255]
        for i in range(0, len(lzw), 255)) + b"\x00"
    return (b"GIF89a"
            + struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4)
                          | (bits - 1), 0, 0)
            + full.tobytes()
            + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, no transparency
            + struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                          0x40 if interlaced else 0)
            + bytes([mcs]) + blocks + b"\x3B")


def gif_decode(p: bytes) -> tuple[np.ndarray, int, bool]:
    """Decode the first image of a real GIF87a/89a payload to an
    (h, w, 3) uint8 RGB array via the palette; returns (pixels,
    palette_size, interlaced)."""
    import struct

    if p[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload: {p[:6]!r}")
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", p, 6)
    pos, gct = 13, None
    if packed & 0x80:
        ncol = 2 << (packed & 7)
        gct = np.frombuffer(p, np.uint8, 3 * ncol, pos).reshape(ncol, 3)
        pos += 3 * ncol
    while pos < len(p):
        b = p[pos]
        if b == 0x3B:
            break
        if b == 0x21:  # extension: label + sub-blocks, skipped
            pos += 2
            while p[pos] != 0:
                pos += p[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _l, _t, w, h, ip = struct.unpack_from("<HHHHB", p, pos + 1)
        pos += 10
        pal = gct
        if ip & 0x80:
            ncol = 2 << (ip & 7)
            pal = np.frombuffer(p, np.uint8, 3 * ncol, pos).reshape(ncol, 3)
            pos += 3 * ncol
        if pal is None:
            raise ValueError("GIF image has no color table")
        interlaced = bool(ip & 0x40)
        mcs = p[pos]
        pos += 1
        data = bytearray()
        while p[pos] != 0:
            n = p[pos]
            data += p[pos + 1:pos + 1 + n]
            pos += n + 1
        idx = np.frombuffer(
            _gif_lzw_decode(bytes(data), mcs, w * h), np.uint8
        ).reshape(h, w)
        if interlaced:
            idx = _gif_deinterlace(idx)
        return pal[idx], len(pal), interlaced
    raise ValueError("GIF contains no image block")


def synth_gif_table(n: int, seed: int = 37) -> pa.Table:
    """Deterministic REAL GIF89a images — seeded palettes (4..256 colors),
    spatially correlated index rasters (so LZW genuinely compresses),
    every third image interlaced."""
    rng = np.random.default_rng(seed)
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = int(rng.integers(6, 48))
        h = int(rng.integers(6, 48))
        ncol = int(rng.integers(4, 257))
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        # runs of repeated indices: realistic LZW-compressible content
        runs = rng.integers(0, ncol, size=(w * h + 5) // 6, dtype=np.uint8)
        idx = np.repeat(runs, 6)[: w * h].reshape(h, w)
        ids.append(i)
        payloads.append(gif_encode(idx, pal, interlaced=(i % 3 == 0)))
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["gif"] * n, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        },
        schema=IMAGE_SCHEMA,
    )


class DecodeGif:
    """Actor-pool stage: REAL GIF decode — from-scratch variable-width LZW,
    palette mapping, interlace reordering. Same output contract as
    DecodePng (decoded_channels is always 3: palette RGB)."""

    def __init__(self, backend: str = "gif"):
        if backend != "gif":
            raise NotImplementedError(
                "animated-GIF frame composition beyond the first image is "
                "out of scope; single-image GIF decode is real")

    _CONSUMED = ("payload", "format", "width", "height")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        ws, hs, ncols, means = [], [], [], []
        for p in payloads:
            px, ncol, _il = gif_decode(p)
            h, w, _ = px.shape
            ws.append(w)
            hs.append(h)
            ncols.append(ncol)
            means.append(round(float(px.mean()) if px.size else 0.0, 4))
        out = t.drop_columns(
            [c for c in self._CONSUMED if c in t.column_names])
        for name, arr in (
            ("decoded_format", pa.array(["gif"] * len(ws), pa.string())),
            ("decoded_width", pa.array(ws, pa.int32())),
            ("decoded_height", pa.array(hs, pa.int32())),
            ("palette_colors", pa.array(ncols, pa.int32())),
            ("mean_intensity", pa.array(means, pa.float64())),
            ("content_hash", pa.array(
                hash64_array([p.hex() for p in payloads]), pa.uint64())),
        ):
            out = out.append_column(name, arr)
        return out


# --- REAL baseline JPEG codec (stages/jpegcodec.py) --------------------------
#
# The from-scratch T.81 baseline implementation: Annex-K tables, float
# DCT, Huffman entropy coding, byte stuffing, 4:4:4/4:2:0, DRI/RSTn.
# Unlike PNG/GIF the roundtrip is lossy by construction, so the synth
# fixtures store the SOURCE pixels' stats and tests assert bounded error
# plus bit-exact flat-block (DC-only) cases; the decoder also reads the
# third-party JPEGs that ship inside CPython's test data.


def synth_jpeg_table(n: int, seed: int = 47) -> pa.Table:
    """Real baseline JPEGs with known geometry: gradient RGB images
    cycling through 4:4:4 / 4:2:0 / grayscale and restart intervals."""
    from .jpegcodec import jpeg_encode

    rng = np.random.default_rng(seed)
    ids, payloads, ws, hs, chans = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(17, 49))
        h = int(rng.integers(17, 41))
        kind = i % 3
        if kind == 2:
            base = (np.add.outer(np.arange(h) * 3, np.arange(w) * 2)
                    + int(rng.integers(0, 64))) % 256
            px = base.astype(np.uint8)
            payload = jpeg_encode(px, quality=90,
                                  restart_interval=i % 4)
            ch = 1
        else:
            px = np.zeros((h, w, 3), np.uint8)
            px[..., 0] = np.linspace(0, 250, w).astype(np.uint8)[None, :]
            px[..., 1] = np.linspace(0, 250, h).astype(np.uint8)[:, None]
            px[..., 2] = int(rng.integers(0, 256))
            payload = jpeg_encode(px, quality=88,
                                  subsample="444" if kind == 0 else "420",
                                  restart_interval=i % 3)
            ch = 3
        ids.append(i)
        payloads.append(payload)
        ws.append(w)
        hs.append(h)
        chans.append(ch)
    return pa.table({
        "image_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "format": pa.array(["jpeg"] * n, pa.string()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "channels": pa.array(chans, pa.int32()),
    })


class DecodeJpeg:
    """Actor-pool stage: REAL baseline JPEG decode (stages/jpegcodec.py —
    segment walk, DHT/DQT from the stream, Huffman + IDCT + YCbCr, no
    image library). Same output contract as DecodePng; progressive JPEG
    and webp (VP8) remain honestly library-gated."""

    def __init__(self, backend: str = "jpeg"):
        if backend != "jpeg":
            raise NotImplementedError(
                "progressive jpeg / webp need PIL/cv2, absent in this "
                "environment; baseline JPEG decode is real (from-scratch "
                "T.81)")

    _CONSUMED = ("payload", "format", "width", "height", "channels")

    def __call__(self, t: pa.Table) -> pa.Table:
        from .jpegcodec import jpeg_decode

        payloads = t["payload"].to_pylist()
        ws, hs, chans, means = [], [], [], []
        for p in payloads:
            px = jpeg_decode(p)
            ch = 1 if px.ndim == 2 else px.shape[2]
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            chans.append(ch)
            means.append(round(float(px.mean()) if px.size else 0.0, 4))
        out = t.drop_columns(
            [c for c in self._CONSUMED if c in t.column_names])
        for name, arr in (
            ("decoded_format", pa.array(["jpeg"] * len(ws), pa.string())),
            ("decoded_width", pa.array(ws, pa.int32())),
            ("decoded_height", pa.array(hs, pa.int32())),
            ("decoded_channels", pa.array(chans, pa.int32())),
            ("mean_intensity", pa.array(means, pa.float64())),
            ("content_hash", pa.array(
                hash64_array([p.hex() for p in payloads]), pa.uint64())),
        ):
            out = out.append_column(name, arr)
        return out


# --- REAL FLAC codec (stages/flaccodec.py) -----------------------------------
#
# Lossless compressed audio, spec-derived like PNG/GIF/JPEG: fixed/LPC
# prediction + Rice residuals, CRC-8/CRC-16/MD5 verified. Because FLAC
# is lossless the roundtrip contract is BIT-EXACT sample equality.


def synth_flac_table(n: int, seed: int = 53) -> pa.Table:
    """Real FLAC payloads with known geometry: mono/stereo int16 tones +
    noise at mixed rates and block sizes."""
    from .flaccodec import flac_encode

    rng = np.random.default_rng(seed)
    ids, payloads, srs, nss, chs = [], [], [], [], []
    for i in range(n):
        sr = [8000, 16000, 44100][i % 3]
        ns = int(rng.integers(600, 5000))
        t = np.arange(ns)
        base = (2500 * np.sin(t / (4 + i % 7))
                + rng.normal(0, 150, ns)).astype(np.int16)
        if i % 2:
            sig = np.stack([base, (base // 2).astype(np.int16)], axis=1)
            ch = 2
        else:
            sig = base
            ch = 1
        payloads.append(flac_encode(sig, sr,
                                    block_size=[512, 1024, 4096][i % 3]))
        ids.append(i)
        srs.append(sr)
        nss.append(ns)
        chs.append(ch)
    return pa.table({
        "audio_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "sample_rate": pa.array(srs, pa.int32()),
        "n_samples": pa.array(nss, pa.int32()),
        "channels": pa.array(chs, pa.int32()),
    })


class DecodeFlac:
    """Actor-pool stage: REAL FLAC decode (stages/flaccodec.py — frame
    sync, fixed/LPC subframes, Rice partitions, CRC + MD5 verify). Same
    feature contract as DecodeWav; mp3/ogg (psychoacoustic entropy
    codecs) stay honestly library-gated."""

    def __init__(self, backend: str = "flac"):
        if backend != "flac":
            raise NotImplementedError(
                "mp3/ogg need external codecs, absent in this "
                "environment; FLAC decode is real (from-scratch spec)")

    def __call__(self, t: pa.Table) -> pa.Table:
        from .flaccodec import flac_decode

        payloads = t["payload"].to_pylist()
        srs, nss, chs, rmss = [], [], [], []
        for p in payloads:
            sig, sr = flac_decode(p)
            srs.append(sr)
            nss.append(sig.shape[0])
            chs.append(sig.shape[1])
            v = sig.astype(np.float64)
            rmss.append(round(float(np.sqrt((v * v).mean()))
                        if sig.size else 0.0, 4))
        out = t.drop_columns(
            [c for c in ("payload", "sample_rate", "n_samples",
                         "channels") if c in t.column_names])
        for name, arr in (
            ("decoded_format", pa.array(["flac"] * len(srs),
                                        pa.string())),
            ("decoded_rate", pa.array(srs, pa.int32())),
            ("decoded_samples", pa.array(nss, pa.int32())),
            ("decoded_channels", pa.array(chs, pa.int32())),
            ("rms", pa.array(rmss, pa.float64())),
            ("content_hash", pa.array(
                hash64_array([p.hex() for p in payloads]), pa.uint64())),
        ):
            out = out.append_column(name, arr)
        return out


# --- perceptual-hash image dedup ---------------------------------------------
#
# The image half of the near-dup family: dHash (difference hash) over
# decoded pixels + the same pigeonhole-sound Hamming banding the text
# SimHash pipeline uses (textdata.simhash_near_dups). Integer-only
# everywhere — BT.601 gray in fixed point, block means by integer
# division — so the hash is bit-reproducible across engines and block
# layouts. Composes the REAL PNG codec with the dedup machinery: the
# payloads are genuine PNGs, decoded per batch in an actor pool.


def dhash64(pixels: np.ndarray) -> int:
    """64-bit dHash: gray -> 9x8 integer block means -> row-major
    adjacent-column gradient signs."""
    px = np.asarray(pixels, dtype=np.int64)
    if px.ndim == 3:
        if px.shape[2] >= 3:
            # BT.601 luma in integer fixed point (//1000)
            px = (px[:, :, 0] * 299 + px[:, :, 1] * 587
                  + px[:, :, 2] * 114) // 1000
        else:
            px = px[:, :, 0]
    h, w = px.shape
    if h < 8 or w < 9:
        raise ValueError(f"dhash needs >= 9x8 pixels, got {w}x{h}")
    ci = np.arange(9) * w // 9
    ri = np.arange(8) * h // 8
    colsum = np.add.reduceat(px, ci, axis=1)
    block = np.add.reduceat(colsum, ri, axis=0)
    cw = np.diff(np.append(ci, w))
    rh = np.diff(np.append(ri, h))
    area = rh[:, None] * cw[None, :]
    g = block // area  # integer mean per block
    bits = (g[:, 1:] > g[:, :-1]).astype(np.uint64).reshape(-1)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class PhashImage:
    """Actor-pool stage: PNG payload -> 64-bit perceptual hash + 16-bit
    band columns (the banding layout simhash_near_dups uses)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        hs = np.array([dhash64(png_decode(p))
                       for p in t["payload"].to_pylist()], dtype=np.uint64)
        out = {"image_id": t["image_id"],
               "phash": pa.array(hs, pa.uint64())}
        for b in range(4):
            out[f"band{b}"] = pa.array(
                ((hs >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                .astype(np.uint32))
        return pa.table(out)


def _phash_base_small(rng: np.random.Generator) -> np.ndarray:
    """8x9 block lattice whose ADJACENT-COLUMN values always differ by
    >= 8: a random-sign walk with reflection at the [0, 248] bounds, so
    +-2 pixel noise can never flip a dHash gradient sign."""
    small = np.empty((8, 9), dtype=np.int64)
    small[:, 0] = rng.integers(0, 32, size=8) * 8
    for j in range(1, 9):
        step = rng.integers(1, 4, size=8) * 8
        sign = np.where(rng.integers(0, 2, size=8) == 1, 1, -1)
        v = small[:, j - 1] + sign * step
        out = (v < 0) | (v > 248)
        v[out] = small[out, j - 1] - sign[out] * step[out]
        small[:, j] = v
    return small


def synth_phash_corpus(n: int = 240, seed: int = 41) -> pa.Table:
    """Deterministic PNG corpus with PLANTED near-duplicates: bases are
    generated at 9x8 'block resolution' with strong gradients (adjacent
    values >= 8 apart), upscaled, and copies add small pixel noise the
    block means absorb — so each copy's dHash is within hamming <= 3 of
    its base BY CONSTRUCTION. ``dup_of`` records the planted ground truth
    (-1 for bases); the pipeline never reads it."""
    rng = np.random.default_rng(seed)
    ids, payloads, dup_of = [], [], []
    i = 0
    while i < n:
        big = np.kron(_phash_base_small(rng),
                      np.ones((4, 4), dtype=np.int64))  # 32x36
        base_px = np.clip(big, 0, 255).astype(np.uint8)
        ids.append(i)
        payloads.append(png_encode(base_px))
        dup_of.append(-1)
        base_id = i
        i += 1
        for _copy in range(int(rng.integers(0, 3))):
            if i >= n:
                break
            noise = rng.integers(-2, 3, size=base_px.shape, dtype=np.int64)
            px = np.clip(base_px.astype(np.int64) + noise, 0, 255)
            if rng.integers(0, 2):  # some copies are RGB re-encodes
                px = np.repeat(px[:, :, None], 3, axis=2)
            ids.append(i)
            payloads.append(png_encode(px.astype(np.uint8)))
            dup_of.append(base_id)
            i += 1
    return pa.table({
        "image_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "dup_of": pa.array(dup_of, pa.int64()),
    })


def image_phash_dups(sf_dir: str, max_hamming: int = 3,
                     n_images: int = 240) -> pa.Table:
    """Gate query: near-duplicate IMAGE detection — real PNG decode ->
    dHash -> 16-bit Hamming banding (pigeonhole-complete for
    hamming <= 3) -> exact popcount verify — with two gate-visible
    verdicts: ``complete`` (banded pair set == brute-force pair set over
    the hashes) and ``planted_ok`` (every planted near-copy pair was
    found). The brute side here spans all hashes (bounded by the fixture
    size); at corpus scale the deterministic id%k sampling of
    simhash_banding_complete applies unchanged. Image decode is not
    SQL-expressible, so the oracle pins the verdict row."""
    import ray.data as rd

    del sf_dir  # fixture-driven like the other multimodal queries
    ds = rd.from_arrow(synth_phash_corpus(n_images)).repartition(4)
    hashed = ds.drop_columns(["dup_of"]).map_batches(
        PhashImage, batch_format="pyarrow", batch_size=32, concurrency=2)

    rows = hashed.take_all()  # one slim (id, hash) row per image: the
    # verdict query is fixture-sized; the banded pair path below is the
    # scale path and is what the completeness verdict checks
    ids = np.array([r["image_id"] for r in rows], dtype=np.int64)
    hs = np.array([r["phash"] for r in rows], dtype=np.uint64)
    order = np.argsort(ids)
    ids, hs = ids[order], hs[order]

    # banded candidate pairs + exact hamming verify (the scale path)
    banded: set = set()
    for b in range(4):
        bv = (hs >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        for v in np.unique(bv):
            members = np.flatnonzero(bv == v)
            for x in range(len(members)):
                i_, rest = members[x], members[x + 1:]
                d = np.unpackbits(
                    np.bitwise_xor(hs[rest], hs[i_]).view(np.uint8)
                    .reshape(-1, 8), axis=1).sum(axis=1)
                for j in np.flatnonzero(d <= max_hamming):
                    banded.add((int(ids[i_]), int(ids[rest[j]])))

    brute: set = set()
    for x in range(len(ids)):
        d = np.unpackbits(
            np.bitwise_xor(hs[x + 1:], hs[x]).view(np.uint8).reshape(-1, 8),
            axis=1).sum(axis=1)
        for j in np.flatnonzero(d <= max_hamming):
            brute.add((int(ids[x]), int(ids[x + 1 + j])))

    truth = synth_phash_corpus(n_images)
    planted = {(int(b_), int(a_)) for a_, b_ in
               zip(truth["image_id"].to_pylist(),
                   truth["dup_of"].to_pylist()) if b_ >= 0}
    return pa.table({
        "n_images": pa.array([len(ids)], pa.int64()),
        "complete": pa.array([int(banded == brute)], pa.int64()),
        "planted_ok": pa.array([int(planted <= banded)], pa.int64()),
    })


# ---------------------------------------------------------------------------
# MIME sniffing: magic-byte container detection over an untyped binary
# column — the first stage every mixed-media ingest pipeline runs (a 100 TB
# crawl's payload column carries whatever the web served; routing to the
# right decoder pool needs the container identified WITHOUT trusting
# headers or extensions)
# ---------------------------------------------------------------------------

_MAGIC = [
    (b"RIFF", 8, b"WAVE", "audio/wav"),       # RIFF....WAVE
    (b".snd", 0, b"", "audio/basic"),          # Sun/NeXT au
    (b"P6", 0, b"", "image/x-portable-pixmap"),
    (b"BM", 0, b"", "image/bmp"),
    (b"\x89PNG\r\n\x1a\n", 0, b"", "image/png"),
    (b"GIF87a", 0, b"", "image/gif"),
    (b"GIF89a", 0, b"", "image/gif"),
    (b"\xFF\xD8\xFF", 0, b"", "image/jpeg"),   # SOI + first marker
    (b"fLaC", 0, b"", "audio/flac"),
]


def sniff_mime(payload: bytes) -> str:
    """Magic-byte MIME detection (the file(1)/WHATWG-sniffing approach,
    restricted to the containers this module really decodes): O(1) bytes
    inspected per payload regardless of size; unknown prefixes fall back
    to application/octet-stream. Pure function shared by the distributed
    stage and the verdict twin."""
    for pre, off2, pre2, mime in _MAGIC:
        if payload[:len(pre)] == pre and (
                not pre2 or payload[off2:off2 + len(pre2)] == pre2):
            return mime
    return "application/octet-stream"


class MimeSniff:
    """Actor-pool stage: (item_id, payload) -> (item_id, mime, n_bytes).
    Only the first ≤12 bytes of each payload are ever touched — the stage
    is IO/scan-bound by design, the cheapest possible router in front of
    the per-container decoder pools above."""

    def __call__(self, t: pa.Table) -> pa.Table:
        pl = t["payload"]
        if isinstance(pl, pa.ChunkedArray):
            pl = pl.combine_chunks()
        heads = pc.binary_slice(pl, 0, 16).to_pylist()
        sizes = pc.binary_length(pl).cast(pa.int64())
        return pa.table({
            "item_id": t["item_id"],
            "mime": pa.array([sniff_mime(h) for h in heads], pa.string()),
            "n_bytes": sizes,
        })


def media_ingest(ds, concurrency: int = 2, batch_size: int = 16):
    """The full mixed-media ingest pipeline as ONE composition: sniff
    every payload's container by magic bytes, route each slice to ITS
    real decoder pool (WAV / au / PPM / BMP / PNG / GIF / JPEG / FLAC —
    the per-container actor-pool stages above), and emit one uniform
    feature row per item: (item_id, mime, ok, units) where ``units`` is
    the decoded content size in the container's natural unit (pixels
    for images, samples x channels for audio) and unknown containers
    pass through with ok=0.

    Scale shape: the router touches ≤16 bytes per payload; each decoder
    branch is a ``filter`` + actor-pool ``map_batches`` over only its
    slice (payloads never cross a shuffle — the branches are unioned
    AFTER decode, when rows are slim feature tuples). This is exactly
    how a 100 TB crawl's media column fans out to per-codec pools.

    ``ds`` is a Dataset with (item_id, payload) columns."""
    import ray.data as rd

    def _sniff(t: pa.Table) -> pa.Table:
        pl = t["payload"]
        if isinstance(pl, pa.ChunkedArray):
            pl = pl.combine_chunks()
        heads = pc.binary_slice(pl, 0, 16).to_pylist()
        return t.append_column(
            "mime", pa.array([sniff_mime(h) for h in heads],
                             pa.string()))

    sniffed = ds.map_batches(_sniff, batch_format="pyarrow").materialize()

    def decoded_units(mime: str, decode_cls):
        def branch(t: pa.Table) -> pa.Table:
            u = decode_cls()(t.select(["item_id", "payload"]))
            if "decoded_width" in u.column_names:
                units = pc.multiply(
                    u["decoded_width"].cast(pa.int64()),
                    u["decoded_height"].cast(pa.int64()))
            else:
                units = pc.multiply(
                    u["decoded_samples"].cast(pa.int64()),
                    u["decoded_channels"].cast(pa.int64()))
            n = u.num_rows
            return pa.table({
                "item_id": u["item_id"],
                "mime": pa.array([mime] * n, pa.string()),
                "ok": pa.array(np.ones(n, np.int64)),
                "units": units,
            })

        return branch

    branches = []
    routes = [
        ("image/x-portable-pixmap", DecodePpm),
        ("image/bmp", DecodeBmp),
        ("image/png", DecodePng),
        ("image/jpeg", DecodeJpeg),
        ("audio/flac", DecodeFlac),
    ]
    for mime, cls in routes:
        part = sniffed.filter(
            lambda row, _m=mime: row["mime"] == _m)
        branches.append(part.map_batches(
            decoded_units(mime, cls), batch_format="pyarrow",
            batch_size=batch_size, concurrency=concurrency))

    def gif_units(t: pa.Table) -> pa.Table:
        ids = t["item_id"].to_pylist()
        units = []
        for p in t["payload"].to_pylist():
            px, _ncol, _il = gif_decode(p)
            units.append(px.shape[0] * px.shape[1])
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "mime": pa.array(["image/gif"] * len(ids), pa.string()),
            "ok": pa.array(np.ones(len(ids), np.int64)),
            "units": pa.array(units, pa.int64()),
        })

    branches.append(
        sniffed.filter(lambda row: row["mime"] == "image/gif")
        .map_batches(gif_units, batch_format="pyarrow",
                     batch_size=batch_size, concurrency=concurrency))

    def audio_units(mime, parser):
        def f(t: pa.Table) -> pa.Table:
            ids = t["item_id"].to_pylist()
            units = []
            for p in t["payload"].to_pylist():
                units.append(parser(p))
            return pa.table({
                "item_id": pa.array(ids, pa.int64()),
                "mime": pa.array([mime] * len(ids), pa.string()),
                "ok": pa.array(np.ones(len(ids), np.int64)),
                "units": pa.array(units, pa.int64()),
            })

        return f

    def _wav_units(p: bytes) -> int:
        import io
        import wave

        with wave.open(io.BytesIO(p)) as wf:
            return wf.getnframes() * wf.getnchannels()

    def _au_units(p: bytes) -> int:
        import struct as _s

        _magic, off, size = _s.unpack(">III", p[:12])
        return size  # one byte per mu-law sample

    branches.append(
        sniffed.filter(lambda row: row["mime"] == "audio/wav")
        .map_batches(audio_units("audio/wav", _wav_units),
                     batch_format="pyarrow", batch_size=batch_size,
                     concurrency=concurrency))
    branches.append(
        sniffed.filter(lambda row: row["mime"] == "audio/basic")
        .map_batches(audio_units("audio/basic", _au_units),
                     batch_format="pyarrow", batch_size=batch_size,
                     concurrency=concurrency))

    def unknown(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "item_id": t["item_id"],
            "mime": t["mime"],
            "ok": pa.array(np.zeros(n, np.int64)),
            "units": pa.array(np.zeros(n, np.int64)),
        })

    branches.append(
        sniffed.filter(
            lambda row: row["mime"] == "application/octet-stream")
        .map_batches(unknown, batch_format="pyarrow"))

    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out


def synth_mixed_table(n_per: int, seed: int = 43) -> pa.Table:
    """A mixed-container payload table with known ground truth: n_per REAL
    payloads of each container this module decodes (WAV/au/PPM/BMP/PNG/
    GIF/JPEG/FLAC — the same generators the decode stages are tested on)
    plus n_per unknown blobs whose first bytes collide with no magic
    (0xFE fill — 0xFF would match the JPEG SOI prefix)."""
    rng = np.random.default_rng(seed)
    parts = [
        (synth_wav_table(n_per), "audio/wav"),
        (synth_au_table(n_per), "audio/basic"),
        (synth_ppm_table(n_per), "image/x-portable-pixmap"),
        (synth_bmp_table(n_per), "image/bmp"),
        (synth_png_table(n_per), "image/png"),
        (synth_gif_table(n_per), "image/gif"),
        (synth_jpeg_table(n_per), "image/jpeg"),
        (synth_flac_table(n_per), "audio/flac"),
    ]
    ids, payloads, truth = [], [], []
    nxt = 0
    for t, mime in parts:
        for v in t["payload"].to_pylist():
            ids.append(nxt)
            payloads.append(v)
            truth.append(mime)
            nxt += 1
    for _ in range(n_per):
        blob = b"\xfe" * 16 + rng.integers(0, 256, size=64,
                                           dtype=np.uint8).tobytes()
        ids.append(nxt)
        payloads.append(blob)
        truth.append("application/octet-stream")
        nxt += 1
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "true_mime": pa.array(truth, pa.string()),
    })
