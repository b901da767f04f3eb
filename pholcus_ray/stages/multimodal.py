"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata struct
columns; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. Container formats the stdlib can parse are decoded
FOR REAL: WAV via the ``wave`` module (DecodeWav) and binary netpbm
PPM/PGM via a pure header parse (DecodePpm) — genuine bytes any external
tool would accept. Only compressed codecs (png/jpg/webp, mp3/ogg/flac,
h264) need PIL/cv2/librosa/ffmpeg, which are absent in this container, so
those constructors raise NotImplementedError; the deterministic fake
backend keeps the Ray-side plumbing — schemas, batch sizing for wide
binary rows, actor signature, output layout — testable for them too.

Scale notes: binary payloads dominate block size; these stages must run
with small ``batch_size`` (tens of rows) and the payload column must be
dropped before any shuffle (same html rule as the crawl fetch stage,
SURVEY.md §7.4.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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
    as DecodeImage; compressed formats (png/jpg/webp) stay library-gated."""

    def __init__(self, backend: str = "ppm"):
        if backend != "ppm":
            raise NotImplementedError(
                "compressed image codecs (png/jpg/webp) need PIL/cv2, absent "
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
