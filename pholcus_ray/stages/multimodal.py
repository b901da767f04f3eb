"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata struct
columns; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The image/audio codec libraries are NOT present in
this container, so the codec call itself is stubbed (DecodeImage with
``backend="real"`` raises NotImplementedError at construction); the
deterministic fake backend makes the Ray-side plumbing — schemas, batch
sizing for wide binary rows, actor signature, output layout — real and
testable end-to-end.

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
