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

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        fmts, ws, hs, means = [], [], [], []
        for p in payloads:
            fmts.append(p[:4].rstrip(b"\0").decode())
            ws.append(int.from_bytes(p[4:8], "big"))
            hs.append(int.from_bytes(p[8:12], "big"))
            body = np.frombuffer(p[12:], dtype=np.uint8)
            means.append(round(float(body.mean()) if len(body) else 0.0, 4))
        return pa.table(
            {
                "image_id": t["image_id"],
                "decoded_format": pa.array(fmts, pa.string()),
                "decoded_width": pa.array(ws, pa.int32()),
                "decoded_height": pa.array(hs, pa.int32()),
                "mean_intensity": pa.array(means, pa.float64()),
                "content_hash": pa.array(
                    hash64_array([p.hex() for p in payloads]), pa.uint64()
                ),
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
