"""Arrow schemas and ordering keys for the frontier machinery.

The frontier record mirrors the reference's ``Request``
(app/downloader/request/request.go:20-43) plus round bookkeeping
(SURVEY.md §1.7, FIXTURES.md §3).

Ordering (``seq``): the reference pulls highest priority first, FIFO within
priority (matrix.go:88-124), where FIFO order is enqueue order. Our
deterministic, distributed-friendly equivalent is a **lexicographic path
seq**: a seed gets ``%08x(seed_index)``; the k-th request enqueued by a page
gets ``parent_seq + %08x(k)``. Within a BFS round, enqueue order == sorting
by ``seq`` (parents were processed in seq order, each parent enqueues in
document order), so ``sort(priority desc, seq asc)`` reproduces
priority-then-FIFO without ever assigning a global dense counter — no
driver-side bottleneck at 10^10 rows.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyarrow as pa

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),        # canonical absolute url
        ("host", pa.string()),
        ("key", pa.uint64()),        # dedup identity hash64(url\0method\0rule)
        ("rule", pa.string()),
        ("method", pa.string()),     # GET | POST | POST-M | HEAD (param.go:61-84)
        ("post_data", pa.string()),  # request body, mirrors Request.PostData
        ("priority", pa.int32()),
        ("depth", pa.int32()),
        ("referer", pa.string()),
        ("anchor", pa.string()),
        ("seq", pa.string()),        # lexicographic path, 8 hex chars per level
        ("attempts_done", pa.int32()),
        ("bypass_dedup", pa.bool_()),
        ("reloadable", pa.bool_()),
        ("keyin", pa.string()),
        ("temp", pa.string()),       # JSON map, mirrors Request.Temp
    ]
)

TAGGED_SCHEMA = FRONTIER_SCHEMA.append(pa.field("deferred", pa.bool_()))

FILE_STRUCT = pa.struct(
    [
        ("name", pa.string()),
        ("data", pa.binary()),
    ]
)

LINK_STRUCT = pa.struct(
    [
        ("url", pa.string()),
        ("rule", pa.string()),
        ("method", pa.string()),
        ("post_data", pa.string()),
        ("priority", pa.int32()),
        ("anchor", pa.string()),
        ("reloadable", pa.bool_()),
        ("temp", pa.string()),
    ]
)

RESULT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("key", pa.uint64()),
        ("rule", pa.string()),
        ("method", pa.string()),
        ("post_data", pa.string()),
        ("priority", pa.int32()),
        ("depth", pa.int32()),
        ("referer", pa.string()),
        ("seq", pa.string()),
        ("keyin", pa.string()),
        ("temp", pa.string()),
        ("status", pa.int32()),
        ("ok", pa.bool_()),
        ("attempts", pa.int32()),
        ("set_cookie", pa.string()),        # Set-Cookie observed ('' = none); the
                                            # driver merges these into the jar at
                                            # round end, in seq order (ST1)
        ("n_items", pa.int32()),            # len(items): metadata-cheap accounting
        ("items", pa.list_(pa.string())),   # JSON-encoded DataCells
        ("links", pa.list_(LINK_STRUCT)),
        ("files", pa.list_(FILE_STRUCT)),   # FileCell outputs (data.go:48-54)
    ]
)

CRAWL_LOG_SCHEMA = pa.schema(
    [
        ("round", pa.int32()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("seq", pa.string()),
        ("depth", pa.int32()),
        ("ok", pa.bool_()),
        ("status", pa.int32()),
        ("attempts", pa.int32()),
    ]
)

ITEMS_SCHEMA = pa.schema(
    [
        ("rule", pa.string()),
        ("data", pa.string()),       # JSON object (per-rule dynamic fields)
        ("url", pa.string()),
        ("parent_url", pa.string()),
        ("download_time", pa.string()),
        ("round", pa.int32()),
    ]
)

_VIRTUAL_T0 = datetime(2026, 3, 15)


def seed_seq(i: int) -> str:
    return f"{i:08x}"


def seed_seq_array(idx: "np.ndarray") -> pa.Array:
    """Vectorized :func:`seed_seq` over a uint64 index array — builds the
    8-hex-char strings as raw nibble-indexed bytes plus an offsets buffer
    (zero per-row python; a 165k-seed frontier pays ~60ms of f-string
    formatting otherwise). Falls back to the scalar form for indices that
    need more than 8 hex digits (f-strings widen past 2^32; byte-parity
    with the oracle demands the identical widening)."""
    import numpy as np

    idx = np.asarray(idx, dtype=np.uint64)
    if idx.size and int(idx.max()) > 0xFFFFFFFF:
        return pa.array([seed_seq(int(i)) for i in idx], pa.string())
    v = idx.astype(np.uint32)
    nib = np.empty((v.size, 8), np.uint8)
    for k in range(8):
        nib[:, k] = ((v >> np.uint32(4 * (7 - k))) & np.uint32(0xF)).astype(
            np.uint8
        )
    hexd = np.frombuffer(b"0123456789abcdef", np.uint8)
    data = hexd[nib].tobytes()
    offsets = np.arange(0, (v.size + 1) * 8, 8, dtype=np.int32)
    return pa.StringArray.from_buffers(
        v.size, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)
    )


def child_seq(parent_seq: str, ordinal: int) -> str:
    return parent_seq + f"{ordinal:08x}"


def virtual_download_time(round_idx: int, round_virtual_sec: float,
                          t0_sec: float = 0.0) -> str:
    """Deterministic per-round DownloadTime (replaces wall-clock,
    data/data.go:37-45's DownloadTime column). ``t0_sec`` offsets the whole
    run on the virtual clock (recurring crawls start at their fire time)."""
    return (_VIRTUAL_T0 + timedelta(
        seconds=t0_sec + round_idx * round_virtual_sec)).isoformat()


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


# --- ordering ranks for the two-phase claim/resolve protocol ----------------
# A row's rank is a byte string whose lexicographic order equals the
# scheduling order (bypass first / priority desc / seq asc). Ranks are unique
# per row (they end in the unique seq), so "min rank per key" and "cap
# smallest ranks per host" have unique, order-independent answers — the
# property that makes the distributed claim/resolve fold byte-equal to the
# sequential oracle.

_PRIO_MAX = 0x7FFFFFFF


def dedup_rank(bypass: bool, priority: int, seq: str) -> bytes:
    return (
        (b"\x00" if bypass else b"\x01")
        + (_PRIO_MAX - int(priority)).to_bytes(4, "big")
        + seq.encode()
    )


def cap_rank(priority: int, seq: str) -> bytes:
    return (_PRIO_MAX - int(priority)).to_bytes(4, "big") + seq.encode()


# --- vectorized (Arrow) rank builders: C-level kernels for the driver
# control plane; byte-identical to the scalar builders above (the scalar
# functions remain as the spec the property tests check against) -----------

_PRIO_BYTES_TABLE = pa.array(
    [(_PRIO_MAX - p).to_bytes(4, "big") for p in range(256)], pa.binary()
)


def _prio_bytes(prio_col: pa.Array) -> pa.Array:
    import pyarrow.compute as pc

    import numpy as np

    pr = prio_col.to_numpy(zero_copy_only=False)
    # negative priorities would index the lookup table from the end —
    # fall back to the scalar spec outside the fast path's [0, 255] range
    if pr.size and (pr.max() > 255 or pr.min() < 0):
        return pa.array([(int(_PRIO_MAX) - int(p)).to_bytes(4, "big") for p in pr],
                        pa.binary())
    return _PRIO_BYTES_TABLE.take(prio_col.cast(pa.int32()))


def dedup_rank_arrow(bypass_col, prio_col, seq_col) -> pa.Array:
    import pyarrow.compute as pc

    def _arr(c):
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    bypass_col, prio_col, seq_col = _arr(bypass_col), _arr(prio_col), _arr(seq_col)
    prefix = pc.if_else(
        bypass_col, pa.scalar(b"\x00", pa.binary()), pa.scalar(b"\x01", pa.binary())
    )
    return pc.binary_join_element_wise(
        prefix, _prio_bytes(prio_col), seq_col.cast(pa.binary()), b""
    )


def cap_rank_arrow(prio_col, seq_col) -> pa.Array:
    import pyarrow.compute as pc

    def _arr(c):
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    prio_col, seq_col = _arr(prio_col), _arr(seq_col)
    return pc.binary_join_element_wise(
        _prio_bytes(prio_col), seq_col.cast(pa.binary()), b""
    )
