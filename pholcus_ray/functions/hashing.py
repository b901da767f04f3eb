"""Hash / fingerprint functions.

Reference parity (SURVEY.md §2.2 M16): the reference exposes CRC32, FNV64,
FNV64-of-JSON and MD5 helpers (common/util/util.go:252-283) and derives the
request dedup identity as ``md5(spider + rule + url + method)``
(app/downloader/request/request.go:139-145).

Our engine's native dedup key is a 64-bit hash of the canonical
``url + "\\x00" + method + "\\x00" + rule`` string (BASELINE.json north_star:
"dedup via URL canonicalization + xxhash before cuckoo insert"):

- ``hash64_array``: the vectorized hot path — pandas' C-level 64-bit string
  hasher (deterministic, fixed key, stable across processes/machines).
- ``xxhash64``: a from-scratch pure-Python implementation of the public
  XXH64 spec, used for spec-conformance tests and anywhere a single key is
  hashed; NOT the hot path (no C xxhash module is available in this sandbox).
- ``md5_unique``: reference-compatible dedup identity (md5 hex), for
  conformance against the reference's history files.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pandas.util import hash_array

_MASK64 = 0xFFFFFFFFFFFFFFFF

# --- vectorized 64-bit key hash (hot path) ---------------------------------


def hash64_array(values) -> np.ndarray:
    """Deterministic uint64 hash of an array-like of strings (vectorized, C).

    Stable across processes and machines (pandas hashes object/string arrays
    with a fixed SipHash-1-3 key). This is the key that routes to seen-set
    shards and feeds cuckoo fingerprints.
    """
    arr = np.asarray(values, dtype=object)
    return hash_array(arr, categorize=False)


def hash64(value: str) -> int:
    """Scalar convenience wrapper around :func:`hash64_array`."""
    return int(hash64_array([value])[0])


def dedup_key_array(urls, methods=None, rules=None) -> np.ndarray:
    """Vectorized dedup identity: hash64(url + NUL + method + NUL + rule).

    Mirrors the *semantics* of Request.Unique() (request.go:139-145): the
    identity is (url, method, rule); spider is implicit (one job = one spider).

    The NUL join runs through Arrow's ``binary_join_element_wise``: a
    pandas object-series ``u + "\\x00" + m`` add SILENTLY DROPS the
    separator (numpy coerces the python scalar to a fixed-width unicode
    scalar and ``np.str_("\\x00") == ""``), which made (url, method, rule)
    boundary-ambiguous. Keys changed when this was fixed —
    ``_RESULT_SCHEMA_VERSION`` was bumped so old workdir checkpoints
    restart cold instead of mixing key spaces.
    """
    import pyarrow as pa

    u = pa.array(np.asarray(urls, dtype=object), pa.string())
    m = (pa.array(np.asarray(methods, dtype=object), pa.string())
         if methods is not None else "GET")
    r = (pa.array(np.asarray(rules, dtype=object), pa.string())
         if rules is not None else "")
    return dedup_key_arrow(u, m, r)


def dedup_key_arrow(urls, methods, rules) -> np.ndarray:
    """:func:`dedup_key_array` for Arrow string arrays (or scalar
    method/rule): one C-level ``binary_join_element_wise`` + one C-level
    hash pass — the frontier hot path (10^5+ seed rows per round) stays
    object-free until the final hash call."""
    import pyarrow.compute as pc

    combined = pc.binary_join_element_wise(urls, methods, rules, "\x00")
    return hash_array(combined.to_numpy(zero_copy_only=False),
                      categorize=False)


# --- DuckDB-replicable 64-bit hash (SQL-oracle path) ------------------------


def md5_lower64_array(values) -> np.ndarray:
    """uint64 hash of each string: bytes 8..16 of the md5 digest read
    little-endian — BIT-IDENTICAL to DuckDB's ``md5_number_lower()``.

    This is the hash the content-defined operators (minhash shingles,
    simhash token votes) use, precisely so their full constructions can be
    replayed inside a DuckDB SQL oracle with no UDF: same digest, same byte
    order, same 64-bit value. It is a Python-loop hash (hashlib has no
    vectorized form), so it stays OFF the crawl hot path — request dedup /
    shard routing keeps the C-level ``hash64_array``.
    """
    out = np.empty(len(values), dtype=np.uint64)
    md5 = hashlib.md5
    for i, s in enumerate(values):
        out[i] = int.from_bytes(md5(s.encode("utf-8")).digest()[8:16], "little")
    return out


# --- reference-compatible md5 identity -------------------------------------


def md5_unique(spider: str, rule: str, url: str, method: str) -> str:
    """md5 hex of spider+rule+url+method — reference Request.Unique() compat
    (request.go:139-145)."""
    return hashlib.md5((spider + rule + url + method).encode("utf-8")).hexdigest()


# --- pure-Python XXH64 (public spec) ---------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK64
    return (_rotl(acc, 31) * _P1) & _MASK64


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` per the public xxHash specification."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK64
        v2 = (seed + _P2) & _MASK64
        v3 = seed & _MASK64
        v4 = (seed - _P1) & _MASK64
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _MASK64
    h = (h + n) & _MASK64
    while pos + 8 <= n:
        h ^= _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK64
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * _P1) & _MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _MASK64
        h = (_rotl(h, 11) * _P1) & _MASK64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK64
    h ^= h >> 29
    h = (h * _P3) & _MASK64
    h ^= h >> 32
    return h


# --- content fingerprints (training-data ops) ------------------------------


def fingerprint64_text(texts) -> np.ndarray:
    """Deterministic 64-bit content fingerprint of text values (vectorized)."""
    return hash64_array(texts)


def md5_hex_array(texts) -> np.ndarray:
    """md5 hex per value — matches DuckDB ``md5(text)`` for the SQL oracle."""
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        out[i] = hashlib.md5(str(t).encode("utf-8")).hexdigest()
    return out
