"""Sharded URL-seen set: cuckoo filter (approximate) or exact set.

Reference parity (SURVEY.md §2.3 ST5, §2.7 D1/D2): the reference keeps the
seen-set as in-process Go maps per spider (app/aid/history/success.go:16-23,
app/scheduler/matrix.go:25-26, 81-86, 241-255) — insert at enqueue time
("tempHistory"), with ``Reloadable`` requests bypassing the check, and failed
requests bypassing dedup on their one requeue (matrix.go:144-204).

Our design (BASELINE.json north_star): a **sharded cuckoo-filter actor pool**.
Keys are 64-bit url-identity hashes (functions.hashing.dedup_key_array);
``shard = key % S``; the dedup stage batches ``insert_if_absent(keys)`` RPCs.
Shard count scales with cluster size (2-4x nodes); each shard holds either

- ``exact``: a Python set of int keys (8 B/key + set overhead; used for
  conformance and as the default at test scale), or
- ``cuckoo``: a from-scratch cuckoo filter — numpy uint16 fingerprint table,
  4 slots/bucket, partial-cubby-kicking eviction — ~2.2 B/key at 95% load,
  the memory-bound path for a 10^10-key frontier (~23 GB across shards
  vs ~80 GB exact).

Determinism: within a round the engine first reduces candidates to one row
per key (groupby-key winner selection), so insert order across shards cannot
change the outcome; cuckoo eviction uses a per-shard seeded RNG so dumps are
reproducible.

Cuckoo filter follows the public design of Fan et al., "Cuckoo Filter:
Practically Better Than Bloom" (CoNEXT 2014).
"""

from __future__ import annotations

import numpy as np

_FP_MUL = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier for i2 derivation


class CuckooFilter:
    """Approximate membership with deletion-free insert_if_absent semantics."""

    def __init__(self, capacity: int, bucket_size: int = 4, seed: int = 0,
                 max_kicks: int = 500):
        n_buckets = 1
        while n_buckets * bucket_size < capacity / 0.95:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self._mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self._rng = np.random.default_rng(seed)
        self.count = 0
        # (fingerprint, bucket) pairs left homeless by an exhausted kick
        # chain (rare). The chain conserves table occupancy, so the entry
        # that loses its slot is the LAST EVICTED VICTIM, not the new key —
        # stashing the victim's (fp, alternate-bucket) preserves the no-
        # false-negative guarantee for every previously inserted key.
        self.stash: set[tuple[int, int]] = set()

    # fingerprints are non-zero uint16; index2 = index1 ^ h(fp)
    def _fp_i1_i2(self, keys: np.ndarray):
        keys = keys.astype(np.uint64, copy=False)
        fp = ((keys >> np.uint64(48)) ^ (keys >> np.uint64(24))).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (keys & self._mask).astype(np.uint64)
        i2 = (i1 ^ ((fp.astype(np.uint64) * _FP_MUL) & self._mask)) & self._mask
        return fp, i1.astype(np.int64), i2.astype(np.int64)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership test -> bool mask."""
        fp, i1, i2 = self._fp_i1_i2(keys)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.stash:
            for j in np.flatnonzero(~hit):
                if (int(fp[j]), int(i1[j])) in self.stash or \
                   (int(fp[j]), int(i2[j])) in self.stash:
                    hit[j] = True
        return hit

    def insert_if_absent(self, keys: np.ndarray) -> np.ndarray:
        """Insert each key not already present; returns was_new mask.

        Duplicate keys inside one call: the first occurrence is new, the
        rest are not (callers pass round-deduped keys, but this is safe).
        """
        fp, i1, i2 = self._fp_i1_i2(keys)
        present = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        was_new = np.zeros(len(keys), dtype=bool)
        for j in range(len(keys)):
            f, a, b = fp[j], i1[j], i2[j]
            if present[j] or (int(f), int(a)) in self.stash or \
                    (int(f), int(b)) in self.stash:
                continue
            # re-check: an earlier insert in this call may have added this fp
            if (self.table[a] == f).any() or (self.table[b] == f).any():
                continue
            was_new[j] = True
            self._insert_one(f, a, b)
        return was_new

    def _insert_one(self, f: np.uint16, a: int, b: int) -> None:
        for idx in (a, b):
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = f
                self.count += 1
                return
        # evict (cuckoo kick)
        idx = a if self._rng.integers(2) else b
        cur = f
        for _ in range(self.max_kicks):
            slot = int(self._rng.integers(self.bucket_size))
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            idx = (int(idx) ^ ((int(cur) * int(_FP_MUL)) & int(self._mask))) & int(
                self._mask
            )
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                return
        # kick chain exhausted: every swap conserved occupancy, so the new
        # fp IS in the table and ``cur`` (the final evicted victim) is the
        # homeless one; ``idx`` is cur's alternate bucket. Stash it so the
        # victim's key still tests present.
        self.stash.add((int(cur), int(idx)))
        self.count += 1

    def load_factor(self) -> float:
        return float((self.table != 0).sum()) / self.table.size

    # --- checkpoint ---
    def dump(self) -> dict:
        return {
            "kind": "cuckoo",
            "table": self.table.copy(),
            "count": self.count,
            "stash": np.array(sorted(self.stash), dtype=np.uint64).reshape(-1, 2),
            "rng_state": self._rng.bit_generator.state,
        }

    def load(self, blob: dict) -> None:
        self.table = blob["table"].copy()
        self.count = int(blob["count"])
        self.stash = {(int(f), int(i)) for f, i in blob["stash"]}
        self._rng.bit_generator.state = blob["rng_state"]


class ExactSet:
    """Exact membership (conformance mode): a set of int keys."""

    def __init__(self):
        self._s: set[int] = set()

    @property
    def count(self) -> int:
        return len(self._s)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        s = self._s
        return np.fromiter((int(k) in s for k in keys), dtype=bool, count=len(keys))

    def insert_if_absent(self, keys: np.ndarray) -> np.ndarray:
        s = self._s
        out = np.zeros(len(keys), dtype=bool)
        for j, k in enumerate(keys):
            k = int(k)
            if k not in s:
                s.add(k)
                out[j] = True
        return out

    def dump(self) -> dict:
        return {"kind": "exact", "keys": np.fromiter(self._s, dtype=np.uint64)}

    def load(self, blob: dict) -> None:
        self._s = set(int(x) for x in blob["keys"])

    def keys_array(self) -> np.ndarray:
        return np.sort(np.fromiter(self._s, dtype=np.uint64))


def make_store(mode: str, capacity: int, seed: int = 0):
    if mode == "exact":
        return ExactSet()
    if mode == "cuckoo":
        return CuckooFilter(capacity, seed=seed)
    raise ValueError(f"unknown seen-set mode {mode!r}")
