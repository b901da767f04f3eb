"""The sharded URL-seen actor pool and its client handle.

Routing: ``shard = key % num_shards``. The dedup map_batches stage holds a
``ShardedSeen`` (actor handles serialize into the worker) and issues batched
``insert_if_absent`` RPCs — one RPC per touched shard per batch, vectorized
numpy in and out. Shards are ``num_cpus=0`` actors: they are memory services,
not compute, and must never starve the fetch/parse pools of CPU slots.

Checkpointing is by DELTA: each shard remembers the keys inserted since its
last ``delta_dump`` and the crawl loop persists one ``.npy`` per shard per
round. Restore replays all round deltas (order-independent for membership),
which keeps per-round checkpoint IO proportional to newly discovered urls,
not to the total seen set — the property that matters at a 10^10-key
frontier.
"""

from __future__ import annotations

import os

import numpy as np
import ray

from .cuckoo import make_store


def slice_positions(coll, sel: np.ndarray):
    """Slice a collection (python list OR arrow array) by positions — arrow
    take is a C kernel; the python fallback keeps the oracle path. Shared by
    ShardedSeen and HostBudget (one copy of the routing slice)."""
    if isinstance(coll, list):
        return [coll[i] for i in sel]
    import pyarrow as pa

    return coll.take(pa.array(sel))


_slice_ranks = slice_positions  # local alias (historical name)


@ray.remote(num_cpus=0)
class SeenShardActor:
    def __init__(self, mode: str, capacity: int, seed: int):
        self.store = make_store(mode, capacity, seed=seed)
        self._delta: list[np.ndarray] = []
        self._claims: dict[int, bytes] = {}

    def insert_if_absent(self, keys: np.ndarray) -> np.ndarray:
        mask = self.store.insert_if_absent(keys)
        if mask.any():
            self._delta.append(keys[mask].astype(np.uint64))
        return mask

    # --- two-phase intra-round winner selection (shuffle-free dedup) ---
    # Phase A (claim): every candidate row registers (key, rank); the shard
    # keeps the MINIMUM rank per key — a commutative fold, so arrival order
    # cannot change the outcome. Phase B (resolve): a row wins iff its rank
    # IS the minimum (ranks are unique per row: they embed the unique seq),
    # and — for normal rows — its key was not seen in a previous round
    # (insert-if-absent at enqueue, matrix.go:81-86 semantics).

    def begin_round(self) -> None:
        self._claims = {}
        self._round_winners: set[int] = set()

    def claim(self, keys: np.ndarray, ranks) -> None:
        if not isinstance(ranks, list):
            ranks = ranks.to_pylist()
        c = self._claims
        for k, r in zip(keys, ranks):
            k = int(k)
            cur = c.get(k)
            if cur is None or r < cur:
                c[k] = r

    def resolve(self, keys: np.ndarray, ranks,
                exempt: np.ndarray) -> np.ndarray:
        """Winner mask; winners that are not exempt (bypass/reloadable) are
        inserted into the seen store (reloadable winners are exempt and NOT
        inserted, mirroring Reloadable's dedup opt-out). Idempotent within a
        round (``_round_winners``), so Ray task retries cannot drop rows."""
        if not isinstance(ranks, list):
            ranks = ranks.to_pylist()
        c = self._claims
        winners = getattr(self, "_round_winners", set())
        self._round_winners = winners
        out = np.zeros(len(keys), dtype=bool)
        to_insert = []
        ins_pos = []
        for i, (k, r) in enumerate(zip(keys, ranks)):
            k = int(k)
            if c.get(k) == r:
                if exempt[i]:
                    out[i] = True
                elif k in winners:
                    out[i] = True
                else:
                    to_insert.append(k)
                    ins_pos.append(i)
        if to_insert:
            arr = np.array(to_insert, dtype=np.uint64)
            mask = self.store.insert_if_absent(arr)
            if mask.any():
                self._delta.append(arr[mask])
            for j, pos in enumerate(ins_pos):
                if mask[j]:
                    out[pos] = True
                    winners.add(to_insert[j])
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self.store.contains(keys)

    def insert_bulk(self, keys: np.ndarray) -> int:
        """Restore path: insert without recording deltas."""
        mask = self.store.insert_if_absent(keys)
        return int(mask.sum())

    def count(self) -> int:
        return self.store.count

    def delta_dump(self) -> np.ndarray:
        if self._delta:
            out = np.concatenate(self._delta)
        else:
            out = np.empty(0, dtype=np.uint64)
        self._delta = []
        return out

    def keys_array(self) -> np.ndarray:
        """Exact mode only: full sorted key dump (final url_seen output)."""
        return self.store.keys_array()


class ShardedSeen:
    """Driver/worker-side client over the shard actors (picklable)."""

    def __init__(self, num_shards: int, mode: str = "exact",
                 capacity_per_shard: int = 1 << 20, seed: int = 0):
        self.num_shards = num_shards
        self.mode = mode
        self.shards = [
            SeenShardActor.remote(mode, capacity_per_shard, seed + i)
            for i in range(num_shards)
        ]

    def _route(self, keys: np.ndarray):
        keys = keys.astype(np.uint64, copy=False)
        shard_ids = (keys % np.uint64(self.num_shards)).astype(np.int64)
        return keys, shard_ids

    def insert_if_absent(self, keys: np.ndarray) -> np.ndarray:
        """Batched cross-shard insert; returns was_new mask aligned to keys."""
        keys, shard_ids = self._route(keys)
        out = np.zeros(len(keys), dtype=bool)
        idxs, refs = [], []
        for s in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == s)
            idxs.append(sel)
            refs.append(self.shards[int(s)].insert_if_absent.remote(keys[sel]))
        for sel, mask in zip(idxs, ray.get(refs)):
            out[sel] = mask
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys, shard_ids = self._route(keys)
        out = np.zeros(len(keys), dtype=bool)
        idxs, refs = [], []
        for s in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == s)
            idxs.append(sel)
            refs.append(self.shards[int(s)].contains.remote(keys[sel]))
        for sel, mask in zip(idxs, ray.get(refs)):
            out[sel] = mask
        return out

    def begin_round(self) -> None:
        ray.get([s.begin_round.remote() for s in self.shards])

    def claim(self, keys: np.ndarray, ranks) -> None:
        keys, shard_ids = self._route(keys)
        refs = []
        for s in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == s)
            refs.append(
                self.shards[int(s)].claim.remote(keys[sel], _slice_ranks(ranks, sel))
            )
        ray.get(refs)

    def resolve(self, keys: np.ndarray, ranks,
                exempt: np.ndarray) -> np.ndarray:
        keys, shard_ids = self._route(keys)
        out = np.zeros(len(keys), dtype=bool)
        idxs, refs = [], []
        for s in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == s)
            idxs.append(sel)
            refs.append(
                self.shards[int(s)].resolve.remote(
                    keys[sel], _slice_ranks(ranks, sel), exempt[sel]
                )
            )
        for sel, mask in zip(idxs, ray.get(refs)):
            out[sel] = mask
        return out

    def counts(self) -> list[int]:
        return ray.get([s.count.remote() for s in self.shards])

    def total(self) -> int:
        return sum(self.counts())

    # --- checkpoint (delta) ---

    def dump_deltas(self, out_dir: str) -> int:
        os.makedirs(out_dir, exist_ok=True)
        deltas = ray.get([s.delta_dump.remote() for s in self.shards])
        n = 0
        for i, d in enumerate(deltas):
            np.save(os.path.join(out_dir, f"shard_{i:04d}.npy"), d)
            n += len(d)
        return n

    def restore_deltas(self, delta_dirs: list[str]) -> int:
        """Replay per-round delta dumps (membership-equivalent restore)."""
        per_shard: list[list[np.ndarray]] = [[] for _ in range(self.num_shards)]
        for d in delta_dirs:
            for i in range(self.num_shards):
                p = os.path.join(d, f"shard_{i:04d}.npy")
                if os.path.exists(p):
                    arr = np.load(p)
                    if len(arr):
                        per_shard[i].append(arr)
        refs = []
        for i, chunks in enumerate(per_shard):
            if chunks:
                refs.append(self.shards[i].insert_bulk.remote(np.concatenate(chunks)))
        return sum(ray.get(refs)) if refs else 0

    def all_keys(self) -> np.ndarray:
        """Exact mode: the full sorted seen-key set (final url_seen dump)."""
        parts = ray.get([s.keys_array.remote() for s in self.shards])
        if not parts:
            return np.empty(0, dtype=np.uint64)
        return np.sort(np.concatenate(parts))
