"""Per-host politeness budget actors — the distributed priority queue.

This IS the north_star's "per-host politeness priority queue hosted in Ray
actor pools": hosts shard across actors by hash(host); each round, every
candidate row CLAIMS (host, rank) where rank embeds (priority desc, seq asc);
at resolve time a host's budget of ``cap = max(1, floor(round_virtual_sec /
crawl_delay))`` admits exactly the cap smallest ranks — the deterministic
top-k of the host's queue — and the rest are deferred to the next round.

Two-phase claim/resolve is commutative (min-k fold), so the distributed
outcome is byte-equal to the sequential oracle regardless of batch arrival
order, with NO shuffle: the hot host costs one actor's sort of its claims,
not a single straggler task dragging the whole candidate set
(SURVEY.md §7.4.5).

Memory: per round, each shard holds its hosts' claims; the accepted sets are
bounded by sum-of-caps (== the number of rows that can be scheduled).
"""

from __future__ import annotations

import numpy as np
import ray

from .hostpolicy import HostPolicy


@ray.remote(num_cpus=0)
class HostBudgetShard:
    def __init__(self, policy: HostPolicy, round_virtual_sec: float):
        self.policy = policy
        self.round_virtual_sec = round_virtual_sec
        self._claims: dict[str, set[bytes]] = {}
        self._accepted: dict[str, set[bytes]] | None = None

    def begin_round(self) -> None:
        self._claims = {}
        self._accepted = None

    def claim(self, hosts, ranks) -> None:
        # sets make claims idempotent under Ray task retries
        if not isinstance(hosts, list):
            hosts = hosts.to_pylist()
        if not isinstance(ranks, list):
            ranks = ranks.to_pylist()
        c = self._claims
        for h, r in zip(hosts, ranks):
            s = c.get(h)
            if s is None:
                c[h] = {r}
            else:
                s.add(r)

    def _finalize(self) -> None:
        acc: dict[str, set[bytes]] = {}
        for h, rs in self._claims.items():
            cap = self.policy.cap_per_round(h, self.round_virtual_sec)
            if len(rs) <= cap:
                acc[h] = set(rs)
            else:
                acc[h] = set(sorted(rs)[:cap])
        self._accepted = acc

    def resolve(self, hosts, ranks) -> np.ndarray:
        if self._accepted is None:
            self._finalize()
        if not isinstance(hosts, list):
            hosts = hosts.to_pylist()
        if not isinstance(ranks, list):
            ranks = ranks.to_pylist()
        acc = self._accepted
        out = np.zeros(len(hosts), dtype=bool)
        for i, (h, r) in enumerate(zip(hosts, ranks)):
            s = acc.get(h)
            if s is not None and r in s:
                out[i] = True
        return out


class HostBudget:
    """Client over the budget shards (picklable; routes by hash(host))."""

    def __init__(self, policy: HostPolicy, round_virtual_sec: float,
                 num_shards: int = 4):
        self.num_shards = num_shards
        self.shards = [
            HostBudgetShard.remote(policy, round_virtual_sec)
            for _ in range(num_shards)
        ]

    def _route(self, hosts) -> np.ndarray:
        from ..functions.hashing import hash64_array

        if not isinstance(hosts, list):
            hosts = hosts.to_pylist()
        return (hash64_array(hosts) % np.uint64(self.num_shards)).astype(np.int64)

    @staticmethod
    def _slice(coll, sel: np.ndarray):
        from .seen import slice_positions

        return slice_positions(coll, sel)

    def begin_round(self) -> None:
        ray.get([s.begin_round.remote() for s in self.shards])

    def claim(self, hosts, ranks) -> None:
        sid = self._route(hosts)
        refs = []
        for s in np.unique(sid):
            sel = np.flatnonzero(sid == s)
            refs.append(
                self.shards[int(s)].claim.remote(
                    self._slice(hosts, sel), self._slice(ranks, sel)
                )
            )
        ray.get(refs)

    def resolve(self, hosts, ranks) -> np.ndarray:
        sid = self._route(hosts)
        out = np.zeros(len(hosts), dtype=bool)
        idxs, refs = [], []
        for s in np.unique(sid):
            sel = np.flatnonzero(sid == s)
            idxs.append(sel)
            refs.append(
                self.shards[int(s)].resolve.remote(
                    self._slice(hosts, sel), self._slice(ranks, sel)
                )
            )
        for sel, mask in zip(idxs, ray.get(refs)):
            out[sel] = mask
        return out
