"""Claim/resolve scheduling stages — shuffle-free dedup + politeness.

The round's control plane is three barrier-separated map_batches passes over
slim frontier rows (NO groupby shuffles; the shared mutable state lives in
the seen-shard and host-budget actors, with commutative claim/resolve folds
that make the outcome independent of batch arrival order — see
state/seen.py and state/hostbudget.py):

1. ``ClaimSeen``      — every candidate claims (key, dedup_rank); pass-through.
2. ``ResolveSeenRobotsCapClaim`` — resolve dedup winners (insert-at-enqueue,
   matrix.go:81-86), drop robots-disallowed rows, claim (host, cap_rank)
   against the politeness budget.
3. ``ResolveCapSpill`` — resolve the per-host budget; scheduled rows flow on
   to fetch, deferred rows are spilled to the round's ``deferred/`` dir with
   ``bypass_dedup=True`` (they re-enter the next round past dedup).

Spill files are named by a content hash so Ray task retries overwrite
rather than duplicate.

An earlier implementation expressed the same semantics as
``groupby(key).map_groups`` + two salted ``groupby(host)`` cap stages; at
thousands of single-row groups per round the per-group UDF overhead
dominated wall time (~20-80 s/round). The claim/resolve actors replace all
three shuffles with batched RPCs.
"""

from __future__ import annotations

import os
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..model import FRONTIER_SCHEMA, cap_rank_arrow, dedup_rank_arrow
from ..state.hostbudget import HostBudget
from ..state.hostpolicy import HostPolicy
from ..state.seen import ShardedSeen


def robots_filter_table(t: pa.Table, policy: HostPolicy) -> pa.Table:
    """Robots Disallow filter: only rows whose host actually HAS rules are
    checked; the check itself is C-level — path extraction via two regex
    kernels (urlsplit(url).path-or-"/" semantics) and one starts_with pass
    per (ruled host, prefix), which for real robots files is a handful of
    vector ops instead of a per-row python loop (the loop cost ~0.7s per
    165k-row round). Any row the path regex cannot parse falls back to the
    per-row urlsplit path, so semantics are identical by construction.
    THE robots implementation — shared by the distributed stage below and
    the driver-local round path (one copy, conformance depends on it)."""
    import pyarrow.compute as pc

    ruled = policy.hosts_with_rules()
    if not ruled:
        return t
    hosts = t["host"]
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    affected = pc.is_in(hosts, value_set=pa.array(sorted(ruled), pa.string()))
    aff_np = affected.to_numpy(zero_copy_only=False)
    if not aff_np.any():
        return t
    aff_idx = np.flatnonzero(aff_np)
    sub_urls = t["url"].take(pa.array(aff_idx))
    sub_hosts = hosts.take(pa.array(aff_idx))
    # path = urlsplit(url).path or "/": strip scheme://netloc, strip ?query
    # and #fragment, default "/" — all C kernels over the affected subset
    rest = pc.replace_substring_regex(
        sub_urls, pattern=r"^[a-z+.-]+://[^/?#]*", replacement="",
        max_replacements=1,
    )
    paths = pc.replace_substring_regex(
        rest, pattern=r"[?#].*$", replacement="", max_replacements=1
    )
    paths = pc.if_else(pc.equal(paths, ""), pa.scalar("/", pa.string()), paths)
    # rows whose url didn't match the scheme pattern (rest == url) keep the
    # exact python semantics
    odd = pc.equal(rest, sub_urls).to_numpy(zero_copy_only=False)
    keep_sub = np.ones(len(aff_idx), dtype=bool)
    # loop bounded by ruled hosts PRESENT in this batch (not the rule set)
    present = set(pc.unique(sub_hosts).to_pylist())
    for host in sorted(ruled & present):
        hmask = pc.equal(sub_hosts, host).to_numpy(zero_copy_only=False)
        for pfx in policy._disallow[host]:
            viol = pc.starts_with(paths, pattern=pfx).to_numpy(
                zero_copy_only=False)
            keep_sub &= ~(hmask & viol & ~odd)
    if odd.any():
        ul = sub_urls.to_pylist()
        hl = sub_hosts.to_pylist()
        for i in np.flatnonzero(odd):
            keep_sub[i] = policy.allowed(hl[i], urlsplit(ul[i]).path or "/")
    keep = np.ones(t.num_rows, dtype=bool)
    keep[aff_idx] = keep_sub
    return t.filter(pa.array(keep))


def _ranks_of(batch: pa.Table):
    bypass = batch["bypass_dedup"].to_numpy(zero_copy_only=False)
    reload_ = batch["reloadable"].to_numpy(zero_copy_only=False)
    keys = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ranks = dedup_rank_arrow(batch["bypass_dedup"], batch["priority"], batch["seq"])
    return keys, ranks, (bypass | reload_)


class ClaimSeen:
    def __init__(self, seen: ShardedSeen):
        self.seen = seen

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            keys, ranks, _ = _ranks_of(batch)
            self.seen.claim(keys, ranks)
        return batch


class ResolveSeenRobotsCapClaim:
    def __init__(self, seen: ShardedSeen, budget: HostBudget, policy_ref,
                 obey_robots: bool):
        """``policy_ref`` is an ObjectRef (distributed path: one plasma copy
        shared by every task) or a HostPolicy instance (driver-local path)."""
        self.seen = seen
        self.budget = budget
        self._policy_ref = policy_ref
        self._policy: HostPolicy | None = (
            policy_ref if isinstance(policy_ref, HostPolicy) else None
        )
        self.obey_robots = obey_robots

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys, ranks, exempt = _ranks_of(batch)
        win = self.seen.resolve(keys, ranks, exempt)
        batch = batch.filter(pa.array(win))
        if batch.num_rows == 0:
            return batch
        if self.obey_robots:
            if self._policy is None:
                self._policy = ray.get(self._policy_ref)
            batch = robots_filter_table(batch, self._policy)
            if batch.num_rows == 0:
                return batch
        hosts = batch["host"]
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.combine_chunks()
        cranks = cap_rank_arrow(batch["priority"], batch["seq"])
        self.budget.claim(hosts, cranks)
        return batch


class ResolveCapSpill:
    def __init__(self, budget: HostBudget, spill_dir: str):
        self.budget = budget
        self.spill_dir = spill_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hosts = batch["host"]
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.combine_chunks()
        cranks = cap_rank_arrow(batch["priority"], batch["seq"])
        sched = self.budget.resolve(hosts, cranks)
        deferred = batch.filter(pa.array(~sched))
        if deferred.num_rows:
            spill_deferred(deferred, self.spill_dir)
        return batch.filter(pa.array(sched))


def spill_deferred(deferred: pa.Table, spill_dir: str) -> None:
    """Persist deferred rows (bypass_dedup=True) under a content-hash name
    (deterministic content; retry-safe overwrite)."""
    from ..functions.hashing import hash64_array

    idx = deferred.schema.get_field_index("bypass_dedup")
    deferred = deferred.set_column(
        idx, "bypass_dedup", pa.array([True] * deferred.num_rows, pa.bool_())
    )
    deferred = deferred.select(FRONTIER_SCHEMA.names)
    tag = int(hash64_array(["|".join(sorted(deferred["seq"].to_pylist()))])[0])
    os.makedirs(spill_dir, exist_ok=True)
    pq.write_table(deferred, os.path.join(spill_dir, f"part-{tag:016x}.parquet"))
