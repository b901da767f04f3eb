"""Politeness scheduling: robots filter + per-host crawl-delay budgets.

Reference parity: the reference's politeness is a random pause per spider
(crawler.go:53-59, 176-179); the north_rule upgrades it to per-host budgets
with robots.txt. See state/hostpolicy.py for the deterministic budget model.

Skew handling (SURVEY.md §7.4.5): the hot host's candidate queue can hold a
large fraction of the round. Cap selection is therefore **two-stage salted
top-k**:

- stage 1 groups by ``(host, key % salt_buckets)``: each salt group sorts
  its own rows by (priority desc, seq asc) and marks everything past the
  host cap as deferred. Because a row ranked > cap within any subset is
  ranked > cap globally, this never defers a row that should run.
- stage 2 groups by ``host`` and re-ranks ONLY the <= salt_buckets * cap
  survivors, marking the true beyond-cap rows deferred; already-deferred
  rows pass through untouched.

So the per-group sort work is bounded by salt_buckets * cap regardless of
how skewed the frontier is, while the deferral decision stays globally
deterministic. Deferred rows re-enter the next round with
``bypass_dedup=True`` (their key is already in the seen set).

The HostPolicy is broadcast via ``ray.put`` once per round and read in each
group task — a small-side broadcast, not a shuffle join.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..state.hostpolicy import HostPolicy


class RobotsSalt:
    """map_batches: drop robots-disallowed rows, add the salt group column."""

    def __init__(self, policy_ref, salt_buckets: int, obey_robots: bool = True):
        self._policy_ref = policy_ref
        self._policy: HostPolicy | None = None
        self.salt_buckets = salt_buckets
        self.obey_robots = obey_robots

    def _pol(self) -> HostPolicy:
        if self._policy is None:
            self._policy = ray.get(self._policy_ref)
        return self._policy

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("host_salt", pa.array([], pa.string()))
        pol = self._pol()
        hosts = batch["host"].to_pylist()
        if self.obey_robots:
            urls = batch["url"].to_pylist()
            keep = [
                pol.allowed(h, urlsplit(u).path or "/") for h, u in zip(hosts, urls)
            ]
            batch = batch.filter(pa.array(keep, pa.bool_()))
            hosts = [h for h, k in zip(hosts, keep) if k]
        keys = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        salt = (keys % np.uint64(self.salt_buckets)).astype(np.int64)
        host_salt = [f"{h}|{s}" for h, s in zip(hosts, salt)]
        return batch.append_column("host_salt", pa.array(host_salt, pa.string()))


def _rank_and_defer(g: pd.DataFrame, cap: int, refine: bool) -> pd.DataFrame:
    """Sort candidate rows by (priority desc, seq asc); defer rows past cap."""
    if refine and "deferred" in g.columns:
        nd = g[~g["deferred"]]
        d = g[g["deferred"]]
    else:
        nd, d = g, g.iloc[0:0]
    nd = nd.sort_values(["priority", "seq"], ascending=[False, True], kind="mergesort")
    deferred = np.arange(len(nd)) >= cap
    nd = nd.assign(deferred=deferred)
    if len(d):
        return pd.concat([nd, d], ignore_index=True)
    return nd.reset_index(drop=True)


class Stage1Cap:
    """groupby(host_salt).map_groups: salted pre-cap (bounded sort work)."""

    def __init__(self, policy_ref, round_virtual_sec: float):
        self._policy_ref = policy_ref
        self._policy = None
        self.round_virtual_sec = round_virtual_sec

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        if self._policy is None:
            self._policy = ray.get(self._policy_ref)
        host = g["host"].iloc[0]
        cap = self._policy.cap_per_round(host, self.round_virtual_sec)
        return _rank_and_defer(g, cap, refine=False)


class Stage2Cap:
    """groupby(host).map_groups: exact cap over the salted survivors."""

    def __init__(self, policy_ref, round_virtual_sec: float):
        self._policy_ref = policy_ref
        self._policy = None
        self.round_virtual_sec = round_virtual_sec

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        if self._policy is None:
            self._policy = ray.get(self._policy_ref)
        host = g["host"].iloc[0]
        cap = self._policy.cap_per_round(host, self.round_virtual_sec)
        return _rank_and_defer(g, cap, refine=True)
