"""Per-host crawl policy: robots.txt rules + politeness budgets.

The reference has no robots support and enforces politeness only as a random
pause between request launches per *spider* (crawler.go:53-59, 176-179,
Pausetime config.go:160). The north_rule upgrades this to per-HOST politeness
with robots.txt and crawl-delay budgets, which we implement as an explicit,
deterministic budget model:

- every BFS round represents ``round_virtual_sec`` seconds of crawl time
- a host with crawl-delay ``d`` may fetch at most
  ``max(1, floor(round_virtual_sec / d))`` urls per round; the rest of its
  queue is DEFERRED to the next round (not dropped)
- urls matching a robots ``Disallow`` prefix are dropped before dedup-visible
  scheduling (they are still inserted into the seen set, so re-discovery does
  not re-evaluate them)

``HostPolicy`` is a small immutable lookup (host -> (disallow prefixes,
delay)). It is broadcast once via ``ray.put`` and read inside scheduling
tasks — the canonical small-side broadcast, not a shuffle join. At 10^9-host
scale this becomes a sharded actor pool keyed by hash(host); the budget
arithmetic is unchanged.
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq


def parse_robots(body: str) -> tuple[list[str], float | None]:
    """Minimal robots.txt parser: ``User-agent: *`` sections only.

    Returns (disallow_prefixes, crawl_delay_or_None). ``Sitemap:``
    directives are global per the protocol (not scoped to a user-agent
    section) — :func:`robots_sitemaps` extracts them.
    """
    disallow: list[str] = []
    delay: float | None = None
    active = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        k, _, v = line.partition(":")
        k = k.strip().lower()
        v = v.strip()
        if k == "user-agent":
            active = v == "*"
        elif active and k == "disallow" and v:
            disallow.append(v)
        elif active and k == "crawl-delay":
            try:
                d = float(v)
            except ValueError:
                continue
            # robots bodies are untrusted page content: reject non-finite
            # and negative delays; 0 is kept (meaning "no delay" — see
            # cap_per_round, which treats it as uncapped, not 1/0)
            if math.isfinite(d) and d >= 0:
                delay = d
    return disallow, delay


class HostPolicy:
    """host -> (disallow prefixes, crawl delay); plain picklable object."""

    def __init__(self, default_delay_sec: float = 1.0):
        self.default_delay_sec = default_delay_sec
        self._disallow: dict[str, list[str]] = {}
        self._delay: dict[str, float] = {}

    @classmethod
    def from_robots_parquet(cls, path: str, default_delay_sec: float = 1.0) -> "HostPolicy":
        pol = cls(default_delay_sec)
        try:
            t = pq.read_table(path)
        except FileNotFoundError:
            return pol
        for host, body in zip(t["host"].to_pylist(), t["body"].to_pylist()):
            dis, delay = parse_robots(body)
            if dis:
                pol._disallow[host] = dis
            if delay is not None:
                pol._delay[host] = delay
        return pol

    def hosts_with_rules(self) -> set:
        return set(self._disallow)

    def allowed(self, host: str, path: str) -> bool:
        for pfx in self._disallow.get(host, ()):
            if path.startswith(pfx):
                return False
        return True

    def delay(self, host: str) -> float:
        return self._delay.get(host, self.default_delay_sec)

    def cap_per_round(self, host: str, round_virtual_sec: float) -> int:
        d = self.delay(host)
        if d <= 0:  # Crawl-delay: 0 (or a 0 default) = politeness-uncapped
            return 1 << 30
        return max(1, math.floor(round_virtual_sec / d))


def robots_sitemaps(body: str) -> list[str]:
    """The ``Sitemap:`` directives of a robots.txt body — the discovery
    channel that bootstraps a frontier from sitemaps (sitemaps.org
    "Sitemap location via robots.txt"). Global directives per the
    protocol: NOT scoped to any User-agent section, absolute URLs, and
    the value itself may contain ':' (scheme), so split once only."""
    out: list[str] = []
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        k, _, v = line.partition(":")
        if k.strip().lower() == "sitemap" and v.strip():
            out.append(v.strip())
    return out
