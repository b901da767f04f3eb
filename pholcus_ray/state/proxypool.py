"""Proxy pool with per-host latency-sorted rotation.

Reference parity (SURVEY.md ST4/O2, aid/proxy/proxy.go:27-232): the
reference keeps a proxy inventory, measures each proxy's latency with a
ping pass, binds every crawl host to the currently-fastest proxy, and
re-rotates bindings once per ``rotation interval``. There is no network in
this sandbox, so latency OBSERVATIONS are injected (in production: measured
RTTs; in tests: deterministic values) — the pool's logic (latency ordering,
per-host stickiness, interval-based re-rotation, dead-proxy eviction) is
the real, tested surface, driven by the same virtual clock as the crawl
rounds.

Usage shape in a production fetch stage::

    pool = ProxyPool(rotation_sec=600)
    pool.add("http://p1:3128"); pool.add("http://p2:3128")
    pool.observe("http://p1:3128", 0.12)          # measured RTT
    proxy = pool.proxy_for("example.com", now_sec) # sticky + fastest
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field


@dataclass
class _ProxyState:
    addr: str
    latency_sec: float = float("inf")  # unknown until observed
    failures: int = 0


@dataclass
class ProxyPool:
    rotation_sec: float = 600.0        # re-bind interval (proxy.go ticker)
    max_failures: int = 3              # evict after this many dead fetches
    _proxies: dict[str, _ProxyState] = field(default_factory=dict)
    _bindings: dict[str, tuple[str, float]] = field(default_factory=dict)
    # HttpDownloader's pool_size>1 path calls proxy_for/observe/
    # report_failure from fetch threads concurrently — same reason
    # DnsCache takes a lock
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False, compare=False)

    # --- inventory -----------------------------------------------------

    def add(self, addr: str) -> None:
        with self._lock:
            self._proxies.setdefault(addr, _ProxyState(addr))

    def remove(self, addr: str) -> None:
        with self._lock:
            self._remove_locked(addr)

    def _remove_locked(self, addr: str) -> None:
        self._proxies.pop(addr, None)
        for host, (bound, _t) in list(self._bindings.items()):
            if bound == addr:
                del self._bindings[host]

    def proxies(self) -> list[str]:
        """Latency order (unknown latencies last; ties by address for
        determinism) — the reference's post-ping sort."""
        with self._lock:
            return self._proxies_locked()

    def _proxies_locked(self) -> list[str]:
        return [
            p.addr
            for p in sorted(self._proxies.values(),
                            key=lambda p: (p.latency_sec, p.addr))
        ]

    # --- observations --------------------------------------------------

    def observe(self, addr: str, latency_sec: float) -> None:
        """Record a measured latency (ping pass / live fetch RTT)."""
        with self._lock:
            st = self._proxies.get(addr)
            if st is not None:
                st.latency_sec = float(latency_sec)
                st.failures = 0

    def report_failure(self, addr: str) -> None:
        """Dead-fetch accounting; eviction after max_failures."""
        with self._lock:
            st = self._proxies.get(addr)
            if st is None:
                return
            st.failures += 1
            if st.failures >= self.max_failures:
                self._remove_locked(addr)

    # --- per-host binding ----------------------------------------------

    def proxy_for(self, host: str, now_sec: float) -> str | None:
        """The proxy a fetch to ``host`` should use at virtual time
        ``now_sec``: sticky within the rotation interval, re-bound to the
        currently-fastest proxy when the interval elapses."""
        with self._lock:
            bound = self._bindings.get(host)
            if bound is not None:
                addr, at = bound
                if addr in self._proxies \
                        and now_sec - at < self.rotation_sec:
                    return addr
            order = self._proxies_locked()
            if not order:
                return None
            self._bindings[host] = (order[0], now_sec)
            return order[0]
