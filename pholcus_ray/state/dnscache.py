"""DNS cache for the real-wire downloader (ST2's real half).

Reference parity: surfer's DnsCache (surfer/surf.go:80-137) is a
success-driven ``host:port -> ip:port`` map consulted in the transport's
Dial hook — a cache hit dials the stored address directly, a hit that
FAILS to dial is deleted (so the next attempt re-resolves), and a fresh
successful dial registers the address it connected to. No TTL: liveness
is governed by dial outcomes, not wall clock.

This is that object for :class:`~pholcus_ray.stages.downloader
.HttpDownloader`: one instance per fetch actor (built in ``__init__``
with the rest of the per-actor state — the stateful-stage rule), queried
per attempt, evicted on connection failure of a cached entry, registered
after the first attempt that reaches the server. The resolver is
injectable so tests count resolutions; the default is one
``socket.getaddrinfo`` call.
"""

from __future__ import annotations

import socket
import threading
from typing import Callable


def _getaddrinfo_ip_port(host: str, port: int) -> str | None:
    try:
        infos = socket.getaddrinfo(host, port, type=socket.SOCK_STREAM)
    except OSError:
        return None
    for *_, sockaddr in infos:
        return f"{sockaddr[0]}:{sockaddr[1]}"
    return None


class DnsCache:
    """Thread-safe success-driven address cache (surfer/surf.go:82-100)."""

    def __init__(self, resolver: Callable[[str, int], str | None]
                 | None = None):
        self._map: dict[str, str] = {}
        self._lock = threading.Lock()
        self._resolver = resolver or _getaddrinfo_ip_port
        self.resolve_calls = 0

    def query(self, addr: str) -> str | None:
        with self._lock:
            return self._map.get(addr)

    def reg(self, addr: str, ip_port: str) -> None:
        with self._lock:
            self._map[addr] = ip_port

    def delete(self, addr: str) -> None:
        with self._lock:
            self._map.pop(addr, None)

    def resolve(self, host: str, port: int) -> str | None:
        """Uncached resolution (counts toward ``resolve_calls``); the
        caller registers the result only after a successful connection,
        matching the reference's dial-then-Reg order."""
        self.resolve_calls += 1
        return self._resolver(host, port)

    def __len__(self) -> int:
        with self._lock:
            return len(self._map)
