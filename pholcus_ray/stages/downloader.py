"""Download engines behind the fetch stage — the surfer-shaped seam.

Reference parity: the reference routes every fetch through a Surfer
interface (surfer/surfer.go:17-37) with pluggable engines — Surf, the pure
HTTP client (surfer/surf.go:52-196: bounded TryTimes retries with
RetryPause, per-attempt UA rotation, cookie pass-through), and the browser
engines. This module is that seam for the Ray engine: ``FetchParse`` holds
ONE downloader per actor (built in ``__init__`` — the stateful-stage rule)
and calls ``fetch_batch`` per batch.

Two engines:

- :class:`SimnetDownloader` — the sandbox default and the conformance test
  double: "the web" is the bucketed pages Parquet corpus shared through
  plasma, statuses are the deterministic simnet model
  (functions/simnet.py), so engine and sequential oracle observe the
  identical network.
- :class:`HttpDownloader` — the real-wire engine (stdlib urllib; no
  third-party HTTP client in this sandbox): same bounded-retry loop, same
  per-attempt UA rotation semantics, Cookie header pass-through and
  Set-Cookie capture. ``url_rewrite`` lets tests route synthetic hosts to
  a localhost server; production passes None and fetches the url as-is.
  Concurrency comes from the actor pool (``cfg.fetch_use_actors`` /
  ``concurrency=N``), one in-flight request per actor — the shape the
  reference's per-downloader goroutine pool also has.

The interface is batch-level so SimnetDownloader keeps its vectorized
bucket lookup (one ``index_in`` + ``take`` per touched bucket, never a
per-row corpus probe).
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
import pyarrow as pa

from ..functions.simnet import sim_fetch_attempts, sim_set_cookie
from ..functions.uapool import fixed_ua, ua_for


class SimnetDownloader:
    """Deterministic corpus-backed engine (the Surf test double)."""

    def __init__(self, corpus_dir: str, n_buckets: int, bucket_refs: dict):
        self.corpus_dir = corpus_dir
        self.n_buckets = n_buckets
        self.bucket_refs = bucket_refs

    def fetch_batch(self, urls: list[str], hosts: list[str],
                    keys: np.ndarray, methods: list[str],
                    post_datas: list[str], attempts_done: np.ndarray,
                    try_times: int, cookies: list[str] | None,
                    ua_pool: tuple[str, ...] | None, use_fixed_ua: bool,
                    ) -> tuple[np.ndarray, np.ndarray, list, list[str]]:
        """Returns (statuses int32, attempts int32, bodies, set_cookies).

        The response is a pure function of (url, key, attempt): the request
        headers (cookies/UA) are accepted for interface parity but do not
        influence the simulated server — exactly like most fetch targets.
        """
        import pyarrow.compute as pc

        from ..functions.hashing import hash64_array
        from .fetchparse import _load_bucket

        n = len(urls)
        bodies: list = [None] * n
        # corpus layout buckets by hash64(url), NOT by the dedup key
        buckets = (hash64_array(urls)
                   % np.uint64(self.n_buckets)).astype(np.int64)
        url_arr = pa.array(urls, pa.string())
        for b in np.unique(buckets):
            sel = np.flatnonzero(buckets == b)
            t = _load_bucket(self.corpus_dir, int(b), self.bucket_refs)
            if t.num_rows == 0:
                continue
            pos = pc.fill_null(
                pc.index_in(url_arr.take(pa.array(sel)), value_set=t["url"]),
                -1,
            ).to_numpy(zero_copy_only=False)
            valid = np.flatnonzero(pos >= 0)
            if len(valid) == 0:
                continue
            got = t["html"].take(pa.array(pos[valid])).to_pylist()
            for j, v in zip(valid, got):
                bodies[int(sel[j])] = v

        statuses = np.zeros(n, dtype=np.int32)
        attempts = np.zeros(n, dtype=np.int32)
        set_cookies = [""] * n
        want_cookies = cookies is not None
        for i in range(n):
            status, att = sim_fetch_attempts(
                int(keys[i]), bodies[i] is not None, int(attempts_done[i]),
                try_times,
            )
            statuses[i] = status
            attempts[i] = att
            if status >= 400:
                bodies[i] = None
            elif want_cookies:
                set_cookies[i] = sim_set_cookie(hosts[i])
        return statuses, attempts, bodies, set_cookies


class HttpDownloader:
    """Real-wire engine (Surf semantics, surfer/surf.go:52-196).

    Bounded retry loop per request: up to ``try_times - attempts_done``
    attempts, ``retry_pause`` seconds apart, stopping at the first status
    < 400 (the engine's ok line, M21). Connection errors count as an
    attempt with status 599 (client-visible network failure). The UA
    rotates per attempt via the same ``ua_for(key, attempt)`` the simnet
    path exposes to rules — unless ``use_fixed_ua`` (EnableCookie pins the
    UA, surfer/param.go:88-90). Set-Cookie response headers are captured
    verbatim for the driver's round-end jar merge.
    """

    def __init__(self, timeout: float = 10.0, retry_pause: float = 0.1,
                 url_rewrite: Callable[[str], str] | None = None,
                 dns_cache=None):
        self.timeout = timeout
        self.retry_pause = retry_pause
        self.url_rewrite = url_rewrite
        # per-actor success-driven host:port -> ip:port map (ST2's real
        # half, surfer/surf.go:80-137); None disables the Dial-hook path
        self.dns_cache = dns_cache

    def _via_dns(self, url: str) -> tuple[str, str | None, str | None,
                                          bool, str | None]:
        """Returns (effective_url, host_header, cache_key, was_cached,
        fresh_ip_port).

        Cache hits dial the stored ip:port with the original host carried
        in the Host header (the urllib analogue of the reference's Dial
        hook, which swaps the address under an unchanged http.Request).
        http-only: a TLS handshake needs the hostname, and the reference
        hook likewise rewrites only the TCP dial address.
        """
        from urllib.parse import urlsplit

        if self.dns_cache is None:
            return url, None, None, False, None
        p = urlsplit(url)
        if p.scheme != "http" or not p.hostname:
            return url, None, None, False, None
        port = p.port or 80
        key = f"{p.hostname}:{port}"
        hit = self.dns_cache.query(key)
        if hit is not None:
            return url.replace(p.netloc, hit, 1), p.netloc, key, True, None
        ip_port = self.dns_cache.resolve(p.hostname, port)
        if ip_port is None:
            return url, None, key, False, None
        return (url.replace(p.netloc, ip_port, 1), p.netloc, key, False,
                ip_port)

    def _fetch_once(self, url: str, method: str, post_data: str,
                    headers: dict) -> tuple[int, bytes | None, str]:
        import urllib.error
        import urllib.request

        body = post_data.encode("utf-8") if method.startswith("POST") else None
        req = urllib.request.Request(
            url, data=body, headers=headers,
            method="POST" if method.startswith("POST") else method,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                data = b"" if method == "HEAD" else resp.read()
                return (int(resp.status), data,
                        resp.headers.get("Set-Cookie", ""))
        except urllib.error.HTTPError as e:
            return int(e.code), None, e.headers.get("Set-Cookie", "") or ""
        except (urllib.error.URLError, OSError, TimeoutError):
            return 599, None, ""

    def fetch_batch(self, urls: list[str], hosts: list[str],
                    keys: np.ndarray, methods: list[str],
                    post_datas: list[str], attempts_done: np.ndarray,
                    try_times: int, cookies: list[str] | None,
                    ua_pool: tuple[str, ...] | None, use_fixed_ua: bool,
                    ) -> tuple[np.ndarray, np.ndarray, list, list[str]]:
        n = len(urls)
        statuses = np.zeros(n, dtype=np.int32)
        attempts = np.zeros(n, dtype=np.int32)
        bodies: list = [None] * n
        set_cookies = [""] * n
        for i in range(n):
            url = urls[i]
            if self.url_rewrite is not None:
                url = self.url_rewrite(url)
            att = int(attempts_done[i])
            status, data, sc = 0, None, ""
            for t in range(try_times):
                att += 1
                headers = {
                    "User-Agent": (fixed_ua(ua_pool) if use_fixed_ua
                                   else ua_for(int(keys[i]), att, ua_pool)),
                }
                if cookies is not None and cookies[i]:
                    headers["Cookie"] = cookies[i]
                eff_url, host_hdr, dns_key, was_cached, fresh = \
                    self._via_dns(url)
                if host_hdr is not None:
                    headers["Host"] = host_hdr
                status, data, sc = self._fetch_once(
                    eff_url, methods[i], post_datas[i], headers
                )
                if self.dns_cache is not None and dns_key is not None:
                    if status == 599:
                        # dial failure: drop the stale entry so the next
                        # attempt re-resolves (surfer/surf.go:122-126)
                        if was_cached:
                            self.dns_cache.delete(dns_key)
                    elif fresh is not None:
                        # connection reached the server: register
                        # (surfer/surf.go:127-132)
                        self.dns_cache.reg(dns_key, fresh)
                if status < 400:
                    break
                if t + 1 < try_times and self.retry_pause > 0:
                    time.sleep(self.retry_pause)
            statuses[i] = status
            attempts[i] = att
            if status < 400:
                bodies[i] = data
                if cookies is not None:
                    set_cookies[i] = sc
        return statuses, attempts, bodies, set_cookies
