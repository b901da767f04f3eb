"""Per-actor cookie jar — the client-side state of Spider.EnableCookie.

Reference parity (SURVEY.md ST1): the reference shares one Go
``net/http/cookiejar`` across its download engines
(surfer/surfer.go:39-51) and gates its use per spider with
``Spider.EnableCookie`` (spider/spider.go:33, request.go:26).  When cookies
are enabled the fetcher also pins a FIXED User-Agent; when disabled it
rolls a random UA and sends no cookies (surfer/param.go:86-96).

This jar implements the RFC-6265 subset that jar actually provides:
name=value storage keyed by (domain, path, name), host-only vs
domain-suffix matching, path-prefix matching, Max-Age/Expires expiry, and
Secure filtering.  Expiry runs on the engine's VIRTUAL clock (the same
substitution ``state/timer.py`` makes) so the distributed engine and the
sequential oracle observe identical jars.

Placement: the DRIVER owns the authoritative jar; each crawl round ships a
read-only snapshot (``to_state()`` in fp_kwargs) to every fetch worker and
merges the round's observed Set-Cookie headers back in seq order
(crawl._merge_round_cookies).  Visibility is therefore ROUND-granular —
every fetch in round r sees the jar merged through round r-1 — which makes
cookie state deterministic under any task/actor scheduling; the sequential
oracle performs the identical merge, so items that embed ctx.get_cookie()
are byte-identical engine-vs-oracle (tests/test_cookiejar.py).  Jar state
is per-HOST, not per-URL: snapshots stay small and the per-round merge
reads only slim result columns.  The sandbox's simulated server issues a
deterministic session cookie per host (functions/simnet.sim_set_cookie),
so jar behavior is exercised end-to-end without a network.
"""

from __future__ import annotations

from dataclasses import dataclass
from email.utils import parsedate_to_datetime
from urllib.parse import urlsplit


@dataclass
class _Cookie:
    name: str
    value: str
    domain: str          # effective domain, no leading dot
    host_only: bool      # True when the Set-Cookie had no Domain attribute
    path: str
    secure: bool
    expires: float | None  # virtual-clock deadline; None = session cookie
    seq: int             # creation order (stable header ordering)


def _default_path(url_path: str) -> str:
    """RFC 6265 §5.1.4 default-path."""
    if not url_path.startswith("/") or url_path.count("/") == 1:
        return "/"
    return url_path.rsplit("/", 1)[0] or "/"


def _domain_match(host: str, cookie_domain: str, host_only: bool) -> bool:
    if host_only:
        return host == cookie_domain
    return host == cookie_domain or host.endswith("." + cookie_domain)


def _path_match(req_path: str, cookie_path: str) -> bool:
    if req_path == cookie_path:
        return True
    if req_path.startswith(cookie_path):
        return cookie_path.endswith("/") or req_path[len(cookie_path)] == "/"
    return False


class CookieJar:
    """RFC-6265-lite jar; deterministic (virtual-clock) twin of Go's
    net/http/cookiejar as used by the reference (surfer.go:39)."""

    def __init__(self) -> None:
        self._store: dict[tuple[str, str, str], _Cookie] = {}
        self._seq = 0

    def __len__(self) -> int:
        return len(self._store)

    def set_cookie(self, url: str, set_cookie: str, now: float = 0.0) -> None:
        """Ingest one Set-Cookie header value for a response from ``url``."""
        parts = [p.strip() for p in set_cookie.split(";")]
        if not parts or "=" not in parts[0]:
            return
        name, value = parts[0].split("=", 1)
        name, value = name.strip(), value.strip()
        if not name:
            return
        sp = urlsplit(url)
        host = (sp.hostname or "").lower()
        domain, host_only = host, True
        path = _default_path(sp.path or "/")
        secure = False
        expires: float | None = None
        for attr in parts[1:]:
            k, _, v = attr.partition("=")
            k, v = k.strip().lower(), v.strip()
            if k == "domain" and v:
                d = v.lstrip(".").lower()
                # reject cookies claiming a foreign domain (RFC 6265 §5.3.6)
                if d == host or host.endswith("." + d):
                    domain, host_only = d, False
            elif k == "path" and v.startswith("/"):
                path = v
            elif k == "secure":
                secure = True
            elif k == "max-age":
                try:
                    expires = now + float(int(v))  # Max-Age wins over Expires
                except ValueError:
                    pass
            elif k == "expires" and expires is None:
                try:
                    # convert the wall-clock date to VIRTUAL seconds (the
                    # clock all expiry comparisons use; model._VIRTUAL_T0 is
                    # virtual t=0). A past-dated Expires — the standard
                    # delete-cookie idiom — lands negative and expires on
                    # arrival, exactly as on a real clock.
                    from ..model import _VIRTUAL_T0

                    parsed = parsedate_to_datetime(v)
                    if parsed.tzinfo is not None:
                        # convert to UTC wall time (dropping tzinfo directly
                        # would shift expiry by the zone offset)
                        from datetime import timezone

                        parsed = parsed.astimezone(timezone.utc).replace(
                            tzinfo=None
                        )
                    expires = (parsed - _VIRTUAL_T0).total_seconds()
                except (TypeError, ValueError):
                    pass
        key = (domain, path, name)
        if expires is not None and expires <= now:
            self._store.pop(key, None)  # expired-on-arrival = deletion
            return
        old = self._store.get(key)
        seq = old.seq if old is not None else self._seq
        if old is None:
            self._seq += 1
        self._store[key] = _Cookie(name, value, domain, host_only, path,
                                   secure, expires, seq)

    def seed(self, url: str, cookie_str: str, now: float = 0.0) -> None:
        """Seed from a user-supplied request Cookie header (the reference's
        ``Request.SetCookies``, request.go:218-220, via SplitCookies)."""
        from ..functions.textops import split_cookies

        for c in split_cookies(cookie_str):
            self.set_cookie(url, f"{c['name']}={c['value']}", now)

    def cookies_for(self, url: str, now: float = 0.0) -> list[tuple[str, str]]:
        """Matching (name, value) pairs, longest-path-first then creation
        order — Go cookiejar's header ordering."""
        sp = urlsplit(url)
        host = (sp.hostname or "").lower()
        req_path = sp.path or "/"
        https = sp.scheme == "https"
        out = []
        dead = []
        for key, c in self._store.items():
            if c.expires is not None and c.expires <= now:
                dead.append(key)
                continue
            if (c.secure and not https) or \
               not _domain_match(host, c.domain, c.host_only) or \
               not _path_match(req_path, c.path):
                continue
            out.append(c)
        for key in dead:
            del self._store[key]
        out.sort(key=lambda c: (-len(c.path), c.seq))
        return [(c.name, c.value) for c in out]

    def header(self, url: str, now: float = 0.0) -> str:
        """The Cookie header a request to ``url`` carries ('' when none)."""
        return "; ".join(f"{n}={v}" for n, v in self.cookies_for(url, now))

    # --- snapshot plumbing (round-granular jar state) -----------------------
    # The crawl engine ships a read-only jar SNAPSHOT to every fetch worker
    # each round and merges the round's observed Set-Cookie headers back on
    # the driver (slim per-host state, per-round delta). to_state() is a
    # plain-JSON-able dict so snapshots ride fp_kwargs / round checkpoints.

    def to_state(self) -> dict:
        return {
            "seq": self._seq,
            "cookies": [
                {
                    "name": c.name, "value": c.value, "domain": c.domain,
                    "host_only": c.host_only, "path": c.path,
                    "secure": c.secure, "expires": c.expires, "seq": c.seq,
                }
                for c in self._store.values()
            ],
        }

    @classmethod
    def from_state(cls, state: dict | None) -> "CookieJar":
        jar = cls()
        if not state:
            return jar
        jar._seq = int(state.get("seq", 0))
        for d in state.get("cookies", []):
            c = _Cookie(**d)
            jar._store[(c.domain, c.path, c.name)] = c
        return jar


__all__ = ["CookieJar"]
