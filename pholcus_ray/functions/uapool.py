"""User-agent pool with per-attempt rotation.

Reference parity (SURVEY.md ST3): the reference keeps a static UA list
(surfer/agent/agent.go) and re-rolls a random UA per retry attempt
(surf.go:170-177). Randomness is replaced by a DETERMINISTIC draw keyed on
(request key, attempt) so the distributed engine and the sequential oracle
pick identical agents — the same substitution the status model makes in
functions/simnet.py.

The pool below is a small set of generic, publicly documented UA shapes
(not copied from the reference's vendored list); production deployments
register their own via ``set_pool``.
"""

from __future__ import annotations

import numpy as np

_DEFAULT_POOL: tuple[str, ...] = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.0 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 "
    "Firefox/121.0",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) "
    "Chrome/120.0 Safari/537.36",
)

_pool: tuple[str, ...] = _DEFAULT_POOL


def set_pool(agents: list[str]) -> None:
    """Replace the DRIVER's default UA pool (agent.go's static list is
    user-config in spirit). A module global never reaches distributed fetch
    workers — the crawl captures ``current_pool()`` into the FetchParse
    kwargs at config time, so both execution paths see the same pool."""
    global _pool
    if not agents:
        raise ValueError("UA pool must not be empty")
    _pool = tuple(agents)


def current_pool() -> tuple[str, ...]:
    """The driver's pool, captured into fetch-stage kwargs (ships to
    workers; never read from the module global inside a worker)."""
    return _pool


def fixed_ua(pool: tuple[str, ...] | None = None) -> str:
    """The pinned UA used when Spider.EnableCookie is on (param.go:88-90:
    cookie-carrying sessions keep one identity; rotation would break them)."""
    return (pool or _pool)[0]


def ua_for(key: int, attempt: int, pool: tuple[str, ...] | None = None) -> str:
    """Deterministic UA for one fetch attempt; distinct attempts of the same
    request rotate through the pool (surf.go:170-177 re-roll semantics)."""
    p = pool or _pool
    return p[(int(key) ^ (attempt * 0x9E3779B9)) % len(p)]


def ua_column(keys: np.ndarray, attempts: np.ndarray,
              pool: tuple[str, ...] | None = None) -> list[str]:
    """Vectorized batch variant for the fetch stage."""
    p = pool or _pool
    idx = (keys.astype(np.uint64)
           ^ (attempts.astype(np.uint64) * np.uint64(0x9E3779B9))) \
        % np.uint64(len(p))
    return [p[int(i)] for i in idx]


__all__ = ["set_pool", "current_pool", "fixed_ua", "ua_for", "ua_column"]
