"""Deterministic simulated network — the sandbox's stand-in for HTTP.

In production the fetch stage is a real HTTP client (the reference's Surf
engine, surfer/surf.go:52-196: GET/POST with TryTimes=3 retries and
RetryPause). In this sandbox the "web" is the bucketed pages Parquet corpus
and failures are a deterministic function of the url's 64-bit key and the
attempt number, so engine and oracle observe the identical network.

Status model (shared contract):
- url absent from the corpus      -> 404 on every attempt (permanent)
- key % 29 == 3 ("transient")     -> 503 on attempts 1-2, 200 from attempt 3
  (succeeds within one enqueue's TryTimes=3 retries)
- key % 29 == 7 ("hard")          -> 503 on attempts 1-4, 200 from attempt 5
  (fails its first enqueue, succeeds on the one failure-requeue —
  exercising matrix.go:144-204 requeue-once semantics)
- otherwise                        -> 200 on attempt 1

Reference parity: fetch "success" means a response was obtained; the engine
treats status >= 400 as a failed fetch for retry purposes
(downloader_surfer.go:67-69, SURVEY.md M21).
"""

from __future__ import annotations

TRY_TIMES_DEFAULT = 3  # reference request.go:48


def sim_status(key: int, in_corpus: bool, attempt: int) -> int:
    """HTTP status for the given url-key on the given (1-based) attempt."""
    if not in_corpus:
        return 404
    r = key % 29
    if r == 3:
        return 200 if attempt >= 3 else 503
    if r == 7:
        return 200 if attempt >= 5 else 503
    return 200


def sim_set_cookie(host: str) -> str:
    """Deterministic Set-Cookie header the simulated server attaches to
    every 200 response: a per-host session id. Lets the per-actor CookieJar
    (state/cookiejar.py, ST1) be exercised end-to-end without a network —
    the jar then sends ``sid=...`` back on every later request to the host."""
    from ..functions.hashing import hash64_array

    sid = int(hash64_array([host])[0])
    return f"sid={sid:016x}; Path=/"


def sim_fetch_attempts(key: int, in_corpus: bool, attempts_done: int,
                       try_times: int = TRY_TIMES_DEFAULT) -> tuple[int, int]:
    """Run up to ``try_times`` attempts starting after ``attempts_done``.

    Returns (final_status, total_attempts_done). Mirrors the reference's
    bounded retry loop inside one download call (surf.go:158-196).
    """
    status = 0
    attempt = attempts_done
    for _ in range(try_times):
        attempt += 1
        status = sim_status(key, in_corpus, attempt)
        if status < 400:
            break
    return status, attempt
