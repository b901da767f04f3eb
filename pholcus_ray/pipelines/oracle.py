"""Sequential conformance oracle.

A tiny pure-Python reimplementation of the engine's DETERMINISTIC semantics
(SURVEY.md §5, §7.4.2): priority desc -> FIFO(seq) within priority, dedup at
enqueue with Reloadable bypass, per-host crawl-delay caps with deferral,
robots Disallow, TryTimes retries, failure requeue exactly once at drain,
maxPage limit. It shares the engine's pure functions (canonicalize,
extract/parse via the Spider API, sim_fetch_attempts, HostPolicy,
seeds_to_frontier) so conformance tests compare ORCHESTRATION — the
distributed BFS loop vs a single ordered queue — not two parsers.

The reference's own ordering is wall-clock dependent (goroutine completion
order); as documented in SURVEY.md §7.4.2 the oracle pins the reference's
*deterministic* core semantics (matrix.go:88-124 priority/FIFO pull order,
matrix.go:144-204 failure requeue) on round-based virtual time.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.hashing import dedup_key_array
from ..functions.simnet import sim_fetch_attempts, sim_set_cookie
from ..functions.uapool import fixed_ua, ua_for
from ..functions.urlnorm import host_of
from ..state.cookiejar import CookieJar
from ..model import child_seq, virtual_download_time
from ..spiderapi import DEFAULT_SPIDER, RuleContext, Spider
from ..stages.normalize import seeds_to_frontier
from ..state.hostpolicy import HostPolicy
from urllib.parse import urlsplit


@dataclass
class OracleResult:
    crawl_log: list[dict]
    items: list[dict]
    url_seen: np.ndarray  # sorted uint64 keys
    failures: list[dict]
    rounds: int


def run_oracle(
    corpus_dir: str,
    spider: Spider = DEFAULT_SPIDER,
    keyins: list[str] | None = None,
    try_times: int = 3,
    round_virtual_sec: float = 16.0,
    default_delay_sec: float = 1.0,
    limit: int | None = None,
    max_depth: int | None = None,
    obey_robots: bool = True,
    max_rounds: int = 10_000,
    ua_pool: tuple[str, ...] | None = None,
    virtual_t0_sec: float = 0.0,
) -> OracleResult:
    pages = {
        u: h
        for u, h in zip(
            *(
                lambda t: (t["url"].to_pylist(), t["html"].to_pylist())
            )(pads.dataset(os.path.join(corpus_dir, "pages")).to_table(columns=["url", "html"]))
        )
    }
    policy = HostPolicy.from_robots_parquet(
        os.path.join(corpus_dir, "robots.parquet"), default_delay_sec
    )

    seeds_tbl = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
    candidates = seeds_to_frontier(seeds_tbl, spider.entry_rule, keyins).to_pylist()

    # ST1 twin of the engine's driver-owned jar: every fetch in round r sees
    # the jar merged through round r-1; this round's Set-Cookie headers are
    # merged after the round, in seq order — identical to
    # crawl._merge_round_cookies, so items are byte-identical even for rules
    # reading ctx.get_cookie()/ctx.user_agent.
    jar = CookieJar() if spider.enable_cookie else None
    seen: set[int] = set()
    failures: list[dict] = []
    failures_requeued = False
    fetched = 0
    logs: list[dict] = []
    items_out: list[dict] = []
    round_idx = 0

    while round_idx < max_rounds:
        if not candidates:
            if failures and not failures_requeued:
                failures_requeued = True
                candidates = failures
                failures = []
                continue
            break
        # quota exhausted: break BEFORE dedup/seen insertion, mirroring the
        # engine's remaining<=0 check ahead of claim/resolve (crawl.py) —
        # otherwise limit=0 would still insert the round's keys into seen
        if limit is not None and limit - fetched <= 0:
            break

        # 1. intra-round winner per key (bypass first, priority desc, seq asc)
        by_key: dict[int, dict] = {}
        for row in candidates:
            k = int(row["key"])
            cur = by_key.get(k)
            if cur is None or _wins(row, cur):
                by_key[k] = row
        # 2. seen filter (insert at enqueue; bypass/reloadable exempt)
        fresh = []
        for row in by_key.values():
            if row["bypass_dedup"] or row["reloadable"]:
                fresh.append(row)
            elif int(row["key"]) not in seen:
                seen.add(int(row["key"]))
                fresh.append(row)
        # 3. robots
        if obey_robots:
            fresh = [
                r
                for r in fresh
                if policy.allowed(r["host"], urlsplit(r["url"]).path or "/")
            ]
        # 4. per-host caps with deferral
        by_host: dict[str, list[dict]] = {}
        for r in fresh:
            by_host.setdefault(r["host"], []).append(r)
        sched: list[dict] = []
        deferred: list[dict] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (-r["priority"], r["seq"]))
            cap = policy.cap_per_round(host, round_virtual_sec)
            sched.extend(rows[:cap])
            for r in rows[cap:]:
                r = dict(r)
                r["bypass_dedup"] = True
                deferred.append(r)
        # 5. global order + limit quota
        sched.sort(key=lambda r: (-r["priority"], r["seq"]))
        if limit is not None:
            # remaining > 0 is guaranteed by the top-of-loop quota break
            sched = sched[: limit - fetched]
        if not sched:
            # mirror the engine exactly: a round with candidates but zero
            # survivors still consumes a round number
            candidates = deferred
            round_idx += 1
            continue

        # 6. fetch + parse in order
        dt = virtual_download_time(round_idx, round_virtual_sec, virtual_t0_sec)
        vnow = virtual_t0_sec + round_idx * round_virtual_sec
        pending_cookies: list[tuple[str, str, str]] = []  # (seq, url, set_cookie)
        new_links: list[dict] = []
        for r in sched:
            html = pages.get(r["url"])
            status, attempts = sim_fetch_attempts(
                int(r["key"]), html is not None, int(r["attempts_done"]), try_times
            )
            ok = status < 400
            fetched += 1
            logs.append(
                {
                    "round": round_idx,
                    "url": r["url"],
                    "host": r["host"],
                    "priority": r["priority"],
                    "seq": r["seq"],
                    "depth": r["depth"],
                    "ok": ok,
                    "status": status,
                    "attempts": attempts,
                }
            )
            if not ok:
                f = dict(r)
                f["attempts_done"] = attempts
                f["bypass_dedup"] = True
                failures.append(f)
                continue
            if jar is not None:
                cookie_hdr = jar.header(r["url"], now=vnow)
                pending_cookies.append(
                    (r["seq"], r["url"], sim_set_cookie(r["host"]))
                )
                # EnableCookie pins the UA (param.go:88-90)
                ua = fixed_ua(ua_pool)
            else:
                cookie_hdr = ""
                ua = ua_for(int(r["key"]), int(attempts), ua_pool)
            ctx = RuleContext(
                url=r["url"], referer=r["referer"], rule=r["rule"],
                depth=int(r["depth"]),
                html_bytes=(b"" if r["method"] == "HEAD" else html),
                temp=r["temp"], keyin=r["keyin"], download_time=dt,
                method=r["method"], post_data=r["post_data"],
                cookie=cookie_hdr, user_agent=ua, status=int(status),
            )
            spider.run_rule(ctx)
            for it in ctx.items:
                items_out.append(
                    {
                        "rule": r["rule"],
                        "data": spider.finalize_item(ctx, it),
                        "url": r["url"],
                        "parent_url": r["referer"],
                        "download_time": dt,
                        "round": round_idx,
                    }
                )
            for ordinal, lr in enumerate(ctx.requests):
                child = {
                    "url": lr.url,
                    "host": host_of(lr.url),
                    "key": int(
                        dedup_key_array([lr.url], [lr.method], [lr.rule])[0]
                    ),
                    "rule": lr.rule,
                    "method": lr.method,
                    "post_data": lr.post_data,
                    "priority": int(lr.priority),
                    "depth": int(r["depth"]) + 1,
                    "referer": r["url"],
                    "anchor": lr.anchor,
                    "seq": child_seq(r["seq"], ordinal),
                    "attempts_done": 0,
                    "bypass_dedup": False,
                    "reloadable": bool(lr.reloadable),
                    "keyin": r["keyin"],
                    "temp": lr.temp,
                }
                if max_depth is None or child["depth"] <= max_depth:
                    new_links.append(child)

        if jar is not None:
            for _, url, sc in sorted(pending_cookies, key=lambda p: p[0]):
                jar.set_cookie(url, sc, now=vnow)
        candidates = new_links + deferred
        round_idx += 1
        if limit is not None and fetched >= limit:
            break

    return OracleResult(
        crawl_log=logs,
        items=items_out,
        url_seen=np.sort(np.fromiter(seen, dtype=np.uint64)),
        failures=failures,
        rounds=round_idx,
    )


def _wins(a: dict, b: dict) -> bool:
    ka = (not a["bypass_dedup"], -a["priority"], a["seq"])
    kb = (not b["bypass_dedup"], -b["priority"], b["seq"])
    return ka < kb
