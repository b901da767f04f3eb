"""Fused fetch + parse: the heavy actor-pool stage.

Reference parity: download (surfer/surf.go:52-196 — bounded TryTimes retry
loop, SURVEY.md S2) immediately followed by rule dispatch + parse
(crawler.go:112-174, context.go:356-375, SURVEY.md M1). The two are FUSED in
one ``map_batches`` stage so the wide ``html`` column never crosses a stage
boundary or enters a shuffle (SURVEY.md §7.4.6) — a page's bytes live only
inside one batch call.

Fetch here is the sandbox's simulated network: a vectorized ``index_in``
lookup against bucket tables of the pages corpus (``bucket = hash64(url) %
n_buckets`` matches the corpus layout) plus the deterministic status model
in functions/simnet.py. Bucket tables are preloaded ONCE by parallel tasks
and pinned in the object store; every worker reads them zero-copy — the
shared-immutable-state analogue of the reference's cookie jar / DNS cache
singletons (ST1/ST2). In production this class swaps its lookup for an
HTTP client with a cookie jar per actor; the stage contract (frontier rows
in, result rows out) is unchanged.
"""

from __future__ import annotations

import os
import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash64_array
from ..functions.uapool import fixed_ua, ua_for
from ..model import FILE_STRUCT, LINK_STRUCT, RESULT_SCHEMA
from ..spiderapi import RuleContext, Spider

import ray


@ray.remote
def _load_bucket_task(corpus_dir: str, bucket: int) -> pa.Table:
    """Loader task: one bucket parquet -> Arrow table in the object store."""
    path = os.path.join(corpus_dir, "pages", f"bucket={bucket}")
    tables = []
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".parquet"):
                tables.append(
                    pq.read_table(os.path.join(path, fn), columns=["url", "html"])
                )
    if tables:
        # single-chunk layout: take()/index_in on a many-chunk table pays a
        # per-index chunk search; combining once in the loader is amortized
        return pa.concat_tables(tables).combine_chunks()
    return pa.table({"url": pa.array([], pa.string()),
                     "html": pa.array([], pa.binary())})


_PRELOAD_MEMO: dict[tuple[str, int], dict] = {}


def preload_corpus(corpus_dir: str, n_buckets: int) -> dict:
    """Load every corpus bucket in PARALLEL tasks and pin the tables in the
    object store; returns {bucket: ObjectRef}. The refs dict ships inside
    the FetchParse closure; each worker ray.gets its buckets zero-copy from
    plasma. Memoized per driver process — the refs (and thus the pinned
    tables) live for the session, so back-to-back crawls (warmup + timed
    run, resumed runs, repeated queries) never re-read the corpus. In
    production this whole shim is replaced by the HTTP fetcher."""
    memo_key = (corpus_dir, n_buckets)
    cached = _PRELOAD_MEMO.get(memo_key)
    if cached is not None:
        return cached
    refs = {b: _load_bucket_task.remote(corpus_dir, b) for b in range(n_buckets)}
    ray.wait(list(refs.values()), num_returns=len(refs))
    _PRELOAD_MEMO[memo_key] = refs
    return refs


# worker-process-local view: (corpus_dir, bucket) -> shared Arrow table.
# Lookups use pyarrow.compute.index_in against the shared table — NO
# per-worker python dict builds (32 workers x 32 buckets of dict building
# cost ~40s at 32 cpus and scaled WITH worker count, inverting CPU scaling).
_BUCKET_CACHE: dict[tuple[str, int], pa.Table] = {}
_CACHE_LOCK = threading.Lock()


def _load_bucket(corpus_dir: str, bucket: int, refs: dict) -> pa.Table:
    ck = (corpus_dir, bucket)
    with _CACHE_LOCK:
        hit = _BUCKET_CACHE.get(ck)
    if hit is not None:
        return hit
    t = ray.get(refs[bucket])  # zero-copy plasma read of the shared table
    with _CACHE_LOCK:
        _BUCKET_CACHE[ck] = t
    return t


class FetchParse:
    """Actor-pool stage: frontier rows in -> result rows out (html dropped)."""

    def __init__(self, corpus_dir: str, spider: Spider, n_buckets: int,
                 try_times: int, download_time: str, bucket_refs: dict | None = None,
                 jar_state: dict | None = None, virtual_now: float = 0.0,
                 ua_pool: tuple[str, ...] | None = None,
                 downloader=None):
        self.corpus_dir = corpus_dir
        self.spider = spider
        self.n_buckets = n_buckets
        self.try_times = try_times
        self.download_time = download_time
        self.virtual_now = virtual_now  # round's virtual clock (expiry checks)
        # UA pool ships in kwargs (a worker's freshly-imported module global
        # would be the default pool, silently diverging from the driver's)
        self.ua_pool = tuple(ua_pool) if ua_pool else None
        self.bucket_refs = (
            bucket_refs
            if bucket_refs is not None
            else preload_corpus(corpus_dir, n_buckets)
        )
        # the surfer seam (stages/downloader.py): ONE engine per actor,
        # built here (stateful-setup rule). Default = the deterministic
        # corpus-backed simnet double; pass an HttpDownloader to go on-wire.
        if downloader is None:
            from .downloader import SimnetDownloader

            downloader = SimnetDownloader(
                corpus_dir, n_buckets, self.bucket_refs
            )
        self.downloader = downloader
        # ST1: the reference shares one jar across its download engines
        # (surfer/surfer.go:39-51), gated per spider by EnableCookie; with
        # cookies on, the UA is FIXED, else rotated per attempt
        # (surfer/param.go:86-96). The distributed engine uses ROUND-granular
        # visibility: every fetch in round r reads an identical read-only
        # snapshot of the jar merged through round r-1 (shipped here as
        # ``jar_state``), and the Set-Cookie header each response carries is
        # emitted as a result column that the driver merges back in seq
        # order at round end. That makes cookie state deterministic under
        # any task/actor scheduling, so engine == sequential oracle even
        # for rules that read ctx.get_cookie()/ctx.user_agent.
        if spider.enable_cookie:
            from ..state.cookiejar import CookieJar

            self.jar: "CookieJar | None" = CookieJar.from_state(jar_state)
        else:
            self.jar = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return RESULT_SCHEMA.empty_table()
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist() if self.jar is not None else None
        keys = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rules = batch["rule"].to_pylist()
        methods = batch["method"].to_pylist()
        post_datas = batch["post_data"].to_pylist()
        referers = batch["referer"].to_pylist()
        depths = batch["depth"].to_numpy(zero_copy_only=False)
        attempts_done = batch["attempts_done"].to_numpy(zero_copy_only=False)
        keyins = batch["keyin"].to_pylist()
        temps = batch["temp"].to_pylist()

        # cookie headers for THIS fetch come from the round-start snapshot;
        # each response's Set-Cookie is RECORDED (not applied) — the driver
        # merges it at round end, on the virtual clock
        cookies = (
            [self.jar.header(u, now=self.virtual_now) for u in urls]
            if self.jar is not None else None
        )
        statuses, attempts, bodies, set_cookies = self.downloader.fetch_batch(
            urls, hosts or [""] * n, keys, methods, post_datas,
            attempts_done, self.try_times, cookies, self.ua_pool,
            use_fixed_ua=self.jar is not None,
        )

        ok = np.zeros(n, dtype=bool)
        items_col: list[list[str]] = []
        links_col: list[list[dict]] = []
        files_col: list[list[dict]] = []

        for i in range(n):
            row_ok = statuses[i] < 400
            ok[i] = row_ok
            if not row_ok:
                items_col.append([])
                links_col.append([])
                files_col.append([])
                continue
            # HEAD gets status/headers only (surfer/param.go:66-67): the
            # rule still runs, but over an empty body. POST/POST-M bodies
            # reach the server; the simulated one (like most fetch targets)
            # keys its response on the URL alone.
            body = b"" if methods[i] == "HEAD" else bodies[i]
            if self.jar is not None:
                cookie_hdr = cookies[i]
                # EnableCookie pins the UA (param.go:88-90)
                ua = fixed_ua(self.ua_pool)
            else:
                cookie_hdr = ""
                ua = ua_for(int(keys[i]), int(attempts[i]), self.ua_pool)
            ctx = RuleContext(
                url=urls[i], referer=referers[i], rule=rules[i],
                depth=int(depths[i]), html_bytes=body, temp=temps[i],
                keyin=keyins[i], download_time=self.download_time,
                method=methods[i], post_data=post_datas[i],
                cookie=cookie_hdr, user_agent=ua, status=int(statuses[i]),
            )
            self.spider.run_rule(ctx)
            items_col.append([self.spider.finalize_item(ctx, it) for it in ctx.items])
            files_col.append(
                [{"name": fn, "data": fd} for fn, fd in ctx.files]
            )
            links_col.append(
                [
                    {
                        "url": r.url,
                        "rule": r.rule,
                        "method": r.method,
                        "post_data": r.post_data,
                        "priority": int(r.priority),
                        "anchor": r.anchor,
                        "reloadable": bool(r.reloadable),
                        "temp": r.temp,
                    }
                    for r in ctx.requests
                ]
            )

        return pa.table(
            {
                "url": batch["url"],
                "host": batch["host"],
                "key": batch["key"],
                "rule": batch["rule"],
                "method": batch["method"],
                "post_data": batch["post_data"],
                "priority": batch["priority"],
                "depth": batch["depth"],
                "referer": batch["referer"],
                "seq": batch["seq"],
                "keyin": batch["keyin"],
                "temp": batch["temp"],
                "status": pa.array(statuses),
                "ok": pa.array(ok),
                "attempts": pa.array(attempts),
                "set_cookie": pa.array(set_cookies, pa.string()),
                "n_items": pa.array(
                    np.array([len(x) for x in items_col], dtype=np.int32)
                ),
                "items": pa.array(items_col, pa.list_(pa.string())),
                "links": pa.array(links_col, pa.list_(LINK_STRUCT)),
                "files": pa.array(files_col, pa.list_(FILE_STRUCT)),
            },
            schema=RESULT_SCHEMA,
        )


def corpus_n_buckets(corpus_dir: str) -> int:
    import json

    with open(os.path.join(corpus_dir, "manifest.json")) as f:
        return json.load(f)["params"]["n_buckets"]


def page_bucket_of(urls, n_buckets: int) -> np.ndarray:
    """Bucket of a page url in the corpus layout (url-hash based)."""
    return (hash64_array(urls) % np.uint64(n_buckets)).astype(np.int64)
