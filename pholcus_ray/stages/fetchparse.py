"""Fused fetch + parse: the heavy actor-pool stage.

Reference parity: download (surfer/surf.go:52-196 — bounded TryTimes retry
loop, SURVEY.md S2) immediately followed by rule dispatch + parse
(crawler.go:112-174, context.go:356-375, SURVEY.md M1). The two are FUSED in
one ``map_batches`` stage so the wide ``html`` column never crosses a stage
boundary or enters a shuffle (SURVEY.md §7.4.6) — a page's bytes live only
inside one batch call.

Fetch here is the sandbox's simulated network: a lookup into the bucketed
pages corpus (``bucket = key % n_buckets`` matches the corpus layout) plus
the deterministic status model in functions/simnet.py. Bucket tables are
cached in a process-global dict — Ray reuses worker processes across rounds,
so the cache amortizes across the whole crawl, the actor-pool equivalent of
the reference's shared cookie jar / DNS cache singletons (ST1/ST2). In
production this class swaps its lookup for an HTTP client with a cookie jar
per actor; the stage contract (frontier rows in, result rows out) is
unchanged.
"""

from __future__ import annotations

import os
import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash64_array
from ..functions.simnet import sim_fetch_attempts
from ..model import LINK_STRUCT, RESULT_SCHEMA
from ..spiderapi import RuleContext, Spider

# process-global bucket cache: (corpus_dir, bucket) -> dict url -> html bytes
_BUCKET_CACHE: dict[tuple[str, int], dict[str, bytes]] = {}
_CACHE_LOCK = threading.Lock()
_CACHE_CAP = 64


def _load_bucket(corpus_dir: str, bucket: int) -> dict[str, bytes]:
    ck = (corpus_dir, bucket)
    with _CACHE_LOCK:
        hit = _BUCKET_CACHE.get(ck)
    if hit is not None:
        return hit
    path = os.path.join(corpus_dir, "pages", f"bucket={bucket}")
    lookup: dict[str, bytes] = {}
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".parquet"):
                t = pq.read_table(os.path.join(path, fn), columns=["url", "html"])
                for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
                    lookup[u] = h
    with _CACHE_LOCK:
        if len(_BUCKET_CACHE) >= _CACHE_CAP:
            _BUCKET_CACHE.pop(next(iter(_BUCKET_CACHE)))
        _BUCKET_CACHE[ck] = lookup
    return lookup


class FetchParse:
    """Actor-pool stage: frontier rows in -> result rows out (html dropped)."""

    def __init__(self, corpus_dir: str, spider: Spider, n_buckets: int,
                 try_times: int, download_time: str):
        self.corpus_dir = corpus_dir
        self.spider = spider
        self.n_buckets = n_buckets
        self.try_times = try_times
        self.download_time = download_time

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return RESULT_SCHEMA.empty_table()
        urls = batch["url"].to_pylist()
        keys = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        rules = batch["rule"].to_pylist()
        referers = batch["referer"].to_pylist()
        depths = batch["depth"].to_numpy(zero_copy_only=False)
        attempts_done = batch["attempts_done"].to_numpy(zero_copy_only=False)
        keyins = batch["keyin"].to_pylist()
        temps = batch["temp"].to_pylist()

        # corpus layout buckets by hash64(url), NOT by the dedup key
        buckets = (hash64_array(urls) % np.uint64(self.n_buckets)).astype(np.int64)
        lookups = {int(b): _load_bucket(self.corpus_dir, int(b))
                   for b in np.unique(buckets)}

        statuses = np.zeros(n, dtype=np.int32)
        attempts = np.zeros(n, dtype=np.int32)
        ok = np.zeros(n, dtype=bool)
        items_col: list[list[str]] = []
        links_col: list[list[dict]] = []

        for i in range(n):
            html = lookups[int(buckets[i])].get(urls[i])
            status, att = sim_fetch_attempts(
                int(keys[i]), html is not None, int(attempts_done[i]), self.try_times
            )
            statuses[i] = status
            attempts[i] = att
            row_ok = status < 400
            ok[i] = row_ok
            if not row_ok:
                items_col.append([])
                links_col.append([])
                continue
            ctx = RuleContext(
                url=urls[i], referer=referers[i], rule=rules[i],
                depth=int(depths[i]), html_bytes=html, temp=temps[i],
                keyin=keyins[i], download_time=self.download_time,
            )
            self.spider.run_rule(ctx)
            items_col.append([self.spider.finalize_item(ctx, it) for it in ctx.items])
            links_col.append(
                [
                    {
                        "url": r.url,
                        "rule": r.rule,
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
                "priority": batch["priority"],
                "depth": batch["depth"],
                "referer": batch["referer"],
                "seq": batch["seq"],
                "keyin": batch["keyin"],
                "temp": batch["temp"],
                "status": pa.array(statuses),
                "ok": pa.array(ok),
                "attempts": pa.array(attempts),
                "items": pa.array(items_col, pa.list_(pa.string())),
                "links": pa.array(links_col, pa.list_(LINK_STRUCT)),
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
