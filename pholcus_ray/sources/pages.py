"""Deterministic synthetic pages corpus — the simulated web.

Schema is exactly the authoritative ``input_hint`` from BASELINE.json:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.
``text`` is the ground truth that ``functions.textops.extract_text(html)``
must reproduce byte-identically; the generator composes it INDEPENDENTLY of
the extractor (it never calls extract_text), so the identity test is real.

Layout (FIXTURES.md §1):

    corpus_dir/
      pages/bucket={k}/part-0.parquet    # hive-partitioned by hash64(url) % B
      robots.parquet                     # (url, host, body) one row per host with robots
      seeds.parquet                      # (url, rule, method, priority, keyin)
      manifest.json

Bucketing by url-hash is the corpus-side half of the fetch join: the fetch
actor pool prunes its reads to the buckets a batch actually touches
(SURVEY.md §7.3 "fetch join" shuffle key). At 100 TB the bucket count scales
with the corpus; in production this stage is a real HTTP fetch and the
bucketed corpus disappears.

Properties (FIXTURES.md generator spec):
- Zipfian host skew (host 0 is the hot host) to exercise salted politeness.
- Link graph embedded in html: relative ``p/t``, ``./``-less, ``../p/t``,
  absolute with default port, fragment links, ``javascript:`` (dropped),
  duplicates, cross-host, dangling (404) — mirrors GetHref resolution cases
  (reference app/spider/common/common.go:248-306).
- Per-host robots.txt with Disallow + Crawl-delay for hosts h % 3 == 0.
- Deterministic failure markers driven by the url's hash64 (see
  stages/fetch.py sim_status): transient, hard-transient, permanent-404.
- A GB18030 charset subset (meta-charset declared) with lang="zh".
"""

from __future__ import annotations

import hashlib
import html as _html
import json
import os
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash64_array

# corpus FORMAT version: bump on ANY generator change that alters output
# (CLAUDE.md invariant). Single constant — it keys BOTH the manifest params
# check and cached_corpus's cache-dir hash, which must never desync.
_FORMAT = 6

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_WORDS_EN = (
    "stream shuffle arrow block actor frontier filter bucket parquet spill "
    "vector batch schema crawl spider politeness budget priority queue seed "
    "graph anchor host delay robots lineage checkpoint resume metric round"
).split()
_WORDS_ZH = "数据 流式 批处理 爬虫 队列 优先 礼貌 主机 延迟 恢复 检查点 分片".split()

_BASE_TS = datetime(2026, 3, 1)


def _host_name(h: int) -> str:
    return f"host{h}.example.com"


def _zipf_counts(n_pages: int, n_hosts: int, a: float = 1.15) -> list[int]:
    # every host needs >= 1 page, so more hosts than pages is unsatisfiable
    # (the old code handed the hot host a NEGATIVE count in that case)
    if n_hosts > n_pages:
        raise ValueError(
            f"n_hosts ({n_hosts}) must be <= n_pages ({n_pages})"
        )
    w = 1.0 / np.arange(1, n_hosts + 1) ** a
    w /= w.sum()
    counts = np.maximum(1, np.floor(w * n_pages).astype(int))
    # give the remainder to the hot host (the floor of the non-clamped
    # hosts keeps counts.sum() <= n_pages whenever n_hosts <= n_pages)
    counts[0] += n_pages - counts.sum()
    if counts[0] < 1:  # many tiny hosts can still overdraw the hot host
        raise ValueError(
            f"zipf split infeasible: n_hosts {n_hosts} too large for "
            f"n_pages {n_pages}"
        )
    return counts.tolist()


def _page_words(rng_val: int, pool: list[str], n: int) -> list[str]:
    return [pool[(rng_val * 31 + i * 7) % len(pool)] for i in range(n)]


# Paragraph lines depend only on (rng_val % len(pool), n): cache the composed
# and html-escaped strings once per pool — page building is then O(1) string
# lookups per line, which is what makes multi-GB heavy corpora generable.
_LINE_CACHE: dict[int, list[list[tuple[str, str]]]] = {}


def _line_cache(pool: list[str]):
    key = id(pool)
    cached = _LINE_CACHE.get(key)
    if cached is None:
        P = len(pool)
        cached = [
            [
                (
                    " ".join(_page_words(v, pool, n)),
                    _html.escape(" ".join(_page_words(v, pool, n))),
                )
                for n in range(8)
            ]
            for v in range(P)
        ]
        _LINE_CACHE[key] = cached
    return cached


def _build_page(host: str, j: int, host_count: int, h: int, n_hosts: int, zh: bool,
                page_weight: int = 1, far_links: int = 0):
    """Compose one page: returns (url, html_bytes, text, lang, links_raw).

    ``text`` is constructed line-by-line alongside the html so the extraction
    identity is by construction, not by running the extractor.

    ``page_weight`` scales the paragraph count (bench corpora use heavier,
    Common-Crawl-sized bodies so extraction compute dominates fixed costs);
    ``far_links`` adds long-stride in-host links that shrink the BFS
    diameter (fast-mixing graph -> fewer, larger rounds).
    """
    url = f"http://{host}/p/{j}"
    pool = _WORDS_ZH if zh else _WORDS_EN
    title = f"Page {j} of {host} " + " ".join(_page_words(j, pool, 2))
    if j % 9 == 0:
        title += " & <more>"  # exercise entity escaping round-trip

    # --- link targets (deterministic graph) ---
    # Backbone: a 16-ary sitemap tree (page j links to children 16j+1..16j+16
    # when they exist) — every page is reachable at depth log16(count), like
    # a real site's nav/sitemap structure, so BFS has no multi-round
    # geometric discovery tail. Leaves add mod-arithmetic "related" links
    # and hash-mixed far links for graph flavor (duplicates/cycles).
    links_raw: list[str] = []
    is_hub = j == 0 or j % 17 == 0
    tree_base = j * 16 + 1
    if tree_base < host_count:
        targets = [tree_base + i for i in range(16) if tree_base + i < host_count]
    else:
        fanout = 12 if is_hub else 3
        targets = [((j * 7) + i + 1) % host_count for i in range(fanout)]
    for fi in range(far_links):
        mix = (j * 2654435761 + fi * 40503 + 2654435769) & 0xFFFFFFFF
        mix ^= mix >> 13
        targets.append(mix % host_count)
    forms = [
        "/p/{t}",
        "./{t}",
        "../p/{t}",
        "http://{host}:80/p/{t}",
        "/p/{t}#sec",
    ]
    for i, t in enumerate(targets):
        form = forms[(j + i) % len(forms)]
        links_raw.append(form.format(t=t, host=host))
    if j % 6 == 0 and links_raw:
        links_raw.append(links_raw[0])  # duplicate link
    if j % 4 == 0:
        links_raw.append("javascript:void(0)")
    if j % 11 == 0:
        links_raw.append(f"/missing/{j}")  # dangling -> 404
    if j % 5 == 0 and n_hosts > 1:
        # hash-mixed cross-host target: the host-level graph is a random
        # digraph (log diameter), not a 1-step chain that would serialize
        # host discovery into n_hosts BFS rounds
        th = (h * 31 + (j // 5) * 137 + 11) % n_hosts
        if th == h:
            th = (th + 1) % n_hosts
        links_raw.append(f"http://{_host_name(th)}/p/0")
    if is_hub and h % 3 == 0:
        links_raw.append("/private/0")  # robots-disallowed

    # --- body paragraphs ---
    n_lines = (3 + (j % 5)) * max(1, page_weight)
    cache = _line_cache(pool)
    P = len(pool)
    para_pairs = [cache[(j * 13 + k) % P][4 + (k % 4)] for k in range(n_lines)]

    parts = ["<!DOCTYPE html>", "<html><head>"]
    charset = "gb18030" if zh else "utf-8"
    parts.append(f'<meta charset="{charset}">')
    parts.append(f"<title>{_html.escape(title)}</title>")
    parts.append("<style>body { font: 12px sans-serif; }</style>")
    parts.append("</head>")
    parts.append("<body>")
    parts.append(f"<!-- generated page {j} -->")
    parts.append(f"<h1>{_html.escape(title)}</h1>")
    parts.append(
        '<script type="text/javascript">var t = "<p>not text</p>" + (1 < 2);</script>'
    )
    text_lines = [title, title]  # <title> line + <h1> line
    for line, esc in para_pairs:
        parts.append(f"<p>{esc}</p>")
        text_lines.append(line)
    for i, href in enumerate(links_raw):
        anchor = f"link {i} " + pool[(j + i) % len(pool)]
        parts.append(f'<div><a href="{_html.escape(href)}">{_html.escape(anchor)}</a></div>')
        text_lines.append(anchor)
    parts.append("</body></html>")

    doc = "\n".join(parts)
    text = "\n".join(text_lines)
    html_bytes = doc.encode(charset)
    return url, html_bytes, text, ("zh" if zh else "en"), links_raw


def _private_page(host: str, m: int):
    url = f"http://{host}/private/{m}"
    title = f"Private {m} of {host}"
    doc = (
        "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
        f"<title>{title}</title></head>\n<body>\n<p>secret {m}</p>\n</body></html>"
    )
    return url, doc.encode("utf-8"), f"{title}\nsecret {m}", "en"


def _gen_chunk(args) -> tuple:
    """Worker: generate a page-range chunk of ONE host and write its
    bucket-partial parquet files directly (no driver-side assembly; chunked
    by pages — not whole hosts — so the Zipf hot host parallelizes instead
    of serializing generation). Deterministic per (host, range)."""
    (h, j_lo, j_hi, host_count, n_hosts, seed, zh_frac, page_weight, far_links,
     n_buckets, pages_dir, ts_offset) = args
    host = _host_name(h)
    urls, htmls, texts, langs = [], [], [], []
    robots_rows = []
    for j in range(j_lo, j_hi):
        zh = (j * 2654435761 + seed) % 1000 < zh_frac * 1000
        url, hb, text, lang, _ = _build_page(
            host, j, host_count, h, n_hosts, zh, page_weight, far_links
        )
        urls.append(url)
        htmls.append(hb)
        texts.append(text)
        langs.append(lang)
    if j_lo == 0 and h % 3 == 0:
        for m in range(3):
            url, hb, text, lang = _private_page(host, m)
            urls.append(url)
            htmls.append(hb)
            texts.append(text)
            langs.append(lang)
        delay = 1 + (h % 5)
        robots_rows.append(
            (
                f"http://{host}/robots.txt",
                host,
                f"User-agent: *\nDisallow: /private/\nCrawl-delay: {delay}\n",
            )
        )
    n = len(urls)
    ts = [_BASE_TS + timedelta(seconds=(ts_offset + i) * 17) for i in range(n)]
    keys = hash64_array(urls)
    buckets = (keys % np.uint64(n_buckets)).astype(np.int64)
    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    order = np.argsort(urls, kind="stable")
    for b in np.unique(buckets):
        sel = order[buckets[order] == b]
        sub = table.take(pa.array(sel, pa.int64()))
        bdir = os.path.join(pages_dir, f"bucket={int(b)}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(
            sub, os.path.join(bdir, f"part-h{h:05d}-{j_lo:07d}.parquet")
        )
    return robots_rows, n


def make_corpus(
    out_dir: str,
    n_pages: int = 1000,
    n_hosts: int = 10,
    seed: int = 42,
    n_buckets: int = 16,
    zh_frac: float = 0.1,
    page_weight: int = 1,
    far_links: int = 0,
    workers: int = 8,
) -> dict:
    """Generate the corpus (idempotent: skipped if manifest matches params)."""
    params = {
        "n_pages": n_pages,
        "n_hosts": n_hosts,
        "seed": seed,
        "n_buckets": n_buckets,
        "zh_frac": zh_frac,
        "page_weight": page_weight,
        "far_links": far_links,
        "format": _FORMAT,
    }
    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f)
        if old.get("params") == params:
            return old
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)

    counts = _zipf_counts(n_pages, n_hosts)
    # page-range chunks (hot host parallelizes); stable warc_ts offsets
    chunk_pages = 4000
    jobs = []
    offset = 0
    for h in range(n_hosts):
        hc = counts[h]
        for j_lo in range(0, hc, chunk_pages):
            j_hi = min(hc, j_lo + chunk_pages)
            jobs.append(
                (h, j_lo, j_hi, hc, n_hosts, seed, zh_frac, page_weight,
                 far_links, n_buckets, pages_dir, offset)
            )
            offset += j_hi - j_lo + (3 if j_lo == 0 and h % 3 == 0 else 0)

    if len(jobs) > 1 and workers > 1:
        import multiprocessing as mp

        with mp.get_context("fork").Pool(workers) as pool:
            results = pool.map(_gen_chunk, jobs, chunksize=1)
    else:
        results = [_gen_chunk(j) for j in jobs]
    robots_rows = []
    n = 0
    for rr, cnt in results:
        robots_rows.extend(rr)
        n += cnt

    robots_tbl = pa.table(
        {
            "url": pa.array([r[0] for r in robots_rows], pa.string()),
            "host": pa.array([r[1] for r in robots_rows], pa.string()),
            "body": pa.array([r[2] for r in robots_rows], pa.string()),
        }
    )
    pq.write_table(robots_tbl, os.path.join(out_dir, "robots.parquet"))

    # seeds: hub roots of the first few hosts, mixed priorities
    seed_hosts = list(range(min(n_hosts, 5)))
    seeds_tbl = pa.table(
        {
            "url": pa.array([f"http://{_host_name(h)}/p/0" for h in seed_hosts]),
            "rule": pa.array(["page"] * len(seed_hosts)),
            "method": pa.array(["GET"] * len(seed_hosts)),
            "priority": pa.array(
                [1 if h % 2 == 0 else 0 for h in seed_hosts], pa.int32()
            ),
            "keyin": pa.array([""] * len(seed_hosts)),
        }
    )
    pq.write_table(seeds_tbl, os.path.join(out_dir, "seeds.parquet"))

    manifest = {
        "params": params,
        "n_rows": n,
        "n_hosts": n_hosts,
        "hosts": [_host_name(h) for h in range(n_hosts)],
        "host_counts": counts,
        "n_robots": len(robots_rows),
        "n_seeds": len(seed_hosts),
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def cached_corpus(n_pages: int, n_hosts: int, seed: int = 42, n_buckets: int = 16,
                  page_weight: int = 1, far_links: int = 0,
                  root: str = "/tmp/pholcus_ray_cache") -> str:
    """Generate (or reuse) a corpus under a params-keyed cache dir."""
    key = hashlib.md5(
        json.dumps(
            [n_pages, n_hosts, seed, n_buckets, page_weight, far_links, _FORMAT],
            sort_keys=True,
        ).encode()
    ).hexdigest()[:12]
    out = os.path.join(root, f"corpus_{n_pages}x{n_hosts}w{page_weight}_{key}")
    make_corpus(out, n_pages=n_pages, n_hosts=n_hosts, seed=seed,
                n_buckets=n_buckets, page_weight=page_weight, far_links=far_links)
    return out
