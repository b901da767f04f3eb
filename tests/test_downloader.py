"""The surfer seam (stages/downloader.py): simnet double vs real HTTP.

The HttpDownloader is exercised against a loopback http.server — a real
wire, real status codes, real retry behavior — serving the SAME corpus
pages the simnet double reads from parquet, so the parse side of
FetchParse can be byte-compared across engines (S2's real half;
surfer/surf.go:52-196 semantics)."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlsplit

import numpy as np
import pyarrow.dataset as pads
import pytest

from pholcus_ray.functions.hashing import dedup_key_array
from pholcus_ray.stages.downloader import HttpDownloader, SimnetDownloader


class _CorpusHandler(BaseHTTPRequestHandler):
    """Serves /<host>/<path> from an in-memory {url: html} dict; 404 for
    unknown paths; /flaky 503s its first two hits (retry exercise); every
    200 carries a Set-Cookie header."""

    pages: dict[str, bytes] = {}
    flaky_hits = 0
    lock = threading.Lock()
    seen_headers: list[dict] = []

    def do_GET(self):
        with _CorpusHandler.lock:
            _CorpusHandler.seen_headers.append(dict(self.headers))
        if self.path == "/flaky":
            with _CorpusHandler.lock:
                _CorpusHandler.flaky_hits += 1
                hits = _CorpusHandler.flaky_hits
            if hits <= 2:
                self.send_response(503)
                self.end_headers()
                return
            body = b"<html><body>recovered</body></html>"
        else:
            body = _CorpusHandler.pages.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
        self.send_response(200)
        self.send_header("Set-Cookie", "sid=wire; Path=/")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def http_corpus(small_corpus):
    """Loopback server publishing the small corpus at /<host><path>."""
    t = pads.dataset(f"{small_corpus}/pages").to_table(
        columns=["url", "html"]
    )
    pages = {}
    for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        parts = urlsplit(u)
        pages[f"/{parts.hostname}{parts.path}"] = h
    _CorpusHandler.pages = pages
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CorpusHandler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield small_corpus, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _rewrite_to(base: str):
    def rw(url: str, _b=base) -> str:
        p = urlsplit(url)
        return f"{_b}/{p.hostname}{p.path}"

    return rw


def test_http_downloader_fetches_real_pages(http_corpus):
    corpus, base = http_corpus
    t = pads.dataset(f"{corpus}/pages").to_table(columns=["url", "html"])
    urls = t["url"].to_pylist()[:5]
    htmls = t["html"].to_pylist()[:5]
    dl = HttpDownloader(url_rewrite=_rewrite_to(base), retry_pause=0.0)
    keys = dedup_key_array(urls, ["GET"] * 5, ["page"] * 5)
    st, att, bodies, sc = dl.fetch_batch(
        urls, [""] * 5, keys, ["GET"] * 5, [""] * 5,
        np.zeros(5, np.int32), 3, None, None, False,
    )
    assert (st == 200).all() and (att == 1).all()
    assert bodies == htmls  # byte-identical over the wire
    assert sc == [""] * 5  # no jar -> set-cookies not captured


def test_http_downloader_retries_and_404(http_corpus):
    _corpus, base = http_corpus
    _CorpusHandler.flaky_hits = 0
    urls = ["http://anyhost.example/flaky", "http://anyhost.example/nope"]
    dl = HttpDownloader(
        url_rewrite=lambda u: base + "/" + u.rsplit("/", 1)[1]
        if u.endswith(("flaky", "nope")) else u,
        retry_pause=0.0,
    )
    keys = dedup_key_array(urls, ["GET"] * 2, ["page"] * 2)
    st, att, bodies, sc = dl.fetch_batch(
        urls, ["", ""], keys, ["GET"] * 2, ["", ""],
        np.zeros(2, np.int32), 3, ["", ""], None, False,
    )
    # /flaky: 503, 503, then 200 on the third in-call attempt
    assert st[0] == 200 and att[0] == 3 and bodies[0] is not None
    assert sc[0] == "sid=wire; Path=/"  # jar present -> captured
    # /nope: permanent 404, all try_times consumed
    assert st[1] == 404 and att[1] == 3 and bodies[1] is None


def test_http_downloader_sends_cookie_and_ua(http_corpus):
    _corpus, base = http_corpus
    _CorpusHandler.seen_headers = []
    urls = ["http://h.example/flaky"]
    dl = HttpDownloader(url_rewrite=lambda u: base + "/flaky",
                        retry_pause=0.0)
    _CorpusHandler.flaky_hits = 10  # already recovered: one attempt
    keys = dedup_key_array(urls, ["GET"], ["page"])
    dl.fetch_batch(urls, [""], keys, ["GET"], [""], np.zeros(1, np.int32),
                   3, ["sid=abc"], None, True)
    hdr = _CorpusHandler.seen_headers[-1]
    assert hdr.get("Cookie") == "sid=abc"
    from pholcus_ray.functions.uapool import fixed_ua

    assert hdr.get("User-Agent") == fixed_ua(None)


def test_dns_cache_semantics():
    """Success-driven map parity (surfer/surf.go:82-100): reg/query/del,
    injectable resolver counted per uncached resolve."""
    from pholcus_ray.state.dnscache import DnsCache

    calls = []
    dc = DnsCache(resolver=lambda h, p: (calls.append((h, p)),
                                         f"10.0.0.9:{p}")[1])
    assert dc.query("a.example:80") is None
    assert dc.resolve("a.example", 80) == "10.0.0.9:80"
    assert calls == [("a.example", 80)] and dc.resolve_calls == 1
    dc.reg("a.example:80", "10.0.0.9:80")
    assert dc.query("a.example:80") == "10.0.0.9:80" and len(dc) == 1
    dc.delete("a.example:80")
    assert dc.query("a.example:80") is None and len(dc) == 0
    dc.delete("a.example:80")  # idempotent


def test_http_downloader_dns_cache_hits_and_eviction(http_corpus):
    """Wire behavior of the Dial-hook analogue: the first fetch resolves
    once and registers host:port -> ip:port; the second fetch is a cache
    hit (no new resolution) dialing the ip with the original netloc in
    the Host header; a poisoned entry (dead port) is evicted on the
    connection failure and the NEXT attempt re-resolves and succeeds —
    the surfer delete-on-dial-error semantics."""
    from pholcus_ray.state.dnscache import DnsCache

    _corpus, base = http_corpus
    port = int(base.rsplit(":", 1)[1])
    _CorpusHandler.flaky_hits = 10  # /flaky answers 200 immediately
    dc = DnsCache()  # real getaddrinfo on the loopback name
    dl = HttpDownloader(retry_pause=0.0, dns_cache=dc)
    url = f"http://localhost:{port}/flaky"
    key = f"localhost:{port}"
    keys = dedup_key_array([url], ["GET"], ["page"])

    _CorpusHandler.seen_headers = []
    st, att, _, _ = dl.fetch_batch([url], [""], keys, ["GET"], [""],
                                   np.zeros(1, np.int32), 3, None, None,
                                   False)
    assert st[0] == 200 and dc.resolve_calls == 1
    assert dc.query(key) == f"127.0.0.1:{port}"
    assert _CorpusHandler.seen_headers[-1].get("Host") == key

    st, att, _, _ = dl.fetch_batch([url], [""], keys, ["GET"], [""],
                                   np.zeros(1, np.int32), 3, None, None,
                                   False)
    assert st[0] == 200 and dc.resolve_calls == 1  # pure cache hit

    dc.reg(key, "127.0.0.1:9")  # poison: discard-port, connection refused
    st, att, _, _ = dl.fetch_batch([url], [""], keys, ["GET"], [""],
                                   np.zeros(1, np.int32), 3, None, None,
                                   False)
    assert st[0] == 200 and att[0] == 2  # 599 evicted, retry re-resolved
    assert dc.resolve_calls == 2 and dc.query(key) == f"127.0.0.1:{port}"


def test_fetchparse_identical_over_wire_and_simnet(http_corpus):
    """FetchParse + HttpDownloader against the loopback server produces
    the SAME parse output (items, links, n_items) as FetchParse + simnet
    on rows where simnet injects no failure — the parse plane is engine-
    agnostic; only the network column (status/attempts) may differ."""
    import pyarrow as pa

    from pholcus_ray.model import FRONTIER_SCHEMA
    from pholcus_ray.spiderapi import DEFAULT_SPIDER
    from pholcus_ray.stages.fetchparse import FetchParse, corpus_n_buckets
    from pholcus_ray.stages.normalize import seeds_to_frontier

    corpus, base = http_corpus
    t = pads.dataset(f"{corpus}/pages").to_table(columns=["url"])
    seeds = pa.table({"url": t["url"][:24]})
    frontier = seeds_to_frontier(seeds, DEFAULT_SPIDER.entry_rule)
    nb = corpus_n_buckets(corpus)
    common = dict(corpus_dir=corpus, spider=DEFAULT_SPIDER, n_buckets=nb,
                  try_times=3, download_time="2020-01-01T00:00:00")
    sim = FetchParse(**common)(frontier)
    wire = FetchParse(
        **common,
        downloader=HttpDownloader(url_rewrite=_rewrite_to(base),
                                  retry_pause=0.0),
    )(frontier)
    assert wire.num_rows == sim.num_rows
    # the wire has no injected failures: everything 200 on attempt 1
    assert wire["ok"].to_pylist() == [True] * wire.num_rows
    # rows simnet fetched ok must parse byte-identically over the wire
    ok = np.asarray(sim["ok"].to_pylist())
    idx = pa.array(np.flatnonzero(ok))
    for col in ("url", "n_items", "items", "links", "files"):
        assert wire.column(col).take(idx).equals(sim.column(col).take(idx))
    assert ok.sum() >= 15


def test_simnet_downloader_explicit_equals_default(small_corpus):
    """Passing SimnetDownloader explicitly == the default construction."""
    import pyarrow as pa

    from pholcus_ray.spiderapi import DEFAULT_SPIDER
    from pholcus_ray.stages.fetchparse import (FetchParse, corpus_n_buckets,
                                               preload_corpus)
    from pholcus_ray.stages.normalize import seeds_to_frontier

    t = pads.dataset(f"{small_corpus}/pages").to_table(columns=["url"])
    frontier = seeds_to_frontier(pa.table({"url": t["url"][:16]}),
                                 DEFAULT_SPIDER.entry_rule)
    nb = corpus_n_buckets(small_corpus)
    refs = preload_corpus(small_corpus, nb)
    common = dict(corpus_dir=small_corpus, spider=DEFAULT_SPIDER,
                  n_buckets=nb, try_times=3,
                  download_time="2020-01-01T00:00:00", bucket_refs=refs)
    a = FetchParse(**common)(frontier)
    b = FetchParse(**common,
                   downloader=SimnetDownloader(small_corpus, nb, refs))(
        frontier)
    assert a.equals(b)


def test_run_crawl_over_wire(ray_session, http_corpus, tmp_path):
    """run_crawl end-to-end with cfg.downloader=HttpDownloader: the whole
    engine (frontier, dedup, politeness, parse, sinks projections) drives a
    real HTTP server; every fetch is a real request, no simnet anywhere."""
    from pholcus_ray.pipelines.crawl import (CrawlConfig, crawl_log_table,
                                             run_crawl)

    corpus, base = http_corpus
    wd = str(tmp_path / "wire")
    s = run_crawl(CrawlConfig(
        corpus_dir=corpus, workdir=wd, round_virtual_sec=64.0, num_shards=4,
        max_depth=1,
        downloader=HttpDownloader(url_rewrite=_rewrite_to(base),
                                  retry_pause=0.0),
    ))
    assert s.fetched_ok > 0
    log = crawl_log_table(wd).to_pandas()
    # the wire injects no failures, but corpus pages link to far urls the
    # server genuinely does not have: in-corpus -> 200 on attempt 1,
    # out-of-corpus -> real 404 after all try_times
    assert set(log["status"]) <= {200, 404}
    ok = log["status"] == 200
    assert ok.any() and (log.loc[ok, "attempts"] == 1).all()
    # each 404 consumes all try_times; the failure-map re-enqueue (J2)
    # retries once more in a later round, accumulating to 6
    assert set(log.loc[~ok, "attempts"]) <= {3, 6}
    assert s.fetched_fail == int((~ok).sum())
    assert s.fetched_ok == int(ok.sum())
