"""ST1 cookie jar + M15 cookie splitter.

Reference parity targets: net/http/cookiejar as shared by the download
engines (surfer/surfer.go:39-51), Spider.EnableCookie (spider.go:33) with
the fixed-vs-rotated UA split (surfer/param.go:86-96), and SplitCookies
(spider/common/common.go:106-118) including its exact quirks.
"""

import pyarrow.parquet as pq
import pytest

from pholcus_ray.functions.textops import split_cookies
from pholcus_ray.state.cookiejar import CookieJar


# --- M15: SplitCookies parity (vectors from common_test.go:79-105) ---------


@pytest.mark.parametrize(
    "s,want",
    [
        ("a=1; b=2", [("a", "1"), ("b", "2")]),
        ("mt=ci%3D-1_0; thw=cn", [("mt", "ci%3D-1_0"), ("thw", "cn")]),
        ("single=val", [("single", "val")]),
        ("", []),
        (" a = b ", [("a", "b")]),
        # reference quirk: '='-split must yield exactly 2 parts, so values
        # containing '=' are dropped entirely (common.go:111-115)
        ("a=b=c; ok=1", [("ok", "1")]),
        ("mt=ci=-1_0; thw=cn", [("thw", "cn")]),
    ],
)
def test_split_cookies_reference_vectors(s, want):
    assert [(c["name"], c["value"]) for c in split_cookies(s)] == want


# --- ST1: jar semantics ----------------------------------------------------


def test_jar_set_get_roundtrip():
    jar = CookieJar()
    jar.set_cookie("http://a.example.com/x/y", "sid=abc; Path=/")
    assert jar.header("http://a.example.com/other") == "sid=abc"
    # host-only by default: sibling host must NOT see it
    assert jar.header("http://b.example.com/") == ""


def test_jar_domain_attribute_enables_subdomains():
    jar = CookieJar()
    jar.set_cookie("http://www.example.com/", "d=1; Domain=example.com; Path=/")
    assert jar.header("http://sub.example.com/") == "d=1"
    assert jar.header("http://example.com/") == "d=1"
    # foreign Domain attribute is rejected (RFC 6265 §5.3.6)
    jar.set_cookie("http://www.example.com/", "evil=1; Domain=other.com")
    assert "evil" not in jar.header("http://other.com/")


def test_jar_path_matching_and_ordering():
    jar = CookieJar()
    jar.set_cookie("http://h/", "root=1; Path=/")
    jar.set_cookie("http://h/", "deep=2; Path=/a/b")
    assert jar.header("http://h/") == "root=1"
    assert jar.header("http://h/ab") == "root=1"  # /a/b must not match /ab
    # longest path first (Go cookiejar ordering)
    assert jar.header("http://h/a/b/c") == "deep=2; root=1"


def test_jar_max_age_expiry_virtual_clock():
    jar = CookieJar()
    jar.set_cookie("http://h/", "s=1; Path=/; Max-Age=10", now=100.0)
    assert jar.header("http://h/", now=105.0) == "s=1"
    assert jar.header("http://h/", now=110.0) == ""  # expired exactly at deadline
    # Max-Age<=0 deletes an existing cookie
    jar.set_cookie("http://h/", "s=1; Path=/", now=0.0)
    jar.set_cookie("http://h/", "s=; Path=/; Max-Age=0", now=1.0)
    assert jar.header("http://h/", now=1.0) == ""


def test_jar_expires_on_virtual_clock():
    """Expires dates convert to VIRTUAL seconds (model._VIRTUAL_T0 = t0):
    the standard past-dated delete-cookie idiom works, and future dates
    expire when the virtual clock passes them."""
    from datetime import timedelta

    from pholcus_ray.model import _VIRTUAL_T0

    jar = CookieJar()
    jar.set_cookie("http://h/", "sid=live; Path=/", now=0.0)
    # canonical deletion idiom: long-past Expires removes the cookie
    jar.set_cookie("http://h/", "sid=deleted; Path=/; "
                   "Expires=Wed, 21 Oct 2015 07:28:00 GMT", now=0.0)
    assert jar.header("http://h/", now=0.0) == ""
    # a future wall date = (date - _VIRTUAL_T0) virtual seconds
    future = (_VIRTUAL_T0 + timedelta(seconds=500)).strftime(
        "%a, %d %b %Y %H:%M:%S GMT")
    jar.set_cookie("http://h/", f"s2=x; Path=/; Expires={future}", now=0.0)
    assert jar.header("http://h/", now=499.0) == "s2=x"
    assert jar.header("http://h/", now=500.0) == ""


def test_jar_secure_filter_and_seed():
    jar = CookieJar()
    jar.set_cookie("https://h/", "s=1; Path=/; Secure")
    assert jar.header("http://h/") == ""
    assert jar.header("https://h/") == "s=1"
    # seeding from a request Cookie header (Request.SetCookies parity)
    jar.seed("http://h2/", "a=1; b=2")
    assert jar.header("http://h2/") == "a=1; b=2"


# --- EnableCookie wiring through FetchParse --------------------------------


def _frontier_for(corpus_dir):
    import os

    from pholcus_ray.stages.normalize import seeds_to_frontier

    seeds = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
    return seeds_to_frontier(seeds)


def test_fetchparse_cookie_snapshot_and_fixed_ua(ray_session, small_corpus):
    """ST1 round-granular contract: within a round every fetch reads the
    round-start jar snapshot (first contact sends no cookie); the observed
    Set-Cookie headers come back as the ``set_cookie`` result column; a
    next-round FetchParse built from the merged jar sends the per-host sid.
    With enable_cookie the UA is pinned (param.go:88-90)."""
    from pholcus_ray.functions.simnet import sim_set_cookie
    from pholcus_ray.functions.uapool import fixed_ua
    from pholcus_ray.spiderapi import Rule, RuleContext, Spider
    from pholcus_ray.stages.fetchparse import FetchParse, corpus_n_buckets

    seen: list[dict] = []

    def _parse(ctx: RuleContext) -> None:
        seen.append({"url": ctx.url, "cookie": ctx.cookie, "ua": ctx.user_agent})

    sp = Spider(name="cookiespy", rules={"page": Rule(parse=_parse)},
                enable_cookie=True)
    fp = FetchParse(corpus_dir=small_corpus, spider=sp,
                    n_buckets=corpus_n_buckets(small_corpus), try_times=3,
                    download_time="t0")
    frontier = _frontier_for(small_corpus)
    res = fp(frontier)
    first = {r["url"]: r for r in seen}
    assert all(r["cookie"] == "" for r in seen), "first contact sends no cookie"
    assert all(r["ua"] == fixed_ua() for r in seen), "EnableCookie pins the UA"
    # the response's Set-Cookie is RECORDED in the result, not applied:
    # a second fetch through the SAME instance still sees the snapshot
    seen.clear()
    fp(frontier)
    assert seen and all(r["cookie"] == "" for r in seen), \
        "round snapshot is read-only within the round"

    # driver-side merge -> next round's snapshot carries the sid
    jar = CookieJar()
    for url, ok, sc in zip(res["url"].to_pylist(), res["ok"].to_pylist(),
                           res["set_cookie"].to_pylist()):
        if ok and sc:
            jar.set_cookie(url, sc)
    fp2 = FetchParse(corpus_dir=small_corpus, spider=sp,
                     n_buckets=corpus_n_buckets(small_corpus), try_times=3,
                     download_time="t1", jar_state=jar.to_state())
    seen.clear()
    fp2(frontier)
    assert seen, "second round must fetch"
    for r in seen:
        host = r["url"].split("/")[2]
        want = sim_set_cookie(host).split(";")[0]
        assert r["cookie"] == want, f"{r['url']} must carry the host sid"
    assert set(first) == {r["url"] for r in seen}


def _parse_cookie_echo(ctx):
    """Rule whose ITEMS depend on fetch-side state (cookie/UA/status) — the
    hardest conformance case for ST1: engine and oracle must agree byte-
    for-byte on what every request carried."""
    ctx.output({"cookie": ctx.cookie, "ua": ctx.user_agent,
                "status": ctx.status, "title": ctx.title()})
    for url, anchor in ctx.links():
        ctx.add_queue(url, rule="page", anchor=anchor)


def test_cookie_sessions_persist_across_rounds_and_match_oracle(
        ray_session, small_corpus, tmp_path):
    """End-to-end ST1: cookies set in round r are sent in round r+1 by the
    ENGINE path (driver-merged jar snapshots), and items that embed the
    cookie/UA are byte-identical to the sequential oracle's."""
    import json as _json

    from pholcus_ray.pipelines.crawl import CrawlConfig, items_table, run_crawl
    from pholcus_ray.pipelines.oracle import run_oracle
    from pholcus_ray.spiderapi import Rule, Spider

    sp = Spider(name="cookie_echo",
                rules={"page": Rule(parse=_parse_cookie_echo,
                                    item_fields=["cookie", "ua", "status",
                                                 "title"])},
                enable_cookie=True)
    wd = str(tmp_path / "cookiecrawl")
    cfg = CrawlConfig(corpus_dir=small_corpus, workdir=wd,
                      round_virtual_sec=64.0, num_shards=4,
                      fetch_concurrency=2, spider=sp)
    run_crawl(cfg)
    eng = items_table(wd).to_pandas().sort_values(["url", "data"])

    oracle = run_oracle(small_corpus, spider=sp, round_virtual_sec=64.0)
    import pandas as pd

    orc = pd.DataFrame(oracle.items).sort_values(["url", "data"])
    assert len(eng) == len(orc)
    assert (eng["data"].values == orc["data"].values).all(), \
        "cookie/UA-bearing items must be byte-identical engine vs oracle"

    # the session actually persisted: some round>=1 item carries a sid
    later = eng[eng["round"] >= 1]
    cookies = [_json.loads(d)["cookie"] for d in later["data"]]
    assert any(c.startswith("sid=") for c in cookies), \
        "a cookie set in an earlier round must be sent in a later round"
    # and round-0 first contacts sent none
    first = [_json.loads(d)["cookie"] for d in eng[eng["round"] == 0]["data"]]
    assert all(c == "" for c in first)


def test_fetchparse_no_cookie_rotates_ua(ray_session, small_corpus):
    from pholcus_ray.spiderapi import Rule, RuleContext, Spider
    from pholcus_ray.stages.fetchparse import FetchParse, corpus_n_buckets

    seen: list[dict] = []

    def _parse(ctx: RuleContext) -> None:
        seen.append({"cookie": ctx.cookie, "ua": ctx.user_agent})

    sp = Spider(name="nocookie", rules={"page": Rule(parse=_parse)})
    fp = FetchParse(corpus_dir=small_corpus, spider=sp,
                    n_buckets=corpus_n_buckets(small_corpus), try_times=3,
                    download_time="t0")
    assert fp.jar is None
    fp(_frontier_for(small_corpus))
    assert all(r["cookie"] == "" for r in seen)
    assert len({r["ua"] for r in seen}) > 1, "UA must rotate when cookies are off"
