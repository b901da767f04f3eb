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


def test_fetchparse_cookie_jar_and_fixed_ua(ray_session, small_corpus):
    """With enable_cookie: first contact with a host sends no cookie, every
    later request to it carries the simulated server's per-host sid, and
    the UA is pinned (param.go:88-90)."""
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
    fp(frontier)
    first = {r["url"]: r for r in seen}
    assert all(r["cookie"] == "" for r in seen), "first contact sends no cookie"
    assert all(r["ua"] == fixed_ua() for r in seen), "EnableCookie pins the UA"

    seen.clear()
    fp(frontier)  # same urls again through the SAME actor's jar
    assert seen, "second pass must fetch"
    for r in seen:
        host = r["url"].split("/")[2]
        want = sim_set_cookie(host).split(";")[0]
        assert r["cookie"] == want, f"{r['url']} must carry the host sid"
    assert set(first) == {r["url"] for r in seen}


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
