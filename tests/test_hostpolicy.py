"""Robots parsing + politeness budget model (state/hostpolicy.py)."""

from pholcus_ray.state.hostpolicy import HostPolicy, parse_robots


def test_parse_robots():
    body = (
        "# comment\nUser-agent: Googlebot\nDisallow: /g/\n\n"
        "User-agent: *\nDisallow: /private/\nDisallow: /tmp\nCrawl-delay: 2.5\n"
    )
    dis, delay = parse_robots(body)
    assert dis == ["/private/", "/tmp"]
    assert delay == 2.5


def test_parse_robots_ignores_other_agents():
    dis, delay = parse_robots("User-agent: Googlebot\nDisallow: /x/\n")
    assert dis == [] and delay is None


def test_hostile_crawl_delay_values():
    """robots bodies are untrusted page content: Crawl-delay of 0 must not
    divide-by-zero the budget actor, and nan/inf/negative are rejected."""
    pol = HostPolicy(default_delay_sec=1.0)
    _, d0 = parse_robots("User-agent: *\nCrawl-delay: 0\n")
    assert d0 == 0.0
    pol._delay["zero.com"] = 0.0
    assert pol.cap_per_round("zero.com", 16.0) == 1 << 30  # uncapped, no crash
    for v in ("nan", "inf", "-inf", "-3"):
        _, d = parse_robots(f"User-agent: *\nCrawl-delay: {v}\n")
        assert d is None, v


def test_policy_allowed_and_caps():
    pol = HostPolicy(default_delay_sec=1.0)
    pol._disallow["h.com"] = ["/private/"]
    pol._delay["h.com"] = 4.0
    assert not pol.allowed("h.com", "/private/x")
    assert pol.allowed("h.com", "/public/x")
    assert pol.allowed("other.com", "/private/x")
    assert pol.cap_per_round("h.com", 16.0) == 4
    assert pol.cap_per_round("other.com", 16.0) == 16
    # cap is never zero: every host with work makes progress each round
    assert pol.cap_per_round("h.com", 1.0) == 1


def test_robots_filter_table_matches_per_row_semantics():
    """The vectorized robots filter must equal the per-row
    urlsplit(url).path-or-'/' + policy.allowed reference on tricky urls
    (query-only, fragment-only, no path, userinfo, port, prefix overlaps)."""
    from urllib.parse import urlsplit

    import pyarrow as pa

    from pholcus_ray.stages.schedule import robots_filter_table

    pol = HostPolicy(default_delay_sec=1.0)
    pol._disallow = {"a.com": ["/private/", "/tmp"], "b.com": ["/"]}
    urls = [
        "http://a.com/private/x",      # blocked (prefix dir)
        "http://a.com/tmpfile",        # blocked (/tmp prefix matches /tmpfile)
        "http://a.com/public",         # allowed
        "http://a.com",                # path '' -> '/', allowed
        "http://a.com?q=/private/",    # query only, path '/', allowed
        "http://a.com/ok#/tmp",        # fragment not part of path, allowed
        "http://user@a.com/tmp",       # userinfo, blocked
        "http://b.com/anything",       # '/' disallow blocks all
        "http://b.com",                # '' -> '/', blocked
        "http://c.com/private/x",      # unruled host, allowed
    ]
    hosts = [
        "a.com", "a.com", "a.com", "a.com", "a.com", "a.com", "a.com",
        "b.com", "b.com", "c.com",
    ]
    t = pa.table({"url": pa.array(urls), "host": pa.array(hosts)})
    got = robots_filter_table(t, pol)["url"].to_pylist()
    want = [
        u for u, h in zip(urls, hosts)
        if pol.allowed(h, urlsplit(u).path or "/")
    ]
    assert got == want
