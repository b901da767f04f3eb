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
