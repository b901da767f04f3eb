"""Proxy pool (ST4/O2, aid/proxy/proxy.go:27-232): latency ordering,
per-host sticky bindings with interval rotation, dead-proxy eviction."""

from pholcus_ray.state.proxypool import ProxyPool


def _pool():
    p = ProxyPool(rotation_sec=600.0, max_failures=2)
    for addr, lat in [("http://a:1", 0.30), ("http://b:1", 0.10),
                      ("http://c:1", 0.20)]:
        p.add(addr)
        p.observe(addr, lat)
    return p


def test_latency_sort_and_fastest_binding():
    p = _pool()
    assert p.proxies() == ["http://b:1", "http://c:1", "http://a:1"]
    assert p.proxy_for("h1.example.com", 0.0) == "http://b:1"


def test_sticky_within_interval_rebinds_after():
    p = _pool()
    assert p.proxy_for("h", 0.0) == "http://b:1"
    p.observe("http://c:1", 0.01)  # c becomes fastest mid-interval
    assert p.proxy_for("h", 300.0) == "http://b:1"   # sticky
    assert p.proxy_for("h", 601.0) == "http://c:1"   # re-rotation picks fastest


def test_failure_eviction_and_unknown_latency_last():
    p = _pool()
    p.add("http://new:1")  # never observed -> sorts last
    assert p.proxies()[-1] == "http://new:1"
    p.report_failure("http://b:1")
    p.report_failure("http://b:1")  # max_failures=2 -> evicted
    assert "http://b:1" not in p.proxies()
    assert p.proxy_for("h", 0.0) == "http://c:1"


def test_empty_pool_returns_none():
    assert ProxyPool().proxy_for("h", 0.0) is None
