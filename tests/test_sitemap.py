"""Sitemap source/sink (sources/sitemap.py): genuine sitemaps.org XML —
escaping, the 50k-url shard split, sitemapindex discovery, lastmod
roundtrip, and the seed projection the crawl frontier takes."""

import os

import pyarrow as pa
import ray.data as rd

from pholcus_ray.sources.sitemap import (
    CHANGEFREQS,
    _lastmod_us,
    parse_sitemap,
    read_sitemaps,
    seeds_from_sitemaps,
    write_sitemaps,
)


def _rows(urls, lm=None, cf=None, pm=None):
    n = len(urls)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "lastmod_us": pa.array(lm or [86_400_000_000 * i
                                      for i in range(n)], pa.int64()),
        "changefreq": pa.array(cf or [CHANGEFREQS[i % 7]
                                      for i in range(n)], pa.string()),
        "priority_milli": pa.array(pm or [(i * 137) % 1001
                                          for i in range(n)], pa.int64()),
    })


def test_sitemap_roundtrip_with_escaping(ray_session, tmp_path):
    urls = ["http://a.example/x?a=1&b=2",
            "http://a.example/sp ace",
            "http://b.example/<odd>'quote\"",
            "http://b.example/plain"]
    d = str(tmp_path / "sm")
    write_sitemaps(rd.from_arrow(_rows(urls)), d)
    back = read_sitemaps(d).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert sorted(back["url"]) == sorted(urls)
    assert (back["index_listed"] == 1).all()
    src = _rows(urls).to_pandas().sort_values("url").reset_index(drop=True)
    for c in ["lastmod_us", "changefreq", "priority_milli"]:
        assert (back[c].values == src[c].values).all(), c


def test_sitemap_shard_split_and_index(ray_session, tmp_path):
    urls = [f"http://h.example/p/{i}" for i in range(25)]
    d = str(tmp_path / "sm")
    shards = write_sitemaps(rd.from_arrow(_rows(urls)), d, max_urls=10)
    # 25 rows at <=10/shard -> >= 3 shards regardless of block layout
    assert len(shards) >= 3
    with open(os.path.join(d, "sitemap_index.xml"), "rb") as f:
        listed = {r["sitemap"] for r in parse_sitemap(f.read())}
    assert listed == set(shards)
    back = read_sitemaps(d).to_pandas()
    assert len(back) == 25 and (back["index_listed"] == 1).all()


def test_sitemap_rewrite_is_identical(ray_session, tmp_path):
    urls = [f"http://h.example/p/{i}" for i in range(8)]
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_sitemaps(rd.from_arrow(_rows(urls)).repartition(2), a)
    write_sitemaps(rd.from_arrow(_rows(urls)).repartition(2), b)
    fa = {n: open(os.path.join(a, n), "rb").read()
          for n in os.listdir(a)}
    fb = {n: open(os.path.join(b, n), "rb").read()
          for n in os.listdir(b)}
    assert fa == fb


def test_parse_sitemap_defaults_and_forms():
    xml = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://x.example/a</loc></url>
  <url><loc>http://x.example/b</loc>
       <lastmod>2004-06-04T10:20:30+00:00</lastmod>
       <priority>0.8</priority></url>
</urlset>"""
    rows = parse_sitemap(xml)
    assert rows[0] == {"url": "http://x.example/a", "lastmod_us": 0,
                       "changefreq": "", "priority_milli": 500}
    assert rows[1]["priority_milli"] == 800
    assert rows[1]["lastmod_us"] == _lastmod_us("2004-06-04T10:20:30+00:00")


def test_seeds_from_sitemaps_projection(ray_session, tmp_path):
    urls = [f"http://h.example/p/{i}" for i in range(5)]
    d = str(tmp_path / "sm")
    write_sitemaps(rd.from_arrow(_rows(urls)), d)
    seeds = seeds_from_sitemaps(d).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert list(seeds.columns) == ["url", "priority"]
    assert sorted(seeds["url"]) == sorted(urls)
    assert seeds["priority"].between(0, 1000).all()


def test_robots_sitemap_directives():
    from pholcus_ray.state.hostpolicy import parse_robots, robots_sitemaps

    body = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Crawl-delay: 2\n"
        "Sitemap: http://h.example/sitemap_index.xml\n"
        "# comment\n"
        "User-agent: other\n"
        "Disallow: /other/\n"
        "Sitemap: https://h.example/alt-sitemap.xml\n"
    )
    # sitemap directives are global (found even after a non-* section)
    assert robots_sitemaps(body) == [
        "http://h.example/sitemap_index.xml",
        "https://h.example/alt-sitemap.xml",
    ]
    # and invisible to the policy parser (unchanged behavior)
    dis, delay = parse_robots(body)
    assert dis == ["/private/"] and delay == 2.0
    assert robots_sitemaps("User-agent: *\nDisallow: /x/\n") == []


def test_discover_from_robots(ray_session, tmp_path):
    import pyarrow.parquet as pqt

    from pholcus_ray.sources.sitemap import discover_from_robots

    t = pa.table({
        "host": pa.array(["a.example", "b.example", "c.example"]),
        "body": pa.array([
            "User-agent: *\nSitemap: http://a.example/sm.xml\n",
            "User-agent: *\nDisallow: /\n",
            "Sitemap: http://c.example/s1.xml\nSitemap: http://c.example/s2.xml\n",
        ]),
    })
    p = str(tmp_path / "robots.parquet")
    pqt.write_table(t, p)
    df = discover_from_robots(p).to_pandas().sort_values(
        ["host", "sitemap_url"]).reset_index(drop=True)
    assert df["host"].tolist() == ["a.example", "c.example", "c.example"]
    assert df["sitemap_url"].tolist() == [
        "http://a.example/sm.xml", "http://c.example/s1.xml",
        "http://c.example/s2.xml"]


def test_sitemap_index_absolute_urls(ray_session, tmp_path):
    """With base_url the sitemapindex <loc> entries are full absolute
    URLs (the sitemaps.org requirement for a published index); the
    reader resolves them back to shard files and the roundtrip is
    unchanged (round-4 advice item)."""
    urls = [f"http://h.example/p{i}" for i in range(6)]
    d = str(tmp_path / "sm_abs")
    write_sitemaps(rd.from_arrow(_rows(urls)), d,
                   base_url="https://cdn.example.com/sitemaps/")
    with open(os.path.join(d, "sitemap_index.xml")) as f:
        idx = f.read()
    for r in parse_sitemap(idx.encode()):
        assert r["sitemap"].startswith("https://cdn.example.com/sitemaps/")
        assert r["sitemap"].endswith(".xml")
    back = read_sitemaps(d).to_pandas()
    assert sorted(back["url"]) == sorted(urls)
    assert (back["index_listed"] == 1).all()
