"""Sitemap source/sink — the sitemaps.org XML protocol (sitemap 0.9).

The reference discovers URLs purely by following links from seed pages
(spider rules enqueue via ctx.AddQueue; see app/spider). The standard
bootstrap channel real crawls use FIRST is the sitemap protocol:
``robots.txt`` points at a ``<sitemapindex>``, which points at
``<urlset>`` shards of up to 50,000 ``<url>`` entries carrying ``loc``,
``lastmod``, ``changefreq`` and ``priority`` — exactly the metadata a
frontier scheduler (priority queues, recrawl cadence — see
graph.recrawl_priority) wants per seed. This module writes genuine
sitemap XML and streams it back as a Ray Dataset of seed rows.

Scale shape (the WARC/JSONL shard discipline): the writer is
``map_batches`` emitting one urlset shard per batch — url rows in, a
one-row shard manifest out, nothing assembles on the driver except the
small ``sitemap_index.xml`` (bounded by shard count, the protocol's own
index form). The reader is ``read_binary_files`` over the shard dir +
a per-file ElementTree parse, so both directions stream block-by-block.
Spec conformance: the 50,000-urls-per-sitemap limit is enforced by
splitting oversize batches; ``lastmod`` uses the date-only ISO-8601 form
the spec allows; ``priority`` is the 0.0-1.0 decimal.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import md5_lower64_array

_P61 = (1 << 61) - 1
_SM_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
# the spec's changefreq enumeration, in spec order
CHANGEFREQS = ("always", "hourly", "daily", "weekly", "monthly",
               "yearly", "never")
_MAX_URLS = 50_000  # sitemaps.org hard cap per urlset


def _lastmod_str(us: int) -> str:
    """Microseconds-since-epoch -> the date-only lastmod form."""
    import datetime as _dt

    d = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
        microseconds=int(us))
    return d.strftime("%Y-%m-%d")


def _lastmod_us(s: str) -> int:
    """Parse lastmod (date-only or full ISO-8601) back to epoch us."""
    import datetime as _dt

    s = s.strip()
    if "T" in s:
        d = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    else:
        y, m, dd = (int(x) for x in s.split("-"))
        d = _dt.datetime(y, m, dd, tzinfo=_dt.timezone.utc)
    return int(d.timestamp() * 1_000_000)


def _urlset_xml(urls, lastmod_us, changefreq, priority_milli) -> bytes:
    parts = ['<?xml version="1.0" encoding="UTF-8"?>\n'
             f'<urlset xmlns="{_SM_NS}">\n']
    for u, lm, cf, pm in zip(urls, lastmod_us, changefreq, priority_milli):
        parts.append(
            "  <url>\n"
            f"    <loc>{escape(u)}</loc>\n"
            f"    <lastmod>{_lastmod_str(lm)}</lastmod>\n"
            f"    <changefreq>{cf}</changefreq>\n"
            f"    <priority>{pm / 1000:.3f}</priority>\n"
            "  </url>\n")
    parts.append("</urlset>\n")
    return "".join(parts).encode("utf-8")


def write_sitemaps(ds: rd.Dataset, out_dir: str,
                   max_urls: int = _MAX_URLS,
                   base_url: str | None = None) -> list[str]:
    """Write ``ds`` (columns url:string, lastmod_us:int64,
    changefreq:string, priority_milli:int64) as urlset shards + a
    ``sitemap_index.xml``; returns the shard file names (sorted).

    One shard per input batch (split at the spec's 50k-url cap); shard
    names derive from the md5 of the member urls, so a rewrite of the
    same dataset is file-for-file identical (the resumable-output
    contract every sink in this repo follows).

    ``base_url`` (e.g. ``"https://example.com/sitemaps"``) makes the
    index entries full absolute URLs as sitemaps.org requires of a
    published sitemapindex; without it the index holds bare shard
    filenames — self-consistent for the local roundtrip, but an external
    consumer (or a robots ``Sitemap:`` chain) needs ``base_url``."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        names = []
        for lo in range(0, t.num_rows, max_urls):
            chunk = t.slice(lo, max_urls)
            urls = chunk["url"].to_pylist()
            xml = _urlset_xml(
                urls,
                chunk["lastmod_us"].to_pylist(),
                chunk["changefreq"].to_pylist(),
                chunk["priority_milli"].to_pylist(),
            )
            tag = int(md5_lower64_array(["\x00".join(urls)])[0])
            name = f"sitemap-{tag:016x}.xml"
            tmp = os.path.join(out_dir, f".tmp-{name}")
            with open(tmp, "wb") as f:
                f.write(xml)
            os.replace(tmp, os.path.join(out_dir, name))
            names.append(name)
        return pa.table({"shard": pa.array(names, pa.string())})

    shards = sorted(
        r["shard"]
        for r in ds.map_batches(write_shard,
                                batch_format="pyarrow").take_all())
    idx = ['<?xml version="1.0" encoding="UTF-8"?>\n'
           f'<sitemapindex xmlns="{_SM_NS}">\n']
    for name in shards:
        loc = f"{base_url.rstrip('/')}/{name}" if base_url else name
        idx.append(f"  <sitemap><loc>{escape(loc)}</loc></sitemap>\n")
    idx.append("</sitemapindex>\n")
    with open(os.path.join(out_dir, "sitemap_index.xml"), "w",
              encoding="utf-8") as f:
        f.write("".join(idx))
    return shards


def parse_sitemap(xml_bytes: bytes) -> list[dict]:
    """Parse ONE sitemap document. Returns url rows for a ``<urlset>``,
    or ``{"sitemap": loc}`` rows for a ``<sitemapindex>`` (the two
    top-level forms the protocol defines). Missing optional fields
    default to lastmod_us=0, changefreq='', priority_milli=500 (the
    spec's stated 0.5 default)."""
    root = ET.fromstring(xml_bytes)
    tag = root.tag.rsplit("}", 1)[-1]
    ns = {"sm": _SM_NS}
    if tag == "sitemapindex":
        return [{"sitemap": (e.findtext("sm:loc", "", ns) or "").strip()}
                for e in root.findall("sm:sitemap", ns)]
    if tag != "urlset":
        raise ValueError(f"not a sitemap document: <{tag}>")
    out = []
    for e in root.findall("sm:url", ns):
        loc = (e.findtext("sm:loc", "", ns) or "").strip()
        if not loc:
            continue
        lm = e.findtext("sm:lastmod", "", ns)
        cf = (e.findtext("sm:changefreq", "", ns) or "").strip()
        pr = e.findtext("sm:priority", "", ns)
        out.append({
            "url": loc,
            "lastmod_us": _lastmod_us(lm) if lm and lm.strip() else 0,
            "changefreq": cf,
            "priority_milli": int(round(float(pr) * 1000))
            if pr and pr.strip() else 500,
        })
    return out


def read_sitemaps(src_dir: str) -> rd.Dataset:
    """Stream sitemap shards back as url rows (url, lastmod_us,
    changefreq, priority_milli, index_listed). ``index_listed`` marks
    whether the shard appears in ``sitemap_index.xml`` — the
    discovery-integrity bit the roundtrip gate asserts on."""
    with open(os.path.join(src_dir, "sitemap_index.xml"), "rb") as f:
        # index entries may be absolute URLs (base_url form) or bare
        # names; membership is by shard filename either way
        listed = {r["sitemap"].rsplit("/", 1)[-1]
                  for r in parse_sitemap(f.read())}

    paths = sorted(
        os.path.join(src_dir, n) for n in os.listdir(src_dir)
        if n.endswith(".xml") and n != "sitemap_index.xml")
    files = rd.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        urls, lms, cfs, prs, idx = [], [], [], [], []
        for path, data in zip(t["path"].to_pylist(),
                              t["bytes"].to_pylist()):
            shard = os.path.basename(path)
            for row in parse_sitemap(data):
                urls.append(row["url"])
                lms.append(row["lastmod_us"])
                cfs.append(row["changefreq"])
                prs.append(row["priority_milli"])
                idx.append(int(shard in listed))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "lastmod_us": pa.array(lms, pa.int64()),
            "changefreq": pa.array(cfs, pa.string()),
            "priority_milli": pa.array(prs, pa.int64()),
            "index_listed": pa.array(idx, pa.int64()),
        })

    return files.map_batches(parse, batch_format="pyarrow")


def seeds_from_sitemaps(src_dir: str) -> rd.Dataset:
    """Frontier bootstrap: sitemap shards -> (url, priority) seed rows
    in the shape CrawlConfig seeds take — priority from the sitemap's
    own 0..1000 milli scale."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"],
            "priority": t["priority_milli"],
        })

    return read_sitemaps(src_dir).map_batches(project,
                                              batch_format="pyarrow")


def sitemap_roundtrip(sf_dir: str) -> pa.Table:
    """Gate query: documents -> deterministic sitemap url rows (lastmod
    = doc_id%20000 days, changefreq/priority md5-derived so the DuckDB
    oracle re-derives them) -> genuine urlset shards + sitemapindex ->
    read back -> integer sums.

    The oracle recomputes every sum straight from the parquet view, so
    an XML-framing bug, an escaping slip, a lastmod date drift, a
    priority rounding slip or a shard missing from the index fails
    CORRECTNESS."""
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])

    def to_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        urls = [f"http://docs.example/d/{int(i)}" for i in ids]
        cf_i = md5_lower64_array([f"smf:{u}" for u in urls]) % np.uint64(7)
        pm = (md5_lower64_array([f"smp:{u}" for u in urls])
              % np.uint64(1001)).astype(np.int64)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "lastmod_us": pa.array((ids % 20000) * 86_400_000_000,
                                   pa.int64()),
            "changefreq": pa.array([CHANGEFREQS[int(i)] for i in cf_i],
                                   pa.string()),
            "priority_milli": pa.array(pm, pa.int64()),
        })

    out = tempfile.mkdtemp(prefix="pholcus_sitemap_")
    try:
        write_sitemaps(docs.map_batches(to_rows, batch_format="pyarrow"),
                       out)

        def partial(t: pa.Table) -> pa.Table:
            ids = [int(u.rsplit("/", 1)[1]) for u in t["url"].to_pylist()]
            cf_idx = [CHANGEFREQS.index(c)
                      for c in t["changefreq"].to_pylist()]
            lm = t["lastmod_us"].to_pylist()
            pm = t["priority_milli"].to_pylist()
            return pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "ids": pa.array([int(sum(ids) % _P61)], pa.int64()),
                "lms": pa.array([int(sum(lm) % _P61)], pa.int64()),
                "prs": pa.array([int(sum(pm) % _P61)], pa.int64()),
                "cfs": pa.array([int(sum(cf_idx) % _P61)], pa.int64()),
                "ok": pa.array([int(np.asarray(t["index_listed"]).sum())],
                               pa.int64()),
            })

        n = ids = lms = prs = cfs = ok = 0
        for row in read_sitemaps(out).map_batches(
                partial, batch_format="pyarrow").take_all():
            n += int(row["n"])
            ids = (ids + int(row["ids"])) % _P61
            lms = (lms + int(row["lms"])) % _P61
            prs = (prs + int(row["prs"])) % _P61
            cfs = (cfs + int(row["cfs"])) % _P61
            ok += int(row["ok"])
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table({
        "n_urls": pa.array([n], pa.int64()),
        "id_sum_mod": pa.array([ids], pa.int64()),
        "lastmod_sum_mod": pa.array([lms], pa.int64()),
        "prio_sum_mod": pa.array([prs], pa.int64()),
        "freq_sum_mod": pa.array([cfs], pa.int64()),
        "index_listed_ok": pa.array([ok], pa.int64()),
    })


def discover_from_robots(robots_parquet: str) -> rd.Dataset:
    """Frontier bootstrap step 0: scan a corpus's robots bodies for
    ``Sitemap:`` directives (the sitemaps.org robots-location rule) and
    emit (host, sitemap_url) rows — the inputs ``read_sitemaps`` /
    ``seeds_from_sitemaps`` then expand into seeds. Streaming map over
    the robots table; no state."""
    from ..state.hostpolicy import robots_sitemaps

    ds = rd.read_parquet(robots_parquet)

    def scan(t: pa.Table) -> pa.Table:
        hosts, urls = [], []
        for host, body in zip(t["host"].to_pylist(),
                              t["body"].to_pylist()):
            for u in robots_sitemaps(body):
                hosts.append(host)
                urls.append(u)
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "sitemap_url": pa.array(urls, pa.string()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")
