"""WARC source/sink — the ISO-28500 web-archive interchange format.

The reference exports crawl results as CSV/Excel/DB rows
(collector/output.go); the format the web-crawl world actually exchanges
pages in is WARC (Common Crawl, Internet Archive, Heritrix). This module
writes genuine WARC/1.0 ``response`` records — CRLF header blocks,
``WARC-Payload-Digest: sha1:<base32>`` exactly as the WARC spec states it,
an ``HTTP/1.1`` response block as the record payload, and (for ``.warc.gz``)
ONE GZIP MEMBER PER RECORD, the framing every WARC reader relies on to
seek into an archive — and streams them back as a Ray Dataset.

Scale shape: the writer is ``map_batches`` emitting one shard file per
batch (rows in, a one-row shard manifest out — page bytes never assemble
on the driver); the reader is ``read_binary_files`` over the shard dir +
a per-file record parse, so both directions stream block-by-block exactly
like the parquet and JSONL paths. Determinism: record ids derive from the
payload digest (urn:uuid form), dates from the row's timestamp column —
no wall clock, so a rewrite is byte-identical and resumable runs can
compare shards.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import os
import shutil
import tempfile
from typing import Iterator

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import md5_lower64_array

_P61 = (1 << 61) - 1
_CRLF = b"\r\n"
_EPOCH_ISO = "1970-01-01T00:00:00Z"


def _iso8601(us: int) -> str:
    """Microseconds-since-epoch -> the WARC-Date 14-digit UTC form."""
    import datetime as _dt

    t = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) + _dt.timedelta(
        microseconds=int(us))
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _payload_digest(payload: bytes) -> str:
    """``sha1:<base32>`` — the exact labelled-digest form the WARC spec
    (and every Common Crawl record) uses for WARC-Payload-Digest."""
    return "sha1:" + base64.b32encode(hashlib.sha1(payload).digest()).decode()


def _record_id(digest: str, url: str) -> str:
    """Deterministic ``<urn:uuid:...>`` derived from (digest, url) — real
    crawlers mint random UUIDs; determinism here is what lets a re-run
    produce byte-identical shards (the repo's resumability contract)."""
    h = hashlib.md5((digest + "\x00" + url).encode()).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>")


def build_response_record(url: str, payload: bytes, date: str,
                          content_type: str = "text/html",
                          status: int = 200) -> bytes:
    """One WARC/1.0 ``response`` record: WARC header block, blank line,
    an HTTP/1.1 response (status line + headers + body) as the payload,
    then the two-CRLF record separator."""
    http = (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode() + payload
    digest = _payload_digest(payload)
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + f"WARC-Record-ID: {_record_id(digest, url)}".encode() + _CRLF
        + f"WARC-Date: {date}".encode() + _CRLF
        + f"WARC-Target-URI: {url}".encode() + _CRLF
        + f"WARC-Payload-Digest: {digest}".encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + f"Content-Length: {len(http)}".encode() + _CRLF
    )
    return headers + _CRLF + http + _CRLF + _CRLF


def build_warcinfo_record(filename: str, date: str) -> bytes:
    """The leading ``warcinfo`` record real archives open with."""
    body = (b"software: pholcus_ray\r\nformat: WARC File Format 1.0\r\n")
    digest = _payload_digest(body)
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + f"WARC-Record-ID: {_record_id(digest, filename)}".encode() + _CRLF
        + f"WARC-Date: {date}".encode() + _CRLF
        + f"WARC-Filename: {filename}".encode() + _CRLF
        + b"Content-Type: application/warc-fields" + _CRLF
        + f"Content-Length: {len(body)}".encode() + _CRLF
    )
    return headers + _CRLF + body + _CRLF + _CRLF


def _gzip_member(record: bytes) -> bytes:
    """Compress ONE record as its own gzip member (mtime pinned to 0 so
    the byte stream is deterministic) — concatenated members form the
    ``.warc.gz``, the seekable framing WARC readers expect."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


class _WriteWarcShard:
    """map_batches stage: rows -> one .warc(.gz) shard file per batch;
    emits a one-row shard manifest (path, record count, payload bytes).
    Stateless besides config; shard name derives from the batch's first
    url hash so re-runs land on the same file names."""

    def __init__(self, out_dir: str, url_col: str, payload_col: str,
                 ts_col: str | None, compress: bool):
        self.out_dir = out_dir
        self.url_col = url_col
        self.payload_col = payload_col
        self.ts_col = ts_col
        self.compress = compress

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "payload_bytes": pa.array([], pa.int64())})
        urls = t[self.url_col].to_pylist()
        payloads = t[self.payload_col].to_pylist()
        payloads = [p.encode("utf-8") if isinstance(p, str) else p
                    for p in payloads]
        if self.ts_col is not None:
            ts = t[self.ts_col].cast(pa.timestamp("us")).cast(pa.int64())
            dates = [_iso8601(int(v)) for v in ts.to_pylist()]
        else:
            dates = [_EPOCH_ISO] * len(urls)
        # hash EVERY member url: naming off urls[0]+count alone would
        # let two batches with the same head/size silently overwrite one
        # shard via os.replace (round-4 advice item)
        tag = hashlib.md5("\x00".join(urls).encode()).hexdigest()[:12]
        ext = ".warc.gz" if self.compress else ".warc"
        name = f"shard-{tag}-{len(urls)}{ext}"
        path = os.path.join(self.out_dir, name)
        total = 0
        chunks = [build_warcinfo_record(name, dates[0])]
        for url, payload, date in zip(urls, payloads, dates):
            chunks.append(build_response_record(url, payload, date))
            total += len(payload)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            if self.compress:
                for c in chunks:
                    f.write(_gzip_member(c))
            else:
                for c in chunks:
                    f.write(c)
        os.replace(tmp, path)  # shard appears atomically (resume contract)
        return pa.table({
            "shard": pa.array([name], pa.string()),
            "n_records": pa.array([len(urls)], pa.int64()),
            "payload_bytes": pa.array([total], pa.int64()),
        })


def write_warc(ds: rd.Dataset, out_dir: str, url_col: str = "url",
               payload_col: str = "html", ts_col: str | None = None,
               compress: bool = True, batch_size: int = 512) -> pa.Table:
    """Write ``ds`` as WARC shards; returns the shard manifest table
    (small — one row per shard)."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = ds.map_batches(
        _WriteWarcShard(out_dir, url_col, payload_col, ts_col, compress),
        batch_format="pyarrow", batch_size=batch_size,
    )
    rows = manifest.sort("shard").take_all()  # one row per shard — tiny
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("shard", pa.string()), ("n_records", pa.int64()),
        ("payload_bytes", pa.int64())]))


def parse_warc_stream(data: bytes) -> Iterator[dict]:
    """Parse a decompressed WARC byte stream into record dicts. Framing is
    the spec's: header block to the first blank line, ``Content-Length``
    bytes of payload, a CRLF CRLF separator."""
    pos, n = 0, len(data)
    while pos < n:
        # tolerate stray separator bytes between records
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC framing at byte {pos}")
        hdr_end = data.index(_CRLF + _CRLF, pos)
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        body = data[body_start:body_start + length]
        pos = body_start + length
        rec = {"warc_type": headers.get("warc-type", ""),
               "url": headers.get("warc-target-uri", ""),
               "date": headers.get("warc-date", ""),
               "refers_to": headers.get("warc-refers-to", ""),
               "declared_digest": headers.get("warc-payload-digest", "")}
        if rec["warc_type"] == "response":
            # strip the HTTP response envelope back off the payload
            split = body.index(_CRLF + _CRLF)
            status_line = body[:split].split(_CRLF)[0].decode()
            rec["status"] = int(status_line.split(" ")[1])
            rec["payload"] = body[split + 4:]
        else:
            rec["status"] = 0
            rec["payload"] = body
        yield rec


def _parse_shard_batch(t: pa.Table) -> pa.Table:
    """read_binary_files batch -> response-record rows, with the payload
    digest RECOMPUTED and compared against the header's declared sha1 —
    read-back verification is part of the read, not an afterthought."""
    urls, dates, statuses, payloads, ok = [], [], [], [], []
    for raw, path in zip(t["bytes"].to_pylist(), t["path"].to_pylist()):
        # pyarrow's stream open auto-decompresses by .gz extension under
        # read_binary_files, so detect by gzip magic, not by path
        del path
        data = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
        for rec in parse_warc_stream(data):
            if rec["warc_type"] != "response":
                continue
            urls.append(rec["url"])
            dates.append(rec["date"])
            statuses.append(rec["status"])
            payloads.append(rec["payload"])
            ok.append(_payload_digest(rec["payload"])
                      == rec["declared_digest"])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_date": pa.array(dates, pa.string()),
        "status": pa.array(statuses, pa.int32()),
        "payload": pa.array(payloads, pa.binary()),
        "digest_ok": pa.array(ok, pa.bool_()),
    })


def read_warc(in_dir: str) -> rd.Dataset:
    """Stream WARC shards back as a Dataset of response rows
    (url, warc_date, status, payload, digest_ok)."""
    files = rd.read_binary_files(in_dir, include_paths=True)
    return files.map_batches(_parse_shard_batch, batch_format="pyarrow",
                             batch_size=1)


def warc_roundtrip(sf_dir: str) -> pa.Table:
    """Gate query: documents -> WARC response shards (.warc.gz, one gzip
    member per record, sha1 payload digests) -> read back -> integer
    content sums + the digest-verification count.

    The oracle recomputes n/id-sum/text-hash-sum straight from the parquet
    view and states digests_ok = n_docs, so a framing bug, a lossy
    compress/decompress, an HTTP-envelope slip or a digest mismatch in
    EITHER direction fails CORRECTNESS.
    """
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "url": pa.array([f"http://docs.example/d/{i}" for i in ids],
                            pa.string()),
            "html": pa.array([s.encode("utf-8")
                              for s in t["text"].to_pylist()], pa.binary()),
        })

    out = tempfile.mkdtemp(prefix="pholcus_warc_")
    try:
        write_warc(docs.map_batches(to_pages, batch_format="pyarrow"), out)

        def partial(t: pa.Table) -> pa.Table:
            ids = [int(u.rsplit("/", 1)[1]) for u in t["url"].to_pylist()]
            texts = [p.decode("utf-8") for p in t["payload"].to_pylist()]
            h = md5_lower64_array(texts)
            return pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "ids": pa.array([int(sum(ids) % _P61)], pa.int64()),
                "hs": pa.array([int(sum(int(x) for x in h) % _P61)],
                               pa.int64()),
                "ok": pa.array(
                    [int(np.asarray(t["digest_ok"]).sum())], pa.int64()),
            })

        n = ids = hs = ok = 0
        for row in read_warc(out).map_batches(
                partial, batch_format="pyarrow").take_all():
            n += int(row["n"])
            ids = (ids + int(row["ids"])) % _P61
            hs = (hs + int(row["hs"])) % _P61
            ok += int(row["ok"])
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "id_sum_mod": pa.array([ids], pa.int64()),
        "text_hash_mod": pa.array([hs], pa.int64()),
        "digests_ok": pa.array([ok], pa.int64()),
    })


# --- WET (extracted-text conversion records) --------------------------------
# The second half of the Common Crawl archive pair: for every WARC
# response record, a WET file carries a ``conversion`` record whose
# payload is the page's extracted plain text (ISO 28500 §6.8; Common
# Crawl's *.warc.wet.gz). The converter below is the real thing: it
# STREAMS the response shards back, runs the repo's own DOM extractor
# (functions.textops.extract_text — the byte-identity-tested M3
# function), and writes conversion shards with the same deterministic
# framing discipline as the response writer.


def build_conversion_record(url: str, text: bytes, date: str,
                            refers_to: str) -> bytes:
    """One WARC/1.0 ``conversion`` record (the WET record form):
    text/plain payload, WARC-Refers-To naming the source response."""
    digest = _payload_digest(text)
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: conversion" + _CRLF
        + f"WARC-Record-ID: {_record_id(digest, url)}".encode() + _CRLF
        + f"WARC-Refers-To: {refers_to}".encode() + _CRLF
        + f"WARC-Date: {date}".encode() + _CRLF
        + f"WARC-Target-URI: {url}".encode() + _CRLF
        + f"WARC-Payload-Digest: {digest}".encode() + _CRLF
        + b"Content-Type: text/plain" + _CRLF
        + f"Content-Length: {len(text)}".encode() + _CRLF
    )
    return headers + _CRLF + text + _CRLF + _CRLF


def wet_from_warc(warc_dir: str, wet_dir: str,
                  compress: bool = True) -> pa.Table:
    """WARC -> WET conversion: stream every response shard, extract text
    from the html payload (the M3 extractor), write one conversion
    shard per batch. Returns the WET shard manifest."""
    from ..functions.textops import extract_text

    os.makedirs(wet_dir, exist_ok=True)

    def convert(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        urls = t["url"].to_pylist()
        dates = t["warc_date"].to_pylist()
        payloads = t["payload"].to_pylist()
        chunks = []
        for url, date, payload in zip(urls, dates, payloads):
            text = extract_text(payload).encode("utf-8")
            refers = _record_id(_payload_digest(payload), url)
            chunks.append(build_conversion_record(url, text, date,
                                                  refers))
        # all member urls in the name hash, as the response writer above
        tag = hashlib.md5("\x00".join(urls).encode()).hexdigest()[:12]
        ext = ".warc.wet.gz" if compress else ".warc.wet"
        name = f"shard-{tag}-{len(urls)}{ext}"
        tmp = os.path.join(wet_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            if compress:
                for c in chunks:
                    f.write(_gzip_member(c))
            else:
                for c in chunks:
                    f.write(c)
        os.replace(tmp, os.path.join(wet_dir, name))
        return pa.table({"shard": pa.array([name], pa.string()),
                         "n_records": pa.array([len(urls)], pa.int64())})

    rows = (read_warc(warc_dir).map_batches(convert,
                                            batch_format="pyarrow")
            .sort("shard").take_all())
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("shard", pa.string()), ("n_records", pa.int64())]))


def read_wet(wet_dir: str) -> rd.Dataset:
    """Stream WET shards back as (url, warc_date, text, digest_ok,
    has_refers_to) rows."""

    def parse(t: pa.Table) -> pa.Table:
        urls, dates, texts, ok, refs = [], [], [], [], []
        for raw in t["bytes"].to_pylist():
            data = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
            for rec in parse_warc_stream(data):
                if rec["warc_type"] != "conversion":
                    continue
                urls.append(rec["url"])
                dates.append(rec["date"])
                texts.append(rec["payload"].decode("utf-8"))
                ok.append(_payload_digest(rec["payload"])
                          == rec["declared_digest"])
                refs.append(bool(rec.get("refers_to", "")))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_date": pa.array(dates, pa.string()),
            "text": pa.array(texts, pa.string()),
            "digest_ok": pa.array(ok, pa.bool_()),
            "has_refers_to": pa.array(refs, pa.bool_()),
        })

    files = rd.read_binary_files(wet_dir, include_paths=True)
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def wet_roundtrip(corpus_dir: str) -> pa.Table:
    """Gate query: crawl corpus pages -> WARC response shards -> WET
    conversion shards (REAL extract_text on every payload) -> read back
    -> per-url byte-identity of the extracted text against the corpus's
    ground-truth ``text`` column (the north rule's own invariant), plus
    the conversion-record digest checks.

    The verdict columns are statically assertable: every record's
    recomputed digest matches, every url's extracted text is
    byte-identical to ground truth, counts agree."""
    from ..functions.hashing import md5_lower64_array

    pages = rd.read_parquet(os.path.join(corpus_dir, "pages"),
                            columns=["url", "warc_ts", "html", "text"])
    warc_out = tempfile.mkdtemp(prefix="pholcus_warc_")
    wet_out = tempfile.mkdtemp(prefix="pholcus_wet_")
    try:
        write_warc(pages, warc_out, url_col="url", payload_col="html",
                   ts_col="warc_ts")
        wet_from_warc(warc_out, wet_out)

        nP = np.uint64(8)

        def truth_rows(t: pa.Table) -> pa.Table:
            h = md5_lower64_array(t["text"].to_pylist()).view(np.int64)
            urls = t["url"].to_pylist()
            return pa.table({
                "part": pa.array((md5_lower64_array(urls) % nP)
                                 .astype(np.int64)),
                "url": pa.array(urls, pa.string()),
                "h": pa.array(h, pa.int64()),
                "side": pa.array(np.zeros(t.num_rows, np.int8)),
                "dig_ok": pa.array(np.ones(t.num_rows, np.int8)),
            })

        def wet_rows(t: pa.Table) -> pa.Table:
            h = md5_lower64_array(t["text"].to_pylist()).view(np.int64)
            urls = t["url"].to_pylist()
            return pa.table({
                "part": pa.array((md5_lower64_array(urls) % nP)
                                 .astype(np.int64)),
                "url": pa.array(urls, pa.string()),
                "h": pa.array(h, pa.int64()),
                "side": pa.array(np.ones(t.num_rows, np.int8)),
                "dig_ok": pa.array(
                    np.asarray(t["digest_ok"]).astype(np.int8)),
            })

        import pandas as pd

        def match(g: "pd.DataFrame") -> "pd.DataFrame":
            a = g[g["side"] == 0][["url", "h"]]
            b = g[g["side"] == 1][["url", "h"]]
            m = a.merge(b, on="url", how="outer", suffixes=("_t", "_w"),
                        indicator=True)
            both = m["_merge"] == "both"
            eq = (m.loc[both, "h_t"].to_numpy()
                  == m.loc[both, "h_w"].to_numpy())
            return pd.DataFrame({
                "n_truth": [len(a)],
                "n_wet": [len(b)],
                "n_matched": [int(both.sum())],
                "n_identical": [int(eq.sum())],
                "n_dig_bad": [int((g.loc[g["side"] == 1, "dig_ok"] == 0)
                                  .sum())],
            })

        truth = pages.map_batches(truth_rows, batch_format="pyarrow")
        wet = read_wet(wet_out).map_batches(wet_rows,
                                            batch_format="pyarrow")
        parts = (truth.union(wet)
                 .groupby("part").map_groups(match, batch_format="pandas")
                 .take_all())
        n_truth = sum(int(r["n_truth"]) for r in parts)
        n_wet = sum(int(r["n_wet"]) for r in parts)
        n_match = sum(int(r["n_matched"]) for r in parts)
        n_ident = sum(int(r["n_identical"]) for r in parts)
        n_bad = sum(int(r["n_dig_bad"]) for r in parts)
    finally:
        shutil.rmtree(warc_out, ignore_errors=True)
        shutil.rmtree(wet_out, ignore_errors=True)
    ok = int(n_truth == n_wet == n_match == n_ident and n_bad == 0
             and n_truth > 0)
    return pa.table({
        "extraction_identical_ok": pa.array([ok], pa.int64()),
        "n_digest_bad": pa.array([n_bad], pa.int64()),
    })
