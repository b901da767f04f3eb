"""WARC source/sink: framing, digests, gzip member-per-record, roundtrip."""

import gzip
import shutil
import tempfile

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_record_framing_and_digest():
    from pholcus_ray.sources.warc import (build_response_record,
                                          parse_warc_stream)

    rec = build_response_record("http://h/x", b"<html>hi</html>",
                                "2020-01-02T03:04:05Z")
    assert rec.startswith(b"WARC/1.0\r\n")
    assert rec.endswith(b"\r\n\r\n")
    rows = list(parse_warc_stream(rec))
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "http://h/x"
    assert r["payload"] == b"<html>hi</html>"
    assert r["status"] == 200
    assert r["date"] == "2020-01-02T03:04:05Z"
    # digest in the header is the sha1 of the payload, base32, labelled
    import base64
    import hashlib

    want = "sha1:" + base64.b32encode(
        hashlib.sha1(b"<html>hi</html>").digest()).decode()
    assert r["declared_digest"] == want


def test_gz_shard_is_one_member_per_record():
    from pholcus_ray.sources.warc import (_gzip_member,
                                          build_response_record,
                                          parse_warc_stream)

    recs = [build_response_record(f"http://h/{i}", f"body{i}".encode(),
                                  "1970-01-01T00:00:00Z") for i in range(3)]
    blob = b"".join(_gzip_member(r) for r in recs)
    # three independent members: gzip.decompress handles concatenation,
    # and each member alone is a valid archive (the seekability contract)
    assert gzip.decompress(blob) == b"".join(recs)
    first_end = blob.index(b"\x1f\x8b", 2)
    assert gzip.decompress(blob[:first_end]) == recs[0]
    urls = [r["url"] for r in parse_warc_stream(gzip.decompress(blob))]
    assert urls == [f"http://h/{i}" for i in range(3)]


def test_write_read_roundtrip_bytes_identical(ray_session):
    import ray.data as rd

    from pholcus_ray.sources.warc import read_warc, write_warc

    pages = pa.table({
        "url": [f"http://site{i % 3}.test/p/{i}" for i in range(40)],
        "html": [f"<html><body>page {i} é中</body></html>"
                 .encode("utf-8") for i in range(40)],
    })
    out = tempfile.mkdtemp(prefix="warc_test_")
    try:
        manifest = write_warc(
            rd.from_arrow(pages).repartition(4), out, batch_size=16)
        assert int(pa.compute.sum(manifest["n_records"]).as_py()) == 40
        back = pa.Table.from_pylist(read_warc(out).take_all()).sort_by("url")
        want = pages.sort_by("url")
        assert back["url"].to_pylist() == want["url"].to_pylist()
        assert back["payload"].to_pylist() == want["html"].to_pylist()
        assert all(back["digest_ok"].to_pylist())
        assert set(back["status"].to_pylist()) == {200}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_corrupted_payload_fails_digest(ray_session):
    import os

    import ray.data as rd

    from pholcus_ray.sources.warc import read_warc, write_warc

    pages = pa.table({"url": ["http://h/a"], "html": [b"<html>x</html>"]})
    out = tempfile.mkdtemp(prefix="warc_test_")
    try:
        write_warc(rd.from_arrow(pages), out, compress=False)
        shard = os.path.join(out, os.listdir(out)[0])
        raw = open(shard, "rb").read()
        open(shard, "wb").write(raw.replace(b"<html>x</html>",
                                            b"<html>y</html>"))
        back = pa.Table.from_pylist(read_warc(out).take_all())
        assert back["digest_ok"].to_pylist() == [False]
        assert back["payload"].to_pylist() == [b"<html>y</html>"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_warc_roundtrip_gate_matches_duckdb(ray_session):
    import duckdb

    from pholcus_ray.sources.warc import warc_roundtrip

    got = warc_roundtrip(SF)
    want = duckdb.sql(f"""
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(CAST(doc_id AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS id_sum_mod,
               CAST(SUM(CAST(md5_number_lower(text) AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS text_hash_mod,
               COUNT(*) AS digests_ok
        FROM read_parquet('{SF}/documents.parquet')
    """).arrow()
    assert got.to_pylist() == want.to_pylist()


def test_crawl_corpus_pages_roundtrip(ray_session, small_corpus):
    """The on-theme path: real crawl corpus html pages -> WARC -> back,
    html byte-identical and WARC-Date carried from warc_ts."""
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    from pholcus_ray.sources.warc import read_warc, write_warc

    pages = (pads.dataset(os.path.join(small_corpus, "pages"))
             .to_table(columns=["url", "warc_ts", "html"]))
    out = tempfile.mkdtemp(prefix="warc_test_")
    try:
        write_warc(rd.from_arrow(pages).repartition(3), out,
                   ts_col="warc_ts", batch_size=64)
        back = pa.Table.from_pylist(read_warc(out).take_all()).sort_by("url")
        want = pages.sort_by("url")
        assert back["url"].to_pylist() == want["url"].to_pylist()
        assert back["payload"].to_pylist() == want["html"].to_pylist()
        assert all(back["digest_ok"].to_pylist())
        assert all(d.endswith("Z") and d[4] == "-" and "T" in d
                   for d in back["warc_date"].to_pylist())
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_wet_conversion_records_and_identity(ray_session, tmp_path):
    """WARC -> WET: conversion records carry WARC-Refers-To naming the
    source response, text/plain digests verify, and extraction is
    byte-identical to the corpus ground truth."""
    import os

    import ray.data as rd

    from pholcus_ray.sources.pages import cached_corpus
    from pholcus_ray.sources.warc import (read_wet, wet_from_warc,
                                          wet_roundtrip, write_warc)

    corpus = cached_corpus(n_pages=60, n_hosts=3)
    pages = rd.read_parquet(os.path.join(corpus, "pages"),
                            columns=["url", "warc_ts", "html", "text"])
    warc_dir = str(tmp_path / "warc")
    wet_dir = str(tmp_path / "wet")
    write_warc(pages, warc_dir, ts_col="warc_ts")
    manifest = wet_from_warc(warc_dir, wet_dir)
    assert manifest.num_rows >= 1
    back = read_wet(wet_dir).to_pandas()
    truth = pages.to_pandas()[["url", "text"]]
    assert len(back) == len(truth)
    assert back["digest_ok"].all()
    assert back["has_refers_to"].all()
    merged = truth.merge(back[["url", "text"]], on="url",
                         suffixes=("_t", "_w"))
    assert len(merged) == len(truth)
    assert (merged["text_t"] == merged["text_w"]).all()
    # the gate verdict agrees
    v = wet_roundtrip(corpus).to_pandas()
    assert v["extraction_identical_ok"].iloc[0] == 1
    assert v["n_digest_bad"].iloc[0] == 0
