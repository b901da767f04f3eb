"""Hash functions (reference util.go:252-283, request.go:139-145)."""

import hashlib

import numpy as np

from pholcus_ray.functions.hashing import (
    dedup_key_array,
    hash64,
    hash64_array,
    md5_hex_array,
    md5_unique,
    xxhash64,
)


def test_xxhash64_spec_vectors():
    # public XXH64 test vectors
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999


def test_xxhash64_long_input_and_seed():
    # > 32 bytes exercises the 4-lane loop; seed changes the result
    data = bytes(range(101))
    assert xxhash64(data) != xxhash64(data, seed=1)
    assert xxhash64(data) == xxhash64(bytes(range(101)))  # deterministic


def test_hash64_array_deterministic_and_vectorized():
    urls = [f"http://h{i}.com/p/{i}" for i in range(1000)]
    a = hash64_array(urls)
    b = hash64_array(urls)
    assert a.dtype == np.uint64
    assert (a == b).all()
    assert len(set(a.tolist())) == 1000  # no collisions on this tiny set
    assert hash64(urls[0]) == int(a[0])


def test_dedup_key_distinguishes_method_and_rule():
    u = ["http://e.com/a"]
    k1 = dedup_key_array(u, ["GET"], ["page"])
    k2 = dedup_key_array(u, ["POST"], ["page"])
    k3 = dedup_key_array(u, ["GET"], ["detail"])
    assert len({int(k1[0]), int(k2[0]), int(k3[0])}) == 3


def test_dedup_key_nul_separator_is_real():
    # regression: the pandas object-series join coerced "\x00" to a numpy
    # fixed-width unicode scalar, which TRUNCATES to "" — boundary-shifted
    # triples collided. The arrow join must keep the separator.
    k_a = dedup_key_array(["ab"], ["cGET"], ["page"])
    k_b = dedup_key_array(["abc"], ["GET"], ["page"])
    assert int(k_a[0]) != int(k_b[0])


def test_dedup_key_arrow_matches_list_path_and_defaults():
    import pyarrow as pa

    from pholcus_ray.functions.hashing import dedup_key_arrow

    urls = ["http://e.com/a", "http://e.com/b"]
    got = dedup_key_arrow(
        pa.array(urls), pa.array(["GET", "POST"]), pa.array(["page", "x"])
    )
    want = dedup_key_array(urls, ["GET", "POST"], ["page", "x"])
    assert (got == want).all()
    # scalar defaults: omitted method/rule == explicit "GET"/""
    assert (dedup_key_array(urls)
            == dedup_key_array(urls, ["GET"] * 2, [""] * 2)).all()


def test_md5_unique_reference_compat():
    # md5(spider+rule+url+method), request.go:139-145
    got = md5_unique("sp", "page", "http://e.com/", "GET")
    want = hashlib.md5(b"sppagehttp://e.com/GET").hexdigest()
    assert got == want


def test_md5_hex_array_matches_hashlib():
    out = md5_hex_array(["abc", ""])
    assert out[0] == hashlib.md5(b"abc").hexdigest()
    assert out[1] == hashlib.md5(b"").hexdigest()


def test_md5_lower64_matches_duckdb_md5_number_lower():
    # the SQL-oracle contract: md5_lower64_array must be bit-identical to
    # DuckDB's md5_number_lower() (bytes 8..16 of the digest, little-endian)
    import duckdb

    from pholcus_ray.functions.hashing import md5_lower64_array

    vals = ["", "hello", "a b c", "héllo wörld", "x" * 1000]
    got = md5_lower64_array(vals)
    con = duckdb.connect()
    for s, g in zip(vals, got):
        want = con.execute("select md5_number_lower(?)", [s]).fetchone()[0]
        assert int(g) == int(want)
        assert int(g) == int.from_bytes(
            hashlib.md5(s.encode()).digest()[8:16], "little")
