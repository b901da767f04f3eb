"""Property-based tests (hypothesis) for the pure function core."""

import string

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pholcus_ray.functions.hashing import hash64_array, xxhash64
from pholcus_ray.functions.textops import (
    clean_html,
    deprive2,
    extract_links,
    extract_text,
)
from pholcus_ray.functions.urlnorm import canonicalize, get_href
from pholcus_ray.model import cap_rank, dedup_rank

_host = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,8}){0,4}", fullmatch=True)


@given(_host, _path)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(host, path):
    url = f"http://{host}{path}"
    c1 = canonicalize(url)
    assert c1 is not None
    assert canonicalize(c1) == c1  # canonical form is a fixed point


@given(_host, _path, _path)
@settings(max_examples=200, deadline=None)
def test_get_href_always_canonical(host, base_path, href):
    base = f"http://{host}{base_path or '/'}"
    out = get_href(base, href or "/")
    if out is not None:
        assert canonicalize(out) == out


@given(st.binary(max_size=512))
@settings(max_examples=200, deadline=None)
def test_xxhash64_deterministic_and_bounded(data):
    h = xxhash64(data)
    assert 0 <= h < 2**64
    assert xxhash64(data) == h


@given(st.lists(st.text(alphabet=string.printable, max_size=40), min_size=1,
                max_size=50))
@settings(max_examples=100, deadline=None)
def test_hash64_array_stable(strings):
    a = hash64_array(strings)
    b = hash64_array(strings)
    assert (a == b).all()
    assert a.dtype == np.uint64


@given(st.text(alphabet=string.printable, max_size=300))
@settings(max_examples=150, deadline=None)
def test_extract_text_total_and_deterministic(doc):
    """extract_text never raises and is a pure function of its input."""
    b = doc.encode("utf-8")
    out1 = extract_text(b)
    out2 = extract_text(b)
    assert out1 == out2
    # the cleaners are line-clean: no leading/trailing whitespace survives
    for line in out1.split("\n"):
        assert line == line.strip()


@given(st.text(alphabet=string.printable, max_size=300))
@settings(max_examples=100, deadline=None)
def test_clean_html_levels_monotone_tagfree(doc):
    assert "<script" not in clean_html(doc + "<script>x</script>", 1).lower()
    lvl3 = clean_html(doc, 3)
    assert "<p>" not in lvl3 and "</p>" not in lvl3


@given(st.text(alphabet=string.printable, max_size=200))
@settings(max_examples=100, deadline=None)
def test_extract_links_total(doc):
    links = extract_links(doc)
    for href, anchor in links:
        assert isinstance(href, str) and isinstance(anchor, str)


@given(st.booleans(), st.integers(0, 2**31 - 2), st.text(alphabet="0123456789abcdef", min_size=8, max_size=24),
       st.booleans(), st.integers(0, 2**31 - 2), st.text(alphabet="0123456789abcdef", min_size=8, max_size=24))
@settings(max_examples=300, deadline=None)
def test_rank_order_matches_scheduling_order(b1, p1, s1, b2, p2, s2):
    """Lexicographic rank order == (bypass first, priority desc, seq asc)."""
    k1 = (not b1, -p1, s1)
    k2 = (not b2, -p2, s2)
    r1, r2 = dedup_rank(b1, p1, s1), dedup_rank(b2, p2, s2)
    assert (r1 < r2) == (k1 < k2) or (k1 == k2 and r1 == r2)
    c1, c2 = cap_rank(p1, s1), cap_rank(p2, s2)
    assert (c1 < c2) == ((-p1, s1) < (-p2, s2)) or ((-p1, s1) == (-p2, s2) and c1 == c2)


@given(st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_deprive2_idempotent(s):
    once = deprive2(s)
    assert deprive2(once) == once
