"""Cuckoo filter / exact seen-set stores (SURVEY.md ST5, D1/D2)."""

import numpy as np

from pholcus_ray.state.cuckoo import CuckooFilter, ExactSet, make_store


def _keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=10_000)
    keys = _keys(8_000)
    f.insert_if_absent(keys)
    assert f.contains(keys).all()


def test_cuckoo_false_positive_rate_bounded():
    f = CuckooFilter(capacity=50_000)
    f.insert_if_absent(_keys(40_000, seed=1))
    probe = _keys(20_000, seed=2)
    fp = f.contains(probe).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots: expected fp ~ 8/2^16 ~ 0.00012
    assert fp < 0.01


def test_cuckoo_insert_if_absent_semantics():
    f = CuckooFilter(capacity=1000)
    keys = np.array([1, 2, 3, 2, 1], dtype=np.uint64)
    new = f.insert_if_absent(keys)
    assert new.tolist() == [True, True, True, False, False]
    again = f.insert_if_absent(keys)
    assert not again.any()
    assert f.count == 3


def test_cuckoo_high_load_overflow_safe():
    f = CuckooFilter(capacity=1000, bucket_size=4)
    keys = _keys(1200, seed=3)
    f.insert_if_absent(keys)
    assert f.contains(keys).all()  # stash catches eviction failures


def test_cuckoo_kick_exhaustion_keeps_the_victim():
    """Regression: an exhausted kick chain leaves the LAST EVICTED VICTIM
    homeless (the new key's fp IS in the table after the first swap). The
    stash must preserve the victim — under the old key-based overflow, a
    previously inserted key tested absent and insert_if_absent re-reported
    it new, breaking the dedup guarantee at high load."""
    f = CuckooFilter(capacity=64, seed=3, max_kicks=2)
    keys = _keys(400, seed=7)
    f.insert_if_absent(keys)
    assert f.stash, "tiny table + max_kicks=2 must exhaust some kick chains"
    assert f.contains(keys).all(), "no false negatives, victims included"
    assert not f.insert_if_absent(keys).any(), \
        "re-inserting seen keys must never report was_new"


def test_cuckoo_dump_load_roundtrip():
    f = CuckooFilter(capacity=5000)
    keys = _keys(3000, seed=4)
    f.insert_if_absent(keys)
    blob = f.dump()
    g = CuckooFilter(capacity=5000)
    g.load(blob)
    assert g.contains(keys).all()
    assert g.count == f.count


def test_exact_set():
    s = ExactSet()
    keys = np.array([10, 20, 10, 30], dtype=np.uint64)
    assert s.insert_if_absent(keys).tolist() == [True, True, False, True]
    assert s.contains(np.array([10, 99], dtype=np.uint64)).tolist() == [True, False]
    assert (s.keys_array() == np.array([10, 20, 30], dtype=np.uint64)).all()


def test_make_store():
    assert isinstance(make_store("exact", 10), ExactSet)
    assert isinstance(make_store("cuckoo", 10), CuckooFilter)
