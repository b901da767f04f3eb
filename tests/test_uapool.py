"""UA pool rotation (ST3, surfer/agent/agent.go + surf.go:170-177 re-roll)."""

import numpy as np

from pholcus_ray.functions import uapool


def test_ua_deterministic_and_rotating():
    u1 = uapool.ua_for(12345, 0)
    assert uapool.ua_for(12345, 0) == u1            # deterministic
    others = {uapool.ua_for(12345, a) for a in range(5)}
    assert len(others) > 1                          # retries re-roll


def test_ua_column_matches_scalar():
    keys = np.array([1, 2, 3, 2**63], dtype=np.uint64)
    atts = np.array([0, 1, 2, 3], dtype=np.int32)
    col = uapool.ua_column(keys, atts)
    assert col == [uapool.ua_for(int(k), int(a)) for k, a in zip(keys, atts)]


def test_set_pool():
    old = uapool._pool
    try:
        uapool.set_pool(["bot/1.0"])
        assert uapool.ua_for(99, 7) == "bot/1.0"
    finally:
        uapool._pool = old
