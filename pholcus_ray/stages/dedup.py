"""Dedup stages: intra-round winner selection + cross-round seen-set filter.

Reference parity (SURVEY.md D1/D2, matrix.go:81-86, success.go:26-45):
skip a request whose identity is already in the success history OR in
tempHistory (insert-at-enqueue), unless ``Reloadable``; requeued failures
bypass the check (they were inserted at their first enqueue).

Two stages:

1. ``winner_per_key`` — ``groupby("key").map_groups``: at most one row per
   dedup key per round, chosen deterministically (bypass rows win — they are
   already seen and must proceed; otherwise highest priority, then lowest
   seq). This makes the subsequent actor inserts order-independent, which is
   what keeps the distributed run byte-equal to the sequential oracle.
2. ``SeenFilter`` — ``map_batches`` stage holding the ShardedSeen client:
   batched ``insert_if_absent`` RPCs to the cuckoo/exact shard actors;
   reloadable rows bypass (and are not inserted); bypass_dedup rows pass
   without re-inserting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.seen import ShardedSeen


def winner_per_key(g: pd.DataFrame) -> pd.DataFrame:
    """One row per key: bypass rows first, then priority desc, seq asc."""
    if len(g) == 1:
        return g
    g = g.sort_values(
        ["bypass_dedup", "priority", "seq"],
        ascending=[False, False, True],
        kind="mergesort",
    )
    return g.head(1)


class SeenFilter:
    """map_batches stage: keep rows whose key is new (or exempt)."""

    def __init__(self, seen: ShardedSeen):
        self.seen = seen

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bypass = batch["bypass_dedup"].to_numpy(zero_copy_only=False)
        reload_ = batch["reloadable"].to_numpy(zero_copy_only=False)
        exempt = bypass | reload_
        keep = exempt.copy()
        todo = np.flatnonzero(~exempt)
        if len(todo):
            was_new = self.seen.insert_if_absent(keys[todo])
            keep[todo] = was_new
        return batch.filter(pa.array(keep))
