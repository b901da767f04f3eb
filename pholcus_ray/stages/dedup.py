"""Standalone dedup library stages (semi/anti-join building blocks).

The crawl loop itself uses the two-phase claim/resolve protocol in
stages/schedule.py (shuffle-free, oracle-deterministic). These simpler
one-phase stages remain as reusable library operators for INGESTION-style
pipelines — e.g. appending a new batch of documents/urls against an
existing seen-set where no intra-batch winner ordering is required
(SURVEY.md J1: semi/anti-join of candidate keys vs a membership service):

1. ``winner_per_key`` — ``groupby("key").map_groups`` reducer: at most one
   row per key, deterministically chosen (bypass first, priority desc,
   seq asc).
2. ``SeenFilter`` — ``map_batches`` stage holding a ShardedSeen client:
   batched ``insert_if_absent`` RPCs; reloadable rows bypass (and are not
   inserted); bypass_dedup rows pass without re-inserting.
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
