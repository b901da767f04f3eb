"""Frontier ingest: seed normalization and link explosion.

Reference parity: ``Request.Prepare()`` (request.go:64-117) — URL normalize,
method default GET, priority clamp >= 0 — and the keyin fan-out cross
product (crawler/spiderqueue.go:56-90, SURVEY.md D4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import dedup_key_array
from ..functions.urlnorm import canonicalize_array, host_array
from ..model import FRONTIER_SCHEMA, child_seq, seed_seq


def seeds_to_frontier(seeds: pa.Table, entry_rule: str = "page",
                      keyins: list[str] | None = None) -> pa.Table:
    """Seed table (url[, rule, method, priority, keyin]) -> frontier rows.

    Keyin fan-out: every seed is replicated once per keyin token (the
    reference's spiders x keyins cross product); seq encodes the
    (keyin, seed) order so the expansion is deterministic.
    """
    keyins = keyins if keyins else [""]
    cols = {c: seeds[c].to_pylist() for c in seeds.column_names}
    n = seeds.num_rows
    urls_in = cols["url"]
    rules = cols.get("rule", [entry_rule] * n)
    methods = cols.get("method", ["GET"] * n)
    priorities = cols.get("priority", [0] * n)

    rows = {k: [] for k in ("url", "rule", "method", "priority", "keyin", "seq")}
    i = 0
    for keyin in keyins:
        for j in range(n):
            u = urls_in[j]
            rows["url"].append(u)
            rows["rule"].append(rules[j] or entry_rule)
            rows["method"].append(methods[j] or "GET")
            rows["priority"].append(max(0, int(priorities[j] or 0)))
            rows["keyin"].append(keyin)
            rows["seq"].append(seed_seq(i))
            i += 1

    canon = canonicalize_array(rows["url"])
    keep = [k for k, c in enumerate(canon) if c is not None]
    canon = [canon[k] for k in keep]
    sel = lambda name: [rows[name][k] for k in keep]  # noqa: E731
    m = len(keep)
    keys = dedup_key_array(canon, sel("method"), sel("rule"))
    return pa.table(
        {
            "url": pa.array(canon, pa.string()),
            "host": pa.array(host_array(canon), pa.string()),
            "key": pa.array(keys, pa.uint64()),
            "rule": pa.array(sel("rule"), pa.string()),
            "method": pa.array(sel("method"), pa.string()),
            "priority": pa.array(sel("priority"), pa.int32()),
            "depth": pa.array([0] * m, pa.int32()),
            "referer": pa.array([""] * m, pa.string()),
            "anchor": pa.array([""] * m, pa.string()),
            "seq": pa.array(sel("seq"), pa.string()),
            "attempts_done": pa.array([0] * m, pa.int32()),
            "bypass_dedup": pa.array([False] * m, pa.bool_()),
            "reloadable": pa.array([False] * m, pa.bool_()),
            "keyin": pa.array(sel("keyin"), pa.string()),
            "temp": pa.array([""] * m, pa.string()),
        },
        schema=FRONTIER_SCHEMA,
    )


def explode_links(batch: pa.Table) -> pa.Table:
    """Result rows -> child frontier rows (vectorized list explosion).

    ``map_batches`` stage over the round's result table: flattens the
    ``links`` list column, derives seq = parent_seq + %08x(ordinal),
    depth+1, referer=parent url, and the child dedup key.
    """
    links = batch["links"]
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = pc.list_flatten(links)
    parents = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return FRONTIER_SCHEMA.empty_table()

    # ordinal within each parent's list
    offsets = np.flatnonzero(np.diff(np.concatenate(([-1], parents))))
    starts = np.zeros(len(parents), dtype=np.int64)
    starts[offsets] = np.arange(len(parents))[offsets]
    starts = np.maximum.accumulate(starts)
    ordinals = np.arange(len(parents)) - starts

    p_seq = batch["seq"].to_pylist()
    p_url = batch["url"].to_pylist()
    p_depth = batch["depth"].to_numpy(zero_copy_only=False)
    p_keyin = batch["keyin"].to_pylist()

    urls = flat.field("url").to_pylist()
    rules = flat.field("rule").to_pylist()
    seqs = [child_seq(p_seq[p], int(o)) for p, o in zip(parents, ordinals)]
    keys = dedup_key_array(urls, ["GET"] * len(urls), rules)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(host_array(urls), pa.string()),
            "key": pa.array(keys, pa.uint64()),
            "rule": pa.array(rules, pa.string()),
            "method": pa.array(["GET"] * len(urls), pa.string()),
            "priority": flat.field("priority").cast(pa.int32()),
            "depth": pa.array((p_depth[parents] + 1).astype(np.int32)),
            "referer": pa.array([p_url[p] for p in parents], pa.string()),
            "anchor": flat.field("anchor"),
            "seq": pa.array(seqs, pa.string()),
            "attempts_done": pa.array(np.zeros(len(urls), dtype=np.int32)),
            "bypass_dedup": pa.array([False] * len(urls), pa.bool_()),
            "reloadable": flat.field("reloadable"),
            "keyin": pa.array([p_keyin[p] for p in parents], pa.string()),
            "temp": flat.field("temp"),
        },
        schema=FRONTIER_SCHEMA,
    )
