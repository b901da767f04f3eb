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
    (keyin, seed) order so the expansion is deterministic. Vectorized —
    only URL canonicalization touches python per row (10^5+-seed refresh
    frontiers pass through here).
    """
    keyins = keyins if keyins else [""]
    n = seeds.num_rows
    names = seeds.column_names
    urls_in = seeds["url"].to_pylist()
    rules = (
        [r or entry_rule for r in seeds["rule"].to_pylist()]
        if "rule" in names else [entry_rule] * n
    )
    from ..spiderapi import normalize_method

    methods = (
        [normalize_method(m) for m in seeds["method"].to_pylist()]
        if "method" in names else ["GET"] * n
    )
    post_data = (
        [p or "" for p in seeds["post_data"].to_pylist()]
        if "post_data" in names else [""] * n
    )
    if "priority" in names:
        prio = np.maximum(
            seeds["priority"].to_numpy(zero_copy_only=False).astype(np.int64), 0
        ).astype(np.int32)
    else:
        prio = np.zeros(n, dtype=np.int32)

    # canonicalize once per distinct seed row; invalid urls drop out
    canon = canonicalize_array(urls_in)
    keep = np.array([c is not None for c in canon], dtype=bool)
    keep_idx = np.flatnonzero(keep)
    canon_kept = [canon[k] for k in keep_idx]
    rules_kept = [rules[k] for k in keep_idx]
    methods_kept = [methods[k] for k in keep_idx]
    post_kept = [post_data[k] for k in keep_idx]
    prio_kept = prio[keep_idx]
    hosts_kept = host_array(canon_kept)
    keys_kept = dedup_key_array(canon_kept, methods_kept, rules_kept)
    m = len(keep_idx)

    parts = []
    for ki, keyin in enumerate(keyins):
        # seq index = position in the full (keyin, seed) expansion
        seq_base = ki * n
        seqs = [seed_seq(int(seq_base + j)) for j in keep_idx]
        parts.append(
            pa.table(
                {
                    "url": pa.array(canon_kept, pa.string()),
                    "host": pa.array(hosts_kept, pa.string()),
                    "key": pa.array(keys_kept, pa.uint64()),
                    "rule": pa.array(rules_kept, pa.string()),
                    "method": pa.array(methods_kept, pa.string()),
                    "post_data": pa.array(post_kept, pa.string()),
                    "priority": pa.array(prio_kept),
                    "depth": pa.array(np.zeros(m, dtype=np.int32)),
                    "referer": pa.array(np.full(m, ""), pa.string()),
                    "anchor": pa.array(np.full(m, ""), pa.string()),
                    "seq": pa.array(seqs, pa.string()),
                    "attempts_done": pa.array(np.zeros(m, dtype=np.int32)),
                    "bypass_dedup": pa.array(np.zeros(m, dtype=bool)),
                    "reloadable": pa.array(np.zeros(m, dtype=bool)),
                    "keyin": pa.array(np.full(m, keyin), pa.string()),
                    "temp": pa.array(np.full(m, ""), pa.string()),
                },
                schema=FRONTIER_SCHEMA,
            )
        )
    if len(parts) == 1:
        return parts[0]
    return pa.concat_tables(parts)


# ordinals are at most a few hundred per page; the hex suffixes come from a
# precomputed dictionary so seq derivation is a single vectorized take+join
_HEX_TABLE_SIZE = 4096
_HEX_SUFFIXES = pa.array([f"{i:08x}" for i in range(_HEX_TABLE_SIZE)], pa.string())


def explode_links(batch: pa.Table) -> pa.Table:
    """Result rows -> child frontier rows (Arrow-native list explosion).

    Flattens the ``links`` list column, derives seq = parent_seq +
    %08x(ordinal) via a vectorized binary join, depth+1, referer=parent url,
    and the child dedup key. Runs both as a map_batches stage and on the
    driver control plane, so every step is a C-level kernel.
    """
    links = batch["links"]
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = pc.list_flatten(links)
    if len(flat) == 0:
        return FRONTIER_SCHEMA.empty_table()
    parent_idx = pc.list_parent_indices(links)
    parents = parent_idx.to_numpy(zero_copy_only=False)

    # ordinal within each parent's list
    offsets = np.flatnonzero(np.diff(np.concatenate(([-1], parents))))
    starts = np.zeros(len(parents), dtype=np.int64)
    starts[offsets] = np.arange(len(parents))[offsets]
    starts = np.maximum.accumulate(starts)
    ordinals = np.arange(len(parents)) - starts
    if ordinals.max(initial=0) >= _HEX_TABLE_SIZE:
        hex_ord = pa.array([f"{int(o):08x}" for o in ordinals], pa.string())
    else:
        hex_ord = _HEX_SUFFIXES.take(pa.array(ordinals))

    def _take(col):
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return c.take(parent_idx)

    seq_col = pc.binary_join_element_wise(_take(batch["seq"]), hex_ord, "")
    url_col = flat.field("url")
    rule_col = flat.field("rule")
    method_col = flat.field("method")
    n = len(flat)
    # dedup key still hashes python-side (pandas C hasher needs object arrays)
    keys = dedup_key_array(
        url_col.to_pylist(), method_col.to_pylist(), rule_col.to_pylist()
    )
    # host extraction: C-level regex over canonical urls, python fallback
    # for any row the pattern misses. The optional userinfo group mirrors
    # host_of (urlnorm.py:72): netloc after the last '@', before ':port' —
    # without it, 'http://alice@host/' keyed politeness on 'alice@host'.
    # '[' ']' are excluded so IPv6 literals miss the pattern and take the
    # host_of fallback (the regex would otherwise stop at the first ':').
    hosts_struct = pc.extract_regex(
        url_col, pattern=r"^[a-z+.-]+://(?:[^/?#]*@)?(?P<h>[^/:?#@\[\]]+)"
    )
    hosts = hosts_struct.field("h") if hosts_struct.null_count == 0 else pa.array(
        host_array(url_col.to_pylist()), pa.string()
    )
    return pa.table(
        {
            "url": url_col,
            "host": hosts,
            "key": pa.array(keys, pa.uint64()),
            "rule": rule_col,
            "method": method_col,
            "post_data": flat.field("post_data"),
            "priority": flat.field("priority").cast(pa.int32()),
            "depth": pc.add(_take(batch["depth"]), 1).cast(pa.int32()),
            "referer": _take(batch["url"]),
            "anchor": flat.field("anchor"),
            "seq": seq_col,
            "attempts_done": pa.array(np.zeros(n, dtype=np.int32)),
            "bypass_dedup": pa.array(np.zeros(n, dtype=bool)),
            "reloadable": flat.field("reloadable"),
            "keyin": _take(batch["keyin"]),
            "temp": flat.field("temp"),
        },
        schema=FRONTIER_SCHEMA,
    )
