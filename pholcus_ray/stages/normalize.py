"""Frontier ingest: seed normalization and link explosion.

Reference parity: ``Request.Prepare()`` (request.go:64-117) — URL normalize,
method default GET, priority clamp >= 0 — and the keyin fan-out cross
product (crawler/spiderqueue.go:56-90, SURVEY.md D4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import dedup_key_array, dedup_key_arrow
from ..functions.urlnorm import (
    _FAST_CANON_RE,
    canonicalize_array,
    host_array,
)
from ..model import FRONTIER_SCHEMA, child_seq, seed_seq, seed_seq_array


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
    from ..spiderapi import normalize_method

    u_arr = seeds["url"].combine_chunks()
    if "rule" in names:
        r_in = seeds["rule"].combine_chunks()
        # python `r or entry_rule`: both None and "" fall back
        rules_a = pc.if_else(
            pc.or_kleene(pc.is_null(r_in), pc.equal(r_in, "")),
            pa.scalar(entry_rule, pa.string()), r_in,
        )
    else:
        rules_a = _const_str(n, entry_rule)
    if "method" in names:
        m_in = seeds["method"].combine_chunks()
        # normalize once per DISTINCT method (a frontier has a handful),
        # then a C-level dictionary take fans it back out
        uniq = m_in.unique()
        mapped = pa.array(
            [normalize_method(x) for x in uniq.to_pylist()], pa.string()
        )
        methods_a = mapped.take(pc.index_in(m_in, value_set=uniq))
    else:
        methods_a = _const_str(n, "GET")
    post_a = (
        pc.fill_null(seeds["post_data"].combine_chunks(), "")
        if "post_data" in names else _const_str(n, "")
    )
    if "priority" in names:
        prio = np.maximum(
            seeds["priority"].to_numpy(zero_copy_only=False).astype(np.int64), 0
        ).astype(np.int32)
    else:
        prio = np.zeros(n, dtype=np.int32)

    # canonicalize once per distinct seed row; invalid urls drop out.
    # Fast path: every url already canonical (the refresh-frontier common
    # case) — zero python-object conversions end to end.
    fast = pc.fill_null(
        pc.match_substring_regex(u_arr, _FAST_CANON_RE), False
    ).to_numpy(zero_copy_only=False)
    if fast.all() and u_arr.null_count == 0:
        m = n
        keep_idx = np.arange(n, dtype=np.int64)
        canon_a = u_arr
        hosts_a = pc.extract_regex(u_arr, pattern=_FAST_CANON_RE).field("h")
        rules_k, methods_k, post_k, prio_k = rules_a, methods_a, post_a, prio
    else:
        canon = canonicalize_array(u_arr.to_pylist())
        keep_idx = np.flatnonzero(
            np.array([c is not None for c in canon], dtype=bool)
        )
        m = len(keep_idx)
        canon_kept = canon[keep_idx]
        canon_a = pa.array(canon_kept, pa.string())
        hosts_a = pa.array(host_array(list(canon_kept)), pa.string())
        take = pa.array(keep_idx)
        rules_k = rules_a.take(take)
        methods_k = methods_a.take(take)
        post_k = post_a.take(take)
        prio_k = prio[keep_idx]
    keys = dedup_key_arrow(canon_a, methods_k, rules_k)

    empty_s = _const_str(m, "")
    zeros_i = pa.array(np.zeros(m, dtype=np.int32))
    falses = pa.array(np.zeros(m, dtype=bool))
    parts = []
    for ki, keyin in enumerate(keyins):
        # seq index = position in the full (keyin, seed) expansion
        seqs = seed_seq_array(np.uint64(ki * n) + keep_idx.astype(np.uint64))
        parts.append(
            pa.table(
                {
                    "url": canon_a,
                    "host": hosts_a,
                    "key": pa.array(keys, pa.uint64()),
                    "rule": rules_k,
                    "method": methods_k,
                    "post_data": post_k,
                    "priority": pa.array(prio_k),
                    "depth": zeros_i,
                    "referer": empty_s,
                    "anchor": empty_s,
                    "seq": seqs,
                    "attempts_done": zeros_i,
                    "bypass_dedup": falses,
                    "reloadable": falses,
                    "keyin": _const_str(m, keyin),
                    "temp": empty_s,
                },
                schema=FRONTIER_SCHEMA,
            )
        )
    if len(parts) == 1:
        return parts[0]
    return pa.concat_tables(parts)


def _const_str(m: int, s: str) -> pa.Array:
    """Constant string column of length ``m`` built directly from an
    offsets buffer — no per-row python objects."""
    sb = s.encode("utf-8")
    if sb:
        offsets = np.arange(0, (m + 1) * len(sb), len(sb), dtype=np.int32)
    else:
        offsets = np.zeros(m + 1, dtype=np.int32)
    return pa.StringArray.from_buffers(
        m, pa.py_buffer(offsets.tobytes()), pa.py_buffer(sb * m)
    )


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
