"""JSONL shard source/sink — the interchange format LLM-data pipelines
actually exchange (one JSON object per line, one file per shard).

Reference parity: the reference's pipeline formats are CSV/Excel/DB rows
(collector/output.go); JSONL is the training-data-era addition alongside
the native parquet path. Both directions stream shard-per-block through
Ray Data (``Dataset.write_json`` / ``ray.data.read_json``) — nothing
corpus-sized ever assembles on the driver, and a resumable run can skip
finished shard files exactly like the parquet sinks.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import ray.data as rd

from ..functions.hashing import md5_lower64_array

_P61 = (1 << 61) - 1


def write_jsonl(ds: rd.Dataset, out_dir: str) -> str:
    """Write ``ds`` as JSONL shards (one .json file per block)."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir


def read_jsonl(in_dir: str) -> rd.Dataset:
    """Stream JSONL shards back as a Dataset."""
    return rd.read_json(in_dir)


def _content_sums(ds: rd.Dataset) -> tuple[int, int, int]:
    """(n_docs, sum(doc_id) mod p61, sum(md5_lower64(text)) mod p61) —
    per-batch integer partials, python-bigint driver fold of the few
    partial rows (int64 Sum of ~2^61 partials would wrap)."""

    def partial(t: pa.Table) -> pa.Table:
        h = md5_lower64_array(t["text"].to_pylist())
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "ids": pa.array([int(sum(t["doc_id"].to_pylist()) % _P61)],
                            pa.int64()),
            "hs": pa.array([int(sum(int(x) for x in h) % _P61)], pa.int64()),
        })

    n = ids = hs = 0
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        n += int(row["n"])
        ids = (ids + int(row["ids"])) % _P61
        hs = (hs + int(row["hs"])) % _P61
    return n, ids, hs


def jsonl_roundtrip(sf_dir: str) -> pa.Table:
    """Gate query: documents -> JSONL shards -> read back -> content sums.

    The oracle recomputes the same three numbers straight from the parquet
    table (md5_number_lower == md5_lower64_array), so a lossy write, a
    dropped row, or an escaping bug in either direction fails CORRECTNESS.
    """
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "text"])
    out = tempfile.mkdtemp(prefix="pholcus_jsonl_")
    try:
        write_jsonl(docs, out)
        n, ids, hs = _content_sums(read_jsonl(out))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "id_sum_mod": pa.array([ids], pa.int64()),
        "text_hash_mod": pa.array([hs], pa.int64()),
    })
