"""Output sinks — the reference's pluggable collector outputs.

Reference parity (SURVEY.md §2.1 S5/S11/S12):

- CSV sink (collector/output_csv.go:16-71): one file tree per
  (namespace, rule) with a UTF-8 BOM and a header row from the rule's
  ItemFields plus the three default columns; the dir/sheet naming util is
  output_util.go:8-39.
- File sink (output_file.go:20-71): FileCell bytes written to
  ``file_out/<namespace>/<name>``.
- Sink registry (output_data.go:14-23, Register :60-62): pluggable
  ``name -> writer(workdir, out_dir, **kw)`` callables.

Parquet is the native sink (write_parquet on the items projection,
partitioned by rule); CSV/files exist for reference-parity workflows. All
sinks stream via Ray datasets — nothing materializes the full item set.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from .pipelines.crawl import _has_files, _read_table, _round_dirs, items_dataset
from .model import RESULT_SCHEMA

_FORBIDDEN = re.compile(r'[\\/:*?"<>|]')


def sanitize_filename(name: str) -> str:
    """Replace forbidden filename chars (reference util.go:307-352)."""
    return _FORBIDDEN.sub("_", name)


def write_items_parquet(workdir: str, out_dir: str) -> int:
    """Items -> parquet partitioned by rule (the native sink). Rule
    cardinality is tiny (the spider's Trunk), so one streamed filtered
    write per rule; each filter is a vectorized map_batches."""
    os.makedirs(out_dir, exist_ok=True)
    rules = sorted(items_dataset(workdir).unique("rule"))
    for rule in rules:
        sub = items_dataset(workdir).map_batches(
            lambda t, _r=rule: t.filter(pc.equal(t["rule"], _r)),
            batch_format="pyarrow",
        )
        rdir = os.path.join(out_dir, f"rule={sanitize_filename(rule)}")
        os.makedirs(rdir, exist_ok=True)
        sub.write_parquet(rdir)
    return len(rules)


def write_items_csv(workdir: str, out_dir: str, namespace: str = "pholcus",
                    item_fields: dict[str, list[str]] | None = None) -> list[str]:
    """Items -> per-(namespace, rule) CSV with UTF-8 BOM + ItemFields header
    (output_csv.go parity: BOM line :37, header from ItemFields + default
    columns, JSON-stringified values)."""
    import csv

    from .pipelines.crawl import items_table

    t = items_table(workdir)
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []
    if t.num_rows == 0:
        return written
    rules = sorted(set(t["rule"].to_pylist()))
    for rule in rules:
        sub = t.filter(pc.equal(t["rule"], rule))
        datas = [json.loads(x) for x in sub["data"].to_pylist()]
        if item_fields and rule in item_fields:
            fields = list(item_fields[rule])
            extra = [k for k in ("Url", "ParentUrl", "DownloadTime")
                     if any(k in d for d in datas[:5])]
            fields += [f for f in extra if f not in fields]
        else:
            seen: list[str] = []
            for d in datas:
                for k in d:
                    if k not in seen:
                        seen.append(k)
            fields = seen
        path = os.path.join(
            out_dir, f"{sanitize_filename(namespace)}__{sanitize_filename(rule)}.csv"
        )
        with open(path, "w", newline="", encoding="utf-8-sig") as f:
            w = csv.writer(f)
            w.writerow(fields)
            for d in datas:
                w.writerow(
                    [
                        v if isinstance(v, str) else json.dumps(v, ensure_ascii=False)
                        for v in (d.get(k, "") for k in fields)
                    ]
                )
        written.append(path)
    return written


def write_files(workdir: str, out_dir: str, namespace: str = "pholcus") -> int:
    """FileCell payloads -> file_out/<namespace>/<name> (output_file.go
    parity). Streams the per-round result lineage; only rounds with file
    cells cost anything (metadata-cheap column read)."""
    base = os.path.join(out_dir, sanitize_filename(namespace))
    n = 0
    for _r, d in _round_dirs(workdir):
        res = os.path.join(d, "result")
        if not _has_files(res):
            continue
        t = _read_table(res, RESULT_SCHEMA, columns=["files"])
        col = t["files"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        if len(flat) == 0:
            continue
        os.makedirs(base, exist_ok=True)
        for name, data in zip(
            flat.field("name").to_pylist(), flat.field("data").to_pylist()
        ):
            with open(os.path.join(base, sanitize_filename(name)), "wb") as f:
                f.write(data)
            n += 1
    return n


# --- registry (output_data.go:14-23, 60-62) ---------------------------------

SINKS: dict[str, Callable] = {
    "parquet": write_items_parquet,
    "csv": write_items_csv,
    "files": write_files,
}


def register_sink(name: str, fn: Callable) -> None:
    SINKS[name] = fn


def get_sink(name: str) -> Callable:
    return SINKS[name]
