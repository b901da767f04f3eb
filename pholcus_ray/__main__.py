"""CLI: run a crawl end-to-end (the reference's `pholcus -_ui=cmd` offline
mode, SURVEY.md §3.1) —

    python -m pholcus_ray --corpus DIR --workdir DIR [options]

Owns its Ray session (library code never calls ray.init)."""

from __future__ import annotations

import argparse
import json
import logging
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pholcus_ray", description=__doc__)
    ap.add_argument("--corpus", required=True, help="pages corpus dir")
    ap.add_argument("--workdir", required=True, help="checkpoint/output dir")
    ap.add_argument("--spider", default="site_text",
                    help="registered spider name (see pholcus_ray.spiderapi)")
    ap.add_argument("--rules", default=None, metavar="DIR",
                    help="load declarative *.spider.{json,yaml} files from "
                         "DIR before resolving --spider (dynamic-rule "
                         "surface, SURVEY.md ST8; see pholcus_ray.rulefile)")
    ap.add_argument("--keyins", default="", help="comma-separated keyin tokens")
    ap.add_argument("--limit", type=int, default=None, help="maxPage quota")
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--round-virtual-sec", type=float, default=16.0,
                    help="politeness budget (seconds of virtual crawl per round)")
    ap.add_argument("--seen-mode", choices=["exact", "cuckoo"], default="exact")
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--no-robots", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--sink", default="parquet",
                    choices=["parquet", "csv", "files", "excel", "sql", "none"])
    ap.add_argument("--out", default=None, help="sink output dir (default workdir/out)")
    args = ap.parse_args(argv)

    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.crawl import CrawlConfig, run_crawl
    from .spiderapi import get_spider

    if args.rules:
        from .rulefile import load_spider_dir

        load_spider_dir(args.rules)

    cfg = CrawlConfig(
        corpus_dir=args.corpus,
        workdir=args.workdir,
        spider=get_spider(args.spider),
        keyins=[k for k in args.keyins.split(",") if k],
        seen_mode=args.seen_mode,
        num_shards=args.num_shards,
        round_virtual_sec=args.round_virtual_sec,
        limit=args.limit,
        max_depth=args.max_depth,
        obey_robots=not args.no_robots,
        resume=not args.no_resume,
    )
    summary = run_crawl(cfg)
    report = {k: v for k, v in summary.__dict__.items() if k != "per_round"}

    if args.sink != "none":
        import os

        from .sinks import get_sink

        out = args.out or os.path.join(args.workdir, "out")
        if args.sink in ("sql", "sql_streaming"):
            out = args.out or os.path.join(args.workdir, "items.db")
        get_sink(args.sink)(args.workdir, out)
        report["sink"] = {"type": args.sink, "out": out}

    print(json.dumps(report, indent=2))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
