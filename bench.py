"""Benchmark harness.

Headline metric: sustained fetch+extract throughput (URLs/sec) of the crawl
engine over the synthetic web corpus (BASELINE.json metric), plus per-query
timings for the training-data pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "crawl": {"urls": n, "sec": s, "urls_per_sec": r}}

--scaling: runs the headline crawl twice in fresh processes at
RAY_GRAFT_CPUS=8 and 32 on the SAME corpus and reports throughput at both
plus scaling efficiency (the sandbox proxy for the N-vs-4N-node rule; see
BASELINE.md).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# crawl corpus scale per SF (pages, hosts)
_BENCH_SCALES = {
    "sf0.001": (2_000, 20),
    "sf0.01": (8_000, 40),
    "sf0.1": (40_000, 100),
}

_BENCH_QUERIES = [
    "q1_pricing",
    "events_window",
    "distinct_users",
    "dedup_exact",
    "dedup_minhash_lsh",
    "simhash_docs",
    "token_stats",
    "text_quality",
    "ann_topk",
    "knn_batch",
]


def _init_ray() -> None:
    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    logging.getLogger("ray").setLevel(logging.ERROR)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def bench_crawl() -> dict:
    """Headline: full crawl of the bench corpus; URLs/sec = fetched/sec."""
    from pholcus_ray.pipelines.crawl import CrawlConfig, run_crawl
    from pholcus_ray.sources.pages import cached_corpus

    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    n_pages, n_hosts = _BENCH_SCALES.get(sf_name, _BENCH_SCALES["sf0.1"])
    corpus = cached_corpus(n_pages=n_pages, n_hosts=n_hosts, n_buckets=32)

    wd = f"/tmp/pholcus_ray_bench/{sf_name}_cpus{NUM_CPUS}"
    shutil.rmtree(wd, ignore_errors=True)
    # warm the page cache (untimed read) so we measure compute, not cold IO
    import pyarrow.dataset as pads

    pads.dataset(os.path.join(corpus, "pages")).to_table(columns=["url"])

    cfg = CrawlConfig(
        corpus_dir=corpus,
        workdir=wd,
        round_virtual_sec=1024.0,   # politeness budget per round (bench shape)
        num_shards=8,
        fetch_batch_size=512,
    )
    t0 = time.time()
    s = run_crawl(cfg)
    dt = time.time() - t0
    urls = s.fetched_ok + s.fetched_fail
    return {
        "urls": urls,
        "sec": round(dt, 3),
        "urls_per_sec": round(urls / dt, 2),
        "rounds": s.rounds,
        "items": s.items,
        "seen": s.seen_total,
    }


def bench_queries() -> dict:
    import __ray_entry__ as E

    qs = E.queries()
    out = {}
    for name in _BENCH_QUERIES:
        t0 = time.time()
        res = qs[name](SF_DIR)
        # consume lazily-built datasets so the timing is real
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            res.to_pandas()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    _init_ray()
    crawl = bench_crawl()
    queries = bench_queries()
    sf = os.path.basename(os.path.normpath(SF_DIR))
    print(
        json.dumps(
            {
                "metric": "crawl_fetch_extract_sec",
                "value": crawl["sec"],
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "num_cpus": NUM_CPUS,
                "crawl": crawl,
            }
        )
    )
    import ray

    ray.shutdown()


def scaling() -> None:
    """Same crawl at 8 and 32 CPUs in fresh processes; report efficiency."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    tput_lo = r_lo["crawl"]["urls_per_sec"]
    tput_hi = r_hi["crawl"]["urls_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "cpus_lo": lo,
                "cpus_hi": hi,
                "urls_per_sec_lo": tput_lo,
                "urls_per_sec_hi": tput_hi,
                "sec_lo": r_lo["crawl"]["sec"],
                "sec_hi": r_hi["crawl"]["sec"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
