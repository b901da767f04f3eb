"""Stage-level wall profile of ngram_jaccard_exact at a given sf dir.

Times each pipeline prefix to a materialize() so per-stage cost is the
delta between consecutive prefixes (Ray Data is lazy — whole-pipeline
timing alone can't attribute cost). Usage:

    python tools/profile_ngram.py [sf_dir] [threshold]
"""
import os
import sys
import time

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pholcus_ray.pipelines import textdata as T

    t0 = time.time()
    out = T.ngram_jaccard_exact(sf_dir, threshold=threshold).materialize()
    total = time.time() - t0
    print(f"total {total:.2f}s rows={out.count()}")
    stats = out.stats()
    # condensed per-operator wall
    for ln in stats.splitlines():
        if "Operator" in ln or "wall time" in ln.lower():
            print(ln.strip()[:160])
    ray.shutdown()


if __name__ == "__main__":
    main()
