"""Engine vs sequential oracle: crawl ordering, URL-seen set, items,
failures — the BASELINE.json north_star correctness gate."""

import shutil

import pandas as pd
import pytest

from pholcus_ray.pipelines.crawl import (
    CrawlConfig,
    crawl_log_table,
    items_table,
    run_crawl,
    url_seen_keys,
)
from pholcus_ray.pipelines.oracle import run_oracle

RVS = 64.0  # large virtual round budget -> few rounds -> fast tests


@pytest.fixture(scope="module")
def crawl_pair(ray_session, small_corpus, tmp_path_factory):
    # local_round_threshold=0 forces every round down the DISTRIBUTED
    # claim/resolve path (3 Dataset passes); the driver-local fast path is
    # covered by test_local_and_distributed_paths_agree + test_resume.
    wd = str(tmp_path_factory.mktemp("crawl"))
    shutil.rmtree(wd, ignore_errors=True)
    cfg = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd, round_virtual_sec=RVS,
        fetch_concurrency=2, num_shards=4, local_round_threshold=0,
    )
    summary = run_crawl(cfg)
    oracle = run_oracle(small_corpus, round_virtual_sec=RVS)
    return wd, summary, oracle


def test_local_and_distributed_paths_agree(crawl_pair, small_corpus, tmp_path):
    """The driver-local fast path must produce byte-identical outputs to the
    distributed claim/resolve path (same semantics functions)."""
    wd_local = str(tmp_path / "local")
    cfg = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd_local, round_virtual_sec=RVS,
        fetch_concurrency=2, num_shards=4, local_round_threshold=1 << 30,
    )
    run_crawl(cfg)
    wd_dist, _, _ = crawl_pair
    a = crawl_log_table(wd_dist).to_pandas()
    b = crawl_log_table(wd_local).to_pandas()
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), c
    ka, kb = url_seen_keys(wd_dist), url_seen_keys(wd_local)
    assert len(ka) == len(kb) and (ka == kb).all()


def test_actor_pool_fetch_path_agrees(crawl_pair, small_corpus, tmp_path):
    """fetch_use_actors=True (actor-pool FetchParse with per-actor cookie
    jars, S4/ST6 shape) must produce byte-identical crawl outputs to the
    task path: fetch-side state (cookies, UA) never enters result rows."""
    from pholcus_ray.spiderapi import DEFAULT_SPIDER

    import dataclasses

    sp = dataclasses.replace(DEFAULT_SPIDER, enable_cookie=True)
    wd_act = str(tmp_path / "actors")
    cfg = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd_act, round_virtual_sec=RVS,
        fetch_concurrency=2, num_shards=4, local_round_threshold=0,
        fetch_use_actors=True, spider=sp,
    )
    run_crawl(cfg)
    wd_dist, _, _ = crawl_pair
    a = crawl_log_table(wd_dist).to_pandas()
    b = crawl_log_table(wd_act).to_pandas()
    assert len(a) == len(b)
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), c
    ia = items_table(wd_dist).to_pandas().sort_values(["url", "data"])
    ib = items_table(wd_act).to_pandas().sort_values(["url", "data"])
    assert (ia["data"].values == ib["data"].values).all()


def _oracle_log_df(oracle):
    return (
        pd.DataFrame(oracle.crawl_log)
        .sort_values(["round", "priority", "seq"], ascending=[True, False, True])
        .reset_index(drop=True)
    )


def test_crawl_order_matches_oracle(crawl_pair):
    wd, _, oracle = crawl_pair
    elog = crawl_log_table(wd).to_pandas()
    olog = _oracle_log_df(oracle)
    assert len(elog) == len(olog) > 0
    for c in ["round", "url", "host", "priority", "seq", "depth", "ok", "status", "attempts"]:
        assert (elog[c].values == olog[c].values).all(), f"column {c} diverges"


def test_url_seen_set_matches_oracle(crawl_pair):
    wd, summary, oracle = crawl_pair
    ekeys = url_seen_keys(wd)
    assert len(ekeys) == len(oracle.url_seen) == summary.seen_total
    assert (ekeys == oracle.url_seen).all()


def test_items_match_oracle_byte_identical(crawl_pair):
    """Items carry the extracted text -> byte-identical text per url."""
    wd, summary, oracle = crawl_pair
    ei = items_table(wd).to_pandas().sort_values(["url", "data"]).reset_index(drop=True)
    oi = pd.DataFrame(oracle.items).sort_values(["url", "data"]).reset_index(drop=True)
    assert len(ei) == len(oi) == summary.items > 0
    assert (ei["data"].values == oi["data"].values).all()
    assert (ei["url"].values == oi["url"].values).all()
    assert (ei["parent_url"].values == oi["parent_url"].values).all()


def test_failure_semantics(crawl_pair):
    """Transient urls recover within TryTimes; hard ones recover on the one
    requeue; permanent 404s land in final failures (matrix.go:144-204)."""
    wd, summary, oracle = crawl_pair
    elog = crawl_log_table(wd).to_pandas()
    # attempts > 1 rows exist (transient markers) and succeeded
    trans = elog[(elog["attempts"] >= 3) & elog["ok"]]
    assert len(trans) > 0
    # permanent failures match oracle count
    import pyarrow.parquet as pq
    import os

    fail = pq.read_table(os.path.join(wd, "final", "failures.parquet"))
    assert fail.num_rows == len(oracle.failures)
    assert summary.failures_final == len(oracle.failures)
    # CONTENT, not just cardinality: the writer selecting the wrong rows
    # (e.g. last-round requeues instead of permanent failures) would keep
    # the count while poisoning inherit_from consumers
    assert sorted(fail["url"].to_pylist()) == \
        sorted(f["url"] for f in oracle.failures)
    assert sorted(fail["attempts_done"].to_pylist()) == \
        sorted(int(f["attempts_done"]) for f in oracle.failures)


def test_politeness_caps_respected(crawl_pair, small_corpus):
    """No host exceeds its crawl-delay budget in any round."""
    import os

    from pholcus_ray.state.hostpolicy import HostPolicy

    wd, _, _ = crawl_pair
    pol = HostPolicy.from_robots_parquet(
        os.path.join(small_corpus, "robots.parquet"), 1.0
    )
    elog = crawl_log_table(wd).to_pandas()
    per = elog.groupby(["round", "host"]).size()
    for (rnd, host), n in per.items():
        assert n <= pol.cap_per_round(host, RVS), (rnd, host, n)


def test_robots_disallow_never_fetched(crawl_pair):
    wd, _, _ = crawl_pair
    elog = crawl_log_table(wd).to_pandas()
    assert not elog["url"].str.contains("/private/").any()


@pytest.mark.parametrize("seed,n_pages,n_hosts", [(7, 150, 3), (99, 100, 6)])
def test_conformance_across_corpus_seeds(ray_session, tmp_path, seed,
                                         n_pages, n_hosts):
    """The byte-equality invariant must hold on DIFFERENT link graphs, not
    just the shared fixture corpus: vary generator seed, host count, and
    page count (different zipf splits, failure markers, robots layouts)."""
    import pandas as pd

    from pholcus_ray.sources.pages import cached_corpus

    corpus = cached_corpus(n_pages=n_pages, n_hosts=n_hosts, seed=seed)
    wd = str(tmp_path / f"seed{seed}")
    run_crawl(CrawlConfig(corpus_dir=corpus, workdir=wd,
                          round_virtual_sec=RVS, fetch_concurrency=2,
                          num_shards=4))
    o = run_oracle(corpus, round_virtual_sec=RVS)
    elog = crawl_log_table(wd).to_pandas()
    olog = (
        pd.DataFrame(o.crawl_log)
        .sort_values(["round", "priority", "seq"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert len(elog) == len(olog) and len(elog) > 0
    for c in elog.columns:
        assert (elog[c].values == olog[c].values).all(), (seed, c)
    eng_items = items_table(wd).to_pandas().sort_values(["url", "data"])
    orc_items = pd.DataFrame(o.items).sort_values(["url", "data"])
    assert (eng_items["data"].values == orc_items["data"].values).all()
    ek = url_seen_keys(wd)
    assert len(ek) == len(o.url_seen) and (ek == o.url_seen).all()


def test_frontier_blocks_parallel_granularity(ray_session):
    """The distributed round path must never collapse an in-memory frontier
    into one block: rd.from_arrow(table) is single-block, which serializes
    the whole claim->resolve->fetch chain onto one task (a 320k-seed
    scaling leg measured exactly that: 1 core busy, 31 idle). The helper
    has to emit ~4 blocks/CPU with every row preserved in order."""
    import pyarrow as pa

    from pholcus_ray.pipelines.crawl import _frontier_blocks

    n = 50_000
    t = pa.table({"url": [f"http://h/{i}" for i in range(n)],
                  "seq": pa.array(range(n), pa.int64())})
    ds = _frontier_blocks(t)
    nblocks = ds.materialize().num_blocks()
    assert nblocks > 4, nblocks  # parallel even on the 4-cpu test session
    got = ds.to_pandas()
    assert len(got) == n and (got["seq"].values == range(n)).all()
    # empty frontier stays a valid (single empty block) dataset
    assert _frontier_blocks(t.slice(0, 0)).count() == 0


def test_crawl_lineage_audit_green_and_tamper_detected(ray_session,
                                                       tmp_path):
    """The lineage audit passes on a real crawl workdir, and detects a
    tampered manifest (the failure mode resume must never silently
    accept)."""
    import json
    import os
    import shutil

    from pholcus_ray.pipelines.crawl import (CrawlConfig, crawl_lineage,
                                             run_crawl)
    from pholcus_ray.sources.pages import cached_corpus

    corpus = cached_corpus(n_pages=120, n_hosts=4)
    wd = str(tmp_path / "wd")
    run_crawl(CrawlConfig(corpus_dir=corpus, workdir=wd,
                          round_virtual_sec=64.0, fetch_concurrency=2,
                          num_shards=4))
    t = crawl_lineage(wd).to_pandas()
    assert len(t) > 1
    assert (t["counts_ok"] == 1).all()
    assert (t["chain_ok"] == 1).all()
    assert (t["final_ok"] == 1).all()
    assert (t["ok"] + t["fail"] == t["scheduled"]).all()

    # tamper: inflate one round's ok count -> counts_ok and chain_ok on
    # the NEXT round must flag it
    rdir = sorted(os.listdir(os.path.join(wd, "rounds")))[1]
    mpath = os.path.join(wd, "rounds", rdir, "_COMPLETE.json")
    with open(mpath) as f:
        m = json.load(f)
    m["ok"] += 1
    with open(mpath, "w") as f:
        json.dump(m, f)
    t2 = crawl_lineage(wd).to_pandas()
    assert (t2["counts_ok"] == 0).any() or (t2["chain_ok"] == 0).any()


def test_politeness_audit_detects_violation(ray_session, tmp_path):
    """The audit is green on a real crawl, and a planted over-budget
    round (result rows forged beyond the host cap) flips it red."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pholcus_ray.pipelines.crawl import (CrawlConfig,
                                             politeness_audit, run_crawl)
    from pholcus_ray.sources.pages import cached_corpus

    corpus = cached_corpus(n_pages=120, n_hosts=4)
    wd = str(tmp_path / "wd")
    run_crawl(CrawlConfig(corpus_dir=corpus, workdir=wd,
                          round_virtual_sec=64.0, fetch_concurrency=2,
                          num_shards=4))
    t = politeness_audit(wd, corpus).to_pandas()
    assert t["audit_ok"].iloc[0] == 1
    assert t["n_over_cap"].iloc[0] == 0 and t["n_disallowed"].iloc[0] == 0

    # forge: append 1000 extra fetches of one host into round 0's result
    rdir = sorted(os.listdir(os.path.join(wd, "rounds")))[0]
    res = os.path.join(wd, "rounds", rdir, "result")
    src = next(f for f in os.listdir(res) if f.endswith(".parquet"))
    base = pq.read_table(os.path.join(res, src))
    host = base["host"][0].as_py()
    forged = base.schema.empty_table()
    cols = {}
    for name in base.schema.names:
        col = base[name]
        cols[name] = pa.concat_arrays(
            [col.chunk(0)[:1]] * 1000) if col.num_chunks else col
    forged = pa.table({n: cols[n] for n in base.schema.names})
    pq.write_table(forged, os.path.join(res, "forged.parquet"))
    t2 = politeness_audit(wd, corpus).to_pandas()
    assert t2["audit_ok"].iloc[0] == 0
    assert t2["n_over_cap"].iloc[0] >= 1
