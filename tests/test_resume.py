"""Checkpoint/resume: a crawl interrupted after k rounds and resumed must
reproduce the one-shot run's final state exactly (per-partition lineage,
BASELINE.json north_rule "resumable from checkpoint")."""

import shutil

from pholcus_ray.pipelines.crawl import (
    CrawlConfig,
    crawl_log_table,
    run_crawl,
    url_seen_keys,
)

RVS = 64.0


def test_resume_reproduces_one_shot(ray_session, small_corpus, tmp_path):
    wd_full = str(tmp_path / "full")
    wd_part = str(tmp_path / "part")

    cfg_full = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd_full, round_virtual_sec=RVS,
        fetch_concurrency=2, num_shards=4,
    )
    s_full = run_crawl(cfg_full)

    # interrupted run: stop after 2 rounds, then resume to completion
    cfg_part = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd_part, round_virtual_sec=RVS,
        fetch_concurrency=2, num_shards=4, max_rounds=2,
    )
    s_part = run_crawl(cfg_part)
    assert s_part.rounds == 2 < s_full.rounds

    cfg_part.max_rounds = 10_000
    s_res = run_crawl(cfg_part)
    assert s_res.fetched_ok == s_full.fetched_ok
    assert s_res.seen_total == s_full.seen_total

    lf = crawl_log_table(wd_full).to_pandas()
    lr = crawl_log_table(wd_part).to_pandas()
    assert len(lf) == len(lr)
    for c in lf.columns:
        assert (lf[c].values == lr[c].values).all(), c

    kf, kr = url_seen_keys(wd_full), url_seen_keys(wd_part)
    assert len(kf) == len(kr) and (kf == kr).all()

    # ITEMS too: a resume bug that re-parses a completed round (duplicated
    # rows) or skips item writes would keep the log + seen set identical
    from pholcus_ray.pipelines.crawl import items_table

    itf = items_table(wd_full).to_pandas().sort_values(["url", "data"])
    itr = items_table(wd_part).to_pandas().sort_values(["url", "data"])
    assert len(itf) == len(itr)
    for c in ("url", "data", "download_time", "round"):
        assert (itf[c].values == itr[c].values).all(), c


def test_resume_discards_incomplete_round(ray_session, small_corpus, tmp_path):
    """A round dir without _COMPLETE.json is re-run from scratch."""
    import os

    wd = str(tmp_path / "dirty")
    cfg = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd, round_virtual_sec=RVS,
        fetch_concurrency=2, num_shards=4, max_rounds=2,
    )
    run_crawl(cfg)
    # simulate a crash mid-round-2: partial dir, no _COMPLETE marker
    dirty = os.path.join(wd, "rounds", "round_00002")
    os.makedirs(os.path.join(dirty, "result"), exist_ok=True)
    with open(os.path.join(dirty, "result", "garbage.txt"), "w") as f:
        f.write("partial")

    cfg.max_rounds = 10_000
    s = run_crawl(cfg)
    assert s.fetched_ok > 0
    assert os.path.exists(os.path.join(dirty, "_COMPLETE.json"))
    assert not os.path.exists(os.path.join(dirty, "result", "garbage.txt"))

    # the re-run round's OUTPUT equals a clean one-shot run's, not merely
    # "something completed": stale-frontier or append-to-partial bugs would
    # otherwise pass on the marker checks alone
    from pholcus_ray.pipelines.crawl import items_table

    wd_clean = str(tmp_path / "clean")
    clean = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd_clean, round_virtual_sec=RVS,
        fetch_concurrency=2, num_shards=4,
    )
    run_crawl(clean)
    lc = crawl_log_table(wd_clean).to_pandas()
    ld = crawl_log_table(wd).to_pandas()
    assert len(lc) == len(ld)
    for c in lc.columns:
        assert (lc[c].values == ld[c].values).all(), c
    ic = items_table(wd_clean).to_pandas().sort_values(["url", "data"])
    idd = items_table(wd).to_pandas().sort_values(["url", "data"])
    assert (ic["data"].values == idd["data"].values).all()


def test_cold_start_clears_prior_runs_artifacts(ray_session, small_corpus,
                                                tmp_path):
    """resume=False on a used workdir (the remedy the resume-validation
    error recommends) must NOT mix the old run's round dirs into the new
    run's projections: a 10-round run restarted cold as a 2-round run
    leaves exactly 2 round dirs, and crawl_log sees only them."""
    import os

    wd = str(tmp_path / "reuse")
    cfg = CrawlConfig(corpus_dir=small_corpus, workdir=wd,
                      round_virtual_sec=RVS, fetch_concurrency=2,
                      num_shards=4)
    s_full = run_crawl(cfg)
    assert s_full.rounds > 2

    cfg2 = CrawlConfig(corpus_dir=small_corpus, workdir=wd,
                       round_virtual_sec=RVS, fetch_concurrency=2,
                       num_shards=4, max_rounds=2, resume=False)
    s2 = run_crawl(cfg2)
    assert s2.rounds == 2
    rounds = [d for d in os.listdir(os.path.join(wd, "rounds"))
              if d.startswith("round_")]
    assert len(rounds) == 2, f"stale round dirs survived: {sorted(rounds)}"
    log = crawl_log_table(wd).to_pandas()
    assert set(log["round"]) <= {0, 1}
    assert s2.fetched_ok + s2.fetched_fail == len(log)


def test_resume_rejects_changed_critical_config(ray_session, small_corpus, tmp_path):
    """Resuming with a different num_shards would re-route seen keys
    (key % S) and silently mis-shard the restored set — must fail loudly."""
    import pytest

    wd = str(tmp_path / "reshard")
    cfg = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd, round_virtual_sec=RVS,
        fetch_concurrency=2, num_shards=4, max_rounds=2,
    )
    run_crawl(cfg)

    bad = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd, round_virtual_sec=RVS,
        fetch_concurrency=2, num_shards=8,
    )
    with pytest.raises(ValueError, match="num_shards"):
        run_crawl(bad)

    bad2 = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd, round_virtual_sec=RVS * 2,
        fetch_concurrency=2, num_shards=4,
    )
    with pytest.raises(ValueError, match="round_virtual_sec"):
        run_crawl(bad2)

    # unchanged config still resumes fine; raising the limit is allowed
    cfg.max_rounds = 10_000
    cfg.limit = 10_000
    s = run_crawl(cfg)
    assert s.fetched_ok > 0


def test_resume_restores_full_per_round_history(ray_session, small_corpus, tmp_path):
    """CrawlSummary.per_round after a resume must cover every completed
    round, not just the last checkpoint (round-1 advisor finding)."""
    wd_full = str(tmp_path / "hist_full")
    wd_part = str(tmp_path / "hist_part")
    kw = dict(corpus_dir=small_corpus, round_virtual_sec=RVS,
              fetch_concurrency=2, num_shards=4)

    s_full = run_crawl(CrawlConfig(workdir=wd_full, **kw))

    cfg = CrawlConfig(workdir=wd_part, max_rounds=2, **kw)
    run_crawl(cfg)
    cfg.max_rounds = 10_000
    s_res = run_crawl(cfg)

    assert len(s_res.per_round) == len(s_full.per_round) == s_full.rounds
    assert [m["round"] for m in s_res.per_round] == list(range(s_full.rounds))
    assert s_res.per_round == s_full.per_round


def test_inherit_history_from_previous_run(ray_session, small_corpus, tmp_path):
    """SuccessInherit + FailureInherit (history.go:83-264): a NEW crawl
    seeded with a previous run's history refetches nothing that succeeded
    and requeues the prior permanent failures exactly once."""
    import os

    import pyarrow.parquet as pq

    wd1 = str(tmp_path / "first")
    s1 = run_crawl(CrawlConfig(corpus_dir=small_corpus, workdir=wd1,
                               round_virtual_sec=RVS, fetch_concurrency=2,
                               num_shards=4))
    prev_fail = pq.read_table(os.path.join(wd1, "final", "failures.parquet"))
    prev_ok_urls = set(
        crawl_log_table(wd1).to_pandas().query("ok")["url"]
    )

    wd2 = str(tmp_path / "second")
    s2 = run_crawl(CrawlConfig(corpus_dir=small_corpus, workdir=wd2,
                               round_virtual_sec=RVS, fetch_concurrency=2,
                               num_shards=4, inherit_from=wd1))
    log2 = crawl_log_table(wd2).to_pandas()
    # nothing that succeeded before is fetched again
    assert not (set(log2["url"]) & prev_ok_urls)
    # round 0 is exactly one retry per inherited failure; later rounds are
    # run 2's OWN once-per-run requeue of rows that failed again
    r0 = log2[log2["round"] == 0]
    assert len(r0) == prev_fail.num_rows
    assert set(r0["url"]) == set(prev_fail["url"].to_pylist())
    assert set(log2["url"]) <= set(prev_fail["url"].to_pylist())
    assert s2.fetched_ok + s2.fetched_fail == len(log2)
    # inherited seen set covers everything the first run saw
    assert s2.seen_total >= s1.seen_total

    # mismatched sharding must be rejected (delta files are key%S routed)
    import pytest

    with pytest.raises(ValueError, match="num_shards"):
        run_crawl(CrawlConfig(corpus_dir=small_corpus,
                              workdir=str(tmp_path / "third"),
                              round_virtual_sec=RVS, fetch_concurrency=2,
                              num_shards=8, inherit_from=wd1))
