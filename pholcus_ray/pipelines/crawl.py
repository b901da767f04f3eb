"""The crawl engine: a deterministic BFS frontier loop over Ray Data.

Reference parity — this is the Ray-Data-native replacement for the whole of
Pholcus's scheduler/crawler machinery (SURVEY.md §3.1 steps 4-9,
§2.8 "frontier loop = unbounded stream with quiescence detection"):

- frontier = a Dataset per BFS round (round-based determinism replaces the
  reference's wall-clock arrival order, SURVEY.md §7.4.2)
- dedup = two-phase claim/resolve against the sharded seen-set actors
  (min-rank-per-key fold; insert-at-enqueue, matrix.go:81-86)
- ordering = (priority desc, seq asc) — matrix.go:88-124 semantics
- politeness/robots = per-host budget actors admitting the cap smallest
  ranks per round (north_rule upgrade; see state/hostbudget.py)
- quota = ``limit`` head of the globally ordered schedule (maxPage,
  matrix.go:59-61, spider.go:241-249)
- failure requeue exactly once at drain (matrix.go:172-204), then permanent
  failures persist (FailureInherit semantics, matrix.go:207-218)
- quiescence: stop when nothing is scheduled and failures were requeued

Rounds are HYBRID: below ``local_round_threshold`` candidates the control
plane (claim/resolve/robots over slim rows) runs driver-side against the
shard actors — same semantics functions, no per-execution fixed cost —
while the data plane (fused fetch+parse over html) runs as a distributed
``map_batches`` once the schedule exceeds ``fetch_local_threshold``. Above
the threshold the control plane too runs as barrier-separated Dataset
passes (the 10^10-frontier path; both paths are byte-equal, tested).

Every round writes its result lineage + deferred spill + a seen-set delta
to ``workdir/rounds/round_NNNNN`` and marks the round with
``_COMPLETE.json`` — per-partition lineage. ``resume=True`` restarts from
the last complete round: incomplete round dirs are discarded, seen shards
are rebuilt from the deltas, and the loop continues bit-identically
(tested in tests/test_resume.py).

Scale notes: round state that crosses the loop boundary lives in Parquet;
the html column exists only inside the fused fetch+parse stage; NO shuffle
runs in the round loop — dedup and politeness are commutative actor folds
over slim rows, and items/crawl_log/failures are lazy column-pruned
projections of the per-round result lineage.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..model import (
    FRONTIER_SCHEMA,
    RESULT_SCHEMA,
    virtual_download_time,
)
from ..spiderapi import DEFAULT_SPIDER, Spider
from ..stages.fetchparse import FetchParse, corpus_n_buckets
from ..stages.normalize import explode_links, seeds_to_frontier
from ..stages.schedule import (
    ClaimSeen,
    ResolveCapSpill,
    ResolveSeenRobotsCapClaim,
)
from ..state.hostbudget import HostBudget
from ..state.hostpolicy import HostPolicy
from ..state.seen import ShardedSeen


@dataclass
class CrawlConfig:
    corpus_dir: str
    workdir: str
    spider: Spider = field(default_factory=lambda: DEFAULT_SPIDER)
    keyins: list[str] = field(default_factory=list)
    seen_mode: str = "exact"          # "exact" | "cuckoo"
    num_shards: int = 8
    capacity_per_shard: int = 1 << 20
    try_times: int = 3                # reference TryTimes default (request.go:48)
    round_virtual_sec: float = 16.0   # politeness budget per round
    default_delay_sec: float = 1.0
    budget_shards: int = 4            # host-budget actor pool size
    # control plane (claim/resolve over slim rows) runs driver-side below
    # this candidate count; fully-distributed above (the 10^10 path)
    local_round_threshold: int = 300_000
    # scheduled rows above this fetch distributed. 512 measured best on the
    # politeness-tight many-small-round shape (Common-Crawl-size pages,
    # rvs=600, 49 rounds: thr=1024 -> 42-44s with ~16k pages parsed serially
    # on the driver; thr=512 -> 32-33s; thr=128 overpays the ~0.35s/round
    # distributed fixed cost). Conformance is threshold-independent — both
    # paths are byte-equal (test_local_and_distributed_paths_agree).
    fetch_local_threshold: int = 512
    limit: int | None = None          # maxPage quota (matrix.go:59-61)
    max_rounds: int = 10_000
    max_depth: int | None = None
    fetch_concurrency: int = 4
    fetch_batch_size: int = 256
    obey_robots: bool = True
    resume: bool = True
    fetch_use_actors: bool = False  # True: actor pool (stateful HTTP shape)
    seeds_path: str | None = None   # override corpus seeds.parquet
    # start a NEW crawl inheriting a previous run's history
    # (SuccessInherit/FailureInherit, history.go:83-264): its seen set
    # pre-loads the dedup filter and its final failures are requeued once
    inherit_from: str | None = None
    # custom UA pool (ST3); None = capture the driver's uapool.current_pool()
    # at launch (shipped in fetch kwargs so distributed workers match)
    ua_pool: tuple[str, ...] | None = None
    # virtual-clock start of this run (ST7: a recurring crawl's tick starts
    # at its timer fire time, so DownloadTime / cookie expiry advance)
    virtual_t0_sec: float = 0.0
    # the surfer seam (stages/downloader.py): None = the deterministic
    # corpus-backed simnet double; an HttpDownloader instance puts the SAME
    # engine on a real wire (must be picklable — it ships to fetch workers)
    downloader: object | None = None


@dataclass
class CrawlSummary:
    rounds: int
    fetched_ok: int
    fetched_fail: int
    items: int
    seen_total: int
    deferred_final: int
    failures_final: int
    workdir: str
    per_round: list[dict]


# --- parquet helpers (empty-safe) ------------------------------------------


def _nrows(path: str) -> int:
    if not os.path.isdir(path):
        return 0
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return n


def _has_files(path: str) -> bool:
    return _nrows(path) > 0


def _write(ds: rd.Dataset, path: str, schema: pa.Schema) -> int:
    """Write a dataset to a fresh dir; guarantee at least schema metadata."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)
    n = _nrows(path)
    if n == 0:
        pq.write_table(schema.empty_table(), os.path.join(path, "empty.parquet"))
    return n


def _read_table(path: str, schema: pa.Schema, columns=None) -> pa.Table:
    if _has_files(path):
        return pads.dataset(path).to_table(columns=columns)
    t = schema.empty_table()
    return t.select(columns) if columns else t


# --- opt-in phase profiler ---------------------------------------------------
# PHOLCUS_PROF=1 accumulates per-phase wall time across the whole run and
# prints one {"pholcus_prof": {...}} JSON line to stderr at finalize — the
# instrument behind the fixed-cost budget in BASELINE.md (driver-side costs
# that do NOT shrink with CPU count cap small-corpus scaling efficiency).
# Zero overhead when unset (a single dict check per phase boundary).

_PROF: dict[str, float] | None = None


class _prof:
    __slots__ = ("name", "t0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *exc):
        if _PROF is not None:
            _PROF[self.name] = _PROF.get(self.name, 0.0) + (
                time.perf_counter() - self.t0
            )


def _bool_np(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(bool)


def run_crawl(cfg: CrawlConfig) -> CrawlSummary:
    from ..functions.uapool import current_pool

    global _PROF
    _PROF = {} if os.environ.get("PHOLCUS_PROF") else None

    os.makedirs(cfg.workdir, exist_ok=True)
    rounds_dir = os.path.join(cfg.workdir, "rounds")
    os.makedirs(rounds_dir, exist_ok=True)
    # the EFFECTIVE pool (driver default captured at launch when cfg has
    # none) is what must be validated on resume — recording a null would
    # let a resumed process continue with a silently different default
    ua_pool = tuple(cfg.ua_pool) if cfg.ua_pool else current_pool()
    cfg_json = {
        "corpus_dir": cfg.corpus_dir,
        "round_virtual_sec": cfg.round_virtual_sec,
        "virtual_t0_sec": cfg.virtual_t0_sec,
        "default_delay_sec": cfg.default_delay_sec,
        "seen_mode": cfg.seen_mode,
        "num_shards": cfg.num_shards,
        "limit": cfg.limit,
        "try_times": cfg.try_times,
        "obey_robots": cfg.obey_robots,
        "max_depth": cfg.max_depth,
        "keyins": list(cfg.keyins),
        "seeds_path": cfg.seeds_path,
        "spider": cfg.spider.name,
        "inherit_from": cfg.inherit_from,
        "ua_pool": list(ua_pool),
        # bumped when RESULT_SCHEMA changes; a workdir checkpointed under an
        # older layout is restarted cold instead of mixing schemas
        "result_schema_version": _RESULT_SCHEMA_VERSION,
    }
    cfg_path = os.path.join(cfg.workdir, "run_config.json")
    prev_cfg = None
    if cfg.resume and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            prev_cfg = json.load(f)

    policy = HostPolicy.from_robots_parquet(
        os.path.join(cfg.corpus_dir, "robots.parquet"), cfg.default_delay_sec
    )
    policy_ref = ray.put(policy)
    n_buckets = corpus_n_buckets(cfg.corpus_dir)

    seen = ShardedSeen(cfg.num_shards, cfg.seen_mode, cfg.capacity_per_shard)

    # --- resume or cold start ---
    state = _restore(cfg, seen, rounds_dir, prev_cfg, cfg_json)
    # written only after resume validation, so a rejected resume attempt
    # can't clobber the persisted config the next attempt validates against
    with open(cfg_path, "w") as f:
        json.dump(cfg_json, f, indent=2)
    if state is None:
        # COLD START on a previously-used workdir (resume=False, or nothing
        # restorable): clear every prior run's artifacts — stale complete
        # round dirs would otherwise leak into crawl_log/items projections,
        # a stale final/url_seen.parquet would outlive a seen-mode change,
        # and a stale inherited/ delta would be replayed by a later resume.
        for sub in ("rounds", "final", "inherited"):
            p = os.path.join(cfg.workdir, sub)
            if os.path.isdir(p) and os.listdir(p):
                shutil.rmtree(p)
        os.makedirs(rounds_dir, exist_ok=True)
        with _prof("seeds_read"):
            seeds_tbl = pq.read_table(
                cfg.seeds_path or os.path.join(cfg.corpus_dir, "seeds.parquet")
            )
        with _prof("seeds_normalize"):
            seed_frontier = seeds_to_frontier(
                seeds_tbl, cfg.spider.entry_rule, cfg.keyins or None
            )
        if cfg.inherit_from:
            seed_frontier = _inherit_history(cfg, seen, seed_frontier)
        state = {
            "round": 0,
            "fetched_ok": 0,
            "fetched_fail": 0,
            "items": 0,
            "failures_requeued": False,
            "failure_rounds": [],
            "per_round": [],
            "seed_frontier": seed_frontier,
        }

    budget = HostBudget(policy, cfg.round_virtual_sec, cfg.budget_shards)
    # ST1: the driver owns the authoritative cookie jar. Each round ships a
    # read-only snapshot to the fetch workers and merges the round's observed
    # Set-Cookie headers back in seq order (slim per-host state; the merge
    # reads only 4 slim columns of the round's result). Checkpointed per
    # round (cookies.json) so resume restores session state.
    jar = None
    if cfg.spider.enable_cookie:
        from ..state.cookiejar import CookieJar

        jar = CookieJar.from_state(state.get("jar_state"))
    from ..stages.fetchparse import preload_corpus

    fp_base = dict(
        corpus_dir=cfg.corpus_dir,
        spider=cfg.spider,
        n_buckets=n_buckets,
        try_times=cfg.try_times,
        bucket_refs=preload_corpus(cfg.corpus_dir, n_buckets),
        ua_pool=ua_pool,
    )
    if cfg.downloader is not None:
        fp_base["downloader"] = cfg.downloader

    while state["round"] < cfg.max_rounds:
        r = state["round"]

        # ---- 1. candidate-size estimate (parquet metadata; no execution) ----
        with _prof("estimate"):
            est = _estimate_candidates(cfg, state, rounds_dir)
        if est == 0:
            # drain: requeue accumulated failures exactly once, else stop
            if state["failure_rounds"] and not state["failures_requeued"]:
                state["failures_requeued"] = True
                with _prof("failure_requeue"):
                    state["requeue_table"] = _failure_rows(
                        rounds_dir, state["failure_rounds"]
                    )
                state["failure_rounds"] = []
                state.pop("seed_frontier", None)
                continue
            break

        rdir = os.path.join(rounds_dir, f"round_{r:05d}")
        if os.path.isdir(rdir):
            shutil.rmtree(rdir)  # incomplete leftovers from a killed run
        os.makedirs(rdir)

        seen.begin_round()
        budget.begin_round()
        fp_kwargs = dict(
            fp_base,
            download_time=virtual_download_time(
                r, cfg.round_virtual_sec, cfg.virtual_t0_sec
            ),
        )
        if jar is not None:
            fp_kwargs.update(
                jar_state=jar.to_state(),
                virtual_now=cfg.virtual_t0_sec + r * cfg.round_virtual_sec,
            )
        remaining = None
        if cfg.limit is not None:
            remaining = cfg.limit - state["fetched_ok"] - state["fetched_fail"]
            if remaining <= 0:
                shutil.rmtree(rdir)
                break

        # ---- 2-4. dedup + robots + politeness + fetch+parse ----
        # HYBRID rounds (the default at sandbox scale): the control plane
        # (claim/resolve/robots over slim frontier rows) runs driver-side
        # against the shard actors — same semantics functions, no
        # per-execution fixed costs — while the heavy data plane
        # (fetch+parse over html) runs distributed once the schedule
        # exceeds fetch_local_threshold. Beyond local_round_threshold
        # candidates, the control plane too runs as barrier-separated
        # Dataset passes (the 10^10-frontier path).
        if est <= cfg.local_round_threshold:
            n_sched, n_deferred = _run_round_local(
                cfg, state, rounds_dir, rdir, seen, budget, policy, fp_kwargs,
                remaining,
            )
        else:
            n_sched, n_deferred = _run_round_distributed(
                cfg, state, rounds_dir, rdir, seen, budget, policy_ref, fp_kwargs,
                remaining, est,
            )
        result_dir = os.path.join(rdir, "result")

        # ---- 5. per-round accounting from the result lineage ----
        # items / crawl_log / failures are PROJECTIONS of result.parquet —
        # derived lazily (items_table / crawl_log_table / failure rows at
        # requeue) instead of three extra dataset executions per round.
        with _prof("count_ok_items"):
            n_ok, n_items = _count_ok_items(result_dir) if n_sched else (0, 0)
        n_fail = n_sched - n_ok
        state["fetched_ok"] += n_ok
        state["fetched_fail"] += n_fail
        state["items"] += n_items
        if n_fail:
            state["failure_rounds"].append(r)

        # merge the round's Set-Cookie observations into the jar, in seq
        # order (deterministic; mirrors the oracle's end-of-round merge)
        if jar is not None and n_sched:
            _merge_round_cookies(
                jar, result_dir, cfg.virtual_t0_sec + r * cfg.round_virtual_sec
            )

        # ---- 6. checkpoint: seen delta + round meta ----
        with _prof("seen_dump"):
            n_new_seen = seen.dump_deltas(os.path.join(rdir, "seen_delta"))
        if jar is not None:
            with open(os.path.join(rdir, "cookies.json"), "w") as f:
                json.dump(jar.to_state(), f)
        meta = {
            "round": r,
            "scheduled": n_sched,
            "ok": n_ok,
            "fail": n_fail,
            "items": n_items,
            "deferred": n_deferred,
            "new_seen": n_new_seen,
            "fetched_ok_total": state["fetched_ok"],
            "fetched_fail_total": state["fetched_fail"],
            "items_total": state["items"],
            "failures_requeued": state["failures_requeued"],
            # snapshot, not a reference — the live list keeps growing and
            # would retroactively rewrite earlier per_round entries
            "failure_rounds": list(state["failure_rounds"]),
        }
        state["per_round"].append(meta)
        with open(os.path.join(rdir, "_COMPLETE.json"), "w") as f:
            json.dump(meta, f, indent=2)

        state["round"] = r + 1
        state.pop("seed_frontier", None)
        state.pop("requeue_table", None)

        # ---- 7. quiescence (CanStop semantics, matrix.go:172-204) ----
        if cfg.limit is not None and state["fetched_ok"] + state["fetched_fail"] >= cfg.limit:
            break

    with _prof("finalize"):
        out = _finalize(cfg, state, seen, rounds_dir)
    if _PROF is not None:
        import sys

        print(json.dumps({"pholcus_prof":
                          {k: round(v, 3) for k, v in _PROF.items()}}),
              file=sys.stderr)
    return out


def _estimate_candidates(cfg: CrawlConfig, state: dict, rounds_dir: str) -> int:
    """Exact candidate row count for this round, from cheap metadata reads."""
    if "seed_frontier" in state:
        return state["seed_frontier"].num_rows
    if "requeue_table" in state:
        return state["requeue_table"].num_rows
    prev = os.path.join(rounds_dir, f"round_{state['round'] - 1:05d}")
    return _count_links(os.path.join(prev, "result"), cfg.max_depth) + _nrows(
        os.path.join(prev, "deferred")
    )


# explode_links touches only these result columns; excluding the heavy
# ``items`` payload keeps candidate builds to slim-column reads
_EXPLODE_COLUMNS = ["url", "seq", "depth", "keyin", "links"]

# _result_to_items touches only these; reading the full schema would drag
# the heavy links list-structs and binary file payloads through every items
# projection (and every sink built on it)
_ITEMS_COLUMNS = ["url", "referer", "rule", "items"]


def _candidate_table(cfg: CrawlConfig, state: dict, rounds_dir: str) -> pa.Table:
    """Driver-local candidate table (small rounds only)."""
    if "seed_frontier" in state:
        return state["seed_frontier"]
    if "requeue_table" in state:
        return state["requeue_table"]
    prev = os.path.join(rounds_dir, f"round_{state['round'] - 1:05d}")
    links = explode_links(
        _read_table(os.path.join(prev, "result"), RESULT_SCHEMA,
                    columns=_EXPLODE_COLUMNS)
    )
    if cfg.max_depth is not None and links.num_rows:
        links = links.filter(
            pa.array(links["depth"].to_numpy(zero_copy_only=False) <= cfg.max_depth)
        )
    deferred = _read_table(os.path.join(prev, "deferred"), FRONTIER_SCHEMA)
    if deferred.num_rows == 0:
        return links
    if links.num_rows == 0:
        return deferred
    return pa.concat_tables([links, deferred.select(links.column_names)])


def _sort_limit_table(t: pa.Table, remaining: int) -> pa.Table:
    import pyarrow.compute as pc

    order = pc.sort_indices(
        t, sort_keys=[("priority", "descending"), ("seq", "ascending")]
    )
    return t.take(order[:remaining])


def _run_round_local(cfg, state, rounds_dir, rdir, seen, budget, policy,
                     fp_kwargs, remaining) -> tuple[int, int]:
    """Driver-local round: THE SAME three stage objects as the distributed
    path (stages/schedule.py), applied to one driver-held table instead of
    a Dataset — one control-plane implementation, two execution shapes."""
    with _prof("candidates"):
        cand = _candidate_table(cfg, state, rounds_dir)
    n_deferred = 0
    sched = FRONTIER_SCHEMA.empty_table()
    if cand.num_rows:
        with _prof("claim"):
            ClaimSeen(seen)(cand)
        with _prof("resolve"):
            t = ResolveSeenRobotsCapClaim(
                seen, budget, policy, cfg.obey_robots)(cand)
        if t.num_rows:
            with _prof("cap_spill"):
                sched = ResolveCapSpill(
                    budget, os.path.join(rdir, "deferred"))(t)
            n_deferred = t.num_rows - sched.num_rows
    if remaining is not None and sched.num_rows > remaining:
        sched = _sort_limit_table(sched, remaining)
    result_dir = os.path.join(rdir, "result")
    if sched.num_rows > cfg.fetch_local_threshold:
        # hybrid round: control plane ran driver-side over slim rows, the
        # heavy data plane (fetch+parse over html) runs distributed.
        # adaptive chunking: ~4 blocks per CPU balances spread (small rounds
        # still use every core) against per-block fixed costs (a 165k-row
        # frontier at 256-row blocks paid 647 ray.puts ≈ 4.7s driver time;
        # map_batches still feeds the UDF fetch_batch_size-row batches
        # inside each task, and the fused ->Write keeps task outputs out of
        # plasma, so larger blocks don't grow worker memory)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        chunk = max(64, min(2048, sched.num_rows // (ncpu * 4) + 1))
        chunks = [
            sched.slice(i, chunk) for i in range(0, sched.num_rows, chunk)
        ]
        with _prof("fetch_distributed"):
            n = _write(
                _apply_fetch(rd.from_arrow(chunks), cfg, fp_kwargs),
                result_dir,
                RESULT_SCHEMA,
            )
        return n, n_deferred
    fp = FetchParse(**fp_kwargs)
    result = fp(sched) if sched.num_rows else RESULT_SCHEMA.empty_table()
    os.makedirs(result_dir, exist_ok=True)
    pq.write_table(result, os.path.join(result_dir, "part-0.parquet"))
    return sched.num_rows, n_deferred


def _apply_fetch(ds: "rd.Dataset", cfg: "CrawlConfig", fp_kwargs: dict) -> "rd.Dataset":
    """Attach the fused fetch+parse stage.

    Default: a task-pool closure over one driver-built FetchParse (the
    shared corpus tables make it stateless, so tasks scale elastically).
    ``cfg.fetch_use_actors``: an actor pool of ``cfg.fetch_concurrency``
    FetchParse instances — the stateful-fetch shape (browser process / HTTP
    session built once in ``__init__``, S4/ST6), the production stand-in
    for the reference's long-lived Surf/Chrome downloaders. Cookie state is
    round-granular in BOTH paths (read-only jar snapshot in, Set-Cookie
    result column out; see state/cookiejar.py), so task and actor paths
    emit byte-identical result rows — asserted by the actor-vs-task
    conformance test."""
    if cfg.fetch_use_actors:
        return ds.map_batches(
            FetchParse,
            fn_constructor_kwargs=fp_kwargs,
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
            concurrency=cfg.fetch_concurrency,
        )
    _fp = FetchParse(**fp_kwargs)

    def fetch_parse(batch, _fp=_fp):
        return _fp(batch)

    return ds.map_batches(
        fetch_parse, batch_format="pyarrow", batch_size=cfg.fetch_batch_size
    )


def _run_round_distributed(cfg, state, rounds_dir, rdir, seen, budget,
                           policy_ref, fp_kwargs, remaining,
                           est: int) -> tuple[int, int]:
    """Barrier-separated streaming passes per round. The two-phase
    claim/resolve protocol needs a barrier after claims and after
    cap-claims; ``materialize()`` on the slim frontier rows is the cheapest
    barrier (~0.3s vs 2.5s for a repartition AllToAll at these sizes) and
    keeps the intermediate in the object store instead of round-tripping
    parquet. Claim and resolve RPCs are idempotent, so lineage
    re-execution of a pre-barrier block cannot corrupt the round. At
    extreme frontier scale, swap the materialize barriers for the round's
    parquet checkpoint (same structure, disk-backed)."""
    claim = ClaimSeen(seen)
    rstage = ResolveSeenRobotsCapClaim(seen, budget, policy_ref, cfg.obey_robots)
    spill = ResolveCapSpill(budget, os.path.join(rdir, "deferred"))

    def claim_seen(b, _c=claim):
        return _c(b)

    def resolve_claim(b, _r=rstage):
        return _r(b)

    def resolve_cap(b, _s=spill):
        return _s(b)

    claimed = (
        _candidates(cfg, state, rounds_dir)
        .map_batches(claim_seen, batch_format="pyarrow")
        .materialize()  # BARRIER: all dedup claims registered
    )
    fresh = claimed.map_batches(
        resolve_claim, batch_format="pyarrow"
    ).materialize()  # BARRIER: all politeness claims registered
    ds = fresh.map_batches(resolve_cap, batch_format="pyarrow")
    if remaining is not None and remaining < est:
        # quota can only bind when remaining < est (est >= scheduled rows);
        # only then is the global-order AllToAll sort paid — a slack limit
        # must not violate the no-round-loop-shuffles invariant
        ds = ds.sort(["priority", "seq"], descending=[True, False]).limit(remaining)
    result = _apply_fetch(ds, cfg, fp_kwargs)
    n_sched = _write(result, os.path.join(rdir, "result"), RESULT_SCHEMA)
    n_deferred = _nrows(os.path.join(rdir, "deferred"))
    return n_sched, n_deferred


def _frontier_blocks(t: pa.Table) -> rd.Dataset:
    """An in-memory frontier table as a Dataset with cluster-width block
    granularity. ``rd.from_arrow(table)`` yields ONE block, and every
    downstream ``map_batches`` of the distributed round runs one task per
    block — a 320k-seed round measured exactly that failure mode: the whole
    claim→resolve→fetch chain serialized onto a single core while 31 idled.
    Slice with the same adaptive chunking as the hybrid round's fetch
    dispatch (~4 blocks per CPU, 64-2048 rows) so the control plane and the
    data plane parallelize from the first block."""
    if t.num_rows == 0:
        return rd.from_arrow(t)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    chunk = max(64, min(2048, t.num_rows // (ncpu * 4) + 1))
    return rd.from_arrow([t.slice(i, chunk) for i in range(0, t.num_rows, chunk)])


def _candidates(cfg: CrawlConfig, state: dict, rounds_dir: str) -> rd.Dataset:
    """Build this round's candidate frontier dataset (lazy)."""
    if "seed_frontier" in state:
        return _frontier_blocks(state["seed_frontier"])
    if "requeue_table" in state:
        return _frontier_blocks(state["requeue_table"])
    prev = os.path.join(rounds_dir, f"round_{state['round'] - 1:05d}")
    res_dir = os.path.join(prev, "result")
    if _has_files(res_dir):
        links_src = rd.read_parquet(res_dir, columns=_EXPLODE_COLUMNS)
    else:
        links_src = rd.from_arrow(RESULT_SCHEMA.empty_table().select(_EXPLODE_COLUMNS))
    links = links_src.map_batches(explode_links, batch_format="pyarrow")
    if cfg.max_depth is not None:
        links = links.map_batches(
            lambda t: t.filter(
                pa.array(t["depth"].to_numpy(zero_copy_only=False) <= cfg.max_depth)
            ),
            batch_format="pyarrow",
        )
    deferred_dir = os.path.join(prev, "deferred")
    if _has_files(deferred_dir):
        links = links.union(rd.read_parquet(deferred_dir))
    return links



def _count_ok_items(result_dir: str) -> tuple[int, int]:
    """(ok count, item count) in ONE column-pruned read of the round's
    result lineage (was two separate single-column scans)."""
    t = _read_table(result_dir, RESULT_SCHEMA, columns=["ok", "n_items"])
    if t.num_rows == 0:
        return 0, 0
    return (
        int(_bool_np(t["ok"]).sum()),
        int(t["n_items"].to_numpy(zero_copy_only=False).sum()),
    )


def _merge_round_cookies(jar, result_dir: str, virtual_now: float) -> None:
    """Fold the round's observed Set-Cookie headers into the driver jar in
    seq order — the deterministic end-of-round merge both the engine and
    the sequential oracle perform (round-granular ST1 visibility). Reads
    only slim columns; state folded is per-host, not per-url."""
    import pyarrow.compute as pc

    t = _read_table(
        result_dir, RESULT_SCHEMA, columns=["url", "seq", "ok", "set_cookie"]
    )
    if t.num_rows == 0:
        return
    t = t.filter(pc.and_(t["ok"].combine_chunks(),
                         pc.not_equal(t["set_cookie"], "")))
    if t.num_rows == 0:
        return
    t = t.sort_by("seq")
    for url, sc in zip(t["url"].to_pylist(), t["set_cookie"].to_pylist()):
        jar.set_cookie(url, sc, now=virtual_now)


def _count_links(result_dir: str, max_depth: int | None = None) -> int:
    """Exact child-candidate count from a round's result parquet.

    Must mirror the candidate build's depth filter (child depth =
    parent depth + 1, kept while child depth <= max_depth): counting
    links from parents at the depth frontier would schedule 'ghost'
    rounds with zero survivors that the sequential oracle never runs,
    shifting round numbers and download_time for later requeued rows.
    """
    import pyarrow.compute as pc

    cols = ["links"] if max_depth is None else ["links", "depth"]
    t = _read_table(result_dir, RESULT_SCHEMA, columns=cols)
    if t.num_rows == 0:
        return 0
    if max_depth is not None:
        t = t.filter(
            pa.array(t["depth"].to_numpy(zero_copy_only=False) < max_depth)
        )
        if t.num_rows == 0:
            return 0
    return int(pc.sum(pc.list_value_length(t["links"])).as_py() or 0)




def _result_to_crawl_log(t: pa.Table, round_idx: int) -> pa.Table:
    from ..model import CRAWL_LOG_SCHEMA

    return pa.table(
        {
            "round": pa.array(np.full(t.num_rows, round_idx, dtype=np.int32)),
            "url": t["url"],
            "host": t["host"],
            "priority": t["priority"],
            "seq": t["seq"],
            "depth": t["depth"],
            "ok": t["ok"],
            "status": t["status"],
            "attempts": t["attempts"],
        },
        schema=CRAWL_LOG_SCHEMA,
    )


def _result_to_items(t: pa.Table, round_idx: int, round_virtual_sec: float,
                     t0_sec: float = 0.0) -> pa.Table:
    import pyarrow.compute as pc

    from ..model import ITEMS_SCHEMA

    items = t["items"]
    if isinstance(items, pa.ChunkedArray):
        items = items.combine_chunks()
    flat = pc.list_flatten(items)
    parents = pc.list_parent_indices(items).to_numpy(zero_copy_only=False)
    urls = t["url"].to_pylist()
    refs = t["referer"].to_pylist()
    rules = t["rule"].to_pylist()
    dt = virtual_download_time(round_idx, round_virtual_sec, t0_sec)
    return pa.table(
        {
            "rule": pa.array([rules[p] for p in parents], pa.string()),
            "data": flat,
            "url": pa.array([urls[p] for p in parents], pa.string()),
            "parent_url": pa.array([refs[p] for p in parents], pa.string()),
            "download_time": pa.array([dt] * len(parents), pa.string()),
            "round": pa.array(np.full(len(parents), round_idx, dtype=np.int32)),
        },
        schema=ITEMS_SCHEMA,
    )


def _failures_fn(t: pa.Table) -> pa.Table:
    """Failed fetches back into frontier shape (attempts carried forward)."""
    bad = t.filter(pa.array(~_bool_np(t["ok"])))
    n = bad.num_rows
    return pa.table(
        {
            "url": bad["url"],
            "host": bad["host"],
            "key": bad["key"],
            "rule": bad["rule"],
            "method": bad["method"],
            "post_data": bad["post_data"],
            "priority": bad["priority"],
            "depth": bad["depth"],
            "referer": bad["referer"],
            "anchor": pa.array([""] * n, pa.string()),
            "seq": bad["seq"],
            "attempts_done": bad["attempts"],
            "bypass_dedup": pa.array([True] * n, pa.bool_()),
            "reloadable": pa.array([False] * n, pa.bool_()),
            "keyin": bad["keyin"],
            "temp": bad["temp"],
        },
        schema=FRONTIER_SCHEMA,
    )


_FAILURE_COLUMNS = ["url", "host", "key", "rule", "method", "post_data",
                    "priority", "depth", "referer", "seq", "keyin", "temp",
                    "ok", "attempts"]


def _failure_rows(rounds_dir: str, failure_rounds: list[int]) -> pa.Table:
    """Failed frontier rows of the given rounds, from the result lineage
    (slim columns only — never the items/links payload)."""
    parts = []
    for fr in failure_rounds:
        t = _read_table(
            os.path.join(rounds_dir, f"round_{fr:05d}", "result"), RESULT_SCHEMA,
            columns=_FAILURE_COLUMNS,
        )
        if t.num_rows:
            f = _failures_fn(t)
            if f.num_rows:
                parts.append(f)
    if not parts:
        return FRONTIER_SCHEMA.empty_table()
    return pa.concat_tables(parts)


# --- cross-run history inheritance ------------------------------------------


def _inherit_history(cfg: CrawlConfig, seen: ShardedSeen,
                     seed_frontier: pa.Table) -> pa.Table:
    """Load a PREVIOUS run's history into this fresh crawl
    (SuccessInherit + FailureInherit, history.go:83-264, matrix.go:207-218):
    the prior seen-set deltas pre-populate the dedup filter (previously
    crawled requests won't be refetched), and its permanent failures are
    appended to the seed frontier for exactly one more attempt (their rows
    already carry bypass_dedup=True + attempts_done).

    The prior run must have used the same num_shards/seen_mode — the delta
    files are per-shard (key % S) — enforced against its run_config.json.
    """
    prev_wd = cfg.inherit_from
    prev_cfg_path = os.path.join(prev_wd, "run_config.json")
    if os.path.exists(prev_cfg_path):
        with open(prev_cfg_path) as f:
            prev = json.load(f)
        bad = [
            k for k in ("num_shards", "seen_mode")
            if k in prev and prev[k] != getattr(cfg, k)
        ]
        if bad:
            raise ResumeConfigMismatch(
                f"cannot inherit from {prev_wd!r}: "
                + ", ".join(f"{k} {prev[k]!r} != {getattr(cfg, k)!r}" for k in bad)
            )
    prev_rounds = os.path.join(prev_wd, "rounds")
    # sources: the prev run's own per-round deltas PLUS whatever IT inherited
    # (consolidated below), so chains of inheriting runs keep full history
    delta_dirs = [os.path.join(prev_wd, "inherited", "seen_delta")]
    if os.path.isdir(prev_rounds):
        for d in sorted(os.listdir(prev_rounds)):
            if os.path.exists(os.path.join(prev_rounds, d, "_COMPLETE.json")):
                delta_dirs.append(os.path.join(prev_rounds, d, "seen_delta"))
    # consolidate the inherited membership into THIS workdir (one merged
    # .npy per shard) so (a) resuming this run restores it and (b) a future
    # run inheriting from this one sees the whole chain
    inherit_dir = os.path.join(cfg.workdir, "inherited", "seen_delta")
    os.makedirs(inherit_dir, exist_ok=True)
    for i in range(cfg.num_shards):
        chunks = []
        for d in delta_dirs:
            p = os.path.join(d, f"shard_{i:04d}.npy")
            if os.path.exists(p):
                arr = np.load(p)
                if len(arr):
                    chunks.append(arr)
        merged = (
            np.unique(np.concatenate(chunks)) if chunks
            else np.empty(0, dtype=np.uint64)
        )
        np.save(os.path.join(inherit_dir, f"shard_{i:04d}.npy"), merged)
    seen.restore_deltas([inherit_dir])
    fail_path = os.path.join(prev_wd, "final", "failures.parquet")
    if os.path.exists(fail_path):
        failures = pq.read_table(fail_path)
        if failures.num_rows:
            return pa.concat_tables(
                [seed_frontier, failures.select(seed_frontier.column_names)]
            )
    return seed_frontier


# --- resume -----------------------------------------------------------------


class ResumeConfigMismatch(ValueError):
    """A cached workdir's recorded run_config conflicts with the requested
    one (resume or inherit validation). Callers that cache workdirs may
    safely rmtree + restart cold on THIS exception only — a generic
    ValueError from anywhere else signals a real bug and must not destroy
    a valid checkpoint (round-2 advisor finding)."""


# run_config keys that must be identical to resume a workdir: a changed
# num_shards re-routes seen keys (key % S), a changed seen_mode/clock/corpus
# silently produces a different crawl from the checkpointed prefix.
_RESUME_CRITICAL = (
    "corpus_dir", "round_virtual_sec", "virtual_t0_sec", "default_delay_sec",
    "seen_mode", "num_shards", "try_times", "obey_robots", "max_depth",
    "keyins", "seeds_path", "spider", "inherit_from", "ua_pool",
)

# bump when RESULT_SCHEMA / round-dir layout — or any persisted key space
# (dedup_key_array) — changes; old workdirs are restarted cold rather than
# read with a mismatched schema. v3: dedup keys now genuinely NUL-join
# (url, method, rule); the pandas path had silently dropped the separator.
_RESULT_SCHEMA_VERSION = 3


def _restore(cfg: CrawlConfig, seen: ShardedSeen, rounds_dir: str,
             prev_cfg: dict | None = None,
             cur_cfg: dict | None = None) -> dict | None:
    if not cfg.resume:
        return None
    if prev_cfg is not None and (
        prev_cfg.get("result_schema_version") != _RESULT_SCHEMA_VERSION
    ):
        # engine upgrade, not a user config change: discard the old-layout
        # checkpoints and start cold (stale round dirs would otherwise leak
        # into crawl_log/items projections)
        if os.path.isdir(rounds_dir):
            shutil.rmtree(rounds_dir)
            os.makedirs(rounds_dir)
        return None
    complete = []
    if os.path.isdir(rounds_dir):
        import re as _re

        # only genuine round dirs participate, in NUMERIC order (lexical
        # order breaks past the %05d padding); a stray file (.nfsXXXX,
        # editor temp) must be ignored, not treated as an incomplete round
        # — breaking on it would empty `complete` and the cold-start path
        # would then wipe every real checkpoint
        rdirs = sorted(
            (int(m.group(1)), d)
            for d in os.listdir(rounds_dir)
            if (m := _re.fullmatch(r"round_(\d+)", d))
        )
        for _n, d in rdirs:
            if os.path.exists(os.path.join(rounds_dir, d, "_COMPLETE.json")):
                complete.append(d)
            else:
                break  # stop at the first incomplete round
    if not complete:
        return None
    if prev_cfg is not None and cur_cfg is not None:
        diff = [
            k for k in _RESUME_CRITICAL
            if k in prev_cfg and prev_cfg[k] != cur_cfg.get(k)
        ]
        if diff:
            raise ResumeConfigMismatch(
                f"cannot resume {rounds_dir!r}: config changed for "
                + ", ".join(f"{k} {prev_cfg[k]!r} -> {cur_cfg.get(k)!r}"
                            for k in diff)
                + " (use a fresh workdir, or resume=False to restart)"
            )
    # an inherited seen set (cross-run history) must survive resume too
    inherit_dir = os.path.join(cfg.workdir, "inherited", "seen_delta")
    if os.path.isdir(inherit_dir):
        seen.restore_deltas([inherit_dir])
    # full per_round history, not just the last round (round-1 advisor
    # finding: CrawlSummary.per_round was truncated after any resume)
    per_round = []
    for d in complete:
        with open(os.path.join(rounds_dir, d, "_COMPLETE.json")) as f:
            per_round.append(json.load(f))
    meta = per_round[-1]
    seen.restore_deltas(
        [os.path.join(rounds_dir, d, "seen_delta") for d in complete]
    )
    jar_state = None
    ck = os.path.join(rounds_dir, complete[-1], "cookies.json")
    if os.path.exists(ck):
        with open(ck) as f:
            jar_state = json.load(f)
    return {
        "round": meta["round"] + 1,
        "fetched_ok": meta["fetched_ok_total"],
        "fetched_fail": meta["fetched_fail_total"],
        "items": meta["items_total"],
        "failures_requeued": meta["failures_requeued"],
        "failure_rounds": list(meta["failure_rounds"]),
        "per_round": per_round,
        "jar_state": jar_state,
    }


# --- finalize ---------------------------------------------------------------


def _finalize(cfg: CrawlConfig, state: dict, seen: ShardedSeen,
              rounds_dir: str) -> CrawlSummary:
    final_dir = os.path.join(cfg.workdir, "final")
    os.makedirs(final_dir, exist_ok=True)

    if cfg.seen_mode == "exact":
        keys = seen.all_keys()
        pq.write_table(
            pa.table({"key": pa.array(keys, pa.uint64())}),
            os.path.join(final_dir, "url_seen.parquet"),
        )
    seen_total = seen.total()

    # permanent failures = failure rows never absorbed by the requeue round
    fail_tbl = _failure_rows(rounds_dir, state["failure_rounds"])
    pq.write_table(fail_tbl, os.path.join(final_dir, "failures.parquet"))

    # deferred rows of the FINAL round are unprocessed work iff the loop
    # exited early (limit/max_rounds); a quiescence exit consumed them
    # (a round with deferred > 0 always yields a next-round estimate > 0)
    per_round = state["per_round"]
    summary = CrawlSummary(
        rounds=state["round"],
        fetched_ok=state["fetched_ok"],
        fetched_fail=state["fetched_fail"],
        items=state["items"],
        seen_total=seen_total,
        deferred_final=per_round[-1]["deferred"] if per_round else 0,
        failures_final=fail_tbl.num_rows,
        workdir=cfg.workdir,
        per_round=per_round,
    )
    with open(os.path.join(final_dir, "summary.json"), "w") as f:
        json.dump(
            {k: v for k, v in summary.__dict__.items() if k != "per_round"},
            f,
            indent=2,
        )
    return summary


# --- output readers (projections of the per-round result lineage) -----------


def _round_dirs(workdir: str) -> list[tuple[int, str]]:
    import glob
    import re

    out = []
    for d in glob.glob(os.path.join(workdir, "rounds", "round_*")):
        m = re.search(r"round_(\d+)$", d)
        if m and os.path.exists(os.path.join(d, "_COMPLETE.json")):
            out.append((int(m.group(1)), d))
    # numeric, not lexicographic: 'round_100000' (6 digits past the %05d
    # padding) must sort after 'round_99999'
    out.sort()
    return out


def _run_clock(workdir: str) -> tuple[float, float]:
    """(round_virtual_sec, virtual_t0_sec) the workdir was crawled with."""
    cfg_path = os.path.join(workdir, "run_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            c = json.load(f)
        return (float(c.get("round_virtual_sec", 16.0)),
                float(c.get("virtual_t0_sec", 0.0)))
    return 16.0, 0.0


def crawl_log_table(workdir: str) -> pa.Table:
    """All rounds crawl_log in deterministic crawl order (driver-side;
    use crawl_log_dataset for the streaming path at scale)."""
    import pyarrow.compute as pc

    from ..model import CRAWL_LOG_SCHEMA

    slim = ["url", "host", "priority", "seq", "depth", "ok", "status", "attempts"]
    parts = []
    for r, d in _round_dirs(workdir):
        t = _read_table(os.path.join(d, "result"), RESULT_SCHEMA, columns=slim)
        if t.num_rows:
            parts.append(_result_to_crawl_log(t, r))
    if not parts:
        return CRAWL_LOG_SCHEMA.empty_table()
    t = pa.concat_tables(parts)
    order = pc.sort_indices(
        t,
        sort_keys=[("round", "ascending"), ("priority", "descending"), ("seq", "ascending")],
    )
    return t.take(order)


def items_table(workdir: str) -> pa.Table:
    from ..model import ITEMS_SCHEMA

    rvs, t0 = _run_clock(workdir)
    parts = []
    for r, d in _round_dirs(workdir):
        t = _read_table(os.path.join(d, "result"), RESULT_SCHEMA,
                        columns=_ITEMS_COLUMNS)
        if t.num_rows:
            it = _result_to_items(t, r, rvs, t0)
            if it.num_rows:
                parts.append(it)
    if not parts:
        return ITEMS_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def items_dataset(workdir: str) -> rd.Dataset:
    """Streaming items projection over all rounds (scale path)."""
    rvs, t0 = _run_clock(workdir)
    dss = []
    for r, d in _round_dirs(workdir):
        res_dir = os.path.join(d, "result")
        if _has_files(res_dir):
            dss.append(
                rd.read_parquet(res_dir, columns=_ITEMS_COLUMNS).map_batches(
                    lambda t, _r=r, _v=rvs, _t0=t0: _result_to_items(t, _r, _v, _t0),
                    batch_format="pyarrow",
                )
            )
    if not dss:
        from ..model import ITEMS_SCHEMA

        return rd.from_arrow(ITEMS_SCHEMA.empty_table())
    ds = dss[0]
    for other in dss[1:]:
        ds = ds.union(other)
    return ds


def url_seen_keys(workdir: str) -> np.ndarray:
    p = os.path.join(workdir, "final", "url_seen.parquet")
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"{p}: the exact url_seen dump is written only for "
            "seen_mode='exact' runs (a cuckoo filter cannot enumerate keys)"
        )
    t = pq.read_table(p)
    return t["key"].to_numpy()


def crawl_metrics(workdir: str) -> pa.Table:
    """Per-round metrics table from the checkpoint lineage (the reference's
    run report, app.go:515-563 / collector.go:180-188): round, scheduled,
    ok, fail, items, deferred, new_seen and running totals."""
    rows = []
    for _r, d in _round_dirs(workdir):
        with open(os.path.join(d, "_COMPLETE.json")) as f:
            rows.append(json.load(f))
    if not rows:
        return pa.table({"round": pa.array([], pa.int32())})
    cols = ["round", "scheduled", "ok", "fail", "items", "deferred", "new_seen",
            "fetched_ok_total", "fetched_fail_total", "items_total"]
    return pa.table({c: pa.array([r[c] for r in rows]) for c in cols})


def crawl_lineage(workdir: str) -> pa.Table:
    """Per-partition lineage audit — the checkpoint-integrity half of the
    run report (north rule: "resumable from checkpoint with per-partition
    lineage + metrics"). For every completed round: the ``_COMPLETE.json``
    manifest counts, the ACTUAL parquet row counts of its ``result`` and
    ``seen_delta`` partitions (footer metadata only — no data is read),
    and three verdicts:

    - ``counts_ok``: result rows == scheduled and seen_delta rows ==
      new_seen (the manifest describes exactly what the partition holds);
    - ``chain_ok``: running totals equal the previous round's totals plus
      this round's deltas (the lineage chain has no gap — the property
      resume relies on to skip finished rounds);
    - ``final_ok`` (last row): ``final/summary.json`` agrees with the
      chained totals (set on every row for schema stability; asserted on
      the last).

    Driver cost is bounded by rounds x files-per-round footer reads —
    the audit never touches page data, so it runs at any corpus scale."""

    def _dir_rows(d: str) -> int:
        """Row count from metadata only: parquet footers for result
        partitions, npy headers for the per-shard seen-delta key dumps."""
        if not os.path.isdir(d):
            return 0
        n = 0
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if name.endswith(".parquet"):
                n += pq.ParquetFile(p).metadata.num_rows
            elif name.endswith(".npy"):
                n += int(np.load(p, mmap_mode="r").shape[0])
        return n

    rows = []
    prev = {"fetched_ok_total": 0, "fetched_fail_total": 0,
            "items_total": 0}
    for r, d in _round_dirs(workdir):
        with open(os.path.join(d, "_COMPLETE.json")) as f:
            m = json.load(f)
        result_rows = _dir_rows(os.path.join(d, "result"))
        seen_rows = _dir_rows(os.path.join(d, "seen_delta"))
        counts_ok = (result_rows == m["scheduled"]
                     and seen_rows == m["new_seen"]
                     and m["ok"] + m["fail"] == m["scheduled"])
        chain_ok = (
            m["fetched_ok_total"] == prev["fetched_ok_total"] + m["ok"]
            and m["fetched_fail_total"]
            == prev["fetched_fail_total"] + m["fail"]
            and m["items_total"] == prev["items_total"] + m["items"])
        prev = m
        rows.append((m["round"], m["scheduled"], m["ok"], m["fail"],
                     m["items"], m["new_seen"], result_rows, seen_rows,
                     int(counts_ok), int(chain_ok)))
    final_ok = 0
    fpath = os.path.join(workdir, "final", "summary.json")
    if rows and os.path.exists(fpath):
        with open(fpath) as f:
            s = json.load(f)
        final_ok = int(s.get("fetched_ok") == prev["fetched_ok_total"]
                       and s.get("items") == prev["items_total"]
                       and s.get("rounds") == len(rows))
    cols = list(zip(*rows)) if rows else [[]] * 10
    names = ["round", "scheduled", "ok", "fail", "items", "new_seen",
             "result_rows", "seen_delta_rows", "counts_ok", "chain_ok"]
    t = pa.table({n: pa.array(list(c), pa.int64())
                  for n, c in zip(names, cols)})
    return t.append_column(
        "final_ok", pa.array([final_ok] * t.num_rows, pa.int64()))


def crawl_lineage_check(workdir: str) -> pa.Table:
    """One-row assertion fold of :func:`crawl_lineage` — (has_rounds,
    counts_all_ok, chain_all_ok, final_ok), each 1 on a healthy run.
    Gate-oracled as a static SQL assertion (round-4 advice item: the
    per-round lineage table was rows-only, so a broken manifest chain
    could only fail the unit test, not CORRECTNESS)."""
    t = crawl_lineage(workdir)
    n = t.num_rows

    def allcol(c: str) -> int:
        return int(n > 0 and
                   all(v == 1 for v in t[c].to_pylist()))

    return pa.table({
        "has_rounds": pa.array([int(n > 0)], pa.int64()),
        "counts_all_ok": pa.array([allcol("counts_ok")], pa.int64()),
        "chain_all_ok": pa.array([allcol("chain_ok")], pa.int64()),
        "final_ok": pa.array([allcol("final_ok")], pa.int64()),
    })


def politeness_audit(workdir: str, corpus_dir: str) -> pa.Table:
    """Politeness-compliance audit over the engine's OWN crawl output:
    re-derives every host's robots policy (disallow prefixes +
    crawl-delay cap) straight from the corpus robots bodies and replays
    the two rules against every result row of every round —

    - budget: per (round, host) attempts <= cap = max(1,
      floor(round_virtual_sec / crawl_delay)) (the HostBudgetShard
      admission rule, state/hostbudget.py);
    - robots: every fetched url's path allowed under its host's
      disallow prefixes.

    Emits the statically-assertable verdict row (n_over_cap = 0,
    n_disallowed = 0, audit_ok = 1), so a budget or robots regression
    fails CORRECTNESS, not just the conformance suite.

    Scale shape: result partitions stream (slim url/host columns,
    footer-pruned); the policy is a broadcast ray.put (robots bodies
    are host-bounded); per-batch partials fold to (round, host) counts
    — the exchange is bounded by rounds x hosts, not pages."""
    from urllib.parse import urlsplit

    from ..state.hostpolicy import HostPolicy

    rvs, _t0 = _run_clock(workdir)
    policy = HostPolicy.from_robots_parquet(
        os.path.join(corpus_dir, "robots.parquet"))
    pol_ref = ray.put(policy)

    dss = []
    for r, d in _round_dirs(workdir):
        res_dir = os.path.join(d, "result")
        if _has_files(res_dir):
            dss.append(rd.read_parquet(res_dir, columns=["url", "host"])
                       .map_batches(
                lambda t, _r=r: t.append_column(
                    "round", pa.array(np.full(t.num_rows, _r, np.int64))),
                batch_format="pyarrow"))
    if not dss:
        return pa.table({"n_over_cap": pa.array([0], pa.int64()),
                         "n_disallowed": pa.array([0], pa.int64()),
                         "audit_ok": pa.array([0], pa.int64())})
    ds = dss[0]
    for other in dss[1:]:
        ds = ds.union(other)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        pol: HostPolicy = ray.get(pol_ref)
        hosts = t["host"].to_pylist()
        urls = t["url"].to_pylist()
        rounds = t["round"].to_numpy(zero_copy_only=False)
        bad = sum(0 if pol.allowed(h, urlsplit(u).path or "/") else 1
                  for h, u in zip(hosts, urls))
        df = pd.DataFrame({"round": rounds, "host": hosts})
        cnt = (df.groupby(["round", "host"], sort=False).size()
               .reset_index(name="n"))
        return pa.table({
            "round": pa.array(cnt["round"].astype("int64")),
            "host": pa.array(cnt["host"], pa.string()),
            "n": pa.array(cnt["n"].astype("int64")),
            # this batch's disallowed count rides on row 0 of the partial
            "bad_total": pa.array(
                [bad] + [0] * (len(cnt) - 1) if len(cnt) else [],
                pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[tuple, int] = {}
    n_disallowed = 0
    for row in parts:
        agg[(int(row["round"]), row["host"])] = \
            agg.get((int(row["round"]), row["host"]), 0) + int(row["n"])
        n_disallowed += int(row["bad_total"])
    n_over = 0
    for (r, h), n in agg.items():
        # the engine's own cap rule (Crawl-delay: 0 = uncapped)
        if n > policy.cap_per_round(h, rvs):
            n_over += 1
    ok = int(n_over == 0 and n_disallowed == 0 and len(agg) > 0)
    return pa.table({
        "n_over_cap": pa.array([n_over], pa.int64()),
        "n_disallowed": pa.array([n_disallowed], pa.int64()),
        "audit_ok": pa.array([ok], pa.int64()),
    })


def cuckoo_fpr_check(sf_dir: str, num_shards: int = 4,
                     n_keys: int = 200_000,
                     probes: int = 262_144) -> pa.Table:
    """Accuracy gate on the frontier's OWN approximate seen-set — the
    cuckoo-filter twin of textdata.bloom_fpr_check, run through the real
    ``ShardedSeen`` actor pool (mode='cuckoo', the 10^10-frontier memory
    path, state/cuckoo.py):

    - ``member_miss`` must be 0: a cuckoo filter never false-negatives
      (the kick chain conserves occupancy and exhausted chains stash the
      victim, cuckoo.py:52-58) — checked over every inserted key;
    - ``dup_claim`` must be 0: re-inserting an inserted key must never
      report was_new (the dedup soundness the crawl relies on);
    - ``bound_ok``: false positives on ``probes`` disjoint keys within
      4x the Fan et al. expectation 2b/2^f (b = 4 slots, f = 16-bit
      fingerprints), in exact integer arithmetic:
      fp_count * 2^16 <= 4 * probes * 8.

    Scale derives n_keys synthetic url-identity keys with the engine's
    own C-level hasher (hash64_array over "cu:{i}"), inserted in
    frontier-sized batches across the shard actor pool — the exact
    insert/contains RPC path the crawl uses."""
    from ..functions.hashing import hash64_array

    del sf_dir  # scale-independent: the filter, not the corpus, is under test
    seen = ShardedSeen(num_shards=num_shards, mode="cuckoo",
                       capacity_per_shard=max(1 << 14,
                                              n_keys // num_shards * 2))
    keys = hash64_array([f"cu:{i}" for i in range(n_keys)])
    dup_claim = 0
    for lo in range(0, n_keys, 65_536):
        batch = keys[lo:lo + 65_536]
        seen.insert_if_absent(batch)
        again = seen.insert_if_absent(batch)
        dup_claim += int(again.sum())
    member_miss = 0
    for lo in range(0, n_keys, 65_536):
        member_miss += int((~seen.contains(keys[lo:lo + 65_536])).sum())
    probe_keys = hash64_array([f"pr:{j}" for j in range(probes)])
    # the probe space may collide with member keys in hash space (both
    # are uint64 draws); count only probes whose key is NOT a member key
    member_set = set(keys.tolist())
    mask = np.array([k not in member_set for k in probe_keys.tolist()])
    hits = seen.contains(probe_keys)
    fp_count = int((hits & mask).sum())
    n_probes = int(mask.sum())
    bound_ok = int(fp_count * (1 << 16) <= 4 * n_probes * 8)
    return pa.table({
        "member_miss": pa.array([member_miss], pa.int64()),
        "dup_claim": pa.array([dup_claim], pa.int64()),
        "bound_ok": pa.array([bound_ok], pa.int64()),
    })
