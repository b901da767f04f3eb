"""Recurring-crawl timers on the virtual clock.

Reference parity (SURVEY.md ST7, spider/timer.go:10-163): pholcus spiders
can register named timers — a countdown ("sleep N, run again") or a daily
alarm ("run at HH:MM:SS") — and the engine re-arms the crawl on each fire.
Wall-clock sleeps are meaningless in a deterministic engine, so fire times
live on the same virtual clock as DownloadTime (model.virtual_download_time:
t = T0 + round * round_virtual_sec) and ``run_recurring`` re-arms real
crawls, chaining each tick's history into the next via
``CrawlConfig.inherit_from`` (SuccessInherit semantics — a re-fired crawl
skips everything the previous tick fetched).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

_DAY = 86_400.0


@dataclass(frozen=True)
class CountdownTimer:
    """Fire every ``every_sec`` of virtual time (timer.go 'countdown')."""

    every_sec: float

    def next_fire(self, now_sec: float) -> float:
        if self.every_sec <= 0:
            raise ValueError("every_sec must be positive")
        ticks = int(now_sec // self.every_sec) + 1
        return ticks * self.every_sec


@dataclass(frozen=True)
class DailyAlarm:
    """Fire at a fixed virtual time-of-day (timer.go 'alarm clock')."""

    hour: int = 0
    minute: int = 0
    second: int = 0

    def next_fire(self, now_sec: float) -> float:
        at = self.hour * 3600 + self.minute * 60 + self.second
        day = int(now_sec // _DAY)
        cand = day * _DAY + at
        return cand if cand > now_sec else cand + _DAY


def fire_schedule(timer, start_sec: float, ticks: int) -> list[float]:
    """The first ``ticks`` virtual fire times after ``start_sec``."""
    out: list[float] = []
    now = start_sec
    for _ in range(ticks):
        now = timer.next_fire(now)
        out.append(now)
    return out


def run_recurring(base_cfg, timer, ticks: int):
    """Re-arm the crawl ``ticks`` times (timer.go re-fire loop): tick i runs
    in ``<workdir>/tick_{i}`` at the timer's i-th virtual FIRE TIME,
    inheriting tick i-1's history, so an unchanged corpus yields zero
    refetches after the first tick and a grown corpus yields exactly the
    delta. Each tick's virtual clock starts at its fire time (keyins carry
    no clock, so the offset rides ``virtual_t0_sec``), making DownloadTime
    and cookie expiry advance across ticks the way timer.go's re-fired
    crawls advance in wall time. Returns the per-tick CrawlSummary list."""
    from dataclasses import replace

    from ..pipelines.crawl import run_crawl

    summaries = []
    prev_wd = base_cfg.inherit_from
    for i, fire_sec in enumerate(fire_schedule(timer, 0.0, ticks)):
        cfg = replace(
            base_cfg,
            workdir=os.path.join(base_cfg.workdir, f"tick_{i}"),
            inherit_from=prev_wd,
            virtual_t0_sec=fire_sec,
        )
        summaries.append(run_crawl(cfg))
        prev_wd = cfg.workdir
    return summaries
