"""Relational operator breadth over the TPC-H-ish test tables.

These pipelines exist to demonstrate the engine's general Ray-Data operator
coverage (groupby/aggregate, sort/limit, broadcast join, windowed aggregate,
distinct) with DuckDB-verifiable semantics. Monetary sums use an
integer-cents trick (``floor(x*100 + 0.5)``, = round-half-away for positive
x) so double summation order can never flip the value hash.

Scale notes per pipeline are in each docstring.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def _cents(arr: np.ndarray) -> np.ndarray:
    return np.floor(arr * 100.0 + 0.5).astype(np.int64)


def q1_pricing(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q1-style pricing summary.

    read_parquet with column pruning -> vectorized cents derivation in
    map_batches -> multi-key groupby aggregate (the only shuffle) -> sort.
    """
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def derive(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        # l_quantity is integral-valued; sum it as int64 on both sides so
        # the driver's dtype-sensitive value hash can never diverge.
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        t = t.set_column(
            t.schema.get_field_index("l_quantity"),
            "l_quantity",
            pa.array(np.floor(qty + 0.5).astype(np.int64)),
        )
        t = t.append_column("base_cents", pa.array(_cents(price)))
        t = t.append_column("disc_cents", pa.array(_cents(price * (1.0 - disc))))
        return t.drop_columns(["l_extendedprice", "l_discount"])

    out = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="n"),
        )
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def top_orders(sf_dir: str) -> rd.Dataset:
    """Top-10 orders by total price (sort + limit; distributed top-k)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    )

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "price_cents": pa.array(
                    _cents(t["o_totalprice"].to_numpy(zero_copy_only=False))
                ),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .sort([("price_cents"), ("o_orderkey")], descending=[True, False])
        .limit(10)
    )


def revenue_by_nation(sf_dir: str) -> rd.Dataset:
    """orders ⋈ customer ⋈ nation revenue rollup.

    Both dimension sides are broadcast once via ``ray.put`` (customer is a
    dimension at these SFs; at TB scale switch the customer side to a
    bucketed hash join — see SURVEY.md §2.4 J-table). The fact scan
    pre-aggregates per batch before the tiny final groupby.
    """
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    # sorted custkey -> nationkey arrays for C-level searchsorted lookup,
    # plus a dense nationkey -> name array (nation keys are small ints)
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(ck)
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False)
    names = np.empty(int(nk.max()) + 1, dtype=object)
    names[nk] = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    lookup_ref = ray.put((ck[order], cn[order], names))

    def partial(t: pa.Table) -> pa.Table:
        ck_sorted, cn_sorted, name_arr = ray.get(lookup_ref)
        custkeys = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = _cents(t["o_totalprice"].to_numpy(zero_copy_only=False))
        natkeys = cn_sorted[np.searchsorted(ck_sorted, custkeys)]
        batch = pa.table(
            {
                "n_name": pa.array(name_arr[natkeys], pa.string()),
                "revenue_cents": pa.array(cents, pa.int64()),
                "n_orders": pa.array(np.ones(len(cents), dtype=np.int64)),
            }
        )
        # per-batch combiner: the groupby shuffle moves <=25 rows per batch
        return batch.group_by("n_name").aggregate(
            [("revenue_cents", "sum"), ("n_orders", "sum")]
        ).rename_columns(["n_name", "revenue_cents", "n_orders"])

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .sort("n_name")
    )


def events_window(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour windowed aggregate per event_type.

    Ray Data has no event-time windows (SURVEY.md §2.8); a tumbling window
    over a bounded log IS a groupby on the floored timestamp — fully
    shuffle-parallel, no per-key ordering assumption needed.
    """
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def derive(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        win = (epoch // 3600) * 3600
        return pa.table(
            {
                "window_start": pa.array(win, pa.int64()),
                "event_type": t["event_type"],
                "value_cents": pa.array(
                    _cents(t["value"].to_numpy(zero_copy_only=False))
                ),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="sum_value_cents"))
        .sort(["window_start", "event_type"])
    )


def distinct_users(sf_dir: str) -> rd.Dataset:
    """Exact count-distinct users per event_type.

    Two-level: per-batch local dedup (combiner) -> groupby both keys ->
    count per event_type. The first shuffle moves only the locally
    deduped pairs.
    """
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )

    def local_unique(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    pairs = (
        ds.map_batches(local_unique, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c", "user_id"])
    )
    return (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .sort("event_type")
    )


def filter_revenue(sf_dir: str) -> pa.Table:
    """Predicate pushdown + vectorized projection + global aggregate."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") < pa.scalar(np.datetime64("1995-06-01", "us"))),
    )

    def partial(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = _cents(price * (1.0 - disc))
        return pa.table(
            {
                "n": pa.array([len(rev)], pa.int64()),
                "revenue_cents": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    rev = sum(p["revenue_cents"] for p in parts)
    return pa.table({"n": pa.array([n], pa.int64()),
                     "revenue_cents": pa.array([rev], pa.int64())})


def sessionize_events(sf_dir: str, gap_sec: int = 1800) -> rd.Dataset:
    """Gap-based sessionization per user (streaming-shaped op, SURVEY.md
    §2.8 mapping): events are an ordered, partitioned log — partition by a
    coarse user bucket, sort within the group, and count gap>30min session
    starts with vectorized diffs. One shuffle on the bucket key; the inner
    per-user grouping is a C-level pandas groupby."""
    import pandas as pd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "part", pa.array((uid % 64).astype(np.int32))
        )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        epoch = g["ts"].astype("int64") // 1_000_000
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = epoch.diff() > gap_sec
        new_sess = (new_user | gap).astype("int64")
        out = (
            pd.DataFrame(
                {"user_id": g["user_id"].values, "new_sess": new_sess.values}
            )
            .groupby("user_id", sort=True)
            .agg(n_sessions=("new_sess", "sum"), n_events=("new_sess", "size"))
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions, batch_format="pandas")
        .sort("user_id")
    )


def top_orders_per_priority(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Top-k orders by price within each order priority (windowed top-k):
    per-batch local top-k (combiner) -> tiny per-group merge."""
    import pandas as pd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def local(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_pylist(),
                "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False),
                "price_cents": _cents(t["o_totalprice"].to_numpy(zero_copy_only=False)),
            }
        )
        df = df.sort_values(
            ["o_orderpriority", "price_cents", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        return pa.Table.from_pandas(
            df.groupby("o_orderpriority", sort=False).head(k),
            preserve_index=False,
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["price_cents", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(merge, batch_format="pandas")
        .sort(["o_orderpriority", "rank"])
    )


def events_asof_join(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click") -> rd.Dataset:
    """AS-OF join: each purchase attributed to the user's most recent click
    at-or-before it (the canonical attribution query; SURVEY.md §2.4 gap —
    Ray Data has no asof join operator).

    Expressed as ONE shuffle on a coarse user bucket; inside each coarse
    partition both sides are ordered once and matched by
    ``pandas.merge_asof`` (C-level backward search, grouped ``by=user_id``)
    — no per-user map_groups, no global sort. Partitioning assumption:
    a user's events co-reside in one partition (user_id is the bucket key),
    the same invariant the sessionizer relies on. Unmatched purchases keep
    -1 sentinel prior columns (left join). Skewed users concentrate in a bucket;
    at hot-key scale, split the right side per user by time range and
    route each left row to its containing range (documented, not needed at
    these SFs).
    """
    import pandas as pd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )

    def bucketize(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array([left_type, right_type]))
        t = t.filter(keep)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array((uid % 64).astype(np.int32)))

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values(
            ["ts", "event_id"], kind="mergesort")
        right = g[g["event_type"] == right_type].sort_values(
            ["ts", "event_id"], kind="mergesort")
        # Explicit tie-break among right rows with identical (user_id, ts):
        # keep max event_id. DuckDB's ASOF pick among equal timestamps is
        # unspecified, so the oracle SQL pre-aggregates the same way — the
        # rule is STATED on both sides rather than inherited from sort order.
        right = right.drop_duplicates(subset=["user_id", "ts"], keep="last")
        # carry the right-side timestamp under its own name (merge_asof
        # keeps only the left 'on' column)
        right = right.assign(ts_r_us=right["ts"].astype("int64"))
        m = pd.merge_asof(
            left, right, on="ts", by="user_id",
            suffixes=("", "_prior"), direction="backward",
        )
        ts_us = left["ts"].astype("int64").values
        # unmatched rows use a -1 sentinel instead of NULL: nullable int
        # columns round-trip driver-side as float64 and the dtype-sensitive
        # value hash would depend on the null-handling path (round-1 lesson)
        prior_id = m["event_id_prior"].fillna(-1).astype("int64").values
        gap_us = np.where(
            m["ts_r_us"].notna().values,
            ts_us - m["ts_r_us"].fillna(0).astype("int64").values,
            -1,
        ).astype("int64")
        return pd.DataFrame(
            {
                "event_id": left["event_id"].astype("int64").values,
                "user_id": left["user_id"].astype("int64").values,
                "ts_us": ts_us,
                "prior_event_id": prior_id,
                "gap_us": gap_us,
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("part")
        .map_groups(asof, batch_format="pandas")
        .sort("event_id")
    )


def events_sliding_window(sf_dir: str, size_sec: int = 7200,
                          hop_sec: int = 3600) -> rd.Dataset:
    """Hopping (sliding) windowed aggregate: 2-hour windows every hour —
    each event lands in size/hop windows (SURVEY.md §2.8; the tumbling
    variant is events_window). Window replication happens batch-locally
    (one C-level repeat per batch), then ONE groupby on
    (window_start, event_type); the shuffle carries (int64, small-string,
    int64-cents) rows replicated size/hop times, never the raw log.
    """
    assert size_sec % hop_sec == 0, "size must be a multiple of hop"
    k = size_sec // hop_sec
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"],
    )

    def derive(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        last = (epoch // hop_sec) * hop_sec   # newest window containing e
        n = len(epoch)
        # windows last, last-hop, ..., last-(k-1)*hop  (all w with
        # w <= e < w+size, stepped by hop)
        wins = np.repeat(last, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_sec, n
        )
        cents = _cents(t["value"].to_numpy(zero_copy_only=False))
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        return pa.table(
            {
                "window_start": pa.array(wins, pa.int64()),
                "event_type": et.take(idx),
                "value_cents": pa.array(np.repeat(cents, k)),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Count(alias_name="n"),
                   Sum("value_cents", alias_name="sum_value_cents"))
        .sort(["window_start", "event_type"])
    )


def value_quantiles(sf_dir: str,
                    qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)) -> pa.Table:
    """EXACT distributed quantiles of events.value via a mergeable
    integer-cents histogram (SURVEY.md §2.5 breadth; the sketch-family
    sibling of hll_distinct_users, but exact).

    Scale design: each batch emits its (distinct cents, count) partial —
    C-level ``np.unique`` — and ONE groupby merges partials; the shuffle
    carries histogram rows (two int64s per distinct value), never events.
    The merged histogram is bounded by the value domain (price-like fields
    have ~1e5-1e6 distinct cents regardless of row count), so collecting it
    driver-side is a small-result materialization, not a dataset one; for a
    genuinely unbounded domain swap in fixed-width bins or a t-digest and
    lose exactness. Quantile semantics: value at rank ``ceil(q*n)``
    (1-indexed, "discrete/lower" quantile) — chosen so the SQL oracle can
    state the identical rule with ROW_NUMBER.
    """
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"].to_numpy(zero_copy_only=False))
        u, c = np.unique(cents, return_counts=True)
        return pa.table({"value_cents": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value_cents")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort("value_cents")
        .take_all()
    )
    vals = np.array([r["value_cents"] for r in hist], dtype=np.int64)
    cum = np.cumsum(np.array([r["cnt"] for r in hist], dtype=np.int64))
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = int(np.ceil(q * n))
        out_q.append(float(q))
        out_v.append(int(vals[np.searchsorted(cum, rank)]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value_cents": pa.array(out_v, pa.int64())})


def events_prop_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured extraction: parse the ``props`` JSON column, pull the
    ``k`` property, aggregate per event type (the scraper-output shape — the
    reference's items are exactly such JSON blobs, SURVEY.md §2.2 M6).

    The JSON never crosses a stage boundary: parse happens batch-local
    (stdlib json in a tight loop — swap for simdjson/orjson where
    available; the contract is per-batch columnar out) and the shuffle
    carries only (event_type, int64) rows. Missing keys map to -1 on both
    sides (COALESCE in the oracle) so nullability can't skew the hash.
    """
    import json

    from ray.data.aggregate import Max, Min

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "props"])

    def derive(t: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (json.loads(p).get("k", -1) if p else -1
             for p in t["props"].to_pylist()),
            dtype=np.int64, count=t.num_rows,
        )
        return pa.table({"event_type": t["event_type"],
                         "k": pa.array(ks, pa.int64())})

    return (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"),
                   Sum("k", alias_name="sum_k"),
                   Min("k", alias_name="min_k"),
                   Max("k", alias_name="max_k"))
        .sort("event_type")
    )


def event_funnel(sf_dir: str, window_hours: int = 24,
                 num_buckets: int = 64) -> rd.Dataset:
    """Conversion funnel: per user, the earliest view → click → purchase
    chain where each next stage lands within ``window_hours`` of the one
    before (the product-analytics staple; a stateful ordered-sequence
    operator Ray Data has no primitive for).

    Shape: ONE user-bucket shuffle of slim (user, ts_us, stage_code) int64
    rows — only the three funnel event types leave the scan, plus one
    pre-reduced presence row per (batch, user) so stage-0 users survive.
    Inside each coarse partition the chain resolves with three C-level
    pandas groupby-min/merge rounds (no per-user map_groups). The
    partitioning assumption is the sessionizer's: one user's events
    co-reside in one bucket. Missing stages carry -1 sentinels, never
    NULLs (the dtype-hash lesson, see events_asof_join).
    """
    import pandas as pd

    stages = ("view", "click", "purchase")
    win_us = np.int64(window_hours) * 3_600_000_000
    nb = np.int64(num_buckets)

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        code = np.full(len(uid), -1, np.int64)
        for i, s in enumerate(stages):
            code[et == s] = i
        keep = code >= 0
        u_present = np.unique(uid)
        out_uid = np.concatenate([uid[keep], u_present])
        out_ts = np.concatenate([ts_us[keep],
                                 np.zeros(len(u_present), np.int64)])
        out_code = np.concatenate([code[keep],
                                   np.full(len(u_present), -1, np.int64)])
        return pa.table({
            "part": pa.array(out_uid % nb),
            "user_id": pa.array(out_uid, pa.int64()),
            "ts_us": pa.array(out_ts, pa.int64()),
            "code": pa.array(out_code, pa.int64()),
        })

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "t_view_us": pd.Series([], dtype="int64"),
                "t_click_us": pd.Series([], dtype="int64"),
                "t_purchase_us": pd.Series([], dtype="int64"),
                "stage": pd.Series([], dtype="int64"),
            })
        users = np.unique(g["user_id"].to_numpy())
        prev = None  # Series: user -> prior-stage ts
        stage_ts = []
        for i in range(len(stages)):
            rows = g[g["code"] == i]
            if prev is None:
                cur = rows.groupby("user_id")["ts_us"].min()
            else:
                m = rows.merge(prev.rename("t_prev"), left_on="user_id",
                               right_index=True)
                m = m[(m["ts_us"] > m["t_prev"])
                      & (m["ts_us"] <= m["t_prev"] + win_us)]
                cur = m.groupby("user_id")["ts_us"].min()
            stage_ts.append(cur)
            prev = cur
        cols, stage = {}, np.zeros(len(users), np.int64)
        for i, name in enumerate(("t_view_us", "t_click_us",
                                  "t_purchase_us")):
            v = stage_ts[i].reindex(users)
            hit = v.notna().to_numpy()
            stage[hit] = i + 1
            cols[name] = v.fillna(-1).astype("int64").to_numpy()
        return pd.DataFrame({
            "user_id": users,
            **cols,
            "stage": stage,
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "event_type"])
    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("part")
        .map_groups(chain, batch_format="pandas")
    )


def revenue_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP (order year, priority): finest-level totals plus
    per-year and grand-total super-aggregate rows (SURVEY.md §2.5 breadth —
    the multi-granularity report shape).

    Scale: ONE coarse shuffle of pre-combined (year, priority, cents, n)
    partials — per batch a C-level pandas groupby collapses rows to the
    tiny key space before anything moves; the rollup's coarser levels
    derive from the finest aggregate (35-ish rows) driver-side, never
    re-reading the data. NULL group markers are sentinels (-1 / 'ALL')
    on both sides so nullability can't skew the driver's value hash.
    """
    import pandas as pd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        year = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False)
        cents = _cents(t["o_totalprice"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "o_year": year.astype(np.int64),
            "o_orderpriority": t["o_orderpriority"].to_pandas(),
            "cents": cents,
        })
        agg = (df.groupby(["o_year", "o_orderpriority"], sort=False)
               .agg(revenue_cents=("cents", "sum"), n_orders=("cents", "size"))
               .reset_index())
        agg["n_orders"] = agg["n_orders"].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_year", "o_orderpriority"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                   Sum("n_orders", alias_name="n_orders"))
        .take_all()  # years x priorities — a few dozen rows by construction
    )
    f = pd.DataFrame(finest)
    per_year = (f.groupby("o_year", as_index=False)
                [["revenue_cents", "n_orders"]].sum())
    per_year["o_orderpriority"] = "ALL"
    total = pd.DataFrame({
        "o_year": [np.int64(-1)],
        "o_orderpriority": ["ALL"],
        "revenue_cents": [f["revenue_cents"].sum()],
        "n_orders": [f["n_orders"].sum()],
    })
    cols = ["o_year", "o_orderpriority", "revenue_cents", "n_orders"]
    out = pd.concat([f[cols], per_year[cols], total[cols]],
                    ignore_index=True)
    for c in ("o_year", "revenue_cents", "n_orders"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def time_band_join(sf_dir: str, band_sec: int = 1800) -> rd.Dataset:
    """Banded time-range join WITHOUT an equality key: for every purchase,
    count clicks (any user) in the preceding ``band_sec`` window — the
    classic interval-bucketed distributed range join (SURVEY.md §2.4 gap;
    Ray Data has no range join, and a naive theta-join is O(n²) row
    blowup).

    Shape: time tumbles into buckets exactly ``band_sec`` wide; each click
    replicates to its own bucket and the next (a purchase's window spans
    at most two buckets), purchases route to their bucket only — so the
    single shuffle carries ≤ 2 slim int64 rows per click and 1 per
    purchase, and each coarse time partition resolves its counts with two
    C-level searchsorted calls. Replication factor is window/bucket = 1,
    by construction, independent of data volume; band width sets the
    partition count, so very long bands at scale split into
    (band // bucket_width)+1 replicas instead — same operator, documented
    knob.
    """
    import pandas as pd

    w_us = np.int64(band_sec) * 1_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        isp, isc = et == "purchase", et == "click"
        pb = ts_us[isp] // w_us
        cb = ts_us[isc] // w_us
        return pa.table({
            "bucket": pa.array(np.concatenate([pb, cb, cb + 1])),
            "side": pa.array(np.concatenate(
                [np.zeros(int(isp.sum()), np.int64),
                 np.ones(2 * int(isc.sum()), np.int64)])),
            "event_id": pa.array(np.concatenate(
                [eid[isp], eid[isc], eid[isc]]), pa.int64()),
            "ts_us": pa.array(np.concatenate(
                [ts_us[isp], ts_us[isc], ts_us[isc]]), pa.int64()),
        })

    def count_in_band(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_clicks": pd.Series([], dtype="int64")})
        p = g[g["side"] == 0]
        if len(p) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_clicks": pd.Series([], dtype="int64")})
        c = np.sort(g.loc[g["side"] == 1, "ts_us"].to_numpy())
        pts = p["ts_us"].to_numpy()
        lo = np.searchsorted(c, pts - w_us, side="left")
        hi = np.searchsorted(c, pts, side="left")  # strict: click.ts < p.ts
        return pd.DataFrame({
            "event_id": p["event_id"].to_numpy(),
            "n_clicks": (hi - lo).astype(np.int64),
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "event_type"])
    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_in_band, batch_format="pandas")
    )


def group_quantiles(sf_dir: str, qs: tuple = (0.5, 0.9)) -> pa.Table:
    """Per-language EXACT p50/p90 of document length — the grouped sibling
    of value_quantiles, same mergeable-histogram design: each batch emits
    (lang, length, count) partials via a C-level groupby, one shuffle
    merges histogram rows (bounded by langs × distinct lengths, not row
    count), and the per-group CDF walk happens on that small result.
    Quantile rule is value at rank ceil(q*n) (discrete/lower), identical
    double-precision ceil on both sides.
    """
    import pandas as pd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"lang": t["lang"].to_pandas(),
                           "v": t["n_chars"].to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["lang", "v"], sort=False).size()
               .rename("cnt").reset_index())
        agg["cnt"] = agg["cnt"].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    hist = pd.DataFrame(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()  # bounded by the (lang, length) domain, not by rows
    ).sort_values(["lang", "v"])
    rows = []
    for lang, gf in hist.groupby("lang", sort=True):
        vals = gf["v"].to_numpy(np.int64)
        cum = np.cumsum(gf["cnt"].to_numpy(np.int64))
        n = int(cum[-1])
        picks = [int(vals[np.searchsorted(cum, int(np.ceil(q * n)))])
                 for q in qs]
        rows.append((lang, picks[0], picks[1], n))
    return pa.table({
        "lang": pa.array([r[0] for r in rows], pa.string()),
        "p50_chars": pa.array([r[1] for r in rows], pa.int64()),
        "p90_chars": pa.array([r[2] for r in rows], pa.int64()),
        "n_docs": pa.array([r[3] for r in rows], pa.int64()),
    })


def cohort_retention(sf_dir: str, num_buckets: int = 64) -> rd.Dataset:
    """Cohort retention matrix: users grouped by first-active day, counted
    at each day offset they return (the activation/retention report —
    SURVEY.md §2.5 breadth over the events stream).

    Shape: ONE user-bucket shuffle of per-batch-deduped (user, day) int64
    rows; each coarse partition derives its users' cohort day and offsets
    with two C-level pandas passes and emits pre-combined
    (cohort_day, day_offset, n) partials; a tiny keyspace groupby folds
    them. A user's rows co-reside in one bucket (the sessionizer
    invariant), so the distinct-user count per cell needs no second
    dedup exchange. Days are integer epoch-days (epoch_us // 86.4e9) —
    no timezone/float anywhere.
    """
    import pandas as pd

    nb = np.int64(num_buckets)
    day_us = np.int64(86_400_000_000)

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // day_us
        df = pd.DataFrame({"user_id": uid, "day": day}).drop_duplicates()
        return pa.table({
            "part": pa.array(df["user_id"].to_numpy() % nb),
            "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
            "day": pa.array(df["day"].to_numpy(), pa.int64()),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "cohort_day": pd.Series([], dtype="int64"),
                "day_offset": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64"),
            })
        g = g.drop_duplicates(subset=["user_id", "day"])
        d0 = g.groupby("user_id")["day"].transform("min")
        out = (pd.DataFrame({"cohort_day": d0.to_numpy(),
                             "day_offset": (g["day"] - d0).to_numpy()})
               .groupby(["cohort_day", "day_offset"], sort=False)
               .size().rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype("int64")
        return out

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def events_anomaly(sf_dir: str, k_sigma: int = 2) -> pa.Table:
    """Hourly volume anomaly flags per event type — the streaming-QC shape
    (alert when an hour's count deviates from its type's mean by more
    than k·σ), stated WITHOUT floats: |x-μ| > k·σ over observed hours is
    the exact integer predicate

        (n·x - S)² > k² · (n·Q - S²)     (S = Σx, Q = Σx², n = hours)

    so both engines compare the same int64s (bound: n·Q < 2^63 — hours ×
    square of the hottest hour; rescale to coarser windows past that).

    Shape: per-batch (type, hour, cnt) combiners → ONE groupby over the
    bounded (type × hour) domain; the per-type moment fold runs on that
    small aggregate driver-side. Hours with zero events are absent by
    construction (observed-hours statistics — stated, not accidental).
    """
    import pandas as pd

    hour_us = np.int64(3_600_000_000)

    def partial(t: pa.Table) -> pa.Table:
        hour = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) \
            // hour_us
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "hour": hour})
        agg = (df.groupby(["event_type", "hour"], sort=False).size()
               .rename("cnt").reset_index())
        agg["cnt"] = agg["cnt"].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False) \
                 .replace_schema_metadata(None)

    counts = pd.DataFrame(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                        columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()  # bounded by types x hours, not events
    )
    out = []
    for et, g in counts.groupby("event_type", sort=True):
        x = g["cnt"].to_numpy(np.int64)
        n, s, q = len(x), int(x.sum()), int((x * x).sum())
        lhs = (n * x - s).astype(object) ** 2
        rhs = (k_sigma * k_sigma) * (n * q - s * s)
        flag = np.array([int(a > rhs) for a in lhs], np.int64)
        out.append(pd.DataFrame({
            "event_type": et, "hour": g["hour"].to_numpy(np.int64),
            "cnt": x, "is_anomaly": flag}))
    f = pd.concat(out, ignore_index=True)
    return pa.table({
        "event_type": pa.array(f["event_type"], pa.string()),
        "hour": pa.array(f["hour"].to_numpy(), pa.int64()),
        "cnt": pa.array(f["cnt"].to_numpy(), pa.int64()),
        "is_anomaly": pa.array(f["is_anomaly"].to_numpy(), pa.int64()),
    })


def order_totals_join(sf_dir: str, num_buckets: int = 64) -> rd.Dataset:
    """General LARGE × LARGE equijoin (orders ⋈ lineitem on orderkey) —
    the missing general-join demonstration next to the broadcast join
    (revenue_by_nation) and the pair/attr join (textdata). Ray 2.49's
    built-in Dataset.join is avoided for the aggregator-on-empty-partition
    bug documented at join_pairs_with_doc_attr; the shape here is the
    repo-standard union → coarse key-bucket groupby → C-level per-
    partition merge.

    Scale: lineitem pre-aggregates PER BATCH to (orderkey, cents, lines)
    partials before anything moves — the shuffle carries at most one row
    per (batch, orderkey) from the big side plus one slim row per order.
    Output verifies the denormalization invariant line-sum == o_totalprice
    per order (orders with no lineitem keep 0s via the left join).
    """
    import pandas as pd

    nb = np.int64(num_buckets)

    def li_partial(t: pa.Table) -> pa.Table:
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        df = (pd.DataFrame({"k": okey, "c": cents})
              .groupby("k", sort=False)
              .agg(c=("c", "sum"), n=("c", "size")).reset_index())
        m = len(df)
        return pa.table({
            "part": pa.array(df["k"].to_numpy() % nb),
            "okey": pa.array(df["k"].to_numpy(), pa.int64()),
            "cents": pa.array(df["c"].to_numpy(), pa.int64()),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "side": pa.array(np.zeros(m, np.int8)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = _cents(t["o_totalprice"].to_numpy(zero_copy_only=False))
        return pa.table({
            "part": pa.array(okey % nb),
            "okey": pa.array(okey, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "n": pa.array(np.zeros(len(okey), np.int64)),
            "side": pa.array(np.ones(len(okey), np.int8)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "o_orderkey": pd.Series([], dtype="int64"),
                "n_lines": pd.Series([], dtype="int64"),
                "line_sum_cents": pd.Series([], dtype="int64"),
                "o_total_cents": pd.Series([], dtype="int64"),
            })
        o = g[g["side"] == 1]
        li = (g[g["side"] == 0].groupby("okey", sort=False)
              .agg(c=("cents", "sum"), n=("n", "sum")))
        li = li.reindex(o["okey"].to_numpy())
        return pd.DataFrame({
            "o_orderkey": o["okey"].to_numpy(),
            "n_lines": li["n"].fillna(0).astype("int64").to_numpy(),
            "line_sum_cents": li["c"].fillna(0).astype("int64").to_numpy(),
            "o_total_cents": o["cents"].to_numpy(),
        })

    li = (rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                          columns=["l_orderkey", "l_extendedprice"])
          .map_batches(li_partial, batch_format="pyarrow"))
    orders = (rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                              columns=["o_orderkey", "o_totalprice"])
              .map_batches(o_rows, batch_format="pyarrow"))
    return (li.union(orders)
            .groupby("part")
            .map_groups(merge, batch_format="pandas"))


def customers_without_orders(sf_dir: str, num_buckets: int = 64,
                             status: str = "F") -> rd.Dataset:
    """Distributed ANTI-join: customers with no FINISHED order (NOT
    EXISTS against the status='F' subset — every customer has *some*
    order in this corpus, so the plain anti-join would be empty).

    Same union + key-bucket shape as order_totals_join; the order side is
    status-filtered at the scan and pre-deduped to distinct custkeys per
    batch, so the shuffle carries slim key rows bounded by distinct keys
    per batch, and each coarse partition resolves membership with one
    C-level isin.
    """
    import pandas as pd

    nb = np.int64(num_buckets)

    def cust_rows(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(ck % nb),
            "key": pa.array(ck, pa.int64()),
            "nation": t["c_nationkey"].cast(pa.int64()),
            "side": pa.array(np.zeros(len(ck), np.int8)),
        })

    def order_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], status))
        ck = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({
            "part": pa.array(ck % nb),
            "key": pa.array(ck, pa.int64()),
            "nation": pa.array(np.full(len(ck), -1, np.int64)),
            "side": pa.array(np.ones(len(ck), np.int8)),
        })

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "c_custkey": pd.Series([], dtype="int64"),
                "c_nationkey": pd.Series([], dtype="int64"),
            })
        cust = g[g["side"] == 0]
        seen = g.loc[g["side"] == 1, "key"]
        keep = cust[~cust["key"].isin(seen)]
        return pd.DataFrame({
            "c_custkey": keep["key"].to_numpy(),
            "c_nationkey": keep["nation"].to_numpy(),
        })

    cust = (rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                            columns=["c_custkey", "c_nationkey"])
            .map_batches(cust_rows, batch_format="pyarrow"))
    orders = (rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                              columns=["o_custkey", "o_orderstatus"])
              .map_batches(order_keys, batch_format="pyarrow"))
    return (cust.union(orders)
            .groupby("part")
            .map_groups(anti, batch_format="pandas"))


def events_moving_avg(sf_dir: str, window: int = 3) -> rd.Dataset:
    """Per-user ROWS-window aggregate (the window-function shape: SUM/COUNT
    OVER (PARTITION BY user ORDER BY ts, event_id ROWS window-1 PRECEDING))
    — the per-row moving-total feature build, kept integer-exact (window
    sum in cents + window row count; no float average crosses engines).

    Same partitioning contract as events_asof_join/sessionize: ONE coarse
    user-bucket shuffle, then a single mergesort + cythonized
    groupby-cumsum/shift pass per partition — no per-user map_groups, no
    global sort until the output projection.
    """
    import pandas as pd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def bucketize(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        t = t.append_column(
            "cents", pa.array(_cents(t["value"].to_numpy(zero_copy_only=False)))
        )
        return t.append_column("part", pa.array((uid % 64).astype(np.int32)))

    def window_sums(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cs = g.groupby("user_id", sort=False)["cents"].cumsum()
        pos = g.groupby("user_id", sort=False).cumcount() + 1
        prev = (g.assign(_cs=cs).groupby("user_id", sort=False)["_cs"]
                .shift(window).fillna(0).astype("int64"))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "ts_us": g["ts"].astype("int64").to_numpy(),
            "w_n": np.minimum(pos.to_numpy(), window).astype(np.int64),
            "w_sum_cents": (cs.to_numpy() - prev.to_numpy()).astype(np.int64),
        })

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("part")
        .map_groups(window_sums, batch_format="pandas")
        .sort("event_id")
    )
