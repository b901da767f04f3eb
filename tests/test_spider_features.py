"""Spider API breadth: multi-rule dispatch, keyin fan-out, temp state,
reloadable, file cells, sinks, cuckoo seen mode."""

import json
import os

import pyarrow.parquet as pq
import pytest

from pholcus_ray.pipelines.crawl import (
    CrawlConfig,
    crawl_log_table,
    items_table,
    run_crawl,
    url_seen_keys,
)
from pholcus_ray.pipelines.oracle import run_oracle
from pholcus_ray.spiderapi import Rule, RuleContext, Spider

RVS = 64.0


def _parse_list(ctx: RuleContext) -> None:
    """Entry rule: emit one summary item, follow links into the detail rule,
    carrying temp state (SetTemp/GetTemp parity) and the keyin."""
    links = ctx.links()
    ctx.output({"kind": "list", "n_links": len(links), "keyin": ctx.keyin})
    for i, (url, anchor) in enumerate(links[:4]):
        ctx.add_queue(url, rule="detail", priority=1,
                      temp={"from": ctx.url, "ordinal": i})


def _parse_detail(ctx: RuleContext) -> None:
    ctx.output(
        {
            "kind": "detail",
            "title": ctx.title(),
            "from": ctx.get_temp("from", ""),
            "ordinal": ctx.get_temp("ordinal", -1),
            "keyin": ctx.keyin,
        }
    )
    ctx.file_output(f"page_{ctx.url.rsplit('/', 1)[-1]}.txt", ctx.text.encode())


TWO_RULE_SPIDER = Spider(
    name="list_detail",
    rules={
        "page": Rule(parse=_parse_list, item_fields=["kind", "n_links", "keyin"]),
        "detail": Rule(parse=_parse_detail,
                       item_fields=["kind", "title", "from", "ordinal", "keyin"]),
    },
)


@pytest.fixture(scope="module")
def two_rule_run(ray_session, small_corpus, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("two_rule"))
    cfg = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd, spider=TWO_RULE_SPIDER,
        keyins=["alpha", "beta"], round_virtual_sec=RVS, num_shards=4,
    )
    summary = run_crawl(cfg)
    return wd, summary


def test_multi_rule_dispatch_and_temp(two_rule_run):
    wd, summary = two_rule_run
    items = items_table(wd).to_pandas()
    kinds = items["data"].map(lambda d: json.loads(d)["kind"])
    assert set(kinds) == {"list", "detail"}
    det = items[kinds == "detail"]
    # EVERY detail row must carry its enqueuer's temp (not just the first)
    for _, row in det.iterrows():
        d = json.loads(row["data"])
        assert d["from"].startswith("http://"), row["url"]
        assert d["ordinal"] >= 0, row["url"]
    assert set(det["rule"]) == {"detail"}


def test_multi_rule_items_match_oracle(two_rule_run, small_corpus):
    """Byte-identical ITEMS (not just the crawl log) for the two-rule +
    keyin spider — temp/keyin corruption in later fan-out rows would pass
    a log-only comparison."""
    import pandas as pd

    wd, _ = two_rule_run
    o = run_oracle(small_corpus, spider=TWO_RULE_SPIDER,
                   keyins=["alpha", "beta"], round_virtual_sec=RVS)
    eng = items_table(wd).to_pandas().sort_values(["url", "data"])
    orc = pd.DataFrame(o.items).sort_values(["url", "data"])
    assert len(eng) == len(orc)
    assert (eng["data"].values == orc["data"].values).all()


def test_keyin_fanout(two_rule_run):
    """Seeds replicate per keyin (spiderqueue.go:56-90 cross product); the
    dedup key ignores keyin, so each url is still fetched once — the keyin
    of the WINNING enqueue (lowest seq = first keyin) is carried."""
    wd, _ = two_rule_run
    items = items_table(wd).to_pandas()
    keyins = items["data"].map(lambda d: json.loads(d)["keyin"])
    assert set(keyins) == {"alpha"}
    log = crawl_log_table(wd).to_pandas()
    # a url is successfully fetched at most once; failed attempts may
    # legitimately re-appear on the failure-requeue round
    assert log[log["ok"]]["url"].is_unique


def test_oracle_matches_multi_rule_keyin(two_rule_run, small_corpus):
    wd, _ = two_rule_run
    import pandas as pd

    o = run_oracle(small_corpus, spider=TWO_RULE_SPIDER,
                   keyins=["alpha", "beta"], round_virtual_sec=RVS)
    elog = crawl_log_table(wd).to_pandas()
    olog = (
        pd.DataFrame(o.crawl_log)
        .sort_values(["round", "priority", "seq"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert len(elog) == len(olog)
    for c in elog.columns:
        assert (elog[c].values == olog[c].values).all(), c


def test_file_sink_and_csv_sink(two_rule_run, tmp_path):
    from pholcus_ray.sinks import write_files, write_items_csv, write_items_parquet

    wd, _ = two_rule_run
    out = str(tmp_path / "files")
    n = write_files(wd, out, namespace="ns")
    assert n > 0
    base = os.path.join(out, "ns")
    some = sorted(os.listdir(base))[0]
    assert open(os.path.join(base, some), "rb").read()  # real payload

    fields_by_rule = {r: TWO_RULE_SPIDER.rules[r].item_fields
                      for r in TWO_RULE_SPIDER.rules}
    csvs = write_items_csv(wd, str(tmp_path / "csv"), namespace="ns",
                           item_fields=fields_by_rule)
    assert len(csvs) == 2
    import csv as _csv

    for path in csvs:
        rule = os.path.basename(path).rsplit("__", 1)[1][:-4]
        with open(path, encoding="utf-8-sig") as f:
            rows = list(_csv.reader(f))
        # the EXACT header: ItemFields for THIS rule in order, then the
        # three default columns (output_csv.go parity)
        assert rows[0] == fields_by_rule[rule] + ["Url", "ParentUrl",
                                                  "DownloadTime"], path
        assert len(rows) > 1
        k = rows[0].index("kind")
        want_kind = {"page": "list", "detail": "detail"}[rule]
        assert all(r[k] == want_kind for r in rows[1:]), path

    n_rules = write_items_parquet(wd, str(tmp_path / "pq"))
    assert n_rules == 2
    t = pq.read_table(str(tmp_path / "pq" / "rule=detail"))
    assert t.num_rows > 0


def test_streaming_sql_matches_collected_rows(two_rule_run, tmp_path):
    """The streaming SQL export must produce the same tables with identical
    row content AND insert order as the collected writer (rowid order =
    items order), pinned and discovered field modes."""
    import sqlite3

    from pholcus_ray.sinks import write_items_sql, write_items_sql_streaming

    wd, _ = two_rule_run
    fields_by_rule = {r: TWO_RULE_SPIDER.rules[r].item_fields
                      for r in TWO_RULE_SPIDER.rules}
    for tag, fbr in (("pinned", fields_by_rule), ("discovered", None)):
        db_a = str(tmp_path / f"a_{tag}.db")
        db_b = str(tmp_path / f"b_{tag}.db")
        ta = write_items_sql(wd, db_a, namespace="ns", item_fields=fbr)
        tb = write_items_sql_streaming(wd, db_b, namespace="ns",
                                       item_fields=fbr)
        assert ta == tb
        ca, cb = sqlite3.connect(db_a), sqlite3.connect(db_b)
        for t in ta:
            ra = ca.execute(f'SELECT * FROM "{t}" ORDER BY rowid').fetchall()
            rb = cb.execute(f'SELECT * FROM "{t}" ORDER BY rowid').fetchall()
            assert ra == rb and len(ra) > 0, (tag, t)
        ca.close(), cb.close()


def test_streaming_csv_matches_collected_bytes(two_rule_run, tmp_path):
    """The unbounded-item streaming CSV export must produce byte-identical
    files to the collected reference-parity writer — with ItemFields pinned
    AND with fields discovered first-seen from the data."""
    from pholcus_ray.sinks import write_items_csv, write_items_csv_streaming

    wd, _ = two_rule_run
    fields_by_rule = {r: TWO_RULE_SPIDER.rules[r].item_fields
                      for r in TWO_RULE_SPIDER.rules}
    for tag, fbr in (("pinned", fields_by_rule), ("discovered", None)):
        a = write_items_csv(wd, str(tmp_path / f"c_{tag}"), namespace="ns",
                            item_fields=fbr)
        b = write_items_csv_streaming(wd, str(tmp_path / f"s_{tag}"),
                                      namespace="ns", item_fields=fbr)
        assert [os.path.basename(p) for p in a] == [
            os.path.basename(p) for p in b]
        for pa_, pb in zip(a, b):
            assert open(pa_, "rb").read() == open(pb, "rb").read(), (tag, pa_)


def test_cuckoo_seen_mode_matches_exact(ray_session, small_corpus, tmp_path):
    """The cuckoo filter is the approximate scale path; at test scale its
    fp-rate is ~1e-4, so the crawl must match the exact-set run."""
    wd_c = str(tmp_path / "cuckoo")
    cfg = CrawlConfig(
        corpus_dir=small_corpus, workdir=wd_c, round_virtual_sec=RVS,
        num_shards=4, seen_mode="cuckoo", capacity_per_shard=1 << 16,
    )
    import pandas as pd

    s = run_crawl(cfg)
    o = run_oracle(small_corpus, round_virtual_sec=RVS)
    assert s.fetched_ok == sum(1 for r in o.crawl_log if r["ok"])
    # full per-row log equality, same as the exact-mode conformance test —
    # count-only comparison would miss round/ordering/attempt drift
    elog = crawl_log_table(wd_c).to_pandas()
    olog = (
        pd.DataFrame(o.crawl_log)
        .sort_values(["round", "priority", "seq"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert len(elog) == len(olog)
    for c in elog.columns:
        assert (elog[c].values == olog[c].values).all(), c


def test_reloadable_bypasses_dedup(ray_session, small_corpus, tmp_path):
    """Reloadable requests opt out of the seen-set (request.go:37,
    matrix.go:81-86): a reloadable re-enqueue of an already-crawled url is
    fetched again."""
    # pick a root whose dedup key is in simnet's always-200 class: a url
    # in a failure class (key % 29 in {3, 7}) fails its first enqueues and
    # would not produce the >1 OK fetches this test counts
    import pyarrow.dataset as pads

    from pholcus_ray.functions.hashing import dedup_key_array

    urls = pads.dataset(f"{small_corpus}/pages").to_table(
        columns=["url"])["url"].to_pylist()
    root = next(u for u in urls
                if int(dedup_key_array([u], ["GET"], ["page"])[0]) % 29
                not in (3, 7))

    def _parse_reload(ctx: RuleContext, _root=root) -> None:
        ctx.output({"u": ctx.url})
        # re-enqueue the root as reloadable from every child hop
        if ctx.depth < 2:
            for url, _a in ctx.links()[:2]:
                ctx.add_queue(url, rule="page", priority=0)
            ctx.add_queue(_root, rule="page", priority=0, reloadable=True)

    sp = Spider(name="reloader", rules={"page": Rule(parse=_parse_reload)})
    wd = str(tmp_path / "reload")
    run_crawl(CrawlConfig(corpus_dir=small_corpus, workdir=wd, spider=sp,
                          round_virtual_sec=RVS, num_shards=4, max_depth=3))
    log = crawl_log_table(wd).to_pandas()
    root_fetches = log[(log["url"] == root) & log["ok"]]
    assert len(root_fetches) > 1  # refetched despite being seen


@pytest.mark.parametrize("depth", [1, 2])
def test_max_depth_stops_expansion(ray_session, small_corpus, tmp_path, depth):
    """Full-log conformance under max_depth, INCLUDING the round column:
    a depth-unaware candidate estimate used to schedule empty 'ghost'
    rounds the oracle never runs, shifting round numbers for requeued and
    deferred rows (round-1 advisor finding)."""
    import pandas as pd

    wd = str(tmp_path / f"depth{depth}")
    s = run_crawl(CrawlConfig(corpus_dir=small_corpus, workdir=wd,
                              round_virtual_sec=RVS, num_shards=4,
                              max_depth=depth))
    log = crawl_log_table(wd).to_pandas()
    assert log["depth"].max() <= depth
    o = run_oracle(small_corpus, round_virtual_sec=RVS, max_depth=depth)
    olog = (
        pd.DataFrame(o.crawl_log)
        .sort_values(["round", "priority", "seq"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert len(log) == len(olog)
    for c in log.columns:
        assert (log[c].values == olog[c].values).all(), f"column {c} diverges"
    # engine must not run trailing ghost rounds beyond the oracle
    assert s.rounds == o.rounds


def test_request_methods_distinct_in_dedup(ray_session, small_corpus, tmp_path):
    """GET and POST to the same URL are distinct requests (dedup key covers
    url+method+rule, request.go:25 + history url+method identity); HEAD
    fetches count but parse runs over an empty body. Engine crawl log must
    equal the oracle byte-for-byte (VERDICT round-1 item 6)."""
    import pandas as pd

    from pholcus_ray.pipelines.crawl import run_crawl as _run

    def _parse_methods(ctx: RuleContext) -> None:
        ctx.output({"u": ctx.url, "m": ctx.method, "body_len": len(ctx.html_bytes),
                    "post": ctx.post_data})
        if ctx.depth == 0 and ctx.method == "GET":
            links = ctx.links()
            for url, _a in links[:2]:
                ctx.add_queue(url, rule="page", priority=0)
                # same URL again via POST (distinct request) and HEAD
                ctx.add_queue(url, rule="page", priority=0, method="post",
                              post_data="q=1")
                ctx.add_queue(url, rule="page", priority=0, method="HEAD")

    sp = Spider(name="methods", rules={"page": Rule(parse=_parse_methods)})
    wd = str(tmp_path / "methods")
    _run(CrawlConfig(corpus_dir=small_corpus, workdir=wd, spider=sp,
                     round_virtual_sec=RVS, num_shards=4))
    from pholcus_ray.pipelines.oracle import run_oracle as _runo

    o = _runo(small_corpus, spider=sp, round_virtual_sec=RVS)
    log = crawl_log_table(wd).to_pandas()
    olog = (
        pd.DataFrame(o.crawl_log)
        .sort_values(["round", "priority", "seq"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert len(log) == len(olog)
    for c in log.columns:
        assert (log[c].values == olog[c].values).all(), c

    items = items_table(wd).to_pandas()
    import json as _json

    rows = [_json.loads(d) for d in items["data"]]
    methods_per_url = {}
    for r in rows:
        methods_per_url.setdefault(r["u"], set()).add(r["m"])
    multi = [u for u, ms in methods_per_url.items() if {"GET", "POST", "HEAD"} <= ms]
    assert multi, "child URLs must be fetched via GET, POST and HEAD distinctly"
    # HEAD bodies are empty; POST carries its post_data through the frontier
    for r in rows:
        if r["m"] == "HEAD":
            assert r["body_len"] == 0
        if r["m"] == "POST":
            assert r["post"] == "q=1"
        if r["m"] == "GET" and r["body_len"] == 0:
            raise AssertionError("GET body unexpectedly empty")


def test_excel_and_sql_sinks(two_rule_run, tmp_path):
    """Excel (output_excel.go parity, stdlib xlsx container) and SQL
    (output_mysql.go parity, sqlite backend) round-trips through the
    registry (VERDICT round-1 items 7-8)."""
    import sqlite3
    import zipfile
    from xml.etree import ElementTree

    from pholcus_ray.sinks import get_sink

    wd, _ = two_rule_run
    fields = {r: TWO_RULE_SPIDER.rules[r].item_fields for r in TWO_RULE_SPIDER.rules}

    xlsx = get_sink("excel")(wd, str(tmp_path / "xlsx"), namespace="ns",
                             item_fields=fields)
    with zipfile.ZipFile(xlsx) as z:
        names = z.namelist()
        assert "xl/workbook.xml" in names
        ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
        wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
        sheet_names = [s.get("name") for s in wb.findall(f"{ns}sheets/{ns}sheet")]
        assert sorted(sheet_names) == ["detail", "page"]  # one per rule
        # EVERY sheet: exact ItemFields header for ITS rule + correct data
        for i, rule in enumerate(sheet_names):
            root = ElementTree.fromstring(z.read(f"xl/worksheets/sheet{i+1}.xml"))
            rows = root.findall(f"{ns}sheetData/{ns}row")
            assert len(rows) > 1, rule  # header + data
            header = [c.find(f"{ns}is/{ns}t").text for c in rows[0]]
            assert header == fields[rule] + ["Url", "ParentUrl",
                                             "DownloadTime"], rule
            k = header.index("kind")
            want_kind = {"page": "list", "detail": "detail"}[rule]
            for r in rows[1:]:
                cell = r[k].find(f"{ns}is/{ns}t")
                assert cell is not None and cell.text == want_kind

    db = str(tmp_path / "items.db")
    tables = get_sink("sql")(wd, db, namespace="ns", item_fields=fields)
    assert sorted(tables) == ["ns__detail", "ns__page"]
    con = sqlite3.connect(db)
    try:
        n = con.execute('SELECT COUNT(*) FROM "ns__detail"').fetchone()[0]
        assert n > 0
        cols = [r[1] for r in con.execute('PRAGMA table_info("ns__detail")')]
        assert cols[: len(fields["detail"])] == fields["detail"]
        kinds = {r[0] for r in con.execute('SELECT kind FROM "ns__detail"')}
        assert kinds == {"detail"}
    finally:
        con.close()


def test_rulecontext_full_verb_surface():
    """The §2.10 ctx verb surface (context.go:304-644): getters, mutators,
    item-field upsert, sub-rule dispatch, output pulls, diagnostics."""
    from pholcus_ray.spiderapi import Rule, RuleContext, Spider

    seen = []

    def sub_rule(ctx):
        seen.append(ctx.get_rule_name())
        ctx.output({"from": "sub"})

    def main_rule(ctx):
        assert ctx.get_url() == "http://h0.example.com/p/1"
        assert ctx.get_host() == "h0.example.com"
        assert ctx.get_method() == "GET"
        assert ctx.get_status_code() == 206
        assert ctx.get_referer() == "http://h0.example.com/"
        assert ctx.get_name() == "verbs"
        assert ctx.get_rules() == ["main", "sub"]
        # item fields
        assert ctx.get_item_fields() == ["a"]
        assert ctx.upsert_item_field("b") == 1
        assert ctx.upsert_item_field("a") == 0          # idempotent
        assert ctx.get_item_field(1) == "b"
        assert ctx.get_item_field_index("b") == 1
        assert ctx.get_item_field_index("zz") == -1
        # temps
        ctx.set_temp("k", {"x": 1})
        cp = ctx.copy_temps()
        cp["k"]["x"] = 2
        assert ctx.get_temp("k") == {"x": 1}            # deep copy
        # body mutation invalidates lazy caches
        t0 = ctx.text
        ctx.reset_text("<html><body>fresh</body></html>")
        assert ctx.text != t0 and "fresh" in ctx.text
        # sub-rule dispatch accumulates on the same ctx, rule name restored
        ctx.parse("sub")
        assert ctx.get_rule_name() == "main"
        # diagnostics + pulls
        ctx.log("hello")
        ctx.file_output("f.bin", b"\x01")
        assert ctx.pull_files() == [("f.bin", b"\x01")]
        assert ctx.files == []
        ctx.output({"from": "main"})

    sp = Spider(name="verbs", rules={"main": Rule(parse=main_rule, item_fields=["a"]),
                                     "sub": Rule(parse=sub_rule)},
                entry_rule="main")
    ctx = RuleContext(url="http://h0.example.com/p/1",
                      referer="http://h0.example.com/", rule="main", depth=1,
                      html_bytes=b"<html><body>orig text</body></html>",
                      status=206)
    sp.run_rule(ctx)
    assert seen == ["sub"]
    assert [i["from"] for i in ctx.items] == ["sub", "main"]
    assert ctx.logs == ["hello"]
    # pull_items drains
    assert len(ctx.pull_items()) == 2 and ctx.items == []


def test_queue_and_document_sinks(two_rule_run):
    """Kafka/Mongo/Beanstalkd writers through the registry against in-memory
    clients — format parity per output_{kafka,mgo,beanstalkd}.go (topic and
    collection naming, lowercase vs capitalized default-field keys,
    string-or-JSON value coercion, job payload shape)."""
    import json as _json

    from pholcus_ray.sinks import get_sink

    wd, _ = two_rule_run
    fields = {r: TWO_RULE_SPIDER.rules[r].item_fields
              for r in TWO_RULE_SPIDER.rules}

    class FakeProducer:
        def __init__(self):
            self.msgs = []

        def send(self, topic, message):
            self.msgs.append((topic, message))

    prod = FakeProducer()
    n = get_sink("kafka")(wd, prod, namespace="ns", item_fields=fields)
    assert n == len(prod.msgs) > 0
    topics = {t for t, _ in prod.msgs}
    assert topics == {"ns__page", "ns__detail"}
    m = prod.msgs[0][1]
    # lowercase default-field keys, every value a string (kafka parity)
    assert {"url", "parent_url", "download_time"} <= set(m)
    assert all(isinstance(v, str) for v in m.values())

    class FakeMongo:
        def __init__(self):
            self.docs = {}

        def insert_many(self, db, coll, docs):
            self.docs.setdefault((db, coll), []).extend(docs)

    mg = FakeMongo()
    n = get_sink("mongo")(wd, mg, db_name="pholcus", namespace="ns",
                          item_fields=fields)
    assert n == sum(len(v) for v in mg.docs.values()) > 0
    assert set(mg.docs) == {("pholcus", "ns__page"), ("pholcus", "ns__detail")}
    d = mg.docs[("pholcus", "ns__detail")][0]
    assert {"Url", "ParentUrl", "DownloadTime"} <= set(d)  # capitalized keys

    class FakeTube:
        def __init__(self):
            self.jobs = []

        def send(self, job):
            self.jobs.append(job)

    tube = FakeTube()
    n = get_sink("beanstalkd")(wd, tube, namespace="ns",
                               batch_range=(0, 10), createtime="42")
    assert n == len(tube.jobs) > 0
    j = tube.jobs[0]
    assert set(j) == {"createtime", "type", "content"}
    assert j["createtime"] == "42"
    assert j["type"].startswith("ns__0-10__")
    content = _json.loads(j["content"])
    assert {"Url", "ParentUrl", "DownloadTime"} <= set(content)


def test_registry_dup_suffix_and_pinyin_order():
    """species.go parity: duplicate-name register gains a (2)/(3) suffix
    (Add, species.go:25-38); list_spiders returns pinyin menu order via the
    GB2312-level-1 trick (Get -> pinyin.SortInitials, species.go:41-59)."""
    from pholcus_ray import spiderapi
    from pholcus_ray.spiderapi import list_spiders, register

    added = []
    try:
        # 安(an) < 北(bei) < 上(shang) < 天(tian) in pinyin; their raw
        # unicode codepoints sort 上 < 北 < 天 < 安 — so this asserts the
        # key really is pinyin-relative, not codepoint order.
        for name in ["天猫", "上海站", "安居客", "北京房"]:
            sp = register(Spider(name=name, rules={}))
            added.append(sp.name)
        names = [n for n in list_spiders() if n in set(added)]
        assert names == ["安居客", "北京房", "上海站", "天猫"]

        d1 = register(Spider(name="dupname", rules={}))
        d2 = register(Spider(name="dupname", rules={}))
        d3 = register(Spider(name="dupname", rules={}))
        added += [d1.name, d2.name, d3.name]
        assert (d1.name, d2.name, d3.name) == ("dupname", "dupname(2)", "dupname(3)")
        # ASCII-only ordering is unchanged by the pinyin key
        ascii_names = [n for n in list_spiders() if n.isascii()]
        assert ascii_names == sorted(ascii_names)
    finally:
        for n in added:
            spiderapi._REGISTRY.pop(n, None)


def test_streaming_excel_matches_collected_members(two_rule_run, tmp_path):
    """The unbounded-item streaming Excel export must produce a workbook
    member-for-member identical to the collected writer (zip local
    timestamps may differ; the XML payload must not) — pinned ItemFields
    AND first-seen field discovery."""
    import zipfile

    from pholcus_ray.sinks import write_items_excel, write_items_excel_streaming

    wd, _ = two_rule_run
    fields_by_rule = {r: TWO_RULE_SPIDER.rules[r].item_fields
                      for r in TWO_RULE_SPIDER.rules}
    for tag, fbr in (("pinned", fields_by_rule), ("discovered", None)):
        a = write_items_excel(wd, str(tmp_path / f"xc_{tag}"), namespace="ns",
                              item_fields=fbr)
        b = write_items_excel_streaming(wd, str(tmp_path / f"xs_{tag}"),
                                        namespace="ns", item_fields=fbr)
        with zipfile.ZipFile(a) as za, zipfile.ZipFile(b) as zb:
            assert za.namelist() == zb.namelist(), tag
            for name in za.namelist():
                assert za.read(name) == zb.read(name), (tag, name)


def test_ctx_create_item_aid_and_request_views():
    """CreateItem index->name mapping (context.go:288-302), AidFunc paging
    fan-out (context.go:333-352, jdsearch.go:49-67 shape), GetRequest/
    CopyRequest independence (context.go:450-458)."""

    def aid_pages(ctx, args):
        # the classic AidFunc: enqueue pages 2..n computed from parsed data
        for p in range(2, int(args["total_pages"]) + 1):
            ctx.add_queue(f"/list?page={p}", rule="page")
        return args["total_pages"]

    def parse(ctx):
        item = ctx.create_item({0: "t0", 1: "v1", 9: "dropped"})
        ctx.output(item)
        ctx.aid({"total_pages": 3})

    sp = Spider(name="aidspider",
                rules={"page": Rule(parse=parse,
                                    item_fields=["title", "value"])},
                aid_func=aid_pages)
    ctx = RuleContext(url="http://h0.example.com/list?page=1",
                      referer="", rule="page", depth=0,
                      html_bytes=b"<html></html>")
    sp.run_rule(ctx)
    # index 9 has no registered field -> dropped
    assert ctx.items == [{"title": "t0", "value": "v1"}]
    assert [r.url for r in ctx.requests] == [
        "http://h0.example.com/list?page=2",
        "http://h0.example.com/list?page=3",
    ]
    # request views: copy is independent of the live context
    req = ctx.get_request()
    assert req.url == ctx.url and req.rule == "page"
    cp = ctx.copy_request()
    cp.url = "http://elsewhere.example.com/"
    assert ctx.get_request().url == "http://h0.example.com/list?page=1"


def test_ctx_scheduler_knobs_and_timers_accumulate_controls():
    """SetKeyin/SetLimit/SetPausetime/SetTimer/RunTimer (context.go:378-406)
    accumulate driver-applied control signals; getters see the local write;
    header verbs expose the carried request/response headers."""
    from pholcus_ray.state.timer import CountdownTimer

    ctx = RuleContext(url="http://h0.example.com/", referer="", rule="page",
                      depth=0, html_bytes=b"", keyin="old", limit=10,
                      cookie="sid=1", user_agent="UA-7",
                      response_headers={"Content-Type": "text/html"})
    ctx.set_keyin("new")
    ctx.set_limit(99)
    ctx.set_pausetime(2.5)
    t = CountdownTimer(every_sec=60.0)
    ctx.set_timer("refresh", t)
    ctx.run_timer("refresh")
    assert ctx.get_keyin() == "new" and ctx.get_limit() == 99
    assert ctx.pausetime == 2.5
    assert ctx.controls == [
        ("keyin", "new"), ("limit", 99), ("pausetime", 2.5),
        ("set_timer", ("refresh", t)), ("run_timer", "refresh"),
    ]
    assert ctx.get_header("Content-Type") == "text/html"
    assert ctx.get_header("X-Missing") == ""
    assert ctx.get_request_header() == {"User-Agent": "UA-7",
                                        "Cookie": "sid=1"}
    assert ctx.get_request_header("Cookie") == "sid=1"
