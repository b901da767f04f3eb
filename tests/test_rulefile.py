"""Declarative rule files (rulefile.py) — the dynamic-rule surface (ST8).

Reference parity model: parsejs.go loads XML+JS spider files into the same
registry as static spiders; here a JSON/YAML spider compiles to the same
Spider/Rule objects, so a file-defined spider must crawl IDENTICALLY to an
equivalent hand-coded python spider (same log, same items)."""

import json
import os
import shutil

import pytest

from pholcus_ray.rulefile import (
    RuleFileError,
    load_spider_dir,
    load_spider_file,
    spider_from_dict,
)
from pholcus_ray.spiderapi import Rule, RuleContext, Spider, register

SPEC = {
    "name": "decl_test",
    "entry_rule": "page",
    "rules": {
        "page": {
            "item_fields": ["title", "n_chars", "kind"],
            "output": {
                "title": "title",
                "n_chars": {"get": "text", "fn": "len"},
                "kind": {"const": "list"},
            },
            "enqueue": [
                {"follow_links": {"rule": "page", "priority": 0}},
            ],
        }
    },
}


def _coded_equiv() -> Spider:
    def parse(ctx: RuleContext) -> None:
        ctx.output({"title": ctx.title(), "n_chars": len(ctx.text),
                    "kind": "list"})
        for u, anchor in ctx.links():
            ctx.add_queue(u, rule="page", priority=0, anchor=anchor)

    return register(Spider(name="coded_equiv", rules={
        "page": Rule(parse=parse, item_fields=["title", "n_chars", "kind"])}))


def test_field_and_enqueue_compilation():
    sp = spider_from_dict(json.loads(json.dumps(SPEC)))
    assert sp.name == "decl_test" and sp.entry_rule == "page"
    html = b"<html><head><title>T one</title></head><body>" \
           b"<h2>sub</h2>hello world</body></html>"
    ctx = RuleContext(url="http://h/x", referer="", rule="page", depth=0,
                      html_bytes=html)
    sp.run_rule(ctx)
    assert ctx.items[0]["title"] == "T one"
    assert ctx.items[0]["kind"] == "list"
    assert ctx.items[0]["n_chars"] == len(ctx.text)


def test_regex_getter_and_filters():
    sp = spider_from_dict({
        "name": "decl_rx",
        "rules": {"page": {
            "output": {"h2": {"get": "doc", "regex": "<h2>(.*?)</h2>",
                              "group": 1},
                       "missing": {"get": "doc", "regex": "zzz(q)"}},
            "enqueue": [{"follow_links": {"url_match": r"/p/\d+$",
                                          "max": 1}}],
        }},
    })
    html = (b'<html><body><h2>Sub</h2>'
            b'<a href="/p/3">a</a><a href="/q">b</a><a href="/p/9">c</a>'
            b"</body></html>")
    ctx = RuleContext(url="http://h/x", referer="", rule="page", depth=0,
                      html_bytes=html)
    sp.run_rule(ctx)
    assert ctx.items[0]["h2"] == "Sub"
    assert ctx.items[0]["missing"] == ""
    assert [r.url for r in ctx.requests] == ["http://h/p/3"]  # match + max


def test_add_verb_templates_keyin():
    sp = spider_from_dict({
        "name": "decl_add",
        "rules": {"page": {"enqueue": [
            {"add": {"url": "/search?q={keyin}", "rule": "page",
                     "method": "post", "priority": 2}},
        ]}},
    })
    ctx = RuleContext(url="http://h/x", referer="", rule="page", depth=0,
                      html_bytes=b"<html></html>", keyin="k1")
    sp.run_rule(ctx)
    r = ctx.requests[0]
    assert r.url == "http://h/search?q=k1"
    assert r.method == "POST" and r.priority == 2


def test_hostile_spec_rejected():
    for bad in (
        {"name": "x", "rules": {"page": {"output": {"f": "__import__"}}}},
        {"name": "x", "rules": {"page": {"output": {"f": {"get": "text",
                                                          "fn": "eval"}}}}},
        {"name": "x", "rules": {"page": {"enqueue": [{"exec": {}}]}}},
        {"name": "x", "rules": {}},
        {"name": "x", "entry_rule": "nope", "rules": {"page": {}}},
    ):
        with pytest.raises(RuleFileError):
            spider_from_dict(bad)


def test_file_and_dir_loading_and_reload(tmp_path):
    p = tmp_path / "a.spider.json"
    p.write_text(json.dumps(SPEC))
    sp = load_spider_file(str(p))
    assert sp.name == "decl_test"
    # yaml flavor
    import yaml

    y = tmp_path / "b.spider.yaml"
    y.write_text(yaml.safe_dump(dict(SPEC, name="decl_yaml")))
    loaded = load_spider_dir(str(tmp_path))
    assert sorted(s.name for s in loaded) == ["decl_test", "decl_yaml"]
    # hot reload: edited file re-registers (latest wins)
    spec2 = dict(SPEC)
    spec2["rules"] = {"page": {"output": {"title": "title"},
                               "item_fields": ["title"]}}
    p.write_text(json.dumps(spec2))
    sp2 = load_spider_file(str(p))
    from pholcus_ray.spiderapi import get_spider

    assert get_spider("decl_test") is sp2
    assert sp2.rules["page"].item_fields == ["title"]


def test_declarative_crawl_matches_coded_spider(ray_session, small_corpus,
                                                tmp_path):
    """End-to-end: the declarative spider and its hand-coded equivalent
    produce the SAME crawl log and byte-identical items."""
    from pholcus_ray.pipelines.crawl import (CrawlConfig, crawl_log_table,
                                             items_table, run_crawl)

    decl = spider_from_dict(json.loads(json.dumps(SPEC)))
    coded = _coded_equiv()
    tables = {}
    for sp in (decl, coded):
        wd = str(tmp_path / sp.name)
        shutil.rmtree(wd, ignore_errors=True)
        run_crawl(CrawlConfig(corpus_dir=small_corpus, workdir=wd, spider=sp,
                              round_virtual_sec=64.0, num_shards=4))
        tables[sp.name] = (crawl_log_table(wd), items_table(wd))
    log_a, items_a = tables["decl_test"]
    log_b, items_b = tables["coded_equiv"]
    assert log_a.equals(log_b)
    assert items_a.equals(items_b)
    assert items_a.num_rows > 0


def test_expr_computed_fields():
    """`expr` fields: whitelisted-AST computed values over getters — the
    computed-item-field half of parsejs.go's JS rule bodies."""
    spec = {
        "name": "decl_expr",
        "rules": {
            "page": {
                "item_fields": ["n", "label", "deep", "ratio", "ln"],
                "output": {
                    "n": {"expr": "len(text) - depth"},
                    "label": {"expr": "title + ' | ' + keyin"},
                    "deep": {"expr": "'yes' if depth > 0 else 'no'"},
                    "ratio": {"expr": "max(len(text), 1) / 2"},
                    "ln": {"expr": "lower(title)", "fn": "len"},
                },
            }
        },
    }
    sp = spider_from_dict(spec)
    html = (b"<html><head><title>T One</title></head>"
            b"<body>hello</body></html>")
    ctx = RuleContext(url="http://h/x", referer="", rule="page", depth=0,
                      html_bytes=html, keyin="k")
    sp.run_rule(ctx)
    it = ctx.items[0]
    assert it["n"] == len(ctx.text)
    assert it["label"] == "T One | k"
    assert it["deep"] == "no"
    assert it["ratio"] == max(len(ctx.text), 1) / 2
    assert it["ln"] == len("t one")


def test_expr_hostile_rejected():
    """Attribute access, subscripts, imports, dunder escapes, unknown
    names/calls and statement bodies must all be rejected at compile."""
    hostile = [
        "().__class__",                      # attribute escape
        "text.__class__",
        "text[0]",                           # subscript
        "__import__('os')",                  # non-whitelisted call
        "(lambda: 1)()",                     # lambda
        "[x for x in text]",                 # comprehension
        "unknown_name",                      # not a getter
        "len(text, 1, key=len)",             # keyword args
        "import os",                         # statement -> SyntaxError
    ]
    for src in hostile:
        with pytest.raises(RuleFileError):
            spider_from_dict({
                "name": "h", "rules": {"page": {"output": {"f": {"expr": src}}}}
            })


def test_expr_cannot_reach_builtins():
    """Even a whitelisted-shaped expr evaluates with empty builtins: the
    only names in scope are getters + the fn whitelist."""
    sp = spider_from_dict({
        "name": "decl_expr_scope",
        "rules": {"page": {"output": {"f": {"expr": "min(len(url), 99)"}},
                           "item_fields": ["f"]}},
    })
    ctx = RuleContext(url="http://h/x", referer="", rule="page", depth=0,
                      html_bytes=b"<html><body>x</body></html>")
    sp.run_rule(ctx)
    assert ctx.items[0]["f"] == len("http://h/x")
