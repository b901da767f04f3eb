"""Declarative spider rule files (JSON / YAML) — the dynamic-rule surface.

Reference parity (SURVEY.md §2.9 / ST8): the reference loads spider
definitions from ``*.pholcus.xml`` / ``*.pholcus.html`` files whose rule
bodies are JavaScript run in an otto VM (app/spider/parsejs.go:40-198,
sample/dyn_rules/*). A JS VM is out of scope here (documented scope cut);
the use case it serves — adding/editing spiders WITHOUT touching engine
code, reloadable at startup — is covered by a declarative schema compiled
to the same :class:`~pholcus_ray.spiderapi.Spider` / ``Rule`` objects the
python registry uses, so file-defined and code-defined spiders are
indistinguishable downstream (same fetch stage, same sinks, same oracle).

File shape (JSON or YAML; extension picks the parser)::

    name: quotes
    entry_rule: page            # optional (default "page")
    enable_cookie: false        # optional
    not_default_field: false    # optional
    keyin_urls: []              # optional: url templates w/ {keyin}
    rules:
      page:
        item_fields: [title, n_chars]
        output:                 # one item per page (omit -> no item)
          title: title          # shorthand getter
          n_chars: {get: text, fn: len}
          first_h2: {get: doc, regex: "<h2>(.*?)</h2>", group: 1}
          kind: {const: list}
        enqueue:
          - follow_links: {rule: page, url_match: "/p/\\d+$", priority: 1}
          - add: {url: "/detail", rule: detail}   # resolved vs page url

Field getter grammar (compiled, NOT eval — hostile rule files cannot run
code): shorthand string = one of ``url referer keyin title text doc status
method download_time cookie user_agent depth``; object form adds
``regex``/``group`` (first match over the getter's string value, "" when
unmatched), ``fn`` (whitelisted: ``len strip lower upper int``), or
``const``, or ``expr`` — a COMPUTED field (the last parsejs.go use case:
rule bodies that derive item values, e.g. ``{"expr": "len(text) - depth"}``
or ``{"expr": "title + ' | ' + keyin"}``). Expressions compile through the
python ``ast`` with a strict node whitelist (names = the getters above,
calls = the fn whitelist, arithmetic/compare/bool/conditional operators
only — no attribute access, no subscripts, no comprehensions), so a
hostile rule file still cannot reach python objects or run code. Enqueue
verbs: ``follow_links`` (every page link, optionally filtered by
``url_match``/``anchor_match`` regex, child ``rule``, ``priority``,
``max``) and ``add`` (explicit url template with ``{keyin}`` and ``{url}``
placeholders, resolved relative to the page url).
"""

from __future__ import annotations

import ast
import json
import os
import re
from typing import Callable

from .spiderapi import Rule, RuleContext, Spider, register

_GETTERS: dict[str, Callable[[RuleContext], object]] = {
    "url": lambda c: c.url,
    "referer": lambda c: c.referer,
    "keyin": lambda c: c.keyin,
    "title": lambda c: c.title(),
    "text": lambda c: c.text,
    "doc": lambda c: c.doc,
    "status": lambda c: c.status,
    "method": lambda c: c.method,
    "download_time": lambda c: c.download_time,
    "cookie": lambda c: c.cookie,
    "user_agent": lambda c: c.user_agent,
    "depth": lambda c: c.depth,
}

_FNS: dict[str, Callable] = {
    "len": len,
    "strip": lambda v: str(v).strip(),
    "lower": lambda v: str(v).lower(),
    "upper": lambda v: str(v).upper(),
    "int": lambda v: int(v) if str(v).strip() else 0,
}


class RuleFileError(ValueError):
    """Malformed declarative spider file (bad getter/fn/verb/schema)."""


# expression fields: the AST node whitelist. Everything needed for "derive
# an item value from page fields" arithmetic/logic, and nothing that can
# reach a python object graph (no Attribute, no Subscript, no lambdas, no
# comprehensions, no starargs/keywords).
_EXPR_NODES = (
    ast.Expression, ast.Constant, ast.Name, ast.Load, ast.Call,
    ast.BinOp, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod,
    ast.UnaryOp, ast.USub, ast.UAdd, ast.Not,
    ast.BoolOp, ast.And, ast.Or, ast.IfExp,
    ast.Compare, ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.In, ast.NotIn,
)

_EXPR_FNS: dict[str, Callable] = dict(
    _FNS, str=str, float=lambda v: float(v) if str(v).strip() else 0.0,
    min=min, max=max, abs=abs,
)


def _compile_expr(src: str) -> Callable[[RuleContext], object]:
    """Compile a whitelisted expression over getter names to a callable.

    Covers the computed-item-field half of the reference's JS rule bodies
    (app/spider/parsejs.go:60-198) without a code-execution surface: the
    AST is validated node-by-node, calls may only target the fn whitelist
    by bare name, and evaluation runs with empty builtins. Getters are
    evaluated lazily — only the names the expression mentions."""
    try:
        tree = ast.parse(src, mode="eval")
    except SyntaxError as e:
        raise RuleFileError(f"bad expr {src!r}: {e}") from None
    names: set[str] = set()
    for node in ast.walk(tree):
        if not isinstance(node, _EXPR_NODES):
            raise RuleFileError(
                f"expr {src!r}: {type(node).__name__} not allowed"
            )
        if isinstance(node, ast.Call):
            if (not isinstance(node.func, ast.Name)
                    or node.func.id not in _EXPR_FNS or node.keywords):
                raise RuleFileError(f"expr {src!r}: calls limited to "
                                    f"{sorted(_EXPR_FNS)}")
        if isinstance(node, ast.Name) and node.id not in _EXPR_FNS:
            if node.id not in _GETTERS:
                raise RuleFileError(f"expr {src!r}: unknown name {node.id!r}")
            names.add(node.id)
    code = compile(tree, "<rule-expr>", "eval")

    def _run(c, _code=code, _names=tuple(names)):
        env = dict(_EXPR_FNS)
        for g in _names:
            env[g] = _GETTERS[g](c)
        return eval(_code, {"__builtins__": {}}, env)

    return _run


def _compile_field(spec) -> Callable[[RuleContext], object]:
    """Field spec -> extractor callable. Regexes compile ONCE here (per
    spider load), not per page — the stateful-setup rule every actor-pool
    stage in this repo follows."""
    if isinstance(spec, str):
        if spec not in _GETTERS:
            raise RuleFileError(f"unknown getter {spec!r}")
        return _GETTERS[spec]
    if not isinstance(spec, dict):
        raise RuleFileError(f"field spec must be string or object, got {spec!r}")
    if "const" in spec:
        v = spec["const"]
        return lambda _c: v
    if "expr" in spec:
        run = _compile_expr(str(spec["expr"]))
        if "fn" in spec:
            fn = _FNS.get(spec["fn"])
            if fn is None:
                raise RuleFileError(f"unknown fn {spec['fn']!r}")
            return lambda c, _r=run, _f=fn: _f(_r(c))
        return run
    get = _GETTERS.get(spec.get("get", ""))
    if get is None:
        raise RuleFileError(f"unknown getter {spec.get('get')!r}")
    steps: list[Callable] = [get]
    if "regex" in spec:
        pat = re.compile(spec["regex"], re.S)
        grp = int(spec.get("group", 0))

        def _rx(v, _p=pat, _g=grp):
            m = _p.search(str(v))
            return m.group(_g) if m else ""

        steps.append(_rx)
    if "fn" in spec:
        fn = _FNS.get(spec["fn"])
        if fn is None:
            raise RuleFileError(f"unknown fn {spec['fn']!r}")
        steps.append(fn)

    def _run(c, _steps=tuple(steps)):
        v = _steps[0](c)
        for s in _steps[1:]:
            v = s(v)
        return v

    return _run


def _compile_enqueue(specs) -> Callable[[RuleContext], None]:
    actions: list[Callable[[RuleContext], None]] = []
    for spec in specs or []:
        if not isinstance(spec, dict) or len(spec) != 1:
            raise RuleFileError(f"enqueue entry must be one-verb object: {spec!r}")
        verb, arg = next(iter(spec.items()))
        if verb == "follow_links":
            rule = arg.get("rule")
            prio = int(arg.get("priority", 0))
            cap = arg.get("max")
            um = re.compile(arg["url_match"]) if "url_match" in arg else None
            am = re.compile(arg["anchor_match"]) if "anchor_match" in arg else None

            def _follow(c, _r=rule, _p=prio, _um=um, _am=am, _cap=cap):
                n = 0
                for u, anchor in c.links():
                    if _um is not None and not _um.search(u):
                        continue
                    if _am is not None and not _am.search(anchor):
                        continue
                    c.add_queue(u, rule=_r or c.rule, priority=_p, anchor=anchor)
                    n += 1
                    if _cap is not None and n >= int(_cap):
                        break

            actions.append(_follow)
        elif verb == "add":
            tmpl = arg["url"]
            rule = arg.get("rule")
            method = arg.get("method", "GET")
            prio = int(arg.get("priority", 0))
            post = arg.get("post_data", "")

            def _add(c, _t=tmpl, _r=rule, _m=method, _p=prio, _pd=post):
                c.add_queue(
                    _t.format(keyin=c.keyin, url=c.url),
                    rule=_r or c.rule, method=_m, priority=_p, post_data=_pd,
                )

            actions.append(_add)
        else:
            raise RuleFileError(f"unknown enqueue verb {verb!r}")

    def _run(c, _acts=tuple(actions)):
        for a in _acts:
            a(c)

    return _run


def _compile_rule(rspec: dict) -> Rule:
    out_spec = rspec.get("output")
    fields = {k: _compile_field(v) for k, v in (out_spec or {}).items()}
    enqueue = _compile_enqueue(rspec.get("enqueue"))

    def parse(ctx: RuleContext, _f=fields, _e=enqueue, _emit=out_spec is not None):
        if _emit:
            ctx.output({k: f(ctx) for k, f in _f.items()})
        _e(ctx)

    return Rule(parse=parse, item_fields=list(rspec.get("item_fields", [])))


def spider_from_dict(d: dict) -> Spider:
    """Compile a declarative spider definition to a registered Spider."""
    if "name" not in d or "rules" not in d or not d["rules"]:
        raise RuleFileError("spider file needs 'name' and non-empty 'rules'")
    rules = {name: _compile_rule(rs or {}) for name, rs in d["rules"].items()}
    entry = d.get("entry_rule", "page")
    if entry not in rules:
        raise RuleFileError(f"entry_rule {entry!r} not in rules")
    return register(
        Spider(
            name=str(d["name"]),
            rules=rules,
            entry_rule=entry,
            not_default_field=bool(d.get("not_default_field", False)),
            enable_cookie=bool(d.get("enable_cookie", False)),
        ),
        replace=True,  # rule files hot-reload: latest definition wins
    )


def load_spider_file(path: str) -> Spider:
    """Load one ``*.spider.json`` / ``*.spider.yaml`` file (re-invokable:
    reloading a changed file re-registers the name — latest wins, the
    registry semantics the reference's re-register also has)."""
    with open(path) as f:
        if path.endswith((".yaml", ".yml")):
            import yaml

            d = yaml.safe_load(f)
        else:
            d = json.load(f)
    return spider_from_dict(d)


def load_spider_dir(rules_dir: str) -> list[Spider]:
    """Load every *.spider.{json,yaml,yml} under ``rules_dir`` (sorted, so
    name collisions resolve deterministically)."""
    out = []
    for fn in sorted(os.listdir(rules_dir)):
        if fn.endswith((".spider.json", ".spider.yaml", ".spider.yml")):
            out.append(load_spider_file(os.path.join(rules_dir, fn)))
    return out
