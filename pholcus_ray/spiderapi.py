"""Spider / Rule / RuleContext — the user-extension surface.

Reference parity (SURVEY.md §1.4, §2.9, §2.10): a Pholcus spider is a named
pipeline definition — ``RuleTree.Root`` seeds the frontier and
``Trunk[name].ParseFunc(ctx)`` is the per-page transform; rules enqueue child
requests tagged with the next rule's name (``ctx.AddQueue``,
context.go:104-125) and emit items (``ctx.Output``, context.go:214-241) with
per-rule dynamic schemas; three default columns Url/ParentUrl/DownloadTime
are appended unless ``NotDefaultField`` (spider.go:34, context.go:236-241).

Here a rule's ``parse(ctx)`` runs per page INSIDE a fetch+parse
``map_batches`` stage (HTML parsing is inherently per-document; the regex
machinery underneath is compiled C). The context accumulates
``(items, requests, files)``, which the stage returns as Arrow list columns —
no cross-stage mutable state, no channels.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

from .functions import textops, urlnorm


# request methods the fetcher understands (surfer/param.go:61-84: GET, HEAD,
# POST form-encoded, POST-M multipart; anything else falls back to GET)
VALID_METHODS = frozenset({"GET", "POST", "POST-M", "HEAD"})


def normalize_method(method: str | None) -> str:
    """Upper-case + default-GET method normalization (request.go:72-76)."""
    m = (method or "GET").upper()
    return m if m in VALID_METHODS else "GET"


@dataclass
class LinkRequest:
    """A child request enqueued by a rule (mirrors Request, request.go:20-43)."""

    url: str               # canonical absolute url
    rule: str = "page"
    method: str = "GET"    # GET | POST | POST-M | HEAD
    post_data: str = ""    # request body (Request.PostData); NOT in the dedup key
    priority: int = 0
    anchor: str = ""
    reloadable: bool = False
    temp: str = ""         # JSON-encoded per-request carry-through state


class RuleContext:
    """Per-page context handed to a rule's parse function.

    Offers the same verbs as the reference's ctx (context.go): GetUrl/
    GetHost/GetText/GetDom-ish helpers, SetTemp/GetTemp, Output, AddQueue,
    FileOutput — accumulating outputs instead of pushing to channels.
    """

    def __init__(self, url: str, referer: str, rule: str, depth: int,
                 html_bytes: bytes, temp: str = "", keyin: str = "",
                 download_time: str = "", method: str = "GET",
                 post_data: str = "", cookie: str = "", user_agent: str = "",
                 status: int = 200, limit: int = 0, pausetime: float = 0.0,
                 response_headers: dict | None = None):
        self.url = url
        self.referer = referer
        self.rule = rule
        self.depth = depth
        self.html_bytes = html_bytes
        self.keyin = keyin
        self.download_time = download_time
        self.method = method
        self.post_data = post_data
        self.cookie = cookie          # Cookie header this fetch carried
        self.user_agent = user_agent  # UA this fetch carried (request.go:214, GetCookies parity)
        self.status = status          # response status (GetStatusCode, context.go:445)
        self.limit = limit            # spider crawl limit (GetLimit, context.go:519)
        self.pausetime = pausetime    # politeness pause (SetPausetime target)
        self.response_headers = dict(response_headers or {})
        self.spider = None            # attached by Spider.run_rule (GetSpider)
        self._temp: dict = json.loads(temp) if temp else {}
        self._text: str | None = None
        self._doc: str | None = None
        self.items: list[dict] = []
        self.requests: list[LinkRequest] = []
        self.files: list[tuple[str, bytes]] = []
        self.logs: list[str] = []
        self.error: Exception | None = None
        # control signals a rule raised (SetKeyin/SetLimit/SetPausetime/
        # SetTimer/RunTimer, context.go:378-406). The reference mutates live
        # scheduler state from the rule goroutine; in the distributed engine
        # rules run inside stateless fetch+parse tasks, so these accumulate
        # here for the DRIVER to apply between rounds (the SURVEY §2.8
        # "driver checks between rounds" mapping of pause/knob polling —
        # timers feed state.timer.run_recurring; limit/pausetime map to
        # CrawlConfig.max_pages / host-budget knobs on the next round).
        self.controls: list[tuple[str, object]] = []

    # --- lazy projections (reference context.go:612-644) ---

    @property
    def doc(self) -> str:
        """Decoded html (lazy, cached) — the GetDom/GetText substrate."""
        if self._doc is None:
            self._doc = textops.to_text(self.html_bytes)
        return self._doc

    @property
    def text(self) -> str:
        """Extracted text (lazy, cached) — byte-identical invariant."""
        if self._text is None:
            self._text = textops.extract_text(self.html_bytes)
        return self._text

    def title(self) -> str:
        return textops.extract_title(self.doc)

    def links(self) -> list[tuple[str, str]]:
        """Resolved, canonicalized (url, anchor) pairs in document order;
        javascript:/mailto:/fragment-only links dropped (GetHref parity)."""
        out = []
        for href, anchor in textops.extract_links(self.doc):
            u = urlnorm.get_href(self.url, href)
            if u is not None:
                out.append((u, anchor))
        return out

    # --- request/response getters (context.go:433-608) ---
    # snake_case mirrors of the reference verbs; plain attributes double as
    # the Get* surface (GetURL == ctx.url), these exist for rule-code parity

    def get_url(self) -> str:
        return self.url

    def get_method(self) -> str:
        return self.method

    def get_host(self) -> str:
        return urlnorm.host_of(self.url)

    def get_referer(self) -> str:
        return self.referer

    def get_cookie(self) -> str:
        return self.cookie

    def get_status_code(self) -> int:
        return self.status

    def get_keyin(self) -> str:
        return self.keyin

    def get_rule_name(self) -> str:
        return self.rule

    def get_dom(self) -> str:
        return self.doc

    def get_text(self) -> str:
        return self.text

    def get_limit(self) -> int:
        return self.limit

    def get_header(self, key: str | None = None):
        """Response header(s) (GetHeader, context.go:580-588): the full
        dict, or one value (empty string if absent)."""
        if key is None:
            return dict(self.response_headers)
        return self.response_headers.get(key, "")

    def get_request_header(self, key: str | None = None):
        """Request header(s) as sent (GetRequestHeader, context.go:590-598)
        — synthesized from the carried Cookie/User-Agent, the two headers
        the fetch path actually varies per request."""
        h = {}
        if self.user_agent:
            h["User-Agent"] = self.user_agent
        if self.cookie:
            h["Cookie"] = self.cookie
        if key is None:
            return h
        return h.get(key, "")

    def get_request(self) -> LinkRequest:
        """The current request as a LinkRequest view (GetRequest,
        context.go:450-456)."""
        return LinkRequest(url=self.url, rule=self.rule, method=self.method,
                           post_data=self.post_data, temp=self.temp_json())

    def copy_request(self) -> LinkRequest:
        """Independent copy of the current request (CopyRequest,
        context.go:458) — mutate and re-enqueue without touching the
        original."""
        import copy

        return copy.deepcopy(self.get_request())

    # --- request/body mutators (context.go:309-317, 409) ---

    def set_url(self, url: str) -> None:
        """Rewrite the page url (SetURL, context.go:309) — affects link
        resolution and the default Url item column."""
        self.url = url

    def set_referer(self, referer: str) -> None:
        self.referer = referer

    def reset_text(self, body: str | bytes) -> None:
        """Replace the downloaded body (ResetText, context.go:409) and
        invalidate the lazy doc/text caches."""
        self.html_bytes = body.encode("utf-8") if isinstance(body, str) else body
        self._doc = None
        self._text = None

    # --- spider introspection + item fields (context.go:322, 461-538) ---

    def get_spider(self):
        return self.spider

    def get_name(self) -> str:
        return self.spider.name if self.spider else ""

    def get_rules(self) -> list[str]:
        return sorted(self.spider.rules) if self.spider else []

    def get_item_fields(self, rule: str | None = None) -> list[str]:
        if not self.spider:
            return []
        return list(self.spider.rules[rule or self.rule].item_fields)

    def get_item_field(self, index: int, rule: str | None = None) -> str:
        fields = self.get_item_fields(rule)
        return fields[index] if 0 <= index < len(fields) else ""

    def get_item_field_index(self, field_name: str,
                             rule: str | None = None) -> int:
        fields = self.get_item_fields(rule)
        return fields.index(field_name) if field_name in fields else -1

    def upsert_item_field(self, field_name: str,
                          rule: str | None = None) -> int:
        """Append a field to the rule's ItemFields if missing; return its
        index (UpsertItemField, context.go:322-330)."""
        if not self.spider:
            return -1
        fields = self.spider.rules[rule or self.rule].item_fields
        if field_name not in fields:
            fields.append(field_name)
        return fields.index(field_name)

    def parse(self, rule: str) -> None:
        """Dispatch ANOTHER rule on this same page (ctx.Parse,
        context.go:356-376) — outputs accumulate on this context."""
        prev, self.rule = self.rule, rule
        try:
            self.spider.run_rule(self)
        finally:
            self.rule = prev

    def create_item(self, indexed: dict, rule: str | None = None) -> dict:
        """Build an item dict from {field-index: value} using the rule's
        ItemFields (CreateItem, context.go:288-302); indices without a
        registered field are dropped, matching GetItemField's empty-name
        behavior."""
        out = {}
        for idx, value in sorted(indexed.items()):
            name = self.get_item_field(int(idx), rule)
            if name:
                out[name] = value
        return out

    def aid(self, args: dict | None = None, rule: str | None = None):
        """Invoke the spider's AidFunc helper (Aid, context.go:333-352;
        spider.go:57) — the escape hatch rules use for data-dependent
        frontier expansion (jdsearch.go:49-67 paging fan-out). The helper
        receives (ctx, args) and may enqueue via ctx.add_queue."""
        del rule  # reference routes Aid through the spider, not per rule
        if self.spider is None or self.spider.aid_func is None:
            return None
        return self.spider.aid_func(self, args or {})

    # --- scheduler knobs + timers (context.go:378-406) ---
    # accumulated as control signals; see __init__ notes on why the driver
    # (not the worker task) applies them

    def set_keyin(self, keyin: str) -> None:
        self.keyin = keyin
        self.controls.append(("keyin", keyin))

    def set_limit(self, limit: int) -> None:
        self.limit = int(limit)
        self.controls.append(("limit", int(limit)))

    def set_pausetime(self, pause_sec: float) -> None:
        self.pausetime = float(pause_sec)
        self.controls.append(("pausetime", float(pause_sec)))

    def set_timer(self, timer_id: str, timer) -> None:
        """Register a named recurring timer (SetTimer, context.go:399-403);
        the driver wires it into state.timer.run_recurring."""
        self.controls.append(("set_timer", (timer_id, timer)))

    def run_timer(self, timer_id: str) -> None:
        """Request a timer tick (RunTimer, context.go:405-406). The
        reference blocks the rule goroutine until the bell; the driver-side
        equivalent re-arms the crawl at the timer's next virtual fire."""
        self.controls.append(("run_timer", timer_id))

    # --- diagnostics (context.go:420-431) ---

    def log(self, msg: str) -> None:
        self.logs.append(str(msg))

    def get_error(self) -> Exception | None:
        return self.error

    # --- temp state (context.go:304-307, 542-558) ---

    def set_temp(self, key: str, value) -> None:
        self._temp[key] = value

    def get_temp(self, key: str, default=None):
        return self._temp.get(key, default)

    def temp_json(self) -> str:
        return json.dumps(self._temp, sort_keys=True) if self._temp else ""

    def get_temps(self) -> dict:
        return self._temp

    def copy_temps(self) -> dict:
        """Deep copy of the temp map (CopyTemps, context.go:552-558)."""
        return json.loads(json.dumps(self._temp))

    # --- output pulls (context.go:493-508) ---

    def pull_items(self) -> list[dict]:
        out, self.items = self.items, []
        return out

    def pull_files(self) -> list[tuple[str, bytes]]:
        out, self.files = self.files, []
        return out

    # --- outputs (context.go:214-247) ---

    def output(self, item: dict) -> None:
        self.items.append(item)

    def file_output(self, name: str, data: bytes) -> None:
        self.files.append((name, data))

    def add_queue(self, url: str, rule: str | None = None, priority: int = 0,
                  anchor: str = "", reloadable: bool = False,
                  temp: dict | None = None, method: str = "GET",
                  post_data: str = "") -> None:
        """Enqueue a child request (ctx.AddQueue, context.go:104-125).
        Relative urls are resolved against the page url. ``method`` follows
        request.go:72-76 (upper-cased, unknown -> GET); the dedup key covers
        (url, method, rule) so the same URL fetched via GET and POST are
        distinct requests — ``post_data`` is NOT part of the key, matching
        the reference's url+method history identity (history.go)."""
        resolved = urlnorm.get_href(self.url, url)
        if resolved is None:
            return
        self.requests.append(
            LinkRequest(
                url=resolved,
                rule=rule or self.rule,
                method=normalize_method(method),
                post_data=post_data,
                priority=max(0, int(priority)),
                anchor=anchor,
                reloadable=reloadable,
                temp=json.dumps(temp, sort_keys=True) if temp else "",
            )
        )


@dataclass
class Rule:
    """One parse node (reference Rule, spider.go:43-58)."""

    parse: Callable[[RuleContext], None]
    item_fields: list[str] = field(default_factory=list)


@dataclass
class Spider:
    """A named pipeline definition (reference Spider, spider.go:26-59)."""

    name: str
    rules: dict[str, Rule]
    entry_rule: str = "page"
    not_default_field: bool = False  # spider.go:34: suppress Url/ParentUrl/DownloadTime
    # spider.go:33 EnableCookie: cookies + FIXED UA when True, no cookies +
    # per-attempt UA rotation when False (surfer/param.go:86-96)
    enable_cookie: bool = False
    # spider.go:57 AidFunc: the rule-invocable helper (ctx.aid); receives
    # (ctx, args) — used for data-dependent paging fan-out
    aid_func: Callable | None = None

    def run_rule(self, ctx: RuleContext) -> None:
        ctx.spider = self  # GetSpider / item-field verbs (context.go:433)
        rule = self.rules[ctx.rule]
        rule.parse(ctx)

    def finalize_item(self, ctx: RuleContext, item: dict) -> str:
        """Append default columns + stable JSON encoding (context.go:236-241)."""
        out = dict(item)
        if not self.not_default_field:
            out["Url"] = ctx.url
            out["ParentUrl"] = ctx.referer
            out["DownloadTime"] = ctx.download_time
        return json.dumps(out, sort_keys=True, ensure_ascii=False)


# --- registry (reference species.go:25-38) ---------------------------------

_REGISTRY: dict[str, Spider] = {}


def register(spider: Spider, replace: bool = False) -> Spider:
    """Register a spider; a duplicate name gets a numeric suffix ``(2)``,
    ``(3)``, … instead of clobbering (species.go:25-38 Add semantics).
    ``replace=True`` is the hot-reload path (rule files): the incoming
    spider takes over its name — latest wins."""
    name = spider.name
    if not replace:
        i = 2
        while name in _REGISTRY:
            name = f"{spider.name}({i})"
            i += 1
    spider.name = name
    _REGISTRY[name] = spider
    return spider


def get_spider(name: str) -> Spider:
    return _REGISTRY[name]


def _pinyin_initials_key(name: str) -> bytes:
    """Approximate pinyin sort key (species.go:41-59; common/pinyin
    SortInitials sorts menu entries by each rune's pinyin spelling).

    Instead of shipping a pinyin table, this exploits a public property of
    the GB2312 code chart: its level-1 hanzi block (0xB0A1-0xD7F9, the
    ~3,755 most common characters) is ordered BY PINYIN, so encoding each
    rune with the stdlib gb18030 codec yields pinyin-relative order for
    common hanzi while ASCII bytes sort as themselves. Known divergences
    from the reference, accepted for a menu ordering: rare (level-2+)
    hanzi fall back to radical order, and hanzi always sort after ASCII
    rather than interleaving with the romanized spelling."""
    return b"".join(ch.encode("gb18030", errors="replace") for ch in name)


def list_spiders() -> list[str]:
    """Registered spider names in the reference's menu order — pinyin
    initials (species.go:41-59), which equals plain lexicographic order
    for pure-ASCII names."""
    return sorted(_REGISTRY, key=_pinyin_initials_key)


# --- the default spider: full-site text+link extraction --------------------


def _parse_page(ctx: RuleContext) -> None:
    """Default rule: emit (title, text, lang-ish stats) and follow all links.

    Link priority mirrors a common hub/detail split: links pointing at a
    host's root page (/p/0) get priority 1, others 0 — exercising the
    priority queue (matrix.go:88-124 semantics).
    """
    title = ctx.title()
    text = ctx.text
    ctx.output(
        {
            "title": title,
            "text": text,
            "n_chars": len(text),
            "n_links": 0,  # patched below after links are computed
        }
    )
    links = ctx.links()
    ctx.items[-1]["n_links"] = len(links)
    for url, anchor in links:
        pr = 1 if url.endswith("/p/0") else 0
        ctx.add_queue(url, rule="page", priority=pr, anchor=anchor)


DEFAULT_SPIDER = register(
    Spider(name="site_text", rules={"page": Rule(parse=_parse_page,
                                                item_fields=["title", "text", "n_chars", "n_links"])})
)


def _parse_page_refresh(ctx: RuleContext) -> None:
    """Refresh-crawl rule: full extraction work (text, title, links) but NO
    enqueue — the frontier is the complete known URL list, the job shape of
    a 10^10-frontier re-fetch (BASELINE.json metric)."""
    title = ctx.title()
    text = ctx.text
    links = ctx.links()
    ctx.output(
        {
            "title": title,
            "text": text,
            "n_chars": len(text),
            "n_links": len(links),
        }
    )


REFRESH_SPIDER = register(
    Spider(name="refresh_text", rules={"page": Rule(parse=_parse_page_refresh,
                                                   item_fields=["title", "text", "n_chars", "n_links"])})
)
