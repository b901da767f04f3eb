"""HTML text extraction, charset handling and string cleaners.

Reference parity (SURVEY.md §2.2):

- M2  charset detect + UTF-8 transcode (context.go:678-736). Precedence
  reproduced exactly: (1) charset in an HTML ``<meta>`` within the head,
  (2) charset in the Content-Type header, (3) UTF-8 fallback.
- M3/M4 DOM text extraction (goquery ``.Text()`` / context GetText).
- M7  leveled HTML cleaner (app/spider/common/common.go:19-41).
- M8  longest-text-block article extractor (common.go:45-77).
- M9  whitespace strippers Deprive/Deprive2/DepriveBreak (common.go:80-98).
- M13 unicode escape decoders (common.go:143-174).
- M6  JSONP -> JSON normalizer (common/util/util.go:43-56).

``extract_text`` is THE byte-identical invariant of the engine
(BASELINE.json input_hint: "byte-identical extracted text per url"): one pure
function ``html bytes -> text str``, golden-tested and verified row-for-row
against the corpus ground truth.

Extraction spec (documented contract):
1. decode bytes per charset precedence above
2. drop ``<script>``/``<style>``/``<noscript>`` elements and HTML comments
3. block-level tags (p, div, br, li, ul, ol, h1-h6, tr, table, title, header,
   footer, section, article, blockquote, pre, form, hr) become newlines;
   all other tags become the empty string
4. HTML entities unescaped
5. per line: collapse runs of whitespace to single spaces, strip; drop empty
   lines; join with "\\n"
"""

from __future__ import annotations

import html as _html
import re

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I
)
_CT_CHARSET_RE = re.compile(r"""charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I)

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.I | re.S)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.I | re.S)
_NOSCRIPT_RE = re.compile(r"<noscript\b.*?</noscript\s*>", re.I | re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|title|head|header|footer|"
    r"section|article|blockquote|pre|form|hr|body|html)\b[^>]*/?>",
    re.I,
)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v ]+")

_CHARSET_ALIASES = {
    "gb2312": "gb18030",
    "gbk": "gb18030",
    "iso-8859-1": "latin-1",
}


def detect_charset(html_bytes: bytes, content_type: str | None = None) -> str:
    """Charset with the reference's precedence (context.go:678-736):
    meta tag in the document head -> Content-Type header -> utf-8."""
    head = html_bytes[:2048]
    m = _META_CHARSET_RE.search(head)
    if m:
        return _norm_charset(m.group(1).decode("ascii", "replace"))
    if content_type:
        m2 = _CT_CHARSET_RE.search(content_type)
        if m2:
            return _norm_charset(m2.group(1))
    return "utf-8"


def _norm_charset(name: str) -> str:
    name = name.strip().lower()
    return _CHARSET_ALIASES.get(name, name)


def to_text(html_bytes: bytes, content_type: str | None = None) -> str:
    """Decode raw page bytes to str (reference GetText, context.go:631-644)."""
    cs = detect_charset(html_bytes, content_type)
    try:
        return html_bytes.decode(cs, errors="replace")
    except LookupError:
        return html_bytes.decode("utf-8", errors="replace")


def extract_text(html_bytes: bytes, content_type: str | None = None) -> str:
    """The byte-identical invariant: raw page bytes -> extracted text."""
    doc = to_text(html_bytes, content_type)
    doc = _COMMENT_RE.sub("", doc)
    doc = _SCRIPT_RE.sub("", doc)
    doc = _STYLE_RE.sub("", doc)
    doc = _NOSCRIPT_RE.sub("", doc)
    doc = _BLOCK_TAG_RE.sub("\n", doc)
    doc = _ANY_TAG_RE.sub("", doc)
    doc = _html.unescape(doc)
    lines = []
    for raw in doc.split("\n"):
        line = _WS_RE.sub(" ", raw).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


_HREF_RE = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a\s*>""",
    re.I | re.S,
)


def extract_links(html_text: str) -> list[tuple[str, str]]:
    """All anchors in document order as (href, anchor_text) pairs.

    The href is raw (unresolved); resolution/filtering happens in
    urlnorm.get_href. Anchor text is tag-stripped, entity-unescaped and
    whitespace-collapsed.
    """
    out = []
    for m in _HREF_RE.finditer(html_text):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        anchor = _WS_RE.sub(" ", _html.unescape(_ANY_TAG_RE.sub("", m.group(4)))).strip()
        out.append((_html.unescape(href), anchor))
    return out


_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.I | re.S)


def extract_title(html_text: str) -> str:
    m = _TITLE_RE.search(html_text)
    if not m:
        return ""
    return _WS_RE.sub(" ", _html.unescape(m.group(1))).strip()


# --- leveled HTML cleaner (reference common.go:19-41) ----------------------


def clean_html(s: str, depth: int = 1) -> str:
    """Leveled cleaner mirroring the reference's CleanHtml semantics:
    depth>=1 strip script+comments, >=2 strip style, >=3 strip all tags,
    >=4 unescape entities, >=5 collapse whitespace."""
    if depth >= 1:
        s = _COMMENT_RE.sub("", s)
        s = _SCRIPT_RE.sub("", s)
    if depth >= 2:
        s = _STYLE_RE.sub("", s)
        s = _NOSCRIPT_RE.sub("", s)
    if depth >= 3:
        s = _ANY_TAG_RE.sub("", s)
    if depth >= 4:
        s = _html.unescape(s)
    if depth >= 5:
        s = _WS_RE.sub(" ", s)
        s = re.sub(r"\n\s*\n+", "\n", s).strip()
    return s


# --- whitespace strippers (common.go:80-98, 216-231) -----------------------


def deprive(s: str) -> str:
    """Remove ALL whitespace."""
    return re.sub(r"\s+", "", s)


def deprive2(s: str) -> str:
    """Collapse whitespace runs to single spaces and strip."""
    return re.sub(r"\s+", " ", s).strip()


def deprive_break(s: str) -> str:
    """Remove line breaks only."""
    return s.replace("\r", "").replace("\n", "")


def deprive_multi_break(s: str) -> str:
    """Collapse multiple blank lines to one newline."""
    return re.sub(r"\n\s*\n+", "\n", s)


# --- unicode escape decoders (common.go:143-174) ---------------------------


def unicode_to_utf8(s: str) -> str:
    """Decode ``&#NNNN;`` decimal entity escapes."""
    return re.sub(r"&#(\d+);", lambda m: chr(int(m.group(1))), s)


def unicode16_to_utf8(s: str) -> str:
    """Decode ``\\uXXXX`` escapes."""
    return re.sub(r"\\u([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), s)


# --- JSONP normalizer (util.go:43-56) --------------------------------------


def jsonp_to_json(s: str) -> str:
    """Strip a JSONP callback wrapper: ``cb({...});`` -> ``{...}``."""
    s = s.strip().rstrip(";").strip()
    m = re.match(r"^[\w$.]+\s*\((.*)\)$", s, re.S)
    return m.group(1).strip() if m else s


# --- article extractor (common.go:45-77) -----------------------------------


def extract_article(html_text: str) -> str:
    """Longest-text-block heuristic main-content extraction: split the
    cleaned document on blank lines and return the longest block."""
    cleaned = clean_html(html_text, depth=4)
    blocks = [deprive2(b) for b in re.split(r"\n\s*\n", cleaned)]
    blocks = [b for b in blocks if b]
    if not blocks:
        return ""
    return max(blocks, key=len)


# --- misc scalar helpers (common.go / util.go) -----------------------------


def floor_n(f: float, n: int) -> float:
    """Truncate f to n decimals (reference Floor, common.go:101-104 uses
    math.Trunc: toward zero, so floor_n(-1.15, 1) == -1.1, not -1.2)."""
    import math

    scale = 10**n
    return math.trunc(f * scale) / scale


def is_num(s: str) -> bool:
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False


def split_cookies(cookie_str: str) -> list[dict[str, str]]:
    """Parse a request Cookie string ("a=1; b=2;") into name/value dicts.

    Exact reference semantics (SplitCookies, spider/common/common.go:106-118
    — SURVEY.md M15): split on ';' then '=', keep a fragment only when the
    '='-split yields EXACTLY two parts — so values that themselves contain
    '=' (e.g. "a=b=c") are dropped, as in the reference — and trim spaces
    from both name and value. Values stay percent-encoded as given."""
    out = []
    for frag in cookie_str.split(";"):
        parts = frag.split("=")
        if len(parts) == 2:
            name, value = parts[0].strip(), parts[1].strip()
            out.append({"name": name, "value": value})
    return out


# --- XML parsing (util.go:228-249 XML2mapstr) ------------------------------


def xml_to_map(xml_text: str) -> dict[str, str]:
    """XML string -> {tag: text} of leaf elements (reference XML2mapstr
    semantics: later siblings with the same tag overwrite earlier ones;
    namespaces are stripped to the local tag name). RSS-style rules use
    this to lift item fields without a DOM walk."""
    from xml.etree import ElementTree

    try:
        root = ElementTree.fromstring(xml_text)
    except ElementTree.ParseError:
        return {}
    out: dict[str, str] = {}

    def walk(el) -> None:
        children = list(el)
        if not children:
            tag = el.tag.rsplit("}", 1)[-1]
            out[tag] = (el.text or "").strip()
            return
        for c in children:
            walk(c)

    walk(root)
    return out


def xml_to_records(xml_text: str, record_tag: str) -> list[dict[str, str]]:
    """All <record_tag> elements as leaf-tag maps — the per-item companion
    of xml_to_map for feeds (one dict per <item>/<entry>/...)."""
    from xml.etree import ElementTree

    try:
        root = ElementTree.fromstring(xml_text)
    except ElementTree.ParseError:
        return []
    records = []
    for el in root.iter():
        if el.tag.rsplit("}", 1)[-1] == record_tag:
            rec: dict[str, str] = {}
            for leaf in el.iter():
                if not list(leaf) and leaf is not el:
                    rec[leaf.tag.rsplit("}", 1)[-1]] = (leaf.text or "").strip()
            records.append(rec)
    return records
