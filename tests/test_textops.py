"""HTML text extraction + cleaners (reference context.go:678-736,
app/spider/common/common.go:19-174)."""

from pholcus_ray.functions.textops import (
    clean_html,
    deprive,
    deprive2,
    deprive_break,
    detect_charset,
    extract_article,
    extract_links,
    extract_text,
    extract_title,
    floor_n,
    is_num,
    jsonp_to_json,
    unicode16_to_utf8,
    unicode_to_utf8,
)


def test_extract_text_golden():
    html = (
        b"<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
        b"<title>My &amp; Title</title><style>p{color:red}</style></head>\n"
        b"<body>\n<!-- hidden -->\n<h1>My &amp; Title</h1>\n"
        b"<script>var x = '<p>nope</p>' + (1 < 2);</script>\n"
        b"<p>hello   world</p>\n<div><a href=\"/x\">a link</a></div>\n"
        b"</body></html>"
    )
    assert extract_text(html) == "My & Title\nMy & Title\nhello world\na link"


def test_extract_text_charset_precedence_meta_wins():
    body = "<html><head><meta charset=\"gb18030\"><title>你好</title></head><body><p>世界</p></body></html>"
    raw = body.encode("gb18030")
    # meta declares gb18030 -> decoded correctly even with a wrong CT header
    assert extract_text(raw, content_type="text/html; charset=utf-8") == "你好\n世界"


def test_extract_text_content_type_fallback():
    body = "<html><head><title>你好</title></head><body><p>世界</p></body></html>"
    raw = body.encode("gb18030")
    assert extract_text(raw, content_type="text/html; charset=gb2312") == "你好\n世界"
    assert detect_charset(raw, "text/html; charset=GBK") == "gb18030"
    assert detect_charset(b"<html></html>") == "utf-8"


def test_extract_links_order_and_forms():
    doc = (
        '<a href="/a">one</a> text <a href=\'b\' class=x>two</a>'
        "<a href=c>three</a><a href=\"javascript:void(0)\">js</a>"
        '<a href="/d"><b>bold</b> four</a>'
    )
    links = extract_links(doc)
    assert links == [
        ("/a", "one"),
        ("b", "two"),
        ("c", "three"),
        ("javascript:void(0)", "js"),
        ("/d", "bold four"),
    ]


def test_extract_title():
    assert extract_title("<title> A  &amp; B </title>") == "A & B"
    assert extract_title("<p>no title</p>") == ""


def test_clean_html_levels():
    s = "<!--c--><script>x</script><style>y</style><p>a &amp; b</p>\n\n\n"
    assert "<script>" not in clean_html(s, 1)
    assert "<style>" not in clean_html(s, 2)
    assert clean_html(s, 3).strip() == "a &amp; b"
    assert clean_html(s, 4).strip() == "a & b"
    assert clean_html(s, 5) == "a & b"


def test_strippers():
    assert deprive(" a b\tc\n") == "abc"
    assert deprive2(" a  b\t c \n") == "a b c"
    assert deprive_break("a\nb\r\nc") == "abc"


def test_unicode_decoders():
    assert unicode_to_utf8("&#20320;&#22909;") == "你好"
    assert unicode16_to_utf8(r"你好") == "你好"


def test_jsonp():
    assert jsonp_to_json('cb({"a": 1});') == '{"a": 1}'
    assert jsonp_to_json('jQuery1234_5678(  {"a": [1,2]} )') == '{"a": [1,2]}'
    assert jsonp_to_json('{"a": 1}') == '{"a": 1}'


def test_article_extractor():
    doc = "<p>short</p>\n\n<p>this is the much longer main article body text</p>\n\n<p>tail</p>"
    assert extract_article(doc) == "this is the much longer main article body text"


def test_misc_scalars():
    assert floor_n(3.14159, 2) == 3.14
    # math.Trunc semantics (toward zero), reference Floor (common.go:101-104)
    assert floor_n(-1.15, 1) == -1.1
    assert floor_n(-3.14159, 2) == -3.14
    assert is_num("1.5") and is_num("-2") and not is_num("x")


def test_corpus_text_identity(small_corpus):
    """THE invariant: extract_text(html) == ground-truth text per url."""
    import os

    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(small_corpus, "pages")).to_table(
        columns=["url", "html", "text"]
    )
    assert t.num_rows > 100
    for url, hb, txt in zip(
        t["url"].to_pylist(), t["html"].to_pylist(), t["text"].to_pylist()
    ):
        assert extract_text(hb) == txt, url


def test_xml_to_map_and_records():
    from pholcus_ray.functions.textops import xml_to_map, xml_to_records

    rss = """<?xml version="1.0"?>
    <rss xmlns:dc="http://purl.org/dc/elements/1.1/"><channel>
      <title>Feed</title>
      <item><title>A</title><link>http://x/a</link><dc:creator>ann</dc:creator></item>
      <item><title>B</title><link>http://x/b</link></item>
    </channel></rss>"""
    m = xml_to_map(rss)
    assert m["link"] == "http://x/b"      # later sibling overwrites (ref parity)
    assert m["creator"] == "ann"          # namespace stripped
    recs = xml_to_records(rss, "item")
    assert [r["title"] for r in recs] == ["A", "B"]
    assert recs[0]["creator"] == "ann"
    assert xml_to_map("<broken") == {}
    assert xml_to_records("<broken", "item") == []
