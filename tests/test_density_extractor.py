"""E4 density-scoring extractor: hand-computed expected outputs."""

from __future__ import annotations

from crawler_spark.functions.html_extract import (
    density_final_clean,
    extract_page_density,
)

PAGE = b"""
<html><head><title> Density Page </title>
<script>var x;</script></head>
<body>
<header><a href="/">home home home</a> navigation chrome text here</header>
<div class="sidebar">
<a href="/l1">link one text</a> <a href="/l2">link two text</a> tiny
</div>
<div class="content">
<p>This is the principal body paragraph with plenty of real sentence text to score well.</p>
<p>A second paragraph keeps the density high and the link ratio low for this region.</p>
<ul class="share-menu"><li><a href="/s">share this page somewhere</a></li></ul>
<p>Third paragraph of honest content wraps up the article body nicely.</p>
</div>
<footer>Copyright 2025 nobody</footer>
</body></html>
"""


def test_density_picks_content_div_and_strips_noise():
    res = extract_page_density(PAGE, "https://h.example.org/p", "h.example.org")
    assert res is not None
    text = res["text"]
    assert "principal body paragraph" in text
    assert "second paragraph" in text
    assert "share this page" not in text  # share-menu ul decomposed
    assert "navigation chrome" not in text  # header dropped before scoring
    assert "Copyright" not in text
    assert res["title"] == "Density Page"
    # multi-line output (unlike the selector extractor's collapsed line)
    assert text.count("\n") >= 2


def test_density_link_heavy_region_loses():
    html = b"""
    <html><body>
    <div id="linkfarm">
    <a href="/a">verbose anchor text one that is long</a>
    <a href="/b">verbose anchor text two that is long</a>
    <a href="/c">verbose anchor text three that is long</a>
    <a href="/d">verbose anchor text four that is long</a>
    </div>
    <div id="story">
    <p>Plain prose content with no links at all, long enough to pass the
    one hundred character threshold for candidate scoring in the density
    extractor implementation.</p>
    </div>
    </body></html>
    """
    res = extract_page_density(html, "https://h/", "h")
    assert "Plain prose content" in res["text"]
    assert "verbose anchor text one" not in res["text"]


def test_density_fallback_to_body():
    html = b"<html><body><p>short body only, under candidate threshold but real.</p></body></html>"
    res = extract_page_density(html, "https://h/", "h")
    assert "short body only" in res["text"]


def test_density_final_clean_rules():
    raw = "\n\n\n\n  a line that is long enough to stay\n작성자 : kim\nshort\n다운로드 here\nанother line long enough to remain\n"
    out = density_final_clean(raw)
    lines = out.split("\n")
    assert "a line that is long enough to stay" in lines
    assert all("작성자" not in ln and "다운로드" not in ln and ln != "short" for ln in lines)


def test_density_udf_runs(spark, corpus_dir):
    from pyspark.sql import functions as F

    from crawler_spark.functions.html_extract import extract_density_udf

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet").limit(30)
    out = pages.withColumn(
        "ex", extract_density_udf("html", "url", F.parse_url("url", F.lit("HOST")))
    ).select("url", "ex.text", "ex.quality_score")
    rows = out.collect()
    assert len(rows) == 30
    assert sum(1 for r in rows if r["text"]) >= 20
