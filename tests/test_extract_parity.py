"""Byte-identical extracted text per URL vs the oracle (BASELINE invariant 1).

The oracle `text` column in the synthetic corpus is computed by synthgen
from the template internals (tag-strip + clean-chain spec); the engine
must reproduce it from raw `html` bytes through the full DOM path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.html_extract import (
    clean_extracted_text,
    content_quality,
    extract_page,
)


def test_pure_extraction_byte_parity(corpus_dir, spark):
    rows = spark.read.parquet(f"{corpus_dir}/pages.parquet").collect()
    assert len(rows) >= 300
    n_nonempty = 0
    for r in rows:
        res = extract_page(r["html"], r["url"], r["url"].split("/")[2])
        assert res is not None, r["url"]
        assert res["text"].encode() == r["text"].encode(), (
            f"text mismatch for {r['url']}:\n engine={res['text']!r}\n oracle={r['text']!r}"
        )
        if res["text"]:
            n_nonempty += 1
    assert n_nonempty > len(rows) * 0.8


def test_spark_udf_matches_pure_function(corpus_dir, spark):
    from crawler_spark.functions.html_extract import extract_udf

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet").limit(50)
    df = pages.withColumn(
        "base_netloc", F.parse_url("url", F.lit("HOST"))
    ).withColumn("ex", extract_udf("html", "url", "base_netloc"))
    for r in df.select("url", "text", F.col("ex.text").alias("etext"),
                       F.col("ex.links").alias("links"),
                       F.col("ex.quality_score").alias("q")).collect():
        assert r["text"] == r["etext"], r["url"]
        assert r["q"] is not None
        assert isinstance(r["links"], list) and len(r["links"]) >= 1


def test_clean_chain_edge_cases():
    assert clean_extracted_text("") == ""
    assert clean_extracted_text("short") == ""
    assert clean_extracted_text("   a long enough line of text   ") == "a long enough line of text"
    # noise keyword strip
    out = clean_extracted_text("다운로드 this stays but the keyword goes away")
    assert "다운로드" not in out and "stays" in out
    # metadata patterns
    out = clean_extracted_text("작성자 : kim 등록일 : 2024-01-01 조회수 : 55 real content here")
    assert "kim" not in out and "real content here" in out


def test_quality_score_buckets():
    assert content_quality("") == 0.0
    long_text = ". ".join(f"sentence number {i} with enough substance" for i in range(20))
    assert content_quality(long_text) >= 0.6
    assert content_quality("내용 설명 정보 " + long_text) >= content_quality(long_text)


def test_same_domain_host_match_is_case_insensitive(spark):
    """RFC 3986 §3.2.2: hosts are case-insensitive. A page on example.com
    linking https://Example.com/p2 stays same-domain on BOTH comparison
    sides (the JVM validity predicate and the Python-side link filter)."""
    from crawler_spark.functions.html_extract import extract_page
    from crawler_spark.functions.urlfns import is_valid_url, netloc_of

    html = (
        b"<html><body><main>x</main>"
        b'<a href="https://Example.com/p2">mixed-case self link</a>'
        b'<a href="https://other.com/q">cross host</a></body></html>'
    )
    res = extract_page(html, "https://example.com/p1", "example.com")
    assert [l["url"] for l in res["links"]] == ["https://Example.com/p2"]

    from pyspark.sql import functions as F  # noqa: F811

    df = spark.createDataFrame(
        [
            ("https://Example.com/p2", "example.com"),
            ("https://example.com/p3", "example.com"),
            ("https://other.com/q", "example.com"),
        ],
        "url string, base_netloc string",
    )
    got = df.select(
        "url", is_valid_url(F.col("url"), F.col("base_netloc")).alias("ok")
    ).collect()
    assert {r["url"]: r["ok"] for r in got} == {
        "https://Example.com/p2": True,
        "https://example.com/p3": True,
        "https://other.com/q": False,
    }
    assert df.select(netloc_of(F.col("url")).alias("n")).distinct().count() == 2
