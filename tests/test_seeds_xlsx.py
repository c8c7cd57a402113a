"""S1 seed ingestion: fuzzy Korean-header column match + row filtering
(reference src/config.py:27-57 semantics)."""

from __future__ import annotations

import pandas as pd
import pytest

from crawler_spark.seeds import (
    match_seed_columns,
    seeds_from_pandas,
    site_identifier_py,
)


def test_fuzzy_column_match():
    cols = ["번호", "기관/단체/회사명", "웹사이트 주소", "주요 내용(프롬프트)"]
    url_col, name_col, prompt_col = match_seed_columns(cols)
    assert url_col == "웹사이트 주소"
    assert name_col == "기관/단체/회사명"
    assert prompt_col == "주요 내용(프롬프트)"
    # 회사 alone also matches the name column
    assert match_seed_columns(["주소", "회사명", "내용"])[1] == "회사명"
    assert match_seed_columns(["a", "b", "c"]) == (None, None, None)


def test_site_identifier_matches_spark_column_fn(spark):
    from pyspark.sql import functions as F

    from crawler_spark.functions.urlfns import site_identifier

    urls = [
        "https://www.kyobo-life.co.kr/about",
        "https://blog.naver.com/x",
        "https://www.moel.go.kr/news",
        "https://sub.brand.example.com/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["sid"]
        for r in df.withColumn("sid", site_identifier(F.col("url"))).collect()
    }
    for u in urls:
        assert got[u] == site_identifier_py(u), u


def test_seeds_from_pandas_filters_and_schema(spark):
    pdf = pd.DataFrame(
        {
            "기관명": ["A기관", "B회사", "C사"],
            "웹사이트 주소": ["https://a.example.org", "not-a-url", None],
            "주요 내용": ["공지 수집", "x", "y"],
        }
    )
    seeds = seeds_from_pandas(spark, pdf, max_pages=7, crawl_delay=0.5)
    rows = seeds.collect()
    assert len(rows) == 1  # non-http and None url rows dropped
    r = rows[0]
    assert r["base_url"] == "https://a.example.org"
    assert r["site_name"] == "A기관"
    assert r["instruction"] == "공지 수집"
    assert r["max_pages"] == 7 and r["crawl_delay"] == 0.5
    assert r["site_id"] == site_identifier_py("https://a.example.org")
    assert [f.name for f in seeds.schema.fields] == [
        "site_id", "site_name", "base_url", "instruction", "max_pages", "crawl_delay",
    ]


def test_seeds_missing_headers_raise(spark):
    with pytest.raises(ValueError):
        seeds_from_pandas(spark, pd.DataFrame({"url": [], "name": []}))
