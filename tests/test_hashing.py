"""xxhash64 parity: pure-Python oracle must match Spark's JVM expression."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.hashing import xxhash64_long, xxhash64_str


def test_xxhash64_str_matches_spark(spark):
    samples = [
        "",
        "a",
        "abc",
        "https://example.com/",
        "https://mega0.example.com/a/b/c?q=1",
        "한국어 텍스트 테스트",  # multibyte UTF-8
        "x" * 7,
        "x" * 8,
        "x" * 31,
        "x" * 32,
        "x" * 33,
        "x" * 100,
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == xxhash64_str(s), f"mismatch for {s!r}"


def test_xxhash64_long_matches_spark(spark):
    samples = [0, 1, -1, 42, 2**62, -(2**62), 123456789]
    df = spark.createDataFrame([(v,) for v in samples], ["v"])
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in samples:
        assert got[v] == xxhash64_long(v), f"mismatch for {v}"
