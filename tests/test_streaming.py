"""Streaming cascade: availableNow drain must equal the batch cascade."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from crawler_spark.operators.cascade import run_cascade
from crawler_spark.streaming.worker import start_stream_cascade
from crawler_spark.wave import CrawlConfig, CrawlEngine


def test_stream_cascade_matches_batch(spark, corpus, tmp_path_factory):
    d = corpus["dir"]
    work = tmp_path_factory.mktemp("stream_crawl")
    # produce a few crawled deltas with the batch engine (cascade OFF)
    engine = CrawlEngine(
        spark, str(work),
        pages=spark.read.parquet(f"{d}/pages.parquet"),
        seeds=spark.read.parquet(f"{d}/seeds.parquet"),
        config=CrawlConfig(mode="fifo", batch_size=20, metrics=False),
    )
    engine.bootstrap()
    for _ in range(3):
        engine.run_wave()
    crawled_dir = str(work / "crawled")

    seeds = spark.read.parquet(f"{d}/seeds.parquet")
    out = tmp_path_factory.mktemp("stream_out")
    ckpt = tmp_path_factory.mktemp("stream_ckpt")
    q = start_stream_cascade(
        spark, crawled_dir, seeds, str(out), str(ckpt),
        trigger={"availableNow": True},
    )
    q.awaitTermination(timeout=300)
    assert not q.isActive

    stream_packets = spark.read.parquet(f"{out}/packets")
    batch_out = run_cascade(engine.cat.read("crawled"), seeds, wave=0)
    got = {
        (r["site_id"], r["content_url"]): r["relevance_score"]
        for r in stream_packets.collect()
    }
    exp = {
        (r["site_id"], r["content_url"]): r["relevance_score"]
        for r in batch_out["packets"].collect()
    }
    assert got == exp and len(got) > 0


def test_stream_cascade_incremental_pickup(spark, corpus, tmp_path_factory):
    """New deltas arriving between restarts are processed exactly once."""
    d = corpus["dir"]
    work = tmp_path_factory.mktemp("stream_crawl2")
    engine = CrawlEngine(
        spark, str(work),
        pages=spark.read.parquet(f"{d}/pages.parquet"),
        seeds=spark.read.parquet(f"{d}/seeds.parquet"),
        config=CrawlConfig(mode="fifo", batch_size=20, metrics=False),
    )
    engine.bootstrap()
    engine.run_wave()
    seeds = spark.read.parquet(f"{d}/seeds.parquet")
    out = tmp_path_factory.mktemp("stream_out2")
    ckpt = tmp_path_factory.mktemp("stream_ckpt2")
    crawled_dir = str(work / "crawled")

    q1 = start_stream_cascade(spark, crawled_dir, seeds, str(out), str(ckpt),
                              trigger={"availableNow": True})
    q1.awaitTermination(timeout=300)
    n1 = spark.read.parquet(f"{out}/packets").count()

    engine.run_wave()  # a new delta lands
    q2 = start_stream_cascade(spark, crawled_dir, seeds, str(out), str(ckpt),
                              trigger={"availableNow": True})
    q2.awaitTermination(timeout=300)
    packets = spark.read.parquet(f"{out}/packets")
    n2 = packets.count()
    assert n2 > n1
    # exactly-once: no duplicate content_urls across the two drains
    assert packets.count() == packets.select("content_url").distinct().count()
