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


def test_stream_feedback_state_equals_batch(spark, corpus, tmp_path_factory):
    """KB MERGE + ledger upsert in foreachBatch must be state-equivalent
    to folding the batch cascade wave-by-wave over the same crawled
    deltas (reference worker updates KB per verdict,
    llm_processing_worker.py:97-123)."""
    from crawler_spark.operators.cascade import merge_ledger
    from crawler_spark.operators.kb import merge_kb, wave_kb_delta
    from crawler_spark.streaming.worker import make_feedback_catalog, read_ledger_state
    from crawler_spark import schemas

    d = corpus["dir"]
    work = tmp_path_factory.mktemp("stream_crawl3")
    engine = CrawlEngine(
        spark, str(work),
        pages=spark.read.parquet(f"{d}/pages.parquet"),
        seeds=spark.read.parquet(f"{d}/seeds.parquet"),
        config=CrawlConfig(mode="fifo", batch_size=20, metrics=False),
    )
    engine.bootstrap()
    for _ in range(3):
        engine.run_wave()
    seeds = spark.read.parquet(f"{d}/seeds.parquet")

    # streaming side: drain with a feedback catalog attached
    out = tmp_path_factory.mktemp("stream_out3")
    ckpt = tmp_path_factory.mktemp("stream_ckpt3")
    state = tmp_path_factory.mktemp("stream_state3")
    cat = make_feedback_catalog(spark, str(state), n_buckets=8)
    q = start_stream_cascade(
        spark, str(work / "crawled"), seeds, str(out), str(ckpt),
        trigger={"availableNow": True}, feedback_catalog=cat,
    )
    q.awaitTermination(timeout=300)

    # batch side: fold the cascade + merges wave by wave
    crawled = engine.cat.read("crawled")
    waves = sorted(r["wave"] for r in crawled.select("wave").distinct().collect())
    kb = spark.createDataFrame([], schemas.KB)
    ledger = spark.createDataFrame([], schemas.LEDGER)
    for w in waves:
        o = run_cascade(crawled.filter(F.col("wave") == w), seeds, wave=w)
        kb = merge_kb(kb, wave_kb_delta(o["verdicts"]))
        ledger = merge_ledger(ledger, o["ledger_delta"])

    def kb_sig(df):
        return sorted(
            (r["site_id"], r["pattern"], round(r["total_score"], 6), r["count"],
             r["avg_score"], r["failure_count"])
            for r in df.collect()
        )

    def led_sig(df):
        return sorted(
            (r["url_hash"], r["url"], r["content_hash"]) for r in df.collect()
        )

    assert kb_sig(cat.read("kb", schemas.KB)) == kb_sig(kb)
    # streaming ledger is a MOR version log — compare the resolved state
    assert led_sig(read_ledger_state(cat)) == led_sig(ledger)
    assert read_ledger_state(cat).count() > 0

    # packet wave column derives from the rows, not a hardcoded 0
    pk = spark.read.parquet(f"{out}/packets")
    pk_waves = {r["wave"] for r in pk.select("wave").distinct().collect()}
    assert pk_waves <= set(waves)
    assert max(pk_waves) > 0  # wave 2/3 packets keep their real wave id

    # replay safety WITHIN the checkpoint lineage: delete the latest
    # commits/ entry — the exact crash window (catalog committed, Spark
    # never recorded batch completion) — and restart from the SAME
    # checkpoint. foreachBatch re-runs that batch; the catalog's
    # committed batch counter skips it, so the additive KB merge never
    # double-counts and no committed dir is restaged.
    import os

    n_packets_before = pk.count()
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"  # hadoop checksum shadow
    if os.path.exists(crc):
        os.remove(crc)
    q2 = start_stream_cascade(
        spark, str(work / "crawled"), seeds, str(out), str(ckpt),
        trigger={"availableNow": True}, feedback_catalog=cat,
    )
    q2.awaitTermination(timeout=300)
    assert kb_sig(cat.read("kb", schemas.KB)) == kb_sig(kb)
    assert led_sig(read_ledger_state(cat)) == led_sig(ledger)
    # per-batch overwrite sinks: the replay rewrote, not duplicated
    # (refresh: the session caches the path's file listing and the
    # replay overwrote the part files under it)
    spark.catalog.refreshByPath(f"{out}/packets")
    pk2 = spark.read.parquet(f"{out}/packets")
    assert pk2.count() == n_packets_before
    assert pk2.count() == pk2.select("content_url").distinct().count()

    # checkpoint-lineage guard: a RECREATED checkpoint restarts batch
    # ids at 0 over (potentially) different batch contents, so batch-id
    # idempotence no longer holds — the stream must fail fast instead
    # of silently skipping feedback / overwriting foreign partitions.
    import pytest
    from pyspark.errors import StreamingQueryException

    ckpt_fresh = tmp_path_factory.mktemp("stream_ckpt3_recreated")
    q3 = start_stream_cascade(
        spark, str(work / "crawled"), seeds, str(out), str(ckpt_fresh),
        trigger={"availableNow": True}, feedback_catalog=cat,
    )
    with pytest.raises(StreamingQueryException, match="lineage"):
        q3.awaitTermination(timeout=300)
    # and the refusal left all state untouched
    assert kb_sig(cat.read("kb", schemas.KB)) == kb_sig(kb)
    spark.catalog.refreshByPath(f"{out}/packets")
    assert spark.read.parquet(f"{out}/packets").count() == n_packets_before


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


def test_bind_identity_checks_catalog_before_stamping_marker(tmp_path):
    """_bind_stream_identity must validate BOTH the sink marker and the
    catalog's bound query id BEFORE writing either: if the marker were
    stamped first and the catalog then refused, the remediation the error
    recommends (restart from the original checkpoint) would fail on the
    marker now holding the refused query id."""
    import json
    import os

    import pytest

    from crawler_spark.streaming.worker import _bind_stream_identity

    class _Cat:
        root = "fake://cat"

        def get_meta(self, key, default=None):
            return "original-query"

        def set_meta(self, key, value):  # pragma: no cover
            raise AssertionError("must not bind a refused lineage")

    out_dir = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="different checkpoint lineage"):
        _bind_stream_identity("new-query", out_dir, _Cat())
    marker = os.path.join(out_dir, "_stream_identity.json")
    assert not os.path.exists(marker), "marker stamped with the refused qid"

    # sane path: fresh out_dir + matching catalog binds both
    class _FreshCat(_Cat):
        bound = None

        def get_meta(self, key, default=None):
            return self.bound

        def set_meta(self, key, value):
            self.bound = value

    cat = _FreshCat()
    _bind_stream_identity("q1", out_dir, cat)
    with open(marker) as f:
        assert json.load(f)["query_id"] == "q1"
    assert cat.bound == "q1"


def test_unreadable_checkpoint_metadata_warns(tmp_path):
    """A disabled lineage guard must be visible, not silent."""
    import warnings

    from crawler_spark.streaming.worker import _checkpoint_query_id

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _checkpoint_query_id(str(tmp_path / "nonexistent")) is None
    assert any("lineage guard is DISABLED" in str(x.message) for x in w)


def test_stream_cascade_curation_gate(spark, corpus, tmp_path_factory):
    """curate=True must partition the stream's packets exactly as
    curate_packets partitions the batch cascade's packets — gopher
    failures land in rejected as curation_repetition, survivors carry
    redacted text — and kept ∪ failed must equal the uncurated set."""
    from crawler_spark.operators.curation import curate_packets

    d = corpus["dir"]
    work = tmp_path_factory.mktemp("stream_curate_crawl")
    engine = CrawlEngine(
        spark, str(work),
        pages=spark.read.parquet(f"{d}/pages.parquet"),
        seeds=spark.read.parquet(f"{d}/seeds.parquet"),
        config=CrawlConfig(mode="fifo", batch_size=20, metrics=False),
    )
    engine.bootstrap()
    for _ in range(2):
        engine.run_wave()

    seeds = spark.read.parquet(f"{d}/seeds.parquet")
    out = tmp_path_factory.mktemp("stream_curate_out")
    ckpt = tmp_path_factory.mktemp("stream_curate_ckpt")
    q = start_stream_cascade(
        spark, str(work / "crawled"), seeds, str(out), str(ckpt),
        trigger={"availableNow": True}, curate=True,
    )
    q.awaitTermination(timeout=300)
    assert not q.isActive

    batch_out = run_cascade(engine.cat.read("crawled"), seeds, wave=0)
    kept_b, failed_b = curate_packets(batch_out["packets"])
    kept_exp = {
        r["content_url"]: r["extracted_text"] for r in kept_b.collect()
    }
    failed_exp = {r["content_url"] for r in failed_b.collect()}
    all_urls = {r["content_url"] for r in batch_out["packets"].collect()}
    assert kept_exp.keys() | failed_exp == all_urls

    got = {
        r["content_url"]: r["extracted_text"]
        for r in spark.read.parquet(f"{out}/packets").collect()
    }
    assert got == kept_exp and len(got) > 0
    rej = spark.read.parquet(f"{out}/rejected")
    got_failed = {
        r["canonical_url"]
        for r in rej.filter("reason = 'curation_repetition'").collect()
    }
    assert got_failed == failed_exp
