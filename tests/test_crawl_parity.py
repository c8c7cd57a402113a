"""End-to-end crawl parity: engine vs pure-Python oracle.

BASELINE invariants 2+3: wave-by-wave crawl ordering and final URL-seen
set must match the reference semantics given the same seed list (and, in
priority mode, the same politeness budget).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from crawler_spark.wave import CrawlConfig, CrawlEngine
from tests.oracle import oracle_crawl_fifo, oracle_crawl_priority


def _load_tables(spark, corpus_dir):
    return dict(
        pages=spark.read.parquet(f"{corpus_dir}/pages.parquet"),
        seeds=spark.read.parquet(f"{corpus_dir}/seeds.parquet"),
        robots=spark.read.parquet(f"{corpus_dir}/robots.parquet"),
        kb=spark.read.parquet(f"{corpus_dir}/kb_seed.parquet"),
        ledger=spark.read.parquet(f"{corpus_dir}/ledger_seed.parquet"),
    )


def _engine_waves(engine, site_id, order="fifo"):
    """Per-wave URL lists of consumed (popped) frontier rows.

    ``order='fifo'`` lists each wave in seq (deque pop) order — the
    reference-parity ordering. ``order='priority'`` lists it in the
    priority-queue emission order (-score, depth, seq)."""
    f = engine.cat.read("frontier")
    rows = (
        f.filter(
            (F.col("site_id") == site_id)
            & F.col("processed_wave").isNotNull()
            & (F.col("state") != "gated_kb")
            & (F.col("state") != "robots_blocked")
        )
        .select("processed_wave", "seq", "canonical_url", "score", "depth")
        .collect()
    )
    waves: dict[int, list] = {}
    for r in rows:
        waves.setdefault(r["processed_wave"], []).append(r)
    out = []
    for k in sorted(waves):
        if order == "fifo":
            ordered = sorted(waves[k], key=lambda r: r["seq"])
        else:
            ordered = sorted(waves[k], key=lambda r: (-r["score"], r["depth"], r["seq"]))
        out.append([r["canonical_url"] for r in ordered])
    return out


@pytest.fixture(scope="module")
def fifo_run(spark, corpus, tmp_path_factory):
    t = _load_tables(spark, corpus["dir"])
    work = tmp_path_factory.mktemp("fifo_run")
    engine = CrawlEngine(
        spark,
        str(work),
        pages=t["pages"],
        seeds=t["seeds"],
        robots=t["robots"],
        kb_seed=t["kb"],
        ledger_seed=t["ledger"],
        config=CrawlConfig(mode="fifo", batch_size=20, metrics=True),
    )
    history = engine.run(max_waves=60)
    return engine, history


def test_fifo_wave_order_parity(fifo_run, corpus):
    engine, history = fifo_run
    seeds = pq.read_table(f"{corpus['dir']}/seeds.parquet").to_pylist()
    for s in seeds:
        oracle = oracle_crawl_fifo(
            corpus["dir"], corpus["manifest"], s["site_id"], s["base_url"],
            batch_size=20,
        )
        got = _engine_waves(engine, s["site_id"])
        assert got == oracle["waves"], (
            f"wave order mismatch for {s['site_id']}: "
            f"engine {sum(map(len, got))} urls in {len(got)} waves, "
            f"oracle {sum(map(len, oracle['waves']))} in {len(oracle['waves'])}"
        )


def test_fifo_seen_set_parity(fifo_run, corpus):
    engine, _ = fifo_run
    seeds = pq.read_table(f"{corpus['dir']}/seeds.parquet").to_pylist()
    seen = engine.cat.read("seen")
    for s in seeds:
        oracle = oracle_crawl_fifo(
            corpus["dir"], corpus["manifest"], s["site_id"], s["base_url"],
            batch_size=20,
        )
        got = {
            r["canonical_url"]
            for r in seen.filter(F.col("site_id") == s["site_id"]).collect()
        }
        assert got == oracle["visited"], s["site_id"]


def test_fifo_crawled_set_parity(fifo_run, corpus):
    engine, _ = fifo_run
    seeds = pq.read_table(f"{corpus['dir']}/seeds.parquet").to_pylist()
    crawled = engine.cat.read("crawled")
    for s in seeds:
        oracle = oracle_crawl_fifo(
            corpus["dir"], corpus["manifest"], s["site_id"], s["base_url"],
            batch_size=20,
        )
        got = {
            r["canonical_url"]
            for r in crawled.filter(F.col("site_id") == s["site_id"]).collect()
        }
        assert got == set(oracle["crawled"]), s["site_id"]
        # crawled pages carry byte-exact oracle text (re-check through the
        # full engine path)
        pages = dict(
            (r["url"], r["text"])
            for r in pq.read_table(
                f"{corpus['dir']}/pages.parquet", columns=["url", "text"]
            ).to_pylist()
        )
        for r in crawled.filter(F.col("site_id") == s["site_id"]).collect():
            assert r["text"] == pages[r["canonical_url"]]


def test_fifo_max_pages_stop(spark, corpus, tmp_path_factory):
    t = _load_tables(spark, corpus["dir"])
    seeds_small = t["seeds"].withColumn("max_pages", F.lit(15))
    work = tmp_path_factory.mktemp("fifo_maxp")
    engine = CrawlEngine(
        spark, str(work), pages=t["pages"], seeds=seeds_small,
        kb_seed=t["kb"], ledger_seed=t["ledger"],
        config=CrawlConfig(mode="fifo", batch_size=None, metrics=False),
    )
    engine.run(max_waves=40)
    seeds = pq.read_table(f"{corpus['dir']}/seeds.parquet").to_pylist()
    for s in seeds:
        # reference batch formula: min(20, max_pages//5) = min(20, 3) = 3
        oracle = oracle_crawl_fifo(
            corpus["dir"], corpus["manifest"], s["site_id"], s["base_url"],
            batch_size=3, max_pages=15,
        )
        got = _engine_waves(engine, s["site_id"])
        assert got == oracle["waves"], s["site_id"]
        stats = {
            r["site_id"]: r["scanned"]
            for r in engine.cat.read("site_stats").collect()
        }
        assert stats[s["site_id"]] == oracle["scanned"]


def test_priority_politeness_parity(spark, corpus, tmp_path_factory):
    t = _load_tables(spark, corpus["dir"])
    # one seed, open crawl over all hosts → politeness quota matters
    seeds_one = t["seeds"].filter(F.col("site_id") == "mega0")
    work = tmp_path_factory.mktemp("prio_run")
    engine = CrawlEngine(
        spark, str(work), pages=t["pages"], seeds=seeds_one,
        robots=t["robots"], kb_seed=t["kb"], ledger_seed=t["ledger"],
        config=CrawlConfig(
            mode="priority", batch_size=40, wave_seconds=8.0,
            same_domain_only=False, metrics=True,
        ),
    )
    engine.run(max_waves=80)
    oracle = oracle_crawl_priority(
        corpus["dir"], corpus["manifest"], "mega0",
        "https://mega0.example.org/", batch_size=40, wave_seconds=8.0,
        open_crawl=True,
    )
    got = _engine_waves(engine, "mega0", order="priority")
    assert got == oracle["waves"]
    seen = {
        r["canonical_url"] for r in engine.cat.read("seen").collect()
    }
    assert seen == oracle["visited"]


def test_priority_politeness_quota_property(spark, corpus, tmp_path_factory):
    """Property: per wave and host, fetch count ≤ floor(wave_s/delay) and
    no fetched URL matches a robots disallow rule (SURVEY §5 invariant 6)."""
    t = _load_tables(spark, corpus["dir"])
    seeds_one = t["seeds"].filter(F.col("site_id") == "mega0")
    work = tmp_path_factory.mktemp("prio_prop")
    engine = CrawlEngine(
        spark, str(work), pages=t["pages"], seeds=seeds_one,
        robots=t["robots"], kb_seed=t["kb"], ledger_seed=t["ledger"],
        config=CrawlConfig(
            mode="priority", batch_size=100, wave_seconds=6.0,
            same_domain_only=False, metrics=False,
        ),
    )
    engine.run(max_waves=10)  # property holds per wave; no need to finish
    f = engine.cat.read("frontier")
    consumed = f.filter(
        F.col("processed_wave").isNotNull()
        & ~F.col("state").isin("gated_kb", "robots_blocked")
    )
    robots = {r["host"]: r for r in pq.read_table(f"{corpus['dir']}/robots.parquet").to_pylist()}
    counts = (
        consumed.groupBy("processed_wave", "host").count().collect()
    )
    for r in counts:
        delay = max(1.0, robots.get(r["host"], {}).get("crawl_delay", 0.0))
        assert r["count"] <= max(1, int(6.0 // delay)), r
    # robots disallow honored
    for r in consumed.collect():
        rb = robots.get(r["host"])
        if rb:
            path = r["canonical_url"].split(r["host"], 1)[1]
            assert not any(path.startswith(p) for p in rb["disallow"]), r
