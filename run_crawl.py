"""CLI entry point for the crawl engine — the spark-submit surface.

Local:
    python run_crawl.py --corpus /tmp/corpus --workdir /tmp/crawl1 \
        --mode priority --waves 20 --cascade

Cluster (the north-rule launch path):
    python make_pyfiles.py           # → dist/crawler_spark.zip
    spark-submit --py-files dist/crawler_spark.zip run_crawl.py \
        --corpus s3://bucket/corpus --workdir s3://bucket/crawl1 ...

If --corpus does not exist, a synthetic corpus is generated there first
(--gen-pages controls its size).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser(description="crawler_spark wave-synchronous crawl")
    ap.add_argument("--corpus", required=True, help="dir with pages/seeds/robots parquet")
    ap.add_argument("--workdir", required=True, help="engine state dir (checkpointed)")
    ap.add_argument("--mode", choices=["fifo", "priority"], default="priority")
    ap.add_argument("--waves", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--wave-seconds", type=float, default=20.0)
    ap.add_argument("--cascade", action="store_true", help="run the filter cascade per wave")
    ap.add_argument("--curate", action="store_true",
                    help="gopher-gate + PII-redact packets before commit (needs --cascade)")
    ap.add_argument("--bloom", action="store_true", help="bloom-prefiltered seen set")
    ap.add_argument("--open-crawl", action="store_true", help="follow cross-host links")
    ap.add_argument("--extractor", choices=["selector", "density"], default="selector",
                    help="main-content extraction strategy (E3 selector-priority or E4 link-density)")
    ap.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default="bloom",
                    help="probabilistic seen prefilter backend (with --bloom)")
    ap.add_argument("--fetch", choices=["simulated", "http"], default="simulated",
                    help="page fetch stage: simulated join vs real HTTP (operators/fetch.py)")
    ap.add_argument("--robots", choices=["table", "http"], default="table",
                    help="politeness rules source: robots.parquet in --corpus (table) "
                         "or live /robots.txt fetch per seed host (http)")
    ap.add_argument("--robots-ttl", type=float, default=24 * 3600.0,
                    metavar="SECONDS",
                    help="http robots mode: re-fetch a host's robots.txt once its "
                         "cached copy is older than this (RFC 9309 suggests ~24h; "
                         "0 = fetch-once, never refresh)")
    ap.add_argument("--warc-out", default=None, metavar="DIR",
                    help="archive every live-fetched page as Common-Crawl-"
                         "layout WARC under DIR/wave-N (requires --fetch http)")
    ap.add_argument("--warc", default=None, metavar="DIR",
                    help="read the pages table from a directory of Common-Crawl "
                         ".warc/.warc.gz archives instead of pages.parquet "
                         "(simulated fetch mode)")
    ap.add_argument("--sitemaps", action="store_true",
                    help="seed the wave-0 frontier from each host's sitemaps "
                         "(robots.txt Sitemap: directives, /sitemap.xml fallback)")
    ap.add_argument("--attachments", choices=["off", "http", "table"], default="off",
                    help="attachment stage: fetch+parse linked documents into page text "
                         "(table mode reads attachments.parquet in --corpus)")
    ap.add_argument("--compact-every", type=int, default=0,
                    help="split-compact the frontier log every K waves (0 = off)")
    ap.add_argument("--compact-ratio", type=float, default=0.0,
                    help="adaptively compact when terminal rows since last compaction "
                         "exceed this fraction of live pending (0 = off)")
    ap.add_argument("--catalog", choices=["parquet", "iceberg"], default="parquet",
                    help="table storage backend; with iceberg, --workdir is a "
                         "catalog.namespace identifier (see docs/ICEBERG.md)")
    ap.add_argument("--master", default=None,
                    help="Spark master; omit to honor spark-submit --master "
                         "(falls back to SPARK_GRAFT_MASTER, then local[*])")
    ap.add_argument("--gen-pages", type=int, default=2000)
    args = ap.parse_args()
    if args.warc and args.fetch == "http":
        ap.error("--warc provides the pages table for the simulated fetch; "
                 "it cannot be combined with --fetch http (the WARC corpus "
                 "would be silently ignored)")
    if args.warc_out and args.fetch != "http":
        ap.error("--warc-out archives live-fetched pages; with the simulated "
                 "fetch the pages table IS the archive (use --fetch http)")

    from crawler_spark.session import build_session
    from crawler_spark.sources import latest_captures, read_warc
    from crawler_spark.wave import CrawlConfig, CrawlEngine

    spark = build_session(app_name="run_crawl", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    # with --warc, pages come from the archives; with --fetch http they
    # come from the live web — either way the corpus dir only needs
    # seeds (and optional robots/kb/ledger/attachments) parquet
    needed = (
        "seeds.parquet" if (args.warc or args.fetch == "http") else "pages.parquet"
    )
    if not os.path.exists(os.path.join(args.corpus, needed)):
        os.makedirs(args.corpus, exist_ok=True)
        from crawler_spark.synthgen import generate_corpus

        print(f"generating synthetic corpus ({args.gen_pages} pages) at {args.corpus}",
              file=sys.stderr)
        generate_corpus(args.corpus, n_pages=args.gen_pages)

    def t(name):
        return spark.read.parquet(f"{args.corpus}/{name}.parquet")

    def opt(name):
        path = f"{args.corpus}/{name}.parquet"
        return spark.read.parquet(path) if os.path.exists(path) else None

    engine = CrawlEngine(
        spark,
        args.workdir,
        pages=(
            None
            if args.fetch == "http"
            # archives capture a url many times; the simulated-fetch
            # join needs one row per url (latest capture wins)
            else latest_captures(read_warc(spark, args.warc))
            if args.warc
            else t("pages")
        ),
        seeds=t("seeds"),
        robots=None if args.robots == "http" else opt("robots"),
        kb_seed=opt("kb_seed"),
        ledger_seed=opt("ledger_seed"),
        attachments=opt("attachments"),
        config=CrawlConfig(
            mode=args.mode,
            batch_size=args.batch_size,
            wave_seconds=args.wave_seconds,
            cascade=args.cascade,
            curate=args.curate,
            use_bloom=args.bloom,
            same_domain_only=not args.open_crawl,
            extractor=args.extractor,
            seen_filter_kind=args.seen_filter,
            fetch_mode=args.fetch,
            warc_out=args.warc_out,
            robots_mode=args.robots,
            robots_ttl_s=args.robots_ttl,
            sitemap_seeding=args.sitemaps,
            attachments=args.attachments,
            compact_every=args.compact_every,
            compact_terminal_ratio=args.compact_ratio,
            catalog_backend=args.catalog,
        ),
    )
    resumed_from = engine.cat.committed_wave
    if resumed_from >= 0:
        print(f"resuming from committed wave {resumed_from}", file=sys.stderr)
    t0 = time.time()
    history = engine.run(max_waves=args.waves)
    elapsed = time.time() - t0
    fetched = sum(h.get("fetched", 0) for h in history)
    selected = sum(h.get("batch", 0) for h in history)
    summary = {
        "waves": len(history),
        "resumed_from": resumed_from,
        "selected": selected,
        "fetched": fetched,
        "sec": round(elapsed, 2),
        "urls_per_sec": round(selected / elapsed, 2) if elapsed > 0 else 0.0,
        "done": bool(history and history[-1].get("done")),
        "committed_wave": engine.cat.committed_wave,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
