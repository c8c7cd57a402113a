"""Production HTTP fetch operator vs a loopback http.server fixture.

The sandbox has no external network, but localhost works — so the
status/content-type/encoding keep-rules (reference semantics:
high_performance_extractor.py:201-247) are exercised against a real
HTTP stack, and an end-to-end crawl over the loopback web is compared
against the simulated-fetch engine on the identical page set (the
simulated path stays the deterministic parity oracle).
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.fetch import (
    fetch_binary_one,
    fetch_one,
    http_fetch,
    http_fetch_attachments,
)

# path -> (status, content_type, body_bytes); body may contain invalid
# utf-8 (the keep rule passes RAW bytes; decode-with-ignore is downstream)
PAGES: dict[str, tuple[int, str, bytes]] = {
    "/": (
        200,
        "text/html",
        b"<html><head><title>root</title></head><body><main>"
        b"root page body text with plenty of characters to score"
        b'<a href="/p1">one</a> <a href="/p2">two</a></main></body></html>',
    ),
    "/p1": (
        200,
        "text/html; charset=utf-8",
        b"<html><head><title>p1</title></head><body><main>"
        b"page one body text long enough to pass the guards"
        b'<a href="/p2">two</a> <a href="/p3">three</a>'
        b'<a href="/missing">gone</a></main></body></html>',
    ),
    "/p2": (
        200,
        "text/html",
        b"<html><head><title>p2 \xff\xfe broken bytes</title></head><body>"
        b"<main>page two body \xf0\x28\x8c\x28 with invalid utf8 inline"
        b'<a href="/p4">four</a></main></body></html>',
    ),
    "/p3": (
        200,
        "text/html",
        b"<html><head><title>p3</title></head><body><main>"
        b"page three is a leaf with enough body text</main></body></html>",
    ),
    "/p4": (
        200,
        "text/html",
        b"<html><head><title>p4</title></head><body><main>"
        b"page four is also a leaf with enough body text</main></body></html>",
    ),
    "/plain": (200, "text/plain", b"not html, must be dropped"),
    "/missing": (404, "text/html", b"gone"),
    # attachment fixtures: binaries of NON-html types must be KEPT by the
    # binary fetch (and are exactly what the html fetch drops)
    "/files/a.pdf": (200, "application/pdf", b"%PDF-1.4 fake body \x00\x01"),
    "/files/b.bin": (200, "", b"\x00\xffopaque"),  # header absent -> octet-stream
    # a separate page tree for the wave-level attachment stage (nothing
    # above links here, so the page-crawl parity test is unaffected)
    "/att": (
        200,
        "text/html",
        b"<html><head><title>att root</title></head><body><main>"
        b"attachment host page with enough body text to pass the guards"
        b'<a href="/files/doc.txt">doc</a> <a href="/files/gone.csv">gone</a>'
        b'<a href="/att2">next</a></main></body></html>',
    ),
    "/att2": (
        200,
        "text/html",
        b"<html><head><title>att two</title></head><body><main>"
        b"plain second page with enough body text</main></body></html>",
    ),
    "/files/doc.txt": (200, "text/plain", b"attachment text body for the block"),
    "/files/gone.csv": (404, "text/html", b"?"),
}

ATT_TXT = PAGES["/files/doc.txt"][2]

SLOW_S = 3.0


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/slow":
            time.sleep(SLOW_S)
            status, ctype, body = 200, "text/html", b"<html>late</html>"
        else:
            status, ctype, body = PAGES.get(self.path, (404, "text/html", b"?"))
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()


def test_fetch_one_keep_rules(server):
    assert fetch_one(f"{server}/") == PAGES["/"][2]          # 200 + text/html
    assert fetch_one(f"{server}/p1") == PAGES["/p1"][2]      # charset suffix ok
    assert fetch_one(f"{server}/p2") == PAGES["/p2"][2]      # raw bytes, undecoded
    assert fetch_one(f"{server}/missing") is None            # 404
    assert fetch_one(f"{server}/plain") is None              # wrong content-type
    assert fetch_one(f"{server}/slow", timeout_s=0.3) is None  # timeout
    assert fetch_one("http://127.0.0.1:1/x", timeout_s=0.5) is None  # refused
    # oversize body is SKIPPED (WARC-source keep-rule parity), not
    # truncated into silently-wrong extraction input
    assert fetch_one(f"{server}/", max_bytes=4) is None
    assert fetch_one(f"{server}/", max_bytes=len(PAGES["/"][2])) == PAGES["/"][2]
    # attachments/robots keep the truncating read (RFC 9309 500 KiB parse)
    body, _ = fetch_binary_one(f"{server}/plain", max_bytes=4)
    assert body == PAGES["/plain"][2][:4]


def test_http_fetch_operator_alignment_and_nulls(spark, server):
    """mapInPandas fetch: row-aligned results, NULL _html on every failure
    mode, raw bytes preserved for the downstream utf-8-ignore decode."""
    urls = [
        f"{server}/",
        f"{server}/missing",
        f"{server}/p2",
        f"{server}/plain",
        "http://127.0.0.1:1/refused",
    ]
    batch = spark.createDataFrame(
        [(u,) for u in urls], "canonical_url string"
    ).withColumn("url_hash", F.xxhash64("canonical_url"))
    rows = {
        r["canonical_url"]: r["_html"]
        for r in http_fetch(batch, timeout_s=2.0).collect()
    }
    assert rows[f"{server}/"] == PAGES["/"][2]
    assert bytes(rows[f"{server}/p2"]) == PAGES["/p2"][2]  # invalid utf-8 intact
    assert rows[f"{server}/missing"] is None
    assert rows[f"{server}/plain"] is None
    assert rows["http://127.0.0.1:1/refused"] is None


def test_fetch_binary_keep_rules(server):
    """S3 semantics (reference aio_extractor.py:114-133): keep ANY
    content type on success, fail closed on 404/timeout/refused."""
    body, ctype = fetch_binary_one(f"{server}/files/a.pdf")
    assert body == PAGES["/files/a.pdf"][2] and ctype == "application/pdf"
    body, ctype = fetch_binary_one(f"{server}/plain")  # html fetch drops this
    assert body == PAGES["/plain"][2] and ctype == "text/plain"
    body, ctype = fetch_binary_one(f"{server}/files/b.bin")
    assert body == PAGES["/files/b.bin"][2]
    assert ctype == "application/octet-stream"  # header-absent fallback
    assert fetch_binary_one(f"{server}/missing") == (None, None)
    assert fetch_binary_one(f"{server}/slow", timeout_s=0.3) == (None, None)
    assert fetch_binary_one("http://127.0.0.1:1/x", timeout_s=0.5) == (None, None)


def test_http_fetch_attachments_operator(spark, server):
    urls = [
        f"{server}/files/a.pdf",
        f"{server}/missing",
        f"{server}/files/b.bin",
    ]
    batch = spark.createDataFrame([(u,) for u in urls], "attachment_url string")
    rows = {
        r["attachment_url"]: (r["_content"], r["_content_type"])
        for r in http_fetch_attachments(batch, timeout_s=2.0).collect()
    }
    assert bytes(rows[f"{server}/files/a.pdf"][0]) == PAGES["/files/a.pdf"][2]
    assert rows[f"{server}/files/a.pdf"][1] == "application/pdf"
    assert rows[f"{server}/missing"] == (None, None)
    assert rows[f"{server}/files/b.bin"][1] == "application/octet-stream"


def _mk_seeds(spark, base):
    from crawler_spark import schemas

    return spark.createDataFrame(
        [("loop", "loopback", f"{base}/", "crawl it", 50, 0.0)], schemas.SEEDS
    )


def _state_sig(engine):
    f = engine.cat.read("frontier")
    return sorted(
        (r["site_id"], r["canonical_url"], r["state"], r["seq"])
        for r in f.collect()
    )


def test_wave_attachment_stage_http_vs_table_parity(spark, server, tmp_path_factory):
    """S3/E9/S7 in the wave loop: a crawled page's text gains the
    reference's attachment blocks, failures land in failed_attachments —
    and the REAL http fetch reaches exactly the state the simulated
    payload-table path reaches (the table path is the parity oracle,
    same contract as fetch_mode http vs the pages join)."""
    from crawler_spark import schemas
    from crawler_spark.wave import CrawlConfig, CrawlEngine

    seeds = spark.createDataFrame(
        [("att", "att site", f"{server}/att", "crawl", 50, 0.0)], schemas.SEEDS
    )
    html_pages = [
        (f"{server}/att", bytearray(PAGES["/att"][2])),
        (f"{server}/att2", bytearray(PAGES["/att2"][2])),
    ]
    pages_df = spark.createDataFrame(html_pages, "url string, html binary")
    att_df = spark.createDataFrame(
        [(f"{server}/files/doc.txt", bytearray(ATT_TXT))], "url string, payload binary"
    )

    http_eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("att_http")),
        pages=None,
        seeds=seeds,
        config=CrawlConfig(
            mode="fifo", batch_size=10, metrics=False,
            fetch_mode="http", http_opts={"timeout_s": 5.0},
            attachments="http",
        ),
    )
    http_eng.run(max_waves=6)

    tbl_eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("att_tbl")),
        pages=pages_df,
        seeds=seeds,
        config=CrawlConfig(
            mode="fifo", batch_size=10, metrics=False, attachments="table"
        ),
        attachments=att_df,
    )
    tbl_eng.run(max_waves=6)

    def crawled(eng):
        return {
            r["canonical_url"]: r["text"] for r in eng.cat.read("crawled").collect()
        }

    h, t = crawled(http_eng), crawled(tbl_eng)
    assert h == t  # byte-identical incl. the appended attachment blocks
    att_page = h[f"{server}/att"]
    assert "첨부 파일 시작: doc.txt" in att_page
    assert ATT_TXT.decode() in att_page
    assert h[f"{server}/att2"].endswith("body text")  # no blocks on att2

    def failed(eng):
        return {
            r["url"]: r["reason"]
            for r in eng.cat.read("failed_attachments").collect()
        }

    fh, ft = failed(http_eng), failed(tbl_eng)
    assert set(fh) == set(ft) == {f"{server}/files/gone.csv"}


def test_http_crawl_matches_simulated_crawl(spark, server, tmp_path_factory):
    """End-to-end: the engine crawling the loopback web over REAL HTTP
    must reach exactly the state the simulated-fetch engine reaches on
    the identical page set — fetch stages are interchangeable behind the
    config switch, and the simulated path is the parity oracle."""
    from crawler_spark.wave import CrawlConfig, CrawlEngine

    seeds = _mk_seeds(spark, server)
    html_pages = [
        (f"{server}{p}", bytearray(body))
        for p, (status, ctype, body) in PAGES.items()
        if status == 200 and "text/html" in ctype
    ]
    pages_df = spark.createDataFrame(html_pages, "url string, html binary")

    warc_out = str(tmp_path_factory.mktemp("warc_out"))
    http_eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("http_crawl")),
        pages=None,
        seeds=seeds,
        config=CrawlConfig(
            mode="fifo", batch_size=10, metrics=False,
            fetch_mode="http", http_opts={"timeout_s": 5.0},
            warc_out=warc_out,
        ),
    )
    http_hist = http_eng.run(max_waves=10)

    sim_eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("sim_crawl")),
        pages=pages_df,
        seeds=seeds,
        config=CrawlConfig(mode="fifo", batch_size=10, metrics=False),
    )
    sim_eng.run(max_waves=10)

    assert _state_sig(http_eng) == _state_sig(sim_eng)
    crawled = {
        r["canonical_url"]: r["text"]
        for r in http_eng.cat.read("crawled").collect()
    }
    sim_crawled = {
        r["canonical_url"]: r["text"]
        for r in sim_eng.cat.read("crawled").collect()
    }
    assert crawled == sim_crawled  # byte-identical extracted text per url
    assert crawled, "http crawl fetched nothing"
    # the 404-linked page was attempted and terminally failed, not retried
    states = {
        r["canonical_url"]: r["state"]
        for r in http_eng.cat.read("frontier").collect()
        if r["state"] != "pending"
    }
    assert states.get(f"{server}/missing") == "failed"
    assert len(http_hist) >= 2
    # warc_out archived every successfully fetched page (raw wire bytes),
    # per-wave subdirs, and the archives re-ingest through read_warc
    import os

    from crawler_spark.sources.warc import read_warc

    waves = sorted(d for d in os.listdir(warc_out) if d.startswith("wave-"))
    assert len(waves) >= 2  # multi-wave crawl → one archive dir per wave
    archived = {
        r["url"]: bytes(r["html"])
        for r in read_warc(spark, f"{warc_out}/wave-*").collect()
    }
    expected = {
        f"{server}{p}": bytes(body)
        for p, (status, ctype, body) in PAGES.items()
        if status == 200 and "text/html" in ctype and f"{server}{p}" in crawled
    }
    for url, body in expected.items():
        assert archived.get(url) == body
    # nothing beyond fetched html landed in the archive
    assert set(archived) <= {
        f"{server}{p}"
        for p, (status, ctype, _) in PAGES.items()
        if status == 200 and "text/html" in ctype
    }
