"""Sitemap ingestion (operators/sitemaps.py): protocol parsing, the
loopback fetch pipeline, and the bootstrap contract — a page no crawled
page links to is reached via the sitemap and NOT without it."""

from __future__ import annotations

import gzip
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from crawler_spark.operators.sitemaps import (
    parse_robots_sitemaps,
    parse_sitemap,
    sitemap_candidates,
)

# ---------------------------------------------------------------- parser

def test_parse_robots_sitemaps():
    txt = """
User-agent: a
Disallow: /x
Sitemap: https://h.example/sm1.xml
User-agent: b
Sitemap: https://h.example/sm2.xml  # comment
Sitemap: https://h.example/sm1.xml
"""
    # global (not group-scoped), first-listed order, de-duped
    assert parse_robots_sitemaps(txt) == [
        "https://h.example/sm1.xml",
        "https://h.example/sm2.xml",
    ]
    assert parse_robots_sitemaps(None) == []
    assert parse_robots_sitemaps("User-agent: *\nDisallow: /") == []


URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.example/a</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc> https://h.example/b </loc></url>
  <url><loc>https://h.example/a</loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = b"""<sitemapindex>
  <sitemap><loc>https://h.example/child1.xml</loc></sitemap>
  <sitemap><loc>https://h.example/child2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_urlset_namespace_and_dedupe():
    pages, children = parse_sitemap(URLSET)
    assert pages == ["https://h.example/a", "https://h.example/b"]
    assert children == []


def test_parse_sitemap_index_and_gzip():
    pages, children = parse_sitemap(INDEX)  # no namespace at all
    assert pages == []
    assert children == [
        "https://h.example/child1.xml",
        "https://h.example/child2.xml",
    ]
    pages, _ = parse_sitemap(gzip.compress(URLSET))
    assert pages == ["https://h.example/a", "https://h.example/b"]


def test_parse_sitemap_hostile():
    assert parse_sitemap(None) == ([], [])
    assert parse_sitemap(b"") == ([], [])
    assert parse_sitemap(b"not xml at all") == ([], [])
    assert parse_sitemap(b"<html><body>soup</body></html>") == ([], [])
    assert parse_sitemap(b"\x1f\x8btruncated-gzip") == ([], [])


# ------------------------------------------------------------- loopback

def _page(body: str) -> bytes:
    return (
        b"<html><head><title>t</title></head><body><main>"
        + body.encode()
        + b" padded with enough body text to pass every quality guard"
        b"</main></body></html>"
    )


class _Handler(BaseHTTPRequestHandler):
    routes: dict[str, tuple[str, bytes]] = {}

    def do_GET(self):  # noqa: N802 (http.server API)
        hit = self.routes.get(self.path)
        if hit is None:
            self.send_response(404)
            body, ctype = b"?", "text/html"
        else:
            self.send_response(200)
            ctype, body = hit
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    _Handler.routes = {
        "/robots.txt": (
            "text/plain",
            f"User-agent: *\nDisallow: /private\nSitemap: {base}/smidx.xml\n".encode(),
        ),
        # index -> one urlset child (gzipped) + one broken child
        "/smidx.xml": (
            "application/xml",
            f"<sitemapindex><sitemap><loc>{base}/sm1.xml.gz</loc></sitemap>"
            f"<sitemap><loc>{base}/broken.xml</loc></sitemap></sitemapindex>".encode(),
        ),
        "/sm1.xml.gz": (
            "application/octet-stream",
            gzip.compress(
                f'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                f"<url><loc>{base}/orphan</loc></url>"
                f"<url><loc>{base}/</loc></url>"
                f"<url><loc>https://elsewhere.example/x</loc></url>"
                f"<url><loc>{base}/private/x</loc></url>"
                f"</urlset>".encode()
            ),
        ),
        "/broken.xml": ("text/xml", b"<urlset><url><loc>unclosed"),
        # the web itself: root links NOTHING -> /orphan is sitemap-only
        "/": ("text/html", _page("root page")),
        "/orphan": ("text/html", _page("orphan page reachable only via sitemap")),
        "/private/x": ("text/html", _page("robots-disallowed")),
    }
    yield base
    srv.shutdown()


def test_sitemap_candidates_pipeline(spark, server):
    from crawler_spark import schemas

    seeds = spark.createDataFrame(
        [("s", "site", f"{server}/", "crawl", 50, 0.0)], schemas.SEEDS
    )
    rows = sitemap_candidates(spark, seeds, timeout_s=5.0).collect()
    got = sorted((r["url"], r["link_idx"]) for r in rows)
    # deterministic ordering by (sitemap, child, position); the broken
    # child contributes nothing, failures never error
    assert got == [
        (f"{server}/", 2),
        (f"{server}/orphan", 1),
        (f"{server}/private/x", 4),
        ("https://elsewhere.example/x", 3),
    ]


def test_sitemap_fallback_convention(spark):
    """A host whose robots.txt is unreachable still probes /sitemap.xml."""
    from crawler_spark import schemas

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # routes are class-level: temporarily no robots.txt entry is not
        # possible, so use a dedicated path set keyed by this port via
        # a fresh routes dict (module fixture not running for this srv)
        old = _Handler.routes
        _Handler.routes = {
            "/sitemap.xml": (
                "text/xml",
                f"<urlset><url><loc>{base}/only</loc></url></urlset>".encode(),
            ),
        }
        seeds = spark.createDataFrame(
            [("s", "site", f"{base}/", "crawl", 50, 0.0)], schemas.SEEDS
        )
        rows = sitemap_candidates(spark, seeds, timeout_s=5.0).collect()
        assert [(r["url"], r["link_idx"]) for r in rows] == [(f"{base}/only", 1)]
    finally:
        _Handler.routes = old
        srv.shutdown()


# ------------------------------------------------- end-to-end bootstrap

def test_sitemap_seeding_reaches_orphan(spark, server, tmp_path_factory):
    """The whole point of sitemap seeding: /orphan has no inbound link,
    so only the seeded crawl fetches it; gates still apply (the
    disallowed URL is admitted to the frontier but robots-blocked, the
    cross-host URL never enters under same_domain_only)."""
    from crawler_spark import schemas
    from crawler_spark.wave import CrawlConfig, CrawlEngine

    seeds = spark.createDataFrame(
        [("s", "site", f"{server}/", "crawl", 50, 0.0)], schemas.SEEDS
    )

    def run(workdir, seeding):
        eng = CrawlEngine(
            spark,
            str(workdir),
            pages=None,
            seeds=seeds,
            config=CrawlConfig(
                mode="priority", batch_size=10, wave_seconds=20.0,
                metrics=False, fetch_mode="http",
                http_opts={"timeout_s": 5.0}, robots_mode="http",
                sitemap_seeding=seeding,
            ),
        )
        eng.run(max_waves=6)
        return eng

    with_sm = run(tmp_path_factory.mktemp("sm_on"), True)
    without = run(tmp_path_factory.mktemp("sm_off"), False)

    def crawled(eng):
        return {r["canonical_url"] for r in eng.cat.read("crawled").collect()}

    assert f"{server}/orphan" in crawled(with_sm)
    assert f"{server}/orphan" not in crawled(without)
    states: dict[str, set] = {}
    for r in with_sm.cat.read("frontier").collect():
        states.setdefault(r["canonical_url"], set()).add(r["state"])
    assert "robots_blocked" in states[f"{server}/private/x"]
    assert "https://elsewhere.example/x" not in states  # same-domain gate
    # seq continuity: seed is seq 1, sitemap rows continue 2..N once each
    seqs = sorted(
        r["seq"]
        for r in with_sm.cat.read("frontier").collect()
        if r["state"] == "pending" and r["discovered_wave"] == 0
    )
    assert seqs == list(range(1, len(seqs) + 1))
