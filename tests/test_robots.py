"""robots.txt acquisition + parsing (operators/robots.py).

Covers the RFC 9309 directive/group matrix in pure Python, the
mapInPandas rules operator, the loopback fetch (the sandbox has no
external network; localhost works), and the end-to-end contract: a
priority-mode crawl with ``robots_mode='http'`` reaches exactly the
state the provided-rules-table crawl reaches on the identical web —
the table path is the deterministic parity oracle, same pattern as
``fetch_mode`` simulated/http.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.operators.robots import (
    fetch_robots,
    fetch_robots_one,
    parse_robots_txt,
    robots_from_seeds,
    robots_rules,
)

UA = "crawler-spark/0.1 (+https://example.invalid/bot)"


# ---------------------------------------------------------------- parser

def test_parse_group_selection_specific_beats_star():
    txt = """
User-agent: *
Disallow: /all

User-agent: crawler-spark
Disallow: /mine
Crawl-delay: 2.5
"""
    assert parse_robots_txt(txt, UA) == (["/mine"], [], 2.5)
    # an unrelated UA falls back to the * group
    assert parse_robots_txt(txt, "otherbot/9") == (["/all"], [], None)


def test_parse_longest_match_wins_and_merges_equal_groups():
    txt = """
User-agent: crawler
Disallow: /short

User-agent: crawler-spark
Disallow: /long-a

User-agent: CRAWLER-SPARK
Disallow: /long-b
"""
    # both 'crawler' and 'crawler-spark' are substrings of the product
    # token; the longest wins, and its two (case-insensitive) groups merge
    assert parse_robots_txt(txt, UA) == (["/long-a", "/long-b"], [], None)


def test_parse_shared_header_and_rule_separated_groups():
    txt = """
User-agent: a
User-agent: crawler-spark
Disallow: /x
Disallow: /y

User-agent: b
Disallow: /z
"""
    assert parse_robots_txt(txt, UA) == (["/x", "/y"], [], None)


def test_parse_non_group_lines_are_transparent_to_grouping():
    """Sitemap/host/unknown lines neither end a User-agent header run nor
    close a group — parity with the RFC authors' reference parser
    (google/robotstxt: only allow/disallow set the seen-separator flag).
    Two UA lines separated only by a Sitemap line therefore merge, the
    conservative (over-blocking) read."""
    merged = """
User-agent: *
Sitemap: https://h/s.xml
User-agent: otherbot
Disallow: /private
"""
    assert parse_robots_txt(merged, UA) == (["/private"], [], None)
    # ...but a Sitemap line after RULES still leaves the groups separate
    separate = """
User-agent: *
Disallow: /star
Sitemap: https://h/s.xml
User-agent: otherbot
Disallow: /private
"""
    assert parse_robots_txt(separate, UA) == (["/star"], [], None)


def test_parse_wildcard_and_anchor_kept_verbatim():
    txt = """
User-agent: *
Disallow: /a*/deep
Disallow: /page$
Disallow: *.pdf
Disallow:
Allow: /a/ok
"""
    # wildcard/anchored rules are kept VERBATIM (the match layer honors
    # * and $ exactly); empty Disallow lines are the RFC "allow all"
    # no-op and are ignored
    assert parse_robots_txt(txt, UA) == (
        ["*.pdf", "/a*/deep", "/page$"],
        ["/a/ok"],
        None,
    )


def test_parse_disallow_star_blocks_everything():
    # "Disallow: *" is a common real-world block-all — kept verbatim; the
    # compiled regex ^.* matches every path
    assert parse_robots_txt("User-agent: *\nDisallow: *\n", UA) == (["*"], [], None)
    assert parse_robots_txt("User-agent: *\nDisallow: $\n", UA) == (["$"], [], None)


def test_parse_allow_rules():
    txt = """
User-agent: *
Disallow: /private
Allow: /private/ok
Allow: /wild*card
Allow: /anchored$
"""
    # every non-empty allow is kept verbatim, wildcard/anchored included
    assert parse_robots_txt(txt, UA) == (
        ["/private"],
        ["/anchored$", "/private/ok", "/wild*card"],
        None,
    )


def _rfc_glob_match(rule: str, path: str) -> bool:
    """Independent RFC 9309 matcher (classic glob scan, no regex): the
    property-test oracle for rule_to_regex. '*' matches any sequence, a
    terminal '$' anchors the end, everything else literal, match is
    anchored at the path start. First segment is a required prefix,
    middle segments match greedily left-to-right (earliest occurrence is
    optimal — it leaves the most room for later segments), and the last
    segment is a required suffix when anchored. Consecutive '*'s
    collapse: an empty middle segment consumes nothing."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    segs = body.split("*")
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    if len(segs) == 1:  # no '*' at all
        return len(path) == len(segs[0]) if anchored else True
    for seg in segs[1:-1]:
        if not seg:
            continue
        i = path.find(seg, pos)
        if i == -1:
            return False
        pos = i + len(seg)
    last = segs[-1]
    if not anchored:
        return last == "" or path.find(last, pos) != -1
    if last == "":  # trailing '*' before '$' consumes any tail
        return True
    return path.endswith(last) and len(path) - len(last) >= pos


@given(
    rule=st.text(
        alphabet=st.sampled_from(list("/ab.?*$%[](){}+-^\\|ξ")), min_size=1, max_size=12
    ),
    path=st.text(
        alphabet=st.sampled_from(list("/ab.?xy$%ξ")), min_size=1, max_size=16
    ),
)
@settings(max_examples=400, deadline=None)
def test_rule_to_regex_matches_independent_glob_oracle(rule, path):
    """For arbitrary rules (regex metachars, unicode, nested wildcards)
    the compiled regex must agree with the independent glob matcher."""
    import re

    from crawler_spark.operators.politeness import rule_to_regex

    rx = rule_to_regex(rule)
    got = (
        path.startswith(rule) if rx is None else re.search(rx, path) is not None
    )
    want = _rfc_glob_match(rule, path)
    assert got == want, (rule, path, rx, got, want)


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_parse_robots_txt_total_on_arbitrary_text(txt):
    """The parser never raises and always returns (sorted list, sorted
    list, float|None) on arbitrary input — robots.txt in the wild is
    frequently garbage."""
    dis, alw, delay = parse_robots_txt(txt, UA)
    assert dis == sorted(dis) and alw == sorted(alw)
    assert delay is None or isinstance(delay, float)


def test_robots_filter_longest_match_precedence(spark):
    from pyspark.sql import functions as F

    from crawler_spark import schemas
    from crawler_spark.operators.politeness import robots_filter

    rules = spark.createDataFrame(
        [("h.example", ["/private", "/tmp"], ["/private/ok", "/tmp"], None)],
        schemas.ROBOTS,
    )
    cand = spark.createDataFrame(
        [
            ("https://h.example/private/x", "h.example"),   # blocked
            ("https://h.example/private/ok/y", "h.example"),  # allow longer
            ("https://h.example/tmp/z", "h.example"),       # tie -> allow
            ("https://h.example/open", "h.example"),        # no rule
            ("https://other.example/private/x", "other.example"),  # no host row
        ],
        "canonical_url string, host string",
    )
    got = {
        r["canonical_url"]: r["robots_blocked"]
        for r in robots_filter(cand, rules).collect()
    }
    assert got == {
        "https://h.example/private/x": True,
        "https://h.example/private/ok/y": False,
        "https://h.example/tmp/z": False,
        "https://h.example/open": False,
        "https://other.example/private/x": False,
    }


def test_rule_to_regex_translation():
    from crawler_spark.operators.politeness import rule_to_regex

    # plain prefixes need no regex at all
    assert rule_to_regex("/private") is None
    assert rule_to_regex("/a.b") is None  # metachar but still a prefix
    assert rule_to_regex("/a*/deep") == "^/a.*/deep"
    assert rule_to_regex("/page$") == "^/page$"
    assert rule_to_regex("*.pdf$") == r"^.*\.pdf$"
    assert rule_to_regex("*") == "^.*"
    assert rule_to_regex("$") == "^$"
    # a non-terminal $ is literal
    assert rule_to_regex("/a$b*") == r"^/a\$b.*"


def test_robots_filter_wildcards_and_anchors(spark):
    """Exact RFC 9309 * / $ semantics, longest-PATTERN precedence, and
    regex-metachar escaping in the JVM match path."""
    from crawler_spark import schemas
    from crawler_spark.operators.politeness import robots_filter

    rules = spark.createDataFrame(
        [
            # wildcard disallow + a longer plain allow carving it open
            ("w.example", ["/files/*.pdf", "/cgi*"], ["/files/public/report.pdf"], None),
            # $ anchor: blocks exactly /page, not /page2
            ("a.example", ["/page$"], [], None),
            # leading-* block-all with an allow carve-out
            ("s.example", ["*"], ["/open"], None),
            # '.' inside a wildcard rule is LITERAL after compilation
            ("m.example", ["/a.b*"], [], None),
        ],
        schemas.ROBOTS,
    )
    cand = spark.createDataFrame(
        [
            ("https://w.example/files/x/doc.pdf", "w.example"),        # *.pdf hits
            ("https://w.example/files/x/doc.txt", "w.example"),        # no rule
            ("https://w.example/files/public/report.pdf", "w.example"),  # allow longer
            ("https://w.example/cgi-bin/q", "w.example"),              # /cgi* hits
            ("https://a.example/page", "a.example"),                   # anchored hit
            ("https://a.example/page2", "a.example"),                  # anchor excludes
            ("https://s.example/anything", "s.example"),               # * blocks
            ("https://s.example/open/x", "s.example"),                 # allow(5) > *(1)
            ("https://m.example/a.bXX", "m.example"),                  # literal '.' hit
            ("https://m.example/aXbXX", "m.example"),                  # '.' not a metachar
        ],
        "canonical_url string, host string",
    )
    got = {
        r["canonical_url"]: r["robots_blocked"]
        for r in robots_filter(cand, rules).collect()
    }
    assert got == {
        "https://w.example/files/x/doc.pdf": True,
        "https://w.example/files/x/doc.txt": False,
        "https://w.example/files/public/report.pdf": False,
        "https://w.example/cgi-bin/q": True,
        "https://a.example/page": True,
        "https://a.example/page2": False,
        "https://s.example/anything": True,
        "https://s.example/open/x": False,
        "https://m.example/a.bXX": True,
        "https://m.example/aXbXX": False,
    }


def test_robots_filter_matches_query_string(spark):
    """RFC 9309 patterns match path + '?' + query — `Disallow: /*?*`
    (ubiquitous in the wild) must block parameterized URLs and nothing
    else."""
    from crawler_spark import schemas
    from crawler_spark.operators.politeness import robots_filter

    rules = spark.createDataFrame(
        [
            ("q.example", ["/*?*"], [], None),
            ("p.example", ["/search?q="], [], None),
        ],
        schemas.ROBOTS,
    )
    cand = spark.createDataFrame(
        [
            ("https://q.example/page?sort=asc", "q.example"),  # query → blocked
            ("https://q.example/page", "q.example"),           # no query → open
            ("https://p.example/search?q=x", "p.example"),     # prefix incl ?
            ("https://p.example/search", "p.example"),         # no query → open
        ],
        "canonical_url string, host string",
    )
    got = {
        r["canonical_url"]: r["robots_blocked"]
        for r in robots_filter(cand, rules).collect()
    }
    assert got == {
        "https://q.example/page?sort=asc": True,
        "https://q.example/page": False,
        "https://p.example/search?q=x": True,
        "https://p.example/search": False,
    }


def test_robots_filter_accepts_precompiled_rules(spark):
    from crawler_spark import schemas
    from crawler_spark.operators.politeness import compile_robots, robots_filter

    rules = spark.createDataFrame(
        [("h.example", ["/private"], ["/private/ok"], None)], schemas.ROBOTS
    )
    compiled = compile_robots(rules)
    # idempotent: compiling a compiled table is a no-op
    assert compile_robots(compiled) is compiled
    cand = spark.createDataFrame(
        [("https://h.example/private/x", "h.example"),
         ("https://h.example/private/ok/y", "h.example")],
        "canonical_url string, host string",
    )
    got = {
        r["canonical_url"]: r["robots_blocked"]
        for r in robots_filter(cand, compiled).collect()
    }
    assert got["https://h.example/private/x"] is True
    assert got["https://h.example/private/ok/y"] is False


def test_robots_filter_tolerates_legacy_three_column_table(spark):
    from crawler_spark.operators.politeness import robots_filter

    legacy = spark.createDataFrame(
        [("h.example", ["/private"], 1.0)],
        "host string, disallow array<string>, crawl_delay double",
    )
    cand = spark.createDataFrame(
        [("https://h.example/private/x", "h.example"),
         ("https://h.example/open", "h.example")],
        "canonical_url string, host string",
    )
    got = {
        r["canonical_url"]: r["robots_blocked"]
        for r in robots_filter(cand, legacy).collect()
    }
    assert got["https://h.example/private/x"] is True
    assert got["https://h.example/open"] is False


def test_parse_comments_malformed_and_missing():
    txt = """
# full-line comment
User-agent: * # trailing comment
Disallow: /blocked  # why not
no-colon-line
Unknown-directive: zap
Crawl-delay: not-a-number
"""
    assert parse_robots_txt(txt, UA) == (["/blocked"], [], None)
    assert parse_robots_txt(None, UA) == ([], [], None)
    assert parse_robots_txt("", UA) == ([], [], None)
    # rules before any User-agent line are invalid and dropped
    assert parse_robots_txt("Disallow: /early", UA) == ([], [], None)


# ------------------------------------------------------------- operator

def test_robots_rules_operator(spark):
    raw = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow: /x\nCrawl-delay: 3"),
            ("b.example", None),  # fetch failed -> empty rules row
        ],
        "host string, robots_txt string",
    )
    rows = {r["host"]: r for r in robots_rules(raw, UA).collect()}
    assert rows["a.example"]["disallow"] == ["/x"]
    assert rows["a.example"]["crawl_delay"] == 3.0
    assert rows["b.example"]["disallow"] == []
    assert rows["b.example"]["crawl_delay"] is None


# ------------------------------------------------------------- loopback

ROBOTS_TXT = (
    b"User-agent: nobody\nDisallow: /\n\n"
    b"User-agent: crawler-spark\nDisallow: /p3\nCrawl-delay: 1.0\n"
)

PAGES: dict[str, bytes] = {
    "/": (
        b"<html><head><title>root</title></head><body><main>"
        b"root page body text with plenty of characters to score"
        b'<a href="/p1">one</a> <a href="/p3">three</a></main></body></html>'
    ),
    "/p1": (
        b"<html><head><title>p1</title></head><body><main>"
        b"page one body text long enough to pass the guards"
        b'<a href="/p3">three</a></main></body></html>'
    ),
    "/p3": (
        b"<html><head><title>p3</title></head><body><main>"
        b"robots-disallowed page that must never be fetched</main></body></html>"
    ),
}


class _Handler(BaseHTTPRequestHandler):
    hits: dict[str, int] = {}  # path → GET count (single-process tests)
    robots_txt = ROBOTS_TXT  # mutable: the TTL-refresh test swaps it

    def do_GET(self):  # noqa: N802 (http.server API)
        cls = type(self)
        cls.hits[self.path] = cls.hits.get(self.path, 0) + 1
        if self.path == "/robots.txt":
            status, ctype, body = 200, "text/plain", cls.robots_txt
        elif self.path in PAGES:
            status, ctype, body = 200, "text/html", PAGES[self.path]
        else:
            status, ctype, body = 404, "text/html", b"?"
        self.send_response(status)
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
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_robots_one(server):
    (txt,) = fetch_robots_one(f"{server}/robots.txt")
    assert txt == ROBOTS_TXT.decode()
    assert fetch_robots_one(f"{server}/nope") == (None,)
    assert fetch_robots_one("http://127.0.0.1:1/robots.txt", timeout_s=0.5) == (
        None,
    )


def test_fetch_robots_operator(spark, server):
    hosts = spark.createDataFrame(
        [
            ("127.0.0.1", f"{server}/robots.txt"),
            ("127.0.0.2", "http://127.0.0.1:1/robots.txt"),  # refused
        ],
        "host string, robots_url string",
    )
    rows = {
        r["host"]: r["robots_txt"]
        for r in fetch_robots(hosts, timeout_s=2.0).collect()
    }
    assert rows["127.0.0.1"] == ROBOTS_TXT.decode()
    assert rows["127.0.0.2"] is None


def test_robots_from_seeds_rules_and_host_uniqueness(spark, server):
    from crawler_spark import schemas

    # two seeds on the same (port-less) host: exactly ONE merged rule row
    seeds = spark.createDataFrame(
        [
            ("s1", "site one", f"{server}/", "crawl", 50, 0.0),
            ("s2", "site two", f"{server}/p1", "crawl", 50, 0.0),
        ],
        schemas.SEEDS,
    )
    rules = robots_from_seeds(spark, seeds, timeout_s=5.0).collect()
    assert len(rules) == 1
    r = rules[0]
    assert r["host"] == "127.0.0.1"
    assert r["disallow"] == ["/p3"]  # the crawler-spark group, not nobody's
    assert r["crawl_delay"] == 1.0


def test_fetch_robots_raw_one_get_per_origin(spark, server):
    """Seed sites sharing an origin ride ONE robots.txt GET; the result
    fans back out to every (site_id, host) row."""
    from crawler_spark import schemas
    from crawler_spark.operators.robots import fetch_robots_raw

    seeds = spark.createDataFrame(
        [
            ("a1", "site a1", f"{server}/", "crawl", 50, 0.0),
            ("a2", "site a2", f"{server}/p1", "crawl", 50, 0.0),
            ("a3", "site a3", f"{server}/p2", "crawl", 50, 0.0),
        ],
        schemas.SEEDS,
    )
    before = _Handler.hits.get("/robots.txt", 0)
    raw = fetch_robots_raw(seeds, timeout_s=5.0).collect()
    after = _Handler.hits.get("/robots.txt", 0)
    assert after - before == 1  # one origin → one GET, not one per site
    assert {r["site_id"] for r in raw} == {"a1", "a2", "a3"}
    assert all(r["robots_txt"] == ROBOTS_TXT.decode() for r in raw)


# ------------------------------------------------- end-to-end parity

def test_http_robots_crawl_matches_table_oracle(spark, server, tmp_path_factory):
    """Priority-mode crawl over the loopback web with robots fetched live
    vs the identical crawl with the equivalent hand-provided rules table:
    byte-identical frontier state, /p3 robots_blocked and never fetched."""
    from crawler_spark import schemas
    from crawler_spark.wave import CrawlConfig, CrawlEngine

    seeds = spark.createDataFrame(
        [("loop", "loopback", f"{server}/", "crawl it", 50, 0.0)], schemas.SEEDS
    )

    def run(workdir, robots_mode, robots_df=None):
        eng = CrawlEngine(
            spark,
            str(workdir),
            pages=None,
            seeds=seeds,
            robots=robots_df,
            config=CrawlConfig(
                mode="priority", batch_size=10, wave_seconds=20.0,
                metrics=False, fetch_mode="http",
                http_opts={"timeout_s": 5.0}, robots_mode=robots_mode,
            ),
        )
        eng.run(max_waves=6)
        return eng

    http_eng = run(tmp_path_factory.mktemp("robots_http"), "http")
    table_rules = spark.createDataFrame(
        [("127.0.0.1", ["/p3"], [], 1.0)], schemas.ROBOTS
    )
    tbl_eng = run(tmp_path_factory.mktemp("robots_tbl"), "table", table_rules)

    def sig(eng):
        # resolved MOR view, not the raw log: the log legitimately holds
        # BOTH the pending version and the terminal version of a consumed
        # row, in nondeterministic read order
        return sorted(
            (r["canonical_url"], r["state"], r["seq"])
            for r in eng.frontier_view().collect()
        )

    assert sig(http_eng) == sig(tbl_eng)
    states = {
        r["canonical_url"]: r["state"]
        for r in http_eng.frontier_view().collect()
    }
    assert states[f"{server}/p3"] == "robots_blocked"
    crawled = {
        r["canonical_url"] for r in http_eng.cat.read("crawled").collect()
    }
    assert f"{server}/" in crawled and f"{server}/p1" in crawled
    assert f"{server}/p3" not in crawled


def test_robots_ttl_refresh_midcrawl(spark, server, tmp_path_factory):
    """Robots cache lifecycle: the served robots.txt CHANGES after wave 1
    (newly disallowing /p1); once the per-host TTL lapses, wave 2
    re-fetches, recompiles the rule dim, and the new rule takes effect
    without an engine restart — /p1 ends robots_blocked and unfetched.
    Within the TTL nothing is re-fetched (fetch-once contract holds)."""
    from crawler_spark import schemas
    from crawler_spark.wave import CrawlConfig, CrawlEngine

    seeds = spark.createDataFrame(
        [("ttl", "loopback", f"{server}/", "crawl it", 50, 0.0)], schemas.SEEDS
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("robots_ttl")),
        pages=None,
        seeds=seeds,
        robots=None,
        config=CrawlConfig(
            mode="priority", batch_size=1, wave_seconds=20.0,
            metrics=False, fetch_mode="http",
            http_opts={"timeout_s": 5.0}, robots_mode="http",
            robots_ttl_s=3600.0,
        ),
    )
    # controllable clock: advance time instead of sleeping an hour
    fake_now = [0.0]
    eng._robots_clock = lambda: fake_now[0]
    eng._robots_fetched_at = {h: 0.0 for h in eng._robots_fetched_at}

    eng.bootstrap()
    before = _Handler.hits.get("/robots.txt", 0)
    eng.run_wave()  # wave 1: within TTL → no re-fetch
    assert _Handler.hits.get("/robots.txt", 0) == before
    assert eng._maybe_refresh_robots() == []  # still fresh, zero work

    old_robots = _Handler.robots_txt
    _Handler.robots_txt = (
        b"User-agent: crawler-spark\nDisallow: /p3\nDisallow: /p1\n"
        b"Crawl-delay: 1.0\n"
    )
    try:
        fake_now[0] = 7200.0  # TTL lapsed
        eng.run(max_waves=6)  # refresh fires inside the next wave
        assert _Handler.hits.get("/robots.txt", 0) == before + 1
        states = {
            r["canonical_url"]: r["state"]
            for r in eng.frontier_view().collect()
        }
        assert states[f"{server}/p1"] == "robots_blocked"
        assert states[f"{server}/p3"] == "robots_blocked"
        crawled = {
            r["canonical_url"] for r in eng.cat.read("crawled").collect()
        }
        assert f"{server}/" in crawled
        assert f"{server}/p1" not in crawled
        # the refreshed compiled dim is what future waves broadcast
        rules = {r["host"]: r["disallow"] for r in eng.robots_df.collect()}
        assert rules["127.0.0.1"] == ["/p1", "/p3"]
    finally:
        _Handler.robots_txt = old_robots
