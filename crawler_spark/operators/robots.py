"""robots.txt acquisition + parsing → the politeness rules table.

The reference engine has **no robots handling** (SURVEY §2: zero robots
matches in reference src/); `operators/politeness.py` already consumes a
``robots(host, disallow, crawl_delay)`` dimension table as the
north-rule addition. This module PRODUCES that table from the live web,
so a production crawl (``CrawlConfig(robots_mode="http")``) is
self-contained: fetch each seed host's ``/robots.txt`` once at engine
init, parse it for our user-agent, and hand the rules to the same
broadcast-join filter the table-provided path uses — the provided-table
mode stays the deterministic parity oracle, exactly like
``fetch_mode='simulated'`` vs ``'http'``.

Parsing follows RFC 9309 exactly:

* group selection — the group(s) whose ``User-agent`` value is the
  longest case-insensitive substring match of our product token; ``*``
  groups apply only when no specific group matches; groups with the
  same chosen value are merged (RFC 9309 §2.2.1);
* ``Disallow`` / ``Allow`` — non-empty values are kept VERBATIM,
  ``*`` wildcards and ``$`` end anchors included; the downstream
  ``politeness.robots_filter`` honors them exactly (patterns compile
  once per rule to JVM-side regexes, ``politeness.compile_robots``)
  with RFC 9309 §2.2.2 longest-match precedence — the longest matching
  pattern wins, ties go to allow;
* ``Crawl-delay`` (de-facto standard) parses to seconds for
  ``politeness.host_quotas``;
* an unreachable or non-200 robots.txt yields no rules (crawl allowed,
  the behavior of urllib.robotparser and the major engines for 4xx).

Scale shape: one robots fetch per DISTINCT seed host at init (the rules
table is a small broadcast dimension, bounded by the seed list — never
per-URL, never per-wave), via the same bounded ``mapInPandas`` thread
pool as the page fetcher (operators/fetch.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField

from crawler_spark import schemas
from crawler_spark.operators.fetch import (
    DEFAULT_USER_AGENT,
    _pooled_fetch,
    fetch_binary_one,
)

_DIRECTIVES = {"user-agent", "disallow", "allow", "crawl-delay"}


def parse_robots_txt(
    text: str | None, user_agent: str = DEFAULT_USER_AGENT
) -> tuple[list[str], list[str], float | None]:
    """Parse one robots.txt body → (disallow, allow, crawl_delay).

    Pure Python (no Spark) so the directive/group matrix is unit-testable
    directly; the distributed path wraps this in ``robots_rules``.
    ``None``/empty text → no rules. Allow and Disallow patterns are kept
    verbatim (``*``/``$`` included) and resolved downstream by
    ``politeness.robots_filter``'s RFC 9309 longest-match precedence
    with exact wildcard/anchor semantics.
    """
    if not text:
        return [], [], None
    # our product token, per RFC 9309 §2.2.1 (case-insensitive compare)
    token = user_agent.split("/")[0].strip().lower()

    # pass 1: group the file — a run of consecutive User-agent lines
    # opens a group; rule lines attach to the open group; a User-agent
    # line AFTER rule lines starts a fresh group.
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, str]] = []
    in_header = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key not in _DIRECTIVES:
            # sitemap/host/unknown lines are transparent to grouping: they
            # neither end a User-agent header run nor close a group. This
            # matches the RFC authors' reference parser (google/robotstxt:
            # only allow/disallow set the seen-separator flag), so
            # "User-agent: *\nSitemap: x\nUser-agent: other\nDisallow: /"
            # is ONE merged group — the conservative (over-blocking) read.
            continue
        if key == "user-agent":
            if not in_header:
                if agents:
                    groups.append((agents, rules))
                agents, rules = [], []
                in_header = True
            agents.append(value.lower())
        else:
            in_header = False
            if agents:  # rules before any User-agent line are invalid
                rules.append((key, value))
    if agents:
        groups.append((agents, rules))

    # pass 2: pick the most specific matching agent value, '*' last
    best = ""
    for agents, _ in groups:
        for a in agents:
            if a and a != "*" and a in token and len(a) > len(best):
                best = a
    chosen = best or "*"

    disallow: set[str] = set()
    allow: set[str] = set()
    delay: float | None = None
    for agents, grules in groups:
        if chosen not in agents:
            continue
        for key, value in grules:
            # Non-empty Disallow/Allow values are kept VERBATIM — the
            # match layer honors * / $ exactly, so no widening/dropping
            # rewrites are needed. An empty Disallow ("allow all") is
            # the RFC no-op.
            if key == "disallow" and value:
                disallow.add(value)
            elif key == "allow" and value:
                allow.add(value)
            elif key == "crawl-delay":
                try:
                    delay = float(value)
                except ValueError:
                    pass
    return sorted(disallow), sorted(allow), delay


def robots_rules(
    raw: DataFrame,
    user_agent: str = DEFAULT_USER_AGENT,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → the politeness rules table (schemas.ROBOTS).

    mapInPandas over Arrow batches (no per-row Python UDF); NULL text
    rows (fetch failed / 4xx) become empty-rule rows so every host is
    present exactly once downstream.
    """
    cols = raw.select(host_col, text_col)

    def gen(batches):
        for pdf in batches:
            parsed = [
                parse_robots_txt(t if isinstance(t, str) else None, user_agent)
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "host": pdf[host_col].astype(str),
                    "disallow": [p[0] for p in parsed],
                    "allow": [p[1] for p in parsed],
                    "crawl_delay": [p[2] for p in parsed],
                }
            )

    return cols.mapInPandas(gen, schemas.ROBOTS)


def fetch_robots_one(
    url: str,
    timeout_s: float = 10.0,
    user_agent: str = DEFAULT_USER_AGENT,
    max_bytes: int = 512 * 1024,
) -> tuple[str | None]:
    """GET one robots.txt → (text,) — None on non-200 or any failure.

    RFC 9309 §2.3: parse on 200 regardless of declared content type
    (robots.txt is served as text/plain, text/html, even octet-stream in
    the wild); utf-8 with errors ignored, 500 KiB cap (RFC minimum for
    parseable size). Delegates the request/status/exception handling to
    ``fetch_binary_one`` — ONE urllib code path in the package, so
    redirect/timeout fixes there reach robots too.
    """
    body, _ctype = fetch_binary_one(url, timeout_s, user_agent, max_bytes)
    return (body.decode("utf-8", errors="ignore") if body is not None else None,)


def fetch_robots(
    hosts: DataFrame,
    url_col: str = "robots_url",
    timeout_s: float = 10.0,
    max_concurrency: int = 20,
    per_host: int = 2,
    user_agent: str = DEFAULT_USER_AGENT,
    max_bytes: int = 512 * 1024,
    **_ignored,
) -> DataFrame:
    """Fetch every row's robots.txt URL → input columns + ``robots_txt``
    (string, NULL on failure). Same pooled mapInPandas scaffolding as the
    page fetcher; extra http_opts keys are accepted and ignored so the
    engine can pass its ``http_opts`` dict straight through."""
    return _pooled_fetch(
        hosts,
        url_col,
        [StructField("robots_txt", StringType())],
        lambda u: fetch_robots_one(u, timeout_s, user_agent, max_bytes),
        max_concurrency,
        per_host,
    )


def fetch_robots_raw(
    seeds: DataFrame, user_agent: str = DEFAULT_USER_AGENT, **fetch_opts
) -> DataFrame:
    """(site_id, host, _origin, robots_txt): ONE robots.txt fetch per
    distinct seed origin — the shared input for both rule parsing
    (``robots_from_seeds``) and sitemap discovery
    (``sitemaps.sitemap_candidates``), so enabling both costs one GET
    per host, not two. ``host`` is the wave's join key (lower(HOST),
    port-less); ``_origin`` keeps scheme and port for further fetches.

    The fetch itself dedupes on ``_origin`` alone — seed sites that share
    an origin (same scheme://netloc, different site_id) ride one GET and
    fan back out through a broadcast join, keeping the one-GET-per-origin
    contract."""
    sites = seeds.select(
        "site_id",
        F.lower(F.parse_url("base_url", F.lit("HOST"))).alias("host"),
        F.concat(
            F.parse_url("base_url", F.lit("PROTOCOL")),
            F.lit("://"),
            # netloc incl. port (HOST strips it; the robots URL needs it)
            F.regexp_extract(
                "base_url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1
            ),
        ).alias("_origin"),
    ).distinct()
    fetched = fetch_robots(
        sites.select("_origin").distinct().withColumn(
            "robots_url", F.concat("_origin", F.lit("/robots.txt"))
        ),
        "robots_url",
        user_agent=user_agent,
        **fetch_opts,
    ).select("_origin", "robots_txt")
    return sites.join(F.broadcast(fetched), "_origin").select(
        "site_id", "host", "_origin", "robots_txt"
    )


def robots_from_seeds(
    spark: SparkSession,
    seeds: DataFrame,
    user_agent: str = DEFAULT_USER_AGENT,
    raw: DataFrame | None = None,
    **fetch_opts,
) -> DataFrame:
    """The ``robots_mode='http'`` bootstrap: one fetch+parse per distinct
    seed host → schemas.ROBOTS, keyed the way the wave derives ``host``
    (lower(HOST), port-less) so the broadcast joins line up. Pass ``raw``
    (a ``fetch_robots_raw`` result) to reuse an existing fetch."""
    if raw is None:
        raw = fetch_robots_raw(seeds, user_agent=user_agent, **fetch_opts)
    rules = robots_rules(raw, user_agent)
    # Exactly ONE row per host key: seeds that share a port-less host but
    # differ in port/scheme each fetched their own robots.txt — merge
    # conservatively so the downstream broadcast join on host cannot fan
    # candidate rows out: UNION of disallows and max delay (over-block /
    # over-wait), but INTERSECTION of allows — a URL stays allowed only
    # if every variant allowed it (a union would under-block).
    merged = rules.groupBy("host").agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("disallow")))
        ).alias("disallow"),
        F.collect_list("allow").alias("_allows"),
        F.max("crawl_delay").alias("crawl_delay"),
    )
    return merged.select(
        "host",
        "disallow",
        F.array_sort(
            F.aggregate(
                F.slice("_allows", 2, F.greatest(F.size("_allows") - 1, F.lit(0))),
                F.element_at("_allows", 1),
                lambda acc, x: F.array_intersect(acc, x),
            )
        ).alias("allow"),
        "crawl_delay",
    )
