"""Sitemap ingestion: robots.txt ``Sitemap:`` directives → sitemap.xml
→ wave-0 frontier candidates.

The reference crawls purely by link expansion; a production web crawl
also seeds from sitemaps — the only way to reach pages no crawled page
links to, and the canonical discovery channel (sitemaps.org protocol,
referenced by RFC 9309 §2.4). This stage is bootstrap-only and
optional (``CrawlConfig(sitemap_seeding=True)``, requires
``robots_mode``-style live HTTP): discovered URLs enter the wave-0
frontier as depth-1 children of their seed and then flow through the
exact same admission gates (validity regexes, canonicalization,
same-domain, seen anti-join) as link-discovered URLs.

Protocol coverage: ``<urlset><url><loc>`` page lists,
``<sitemapindex><sitemap><loc>`` indexes (ONE level of expansion,
child count capped), gzip payloads (magic-sniffed), namespace-agnostic
tag matching (sitemaps in the wild use the 0.9 namespace, no
namespace, or custom ones). A host with no ``Sitemap:`` directive
falls back to the ``/sitemap.xml`` convention. Malformed XML or a
failed fetch yields no candidates — never an error (discovery is
best-effort by design).

Scale shape: everything is per-HOST work over the seed dimension
(bounded, small), not per-URL — fetches ride the same pooled
``mapInPandas`` scaffolding as the page fetcher, parsing is
Arrow-batched, and per-site output is capped with a Window rank so a
pathological 50k-entry sitemap cannot flood the frontier.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from crawler_spark.operators.fetch import _pooled_fetch, fetch_binary_one


def parse_robots_sitemaps(text: str | None) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body — global per RFC
    9309 §2.4 (NOT group-scoped, unlike allow/disallow), so this is a
    flat line scan independent of user-agent group selection."""
    if not text:
        return []
    out: list[str] = []
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    # de-dupe preserving first-listed order (the file's priority order)
    return list(dict.fromkeys(out))


def parse_sitemap(payload: bytes | None) -> tuple[list[str], list[str]]:
    """One sitemap payload → (page urls, child sitemap urls).

    Handles gzip (magic-sniffed), ``urlset`` and ``sitemapindex`` roots,
    any/no XML namespace. Anything unparseable → ([], [])."""
    if not payload:
        return [], []
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except OSError:
            return [], []
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(payload)
    except ET.ParseError:
        return [], []
    local = root.tag.rsplit("}", 1)[-1].lower()
    if local == "urlset":
        entry, is_index = "url", False
    elif local == "sitemapindex":
        entry, is_index = "sitemap", True
    else:
        return [], []
    locs: list[str] = []
    for el in root:
        if el.tag.rsplit("}", 1)[-1].lower() != entry:
            continue
        for child in el:
            if child.tag.rsplit("}", 1)[-1].lower() == "loc" and child.text:
                locs.append(child.text.strip())
                break
    locs = list(dict.fromkeys(locs))
    return ([], locs) if is_index else (locs, [])


_PARSED = StructType(
    [
        StructField("page_urls", ArrayType(StringType())),
        StructField("child_sitemaps", ArrayType(StringType())),
    ]
)


def _fetch_and_parse(sm: DataFrame, url_col: str, fetch_opts: dict) -> DataFrame:
    """sitemap-url rows → + (page_urls, child_sitemaps) arrays. The fetch
    keeps ANY content type (sitemaps are served as xml, gzip,
    octet-stream); parse runs in the same Arrow batch. Rides the shared
    ``_pooled_fetch`` scaffolding so the per-host in-flight cap applies —
    a sitemapindex fanning 50 children out against one host is exactly
    the shape the anti-hammering backstop exists for."""
    opts = {k: v for k, v in fetch_opts.items() if k in
            ("timeout_s", "user_agent", "max_bytes")}
    max_concurrency = int(fetch_opts.get("max_concurrency", 8))
    per_host = int(fetch_opts.get("per_host", 2))

    def one(u: str) -> tuple[list[str], list[str]]:
        body, _ctype = fetch_binary_one(str(u), **opts)
        return parse_sitemap(body)

    return _pooled_fetch(
        sm, url_col, list(_PARSED.fields), one, max_concurrency, per_host
    )


def sitemap_candidates(
    spark: SparkSession,
    seeds: DataFrame,
    max_per_site: int = 50_000,
    max_children: int = 50,
    robots_raw: DataFrame | None = None,
    **fetch_opts,
) -> DataFrame:
    """(site_id, url, link_idx): sitemap-discovered page URLs per seed
    site, deterministically ordered and capped. ``fetch_opts`` mirror
    the engine's ``http_opts`` (timeout_s, user_agent, ...). Pass
    ``robots_raw`` (a ``robots.fetch_robots_raw`` result) to reuse the
    rules path's fetch instead of re-GETting every robots.txt."""
    if robots_raw is None:
        from crawler_spark.operators.robots import fetch_robots_raw

        robots_raw = fetch_robots_raw(seeds, **fetch_opts)
    robots = robots_raw.select("site_id", "_origin", "robots_txt")

    def listed(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "site_id": pdf["site_id"].astype(str),
                    "_origin": pdf["_origin"].astype(str),
                    "sitemaps": [
                        parse_robots_sitemaps(t if isinstance(t, str) else None)
                        for t in pdf["robots_txt"]
                    ],
                }
            )

    sm_schema = StructType(
        [
            StructField("site_id", StringType()),
            StructField("_origin", StringType()),
            StructField("sitemaps", ArrayType(StringType())),
        ]
    )
    sm_lists = robots.mapInPandas(listed, sm_schema).withColumn(
        "sitemaps",
        F.when(
            F.size("sitemaps") > 0, F.col("sitemaps")
        ).otherwise(  # /sitemap.xml convention when robots lists none
            F.array(F.concat("_origin", F.lit("/sitemap.xml")))
        ),
    )
    level0 = sm_lists.select(
        "site_id", F.posexplode("sitemaps").alias("sm_idx", "sitemap_url")
    )

    parsed0 = _fetch_and_parse(level0, "sitemap_url", fetch_opts)
    pages0 = parsed0.select(
        "site_id",
        "sm_idx",
        F.lit(-1).cast(IntegerType()).alias("child_idx"),
        F.posexplode("page_urls").alias("pos", "url"),
    )
    # ONE level of sitemapindex expansion, child count capped
    children = parsed0.select(
        "site_id",
        "sm_idx",
        F.posexplode(F.slice("child_sitemaps", 1, max_children)).alias(
            "child_idx", "sitemap_url"
        ),
    )
    parsed1 = _fetch_and_parse(children, "sitemap_url", fetch_opts)
    pages1 = parsed1.select(
        "site_id", "sm_idx", "child_idx", F.posexplode("page_urls").alias("pos", "url")
    )

    all_pages = pages0.unionByName(pages1)
    w = Window.partitionBy("site_id").orderBy("sm_idx", "child_idx", "pos", "url")
    return (
        all_pages.withColumn("link_idx", F.row_number().over(w))
        .filter(F.col("link_idx") <= max_per_site)
        .select("site_id", "url", "link_idx")
    )
