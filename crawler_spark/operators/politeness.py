"""Per-host politeness: robots rules + crawl-delay fetch budget.

The reference has **no robots handling at all** (verified in SURVEY: zero
robots matches in src/); its only politeness is `REQUEST_DELAY` sleeps and
aiohttp per-host connection caps. The robots component here is the
north-rule addition, designed Spark-first:

* ``robots(host, disallow, allow, crawl_delay)`` is a small dimension
  table → broadcast join on host; rule values are RFC 9309 path patterns
  kept VERBATIM (``*`` wildcards, ``$`` end anchors included);
* rule evaluation is entirely JVM-side: ``compile_robots`` translates
  each pattern once (per dimension row, never per URL) into a
  ``(pre, re, len)`` struct — ``re`` NULL for plain prefixes — and the
  filter matches with ``startswith`` for plain prefixes / ``regexp_like``
  only for genuine wildcard rules, inside higher-order functions over
  the broadcast arrays (no Python in the hot path);
* per-host wave quota = ``floor(wave_seconds / effective_delay)`` where
  ``effective_delay = greatest(seed.crawl_delay, robots.crawl_delay)`` —
  the table analog of sleeping ``crawl_delay`` between sequential fetches
  for the duration of one wave.

Skew: quota *computation* is a broadcast join (no shuffle). Quota
*enforcement* is the per-host Window rank in frontier.py. For the
pathological mega-host the window sort is bounded per partition by AQE
skew splitting; a salting stage is applied before per-host *aggregations*
(see metrics/kb) where cardinality, not ordering, is needed.
"""

from __future__ import annotations

import re as _re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# One compiled rule: pre = the verbatim pattern (the startswith prefix
# when re is NULL), re = anchored Java/RE2-safe regex for wildcard or
# $-anchored patterns (NULL for plain prefixes), len = the verbatim
# pattern's length — RFC 9309 §2.2.2 "most octets" precedence is by the
# PATTERN's length (google/robotstxt parity), not the matched span's.
_RULE = StructType(
    [
        StructField("pre", StringType()),
        StructField("re", StringType()),
        StructField("len", IntegerType()),
    ]
)
_COMPILED = StructType(
    [
        StructField("host", StringType()),
        StructField("disallow", ArrayType(_RULE)),
        StructField("allow", ArrayType(_RULE)),
    ]
)


def rule_to_regex(rule: str) -> str | None:
    """RFC 9309 path pattern → anchored regex, or None when a plain
    ``startswith`` suffices (no ``*``, no terminal ``$``).

    ``*`` matches any character sequence; a terminal ``$`` anchors the
    match at the path's end; everything else (including a non-terminal
    ``$``) is literal, so each literal segment is re.escape'd — a rule
    ``/a.b`` must not match ``/aXb``."""
    if "*" not in rule and not rule.endswith("$"):
        return None
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    return (
        "^"
        + ".*".join(_re.escape(seg) for seg in body.split("*"))
        + ("$" if anchored else "")
    )


def compile_robots(robots: DataFrame) -> DataFrame:
    """The public rules table → its match-ready form: one ``(pre, re,
    len)`` struct per pattern (``re`` NULL for plain prefixes).

    Runs ONCE per dimension row via mapInPandas — the per-URL hot path
    stays pure Column expressions over the broadcast structs. Idempotent:
    an already-compiled table passes through. Tables without an ``allow``
    column (older corpora) compile as allow-nothing."""
    if dict(robots.dtypes).get("disallow", "").startswith("array<struct"):
        return robots
    cols = ["host", "disallow"] + (["allow"] if "allow" in robots.columns else [])
    src = robots.select(*cols)
    has_allow = "allow" in cols

    def gen(batches):
        def comp(rules):
            return [
                {"pre": p, "re": rule_to_regex(p), "len": len(p)}
                for p in (rules if rules is not None else [])
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "host": pdf["host"].astype(str),
                    "disallow": [comp(r) for r in pdf["disallow"]],
                    "allow": [
                        comp(r) for r in (pdf["allow"] if has_allow else [None] * len(pdf))
                    ],
                }
            )

    return src.mapInPandas(gen, _COMPILED)


def robots_filter(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Annotate candidates with ``robots_blocked`` — RFC 9309 §2.2.2
    longest-match precedence between Allow and Disallow patterns, with
    EXACT ``*`` wildcard / ``$`` anchor semantics.

    A URL is blocked iff the longest matching disallow pattern is
    STRICTLY longer than the longest matching allow pattern (ties go to
    allow, per the RFC's "SHOULD use the allow"); pattern length is the
    verbatim rule's length (google/robotstxt parity). With no allow
    rules this reduces to the any-pattern disallow check. Entirely
    JVM-side: plain prefixes match via ``startswith``, wildcard/anchored
    patterns via ``regexp_like`` over pre-compiled regexes — no Python
    per URL (compilation is once per dimension row, `compile_robots`).
    Accepts the public rules table or an already-compiled one; tables
    without an ``allow`` column (older corpora) read as allow-nothing.
    Patterns match against path + '?' + query (RFC 9309 §2.2.2 matches
    the query string too — ``Disallow: /*?*`` is ubiquitous in the
    wild); percent-encoding is compared verbatim (no %-normalization:
    rules match URLs as canonicalized)."""
    r = F.broadcast(compile_robots(robots))
    _q = F.parse_url(F.col("canonical_url"), F.lit("QUERY"))
    path = F.concat(
        F.coalesce(F.parse_url(F.col("canonical_url"), F.lit("PATH")), F.lit("/")),
        F.when(_q.isNotNull(), F.concat(F.lit("?"), _q)).otherwise(F.lit("")),
    )

    def longest_match(rules) -> F.Column:
        # length of the longest rule pattern matching path, -1 if none
        matched = F.filter(
            rules,
            lambda x: F.when(x["re"].isNull(), path.startswith(x["pre"])).otherwise(
                F.regexp_like(path, x["re"])
            ),
        )
        return F.aggregate(
            matched, F.lit(-1), lambda acc, x: F.greatest(acc, x["len"])
        )

    out = candidates.join(r, "host", "left")
    empty = F.array().cast(ArrayType(_RULE))
    return (
        out.withColumn(
            "robots_blocked",
            F.coalesce(
                longest_match(F.coalesce(F.col("disallow"), empty))
                > longest_match(F.coalesce(F.col("allow"), empty)),
                F.lit(False),
            ),
        )
        .drop(*[c for c in ("disallow", "allow") if c in out.columns])
    )


def host_quotas(
    active_hosts: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    wave_seconds: float,
) -> DataFrame:
    """(site_id, host, quota): max fetches this wave per host.

    quota = floor(wave_seconds / max(seed_delay, robots_delay)), min 1.
    """
    s = seeds.select("site_id", F.col("crawl_delay").alias("_seed_delay"))
    r = robots.select("host", F.col("crawl_delay").alias("_robots_delay"))
    return (
        active_hosts.join(F.broadcast(s), "site_id", "left")
        .join(F.broadcast(r), "host", "left")
        .withColumn(
            "_delay",
            F.greatest(
                F.coalesce(F.col("_seed_delay"), F.lit(1.0)),
                F.coalesce(F.col("_robots_delay"), F.lit(0.0)),
            ),
        )
        .withColumn(
            "quota",
            # delay <= 0 is legitimate "no throttle" (seed crawl_delay 0,
            # no robots delay): an unbounded quota, NOT a division by
            # zero (ANSI mode would otherwise abort the wave)
            F.when(
                F.col("_delay") > 0,
                F.greatest(
                    F.floor(F.lit(float(wave_seconds)) / F.col("_delay")),
                    F.lit(1),
                ),
            )
            .otherwise(F.lit(2_147_483_647))
            .cast("int"),
        )
        .select("site_id", "host", "quota")
    )
