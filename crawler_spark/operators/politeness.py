"""Per-host politeness: robots rules + crawl-delay fetch budget.

The reference has **no robots handling at all** (verified in SURVEY: zero
robots matches in src/); its only politeness is `REQUEST_DELAY` sleeps and
aiohttp per-host connection caps. The robots component here is the
north-rule addition, designed Spark-first:

* ``robots(host, disallow, crawl_delay)`` is a small dimension table →
  broadcast join on host;
* disallow check = path prefix match, evaluated as a Column expression
  (``exists(disallow, p -> startswith(path, p))`` — JVM-side higher-order
  function, no Python);
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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_filter(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Annotate candidates with ``robots_blocked`` — RFC 9309 §2.2.2
    longest-match precedence between Allow and Disallow prefixes.

    A URL is blocked iff the longest matching disallow prefix is
    STRICTLY longer than the longest matching allow prefix (ties go to
    allow, per the RFC's "SHOULD use the allow"). With no allow rules
    this reduces to the plain any-prefix disallow check. Entirely
    JVM-side higher-order functions (filter/aggregate over the rule
    arrays inside the broadcast join) — no Python in the hot path.
    Rules tables without an ``allow`` column (older corpora) are read
    as allow-nothing."""
    cols = ["host", "disallow", "allow"] if "allow" in robots.columns else [
        "host", "disallow"
    ]
    r = F.broadcast(robots.select(*cols))
    path = F.coalesce(F.parse_url(F.col("canonical_url"), F.lit("PATH")), F.lit("/"))

    def longest_match(rules) -> F.Column:
        # length of the longest rule prefix matching path, -1 if none
        return F.aggregate(
            F.filter(rules, lambda p: path.startswith(p)),
            F.lit(-1),
            lambda acc, p: F.greatest(acc, F.length(p)),
        )

    out = candidates.join(r, "host", "left")
    allow_col = (
        F.coalesce(F.col("allow"), F.array().cast("array<string>"))
        if "allow" in cols
        else F.array().cast("array<string>")
    )
    return (
        out.withColumn(
            "robots_blocked",
            F.coalesce(
                longest_match(F.col("disallow")) > longest_match(allow_col),
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
