"""Knowledge-base feedback: the learned URL-pattern score store.

Reference semantics (knowledge_base.py:43-59): per verdict,
``total_score += s; count += 1; avg = round(total/count, 3)``; failures
bump ``failure_count``. The reference rewrites a JSON file under a lock
on *every single update*; the engine accumulates one partial aggregate
per wave and MERGEs it into the kb table — Spark's partial/final
aggregation does the combine, and the wave-synchronous MERGE removes the
reference's racy read-your-writes file semantics (documented intentional
cleanup, SURVEY §2.10).

Skew note: the groupBy key is (site_id, pattern) — path patterns on a
mega-domain can be hot, so the aggregate is salted: a first partial
aggregate on (site_id, pattern, salt) then the final on (site_id,
pattern). With AQE this is usually unnecessary at test scale, but the
shape is load-bearing at 10^10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.urlfns import kb_pattern

KB_SALT = 16


def wave_kb_delta(verdicts: DataFrame) -> DataFrame:
    """Aggregate one wave's verdicts into per-pattern deltas.

    ``verdicts``: rows with (site_id, canonical_url, score double nullable,
    is_failure boolean). Score rows accumulate (total, count); failure
    rows accumulate failure_count — mirroring update_score/update_failure.
    """
    base = verdicts.withColumn("pattern", kb_pattern(F.col("canonical_url")))
    salted = base.withColumn("_salt", F.pmod(F.xxhash64("canonical_url"), F.lit(KB_SALT)))
    partial = salted.groupBy("site_id", "pattern", "_salt").agg(
        F.sum(F.coalesce(F.col("score"), F.lit(0.0))).alias("_ts"),
        F.sum(F.when(F.col("score").isNotNull(), 1).otherwise(0)).alias("_n"),
        F.sum(F.when(F.col("is_failure"), 1).otherwise(0)).alias("_nf"),
    )
    return partial.groupBy("site_id", "pattern").agg(
        F.sum("_ts").alias("d_total_score"),
        F.sum("_n").alias("d_count"),
        F.sum("_nf").alias("d_failure_count"),
    )


def merge_kb(kb: DataFrame, delta: DataFrame) -> DataFrame:
    """MERGE INTO kb: accumulate deltas, recompute round(total/count, 3)."""
    merged = (
        kb.select(
            "site_id",
            "pattern",
            F.col("total_score").alias("o_total"),
            F.col("count").alias("o_count"),
            F.col("failure_count").alias("o_fail"),
        )
        .join(delta, ["site_id", "pattern"], "full_outer")
        .select(
            "site_id",
            "pattern",
            (F.coalesce("o_total", F.lit(0.0)) + F.coalesce("d_total_score", F.lit(0.0))).alias("total_score"),
            (F.coalesce("o_count", F.lit(0)) + F.coalesce("d_count", F.lit(0))).cast("long").alias("count"),
            (F.coalesce("o_fail", F.lit(0)) + F.coalesce("d_failure_count", F.lit(0))).cast("long").alias("failure_count"),
        )
        .withColumn(
            "avg_score",
            F.when(F.col("count") > 0, F.round(F.col("total_score") / F.col("count"), 3)).otherwise(F.lit(0.0)),
        )
        .select("site_id", "pattern", "total_score", "count", "avg_score", "failure_count")
    )
    return merged
