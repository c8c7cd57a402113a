"""The quality-filter cascade (phase-2 worker re-expressed).

Reference dataflow (llm_processing_worker.py:78-124): per crawled page,
gate 0 parse-failure sentinel (→ KB failure) → gate 1 programmatic
low-quality (→ KB 0.0) → gate 2 gatekeeper relevance (→ KB 0.0) →
gate 3 deep analysis → KB score feedback → threshold (0.6) → accept
(packet + ledger update) / reject.

Cascade cost order is preserved *by construction*: each stage filters on
the previous stage's verdict before the next (more expensive) UDF runs,
so at scale the expensive analysis UDF only sees gatekeeper survivors —
the same 75%-cost-saving shape the reference claims for its two-stage
LLM cascade (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.scoring import (
    analyze_udf,
    gatekeeper_udf,
    low_quality_udf,
    sentinel_col,
)
from crawler_spark.functions.urlfns import truncate_packet_text

RELEVANCE_THRESHOLD = 0.6  # reference config/settings.py:65


def run_cascade(
    crawled: DataFrame,
    seeds: DataFrame,
    wave: int | None,
    threshold: float = RELEVANCE_THRESHOLD,
) -> dict[str, DataFrame]:
    """Apply the full gate cascade to a crawled delta.

    ``wave``: the wave number for this delta, or None to take each row's
    own ``wave`` column (the streaming worker's micro-batches can span
    waves — a hardcoded wave would collide packet_ids when a page is
    re-crawled with changed content in a later wave).

    Returns dict with:
      packets   — accepted rows (PACKETS schema)
      rejected  — (site_id, canonical_url, url_hash, reason)
      verdicts  — KB feedback rows (site_id, canonical_url, score, is_failure)
      ledger_delta — (url_hash, url, content_hash, wave) for accepted rows
    """
    wave_col = (F.lit(wave) if wave is not None else F.col("wave")).cast("int")
    seed_dim = F.broadcast(
        seeds.select("site_id", "site_name", "base_url", "instruction")
    )
    df = crawled.join(seed_dim, "site_id", "left")

    # gate 0: parse-failure sentinel → KB failure feedback
    df = df.withColumn("_sentinel", sentinel_col(F.col("text")))
    rej_sentinel = df.filter("_sentinel")
    s1 = df.filter(~F.col("_sentinel"))

    # gate 1: programmatic low-quality (list-like) → score 0.0
    s1 = s1.withColumn("_low_q", low_quality_udf("text"))
    rej_lowq = s1.filter("_low_q")
    s2 = s1.filter(~F.col("_low_q"))

    # gate 2: gatekeeper relevance on the 1500-char snippet → score 0.0
    s2 = s2.withColumn("_relevant", gatekeeper_udf("text", "instruction"))
    rej_gate = s2.filter(~F.col("_relevant"))
    s3 = s2.filter("_relevant")

    # gate 3: deep analysis → score feedback + threshold
    s3 = s3.withColumn("_a", analyze_udf("text", "instruction"))
    accepted = s3.filter(F.col("_a.relevance_score") >= F.lit(threshold))
    rej_score = s3.filter(F.col("_a.relevance_score") < F.lit(threshold))

    packets = accepted.select(
        F.sha2(
            F.concat_ws(":", F.col("canonical_url"), wave_col.cast("string")), 256
        ).alias("packet_id"),
        "site_id",
        "site_name",
        "base_url",
        "instruction",
        F.col("canonical_url").alias("content_url"),
        "title",
        truncate_packet_text(F.col("text")).alias("extracted_text"),
        F.col("_a.relevance_score").alias("relevance_score"),
        F.col("_a.language").alias("language"),
        F.col("_a.summary").alias("summary"),
        F.col("_a.keywords").alias("keywords"),
        wave_col.alias("wave"),
    )

    rejected = (
        rej_sentinel.select(
            "site_id", "canonical_url", "url_hash", F.lit("parse_failure").alias("reason")
        )
        .unionByName(
            rej_lowq.select(
                "site_id", "canonical_url", "url_hash", F.lit("low_quality").alias("reason")
            )
        )
        .unionByName(
            rej_gate.select(
                "site_id", "canonical_url", "url_hash", F.lit("gatekeeper").alias("reason")
            )
        )
        .unionByName(
            rej_score.select(
                "site_id", "canonical_url", "url_hash", F.lit("low_score").alias("reason")
            )
        )
    )

    verdicts = (
        rej_sentinel.select(
            "site_id",
            "canonical_url",
            F.lit(None).cast("double").alias("score"),
            F.lit(True).alias("is_failure"),
        )
        .unionByName(
            rej_lowq.select(
                "site_id", "canonical_url", F.lit(0.0).alias("score"), F.lit(False).alias("is_failure")
            )
        )
        .unionByName(
            rej_gate.select(
                "site_id", "canonical_url", F.lit(0.0).alias("score"), F.lit(False).alias("is_failure")
            )
        )
        .unionByName(
            s3.select(
                "site_id",
                "canonical_url",
                F.col("_a.relevance_score").alias("score"),
                F.lit(False).alias("is_failure"),
            )
        )
    )

    ledger_delta = accepted.select(
        "url_hash",
        F.col("canonical_url").alias("url"),
        "content_hash",
        wave_col.alias("wave"),
    )

    return {
        "packets": packets,
        "rejected": rejected,
        "verdicts": verdicts,
        "ledger_delta": ledger_delta,
    }


def merge_ledger(ledger: DataFrame, delta: DataFrame) -> DataFrame:
    """Upsert the processed ledger (last write wins, reference dict-put).

    A delta carrying a ``wave`` column may span waves (streaming
    micro-batches): last-write-wins is then resolved per url_hash by max
    wave (min-struct-style aggregate, one shuffle) before the upsert, so
    the ledger never holds two rows for one key.
    """
    if "wave" in delta.columns:
        delta = (
            delta.groupBy("url_hash")
            .agg(F.max(F.struct("wave", "url", "content_hash")).alias("_s"))
            .select("url_hash", "_s.url", "_s.content_hash")
        )
    return (
        ledger.join(delta.select("url_hash"), "url_hash", "left_anti")
        .unionByName(delta)
    )
