"""Streaming filter-cascade worker (the reference phase-2 polling loop as
a real Structured Streaming job).

The reference worker polls ``crawled_data/<site>/*.json`` every 15 s
(2 s busy) and runs the gate cascade per file — exactly a file-source
micro-batch stream with a processing-time trigger (SURVEY §2.10). The
engine's default is the wave-synchronous batch cascade (provable
ordering + resume), but this module provides the always-on variant:

* source: parquet file stream over the ``crawled`` delta directory
  (each wave's commit drops a new delta dir = one micro-batch);
* stateless gates (sentinel, low-quality, gatekeeper, analysis,
  threshold) run as the same vectorized UDFs per micro-batch;
* stateful feedback (KB MERGE, ledger upsert) runs in ``foreachBatch``
  — the standard streaming-upsert pattern, one atomic commit per batch
  through the same TableCatalog (exactly-once via the streaming
  checkpoint + idempotent per-batch stage/commit);
* trigger: ``processingTime='15 seconds'`` in production,
  ``availableNow`` in tests (drain-and-stop, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.operators.cascade import merge_ledger, run_cascade
from crawler_spark.operators.kb import merge_kb, wave_kb_delta
from crawler_spark.tableio import BUCKET_REPLACE, REPLACE, TableCatalog


def make_feedback_catalog(
    spark: SparkSession, state_dir: str, n_buckets: int = 32
) -> TableCatalog:
    """The streaming worker's own kb/ledger state store (same MERGE
    semantics as the batch engine's tables, committed per micro-batch).
    Kept separate from a crawl engine's catalog: the streaming commit
    counter is the micro-batch id, not a wave number."""
    cat = TableCatalog(spark, state_dir)
    cat.register("kb", REPLACE)
    cat.register("ledger", BUCKET_REPLACE, n_buckets=n_buckets)
    return cat


def start_stream_cascade(
    spark: SparkSession,
    crawled_glob: str,
    seeds: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    threshold: float = 0.6,
    feedback_catalog: TableCatalog | None = None,
):
    """Start the streaming cascade; returns the StreamingQuery.

    ``crawled_glob``: directory (or glob) of crawled-delta parquet.
    ``out_dir``: packets/rejected parquet sinks are written under it.
    ``trigger``: e.g. {"processingTime": "15 seconds"} or
    {"availableNow": True} (default, drain-and-stop).
    ``feedback_catalog``: optional state store (make_feedback_catalog)
    that receives the KB MERGE + ledger upsert per micro-batch —
    state-equivalent to the batch cascade's kb/ledger feedback
    (reference worker behavior, llm_processing_worker.py:97-123).
    Exactly-once: a replayed micro-batch restages the same batch_id dirs
    and repoints the same checkpoint entries (idempotent).
    """
    stream = (
        spark.readStream.schema(schemas.CRAWLED)
        .option("maxFilesPerTrigger", 64)
        # tableio lays waves out as crawled/d{N}/ delta subdirs — the
        # file source must recurse into them
        .option("recursiveFileLookup", "true")
        .parquet(crawled_glob)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # wave=None: each row keys packets/ledger by its own wave column
        # (micro-batches can span waves; a hardcoded wave would collide
        # packet_ids on re-crawled pages)
        out = run_cascade(batch_df, seeds, wave=None, threshold=threshold)
        # per-batch atomic appends; batch_id keys make retries idempotent
        out["packets"].withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{out_dir}/packets")
        out["rejected"].withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{out_dir}/rejected")
        if feedback_catalog is not None:
            cat = feedback_catalog
            kb_next = merge_kb(
                cat.read("kb", schemas.KB), wave_kb_delta(out["verdicts"])
            )
            delta = out["ledger_delta"].persist()
            n_b = cat.tables["ledger"].n_buckets
            l_buckets = sorted(
                r["_b"]
                for r in delta.select(
                    F.pmod("url_hash", F.lit(n_b)).cast("int").alias("_b")
                )
                .distinct()
                .collect()
            )
            ledger_next = merge_ledger(
                cat.read_buckets("ledger", l_buckets, schemas.LEDGER), delta
            )
            cat.stage("kb", kb_next, batch_id)
            cat.stage("ledger", ledger_next, batch_id, touched=l_buckets)
            cat.commit(batch_id)
            delta.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    trigger = trigger or {"availableNow": True}
    writer = writer.trigger(**trigger)
    return writer.start()
