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
from crawler_spark.operators.cascade import run_cascade


def start_stream_cascade(
    spark: SparkSession,
    crawled_glob: str,
    seeds: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    threshold: float = 0.6,
):
    """Start the streaming cascade; returns the StreamingQuery.

    ``crawled_glob``: directory (or glob) of crawled-delta parquet.
    ``out_dir``: packets/rejected parquet sinks are written under it.
    ``trigger``: e.g. {"processingTime": "15 seconds"} or
    {"availableNow": True} (default, drain-and-stop).
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
        out = run_cascade(batch_df, seeds, wave=0, threshold=threshold)
        # per-batch atomic appends; batch_id keys make retries idempotent
        out["packets"].withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{out_dir}/packets")
        out["rejected"].withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{out_dir}/rejected")

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    trigger = trigger or {"availableNow": True}
    writer = writer.trigger(**trigger)
    return writer.start()
