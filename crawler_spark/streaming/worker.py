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
* stateful feedback (KB MERGE, ledger versions) runs in ``foreachBatch``
  — the standard streaming-upsert pattern, one atomic commit per batch
  through the same TableCatalog;
* trigger: ``processingTime='15 seconds'`` in production,
  ``availableNow`` in tests (drain-and-stop, deterministic).

Exactly-once under replay (foreachBatch may re-run a batch whose
side-effects completed but whose completion the streaming checkpoint
never recorded):

* packets/rejected are written to a per-batch partition dir
  (``batch_id={id}``) with overwrite — a replay rewrites the same bytes
  instead of appending duplicates;
* the feedback catalog records the last applied batch id as its own
  committed counter; a replayed batch with ``batch_id <= committed`` is
  skipped outright, which both prevents the additive KB merge from
  double-counting and never restages (→ never rmtree's) a dir the
  committed catalog checkpoint references;
* the ledger is a BUCKET_APPEND merge-on-read log exactly like the
  batch engine's (wave.py design): each batch appends only its own
  version rows, latest wave per url_hash wins on read
  (:func:`read_ledger_state`) — no per-batch O(bucket) rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_spark import schemas
from crawler_spark.operators.cascade import run_cascade
from crawler_spark.operators.kb import merge_kb, wave_kb_delta
from crawler_spark.tableio import BUCKET_APPEND, REPLACE, TableCatalog


def make_feedback_catalog(
    spark: SparkSession, state_dir: str, n_buckets: int = 32
) -> TableCatalog:
    """The streaming worker's own kb/ledger state store, committed per
    micro-batch (the catalog's committed counter IS the last applied
    batch id — the replay guard). kb stays a full snapshot (genuinely
    small); ledger is a bucketed merge-on-read version log, the same
    O(delta) append design as the batch engine's ledger."""
    cat = TableCatalog(spark, state_dir)
    cat.register("kb", REPLACE)
    cat.register("ledger", BUCKET_APPEND, n_buckets=n_buckets)
    return cat


def read_ledger_state(cat: TableCatalog) -> DataFrame:
    """Resolved ledger state (latest wave per url_hash) → LEDGER shape."""
    log = cat.read("ledger", schemas.LEDGER_LOG)
    return (
        log.groupBy("url_hash")
        .agg(F.max(F.struct("wave", "url", "content_hash")).alias("_s"))
        .select("url_hash", "_s.url", "_s.content_hash")
    )


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
    ``out_dir``: packets/rejected parquet sinks are written under it,
    partitioned by ``batch_id`` (read the directory whole — Spark's
    partition discovery restores the batch_id column).
    ``trigger``: e.g. {"processingTime": "15 seconds"} or
    {"availableNow": True} (default, drain-and-stop).
    ``feedback_catalog``: optional state store (make_feedback_catalog)
    that receives the KB MERGE + ledger version append per micro-batch —
    state-equivalent to the batch cascade's kb/ledger feedback
    (reference worker behavior, llm_processing_worker.py:97-123).
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
        # idempotent per-batch sinks: a replayed batch overwrites its own
        # partition dir instead of appending duplicate rows
        out["packets"].write.mode("overwrite").parquet(
            f"{out_dir}/packets/batch_id={batch_id}"
        )
        out["rejected"].write.mode("overwrite").parquet(
            f"{out_dir}/rejected/batch_id={batch_id}"
        )
        if feedback_catalog is not None:
            cat = feedback_catalog
            if batch_id <= cat.committed_wave:
                # replay of an already-applied batch (crash landed between
                # the catalog commit and the streaming checkpoint write):
                # the state already includes it — re-merging would double-
                # count the additive KB scores, and restaging would
                # rmtree dirs the committed checkpoint references.
                return
            kb_next = merge_kb(
                cat.read("kb", schemas.KB), wave_kb_delta(out["verdicts"])
            )
            # MOR log append: only this batch's version rows are written;
            # resolution (max wave per key) happens on read
            cat.stage("kb", kb_next, batch_id)
            cat.stage("ledger", out["ledger_delta"], batch_id)
            cat.commit(batch_id)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    trigger = trigger or {"availableNow": True}
    writer = writer.trigger(**trigger)
    return writer.start()
