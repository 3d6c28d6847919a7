"""Structured Streaming incremental ingest (SURVEY.md §2.8 ST1-ST4).

The reference's ``PersistentIngestService`` (REF/PersistentIngestService.
java:176-252) is a sleep/wake micro-batch loop: each cycle rsyncs new
delta logs, parses them, pushes changes, renames processed logs so a
crash resumes where it left off (ST3). The Spark-native equivalent:

- SOURCE: a Structured Streaming *file source* over the delta-log
  directory — Spark's checkpointed file tracking replaces the
  ``dlog-*`` → ``_PROCESSED_`` rename state machine: a file is read
  exactly once across restarts, recorded in the checkpoint's file log
  (same contract, engine-managed).
- TRANSFORM: the SAME batch operators (ingest.parse_delta_log /
  collapse_changes / apply_changes) inside ``foreachBatch`` — one code
  path for batch and streaming (the Dataset-API promise).
- SINK: idempotent MERGE into a parquet snapshot per micro-batch,
  keyed by ``batch_id`` — re-delivery of a batch after a crash
  overwrites to the same state (ST3 exactly-once-ish).
- TRIGGER: ``availableNow`` drains everything then stops (the one-shot
  IngestService); ``processingTime`` mirrors the persistent service's
  PERSIST_WAKEUP_INTERVAL (ST1). Graceful stop = ``query.stop()``
  (ST2's STOP control file).
- Late/duplicate lines (ST4) collapse in ``collapse_changes`` exactly
  as the reference's upsert maps do (DeltaLogParser.java:242-244).

Scale notes: each micro-batch shuffles only the batch's change set
(cost ∝ change volume, §3.2); the snapshot rewrite joins changes
against the previous snapshot — on Iceberg this is MERGE INTO with
partition pruning; here (plain parquet) we rewrite via the same
apply_changes plan and an atomic directory swap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import ingest as I


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame | None:
    """Current snapshot via the atomic _LATEST pointer; None when no
    committed snapshot exists yet. A missing/torn version dir with a
    valid pointer is a hard error (never silently reset — data loss)."""
    ptr = os.path.join(snapshot_dir, "_LATEST")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(snapshot_dir, version))


def read_delta_log_stream(spark: SparkSession, dlog_dir: str) -> DataFrame:
    """Streaming raw delta-log lines (value, src_file). Sequencing and
    parsing happen per micro-batch (monotonically_increasing_id is not
    allowed on unbounded streams — inside foreachBatch the frame is
    bounded and it is)."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)
        .load(dlog_dir)
        .select(F.col("value"), F.input_file_name().alias("src_file"))
    )


def parse_batch(batch_df: DataFrame) -> DataFrame:
    """Micro-batch lines → classified change stream.

    ``seq`` must respect delta-log chronology ACROSS files in the same
    micro-batch: Spark schedules file splits largest-first, so raw
    monotonically_increasing_id would let an older-but-bigger log
    outrank a newer one. The order is therefore (file-name rank ≪ 40 |
    within-partition id): dlog/t-file names are timestamp-sortable
    (Rsyncker's dlog-<ts> convention), giving cross-file chronology;
    the low bits keep within-file line order (a text-source partition
    reads its lines sequentially)."""
    from pyspark.sql import Window

    ranked = batch_df.withColumn(
        "_frank",
        F.dense_rank().over(Window.orderBy("src_file")).cast("long"),
    ).withColumn(
        "seq",
        (F.col("_frank") * F.lit(1 << 40))
        + F.pmod(F.monotonically_increasing_id(), F.lit(1 << 40)),
    )
    return I.parse_delta_log(ranked)


def run_incremental_merge(
    spark: SparkSession,
    dlog_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Drain the delta-log directory into the snapshot via foreachBatch
    MERGE. Returns the (possibly stopped) StreamingQuery."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        changes = I.collapse_changes(parse_batch(batch_df))
        if not changes.take(1):
            return
        snapshot = read_snapshot(spark, snapshot_dir)
        if snapshot is None:
            snapshot = spark.createDataFrame(
                [], "volume_id string, op string, seq long, path string"
            )
        new_rows = changes.where(F.col("op") == "upsert")
        merged = I.apply_changes(snapshot, changes, new_rows)
        # versioned snapshot + atomic pointer rename = the commit
        # record (the reference's rename-as-commit): a crash anywhere
        # before the os.replace leaves the pointer at the previous
        # snapshot — no torn reads, no silent reset; the batch replays
        # idempotently into the same version directory
        ver_path = os.path.join(snapshot_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(ver_path)
        tmp_ptr = os.path.join(snapshot_dir, "_LATEST.tmp")
        with open(tmp_ptr, "w") as f:
            f.write(f"v{batch_id}")
        os.replace(tmp_ptr, os.path.join(snapshot_dir, "_LATEST"))

    writer = (
        read_delta_log_stream(spark, dlog_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    q = writer.trigger(processingTime=processing_time or "10 seconds").start()
    return q


def windowed_change_rates(
    parsed_stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Event-time windowed upsert/delete rates with a watermark for
    late lines — the streaming-metrics analog of the reference's
    throughput log (Ingester.java:332-341). Input must carry an
    event-time ``ts`` column."""
    return (
        parsed_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("kind"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "kind", "n")
    )
