"""Streaming ingestion of the raw tier: Structured Streaming with
watermarked tumbling windows feeding the same MERGE protocol as the
batch cascade.

The reference's streaming-shaped mechanisms (SURVEY.md §2.10): its
update-mode incremental extension (T3/T4 — new acquisitions extend the
series without recomputing old mini-stacks) maps to a file/rate stream
of new slots; the mini-stack tumbling window (W2) maps to
``window(ts, '1 hour')``; late slots are bounded by the watermark and
closed windows become immutable 1h-tier rows.

Two levels:
- ``stream_slot_counts``: pure built-in windowed aggregation (counts /
  sums per (source, window)) — fully incremental, no Python.
- ``stream_rollup_1h``: ``foreachBatch`` driving the SAME batch rollup
  kernel per micro-batch over closed windows, MERGEd into the tier
  store. Closed-window replay is idempotent because the MERGE replaces
  per (bucket) partitions (the batch cascade's semantics).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import EngineConfig
from ..operators.rollup import rollup_1h
from ..sources.catalog import TierStore


def stream_slot_counts(stream_df: DataFrame, cfg: EngineConfig = EngineConfig(),
                       watermark: str = "2 hours") -> DataFrame:
    """Incremental windowed aggregates over a streaming sequences
    source. Late rows beyond the watermark are dropped (T5 gap
    semantics: the batch gap-fill interpolates them later)."""
    return (stream_df
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), F.col("source"))
            .agg(F.count("*").alias("n_obs"),
                 F.sum("n_tok").alias("sum_ntok"),
                 F.avg("n_tok").alias("mean_ntok"))
            .select(F.col("w.start").alias("hour_ts"), "source",
                    "n_obs", "sum_ntok", "mean_ntok"))


STAGING_TABLE = "stream_staging"
STREAM_TIER = "rollup_1h_stream"


def stream_rollup_1h(stream_df: DataFrame, store: TierStore,
                     cfg: EngineConfig = EngineConfig(),
                     checkpoint_dir: str | None = None,
                     trigger_seconds: int = 10):
    """Drive the batch 1h kernel per micro-batch via foreachBatch,
    with continuous-aggregate invalidation semantics:

    1. append the micro-batch's raw rows (tagged with batch_id) to a
       staging table;
    2. recompute ONLY the hours touched by this micro-batch, from the
       FULL staged rows of those hours (so an hour whose slots span
       micro-batches converges to the complete rollup — a per-batch
       overwrite would erase the earlier slots' contribution);
    3. MERGE the recomputed hours at (bucket, hour_idx) granularity —
       overwrite granularity matches the window, so untouched hours
       from prior micro-batches are never rewritten.

    Replayed micro-batches (restart after a failed commit) double-
    append to staging; the recompute dedups on (doc_id, slot), so the
    tier output is idempotent. Returns the started StreamingQuery."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        store.append(batch_df.withColumn("batch_id", F.lit(batch_id)),
                     STAGING_TABLE)
        hour_of = lambda c: (c / cfg.slots_per_hour).cast("int")
        touched = (batch_df.select(hour_of(F.col("slot")).alias("t_hour"))
                   .distinct())
        staged = store.read(spark, STAGING_TABLE)
        rows = (staged.join(F.broadcast(touched),
                            hour_of(staged["slot"]) == touched["t_hour"])
                .drop("t_hour", "batch_id")
                .dropDuplicates(["doc_id", "slot"]))
        out = rollup_1h(rows, cfg)
        store.merge_partitions(out, STREAM_TIER,
                               partition_col=["bucket", "hour_idx"])

    writer = (stream_df.writeStream
              .foreachBatch(process_batch)
              .outputMode("update")
              .trigger(processingTime=f"{trigger_seconds} seconds"))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
