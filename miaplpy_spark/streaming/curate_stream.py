"""Streaming corpus curation: documents arrive as files, every
micro-batch is curated against the persistent dedup index
(functions.curate.curate_batch), and the kept docs extend the index
before the next micro-batch — Structured Streaming closing the
incremental-curation loop end-to-end.

Reference parity note: the reference engine has no streaming corpus
path (its ingestion is batch stacks, `miaplpy/load_slc.py`); this is
the training-data-pipeline surface the brief asks for, built on the
same foreachBatch pattern as streaming/rollup_stream.py.

Semantics per micro-batch (exactly-once through idempotent replay,
the same discipline as stream_rollup_1h):

1. stage the micro-batch's documents to a per-batch directory
   (mode=overwrite — a replayed batch rewrites the same rows);
2. decide keep/drop/reason with curate_batch against the CURRENT
   index (store-wins: docs already indexed by earlier micro-batches
   outrank this batch's members);
3. write the decision partitioned by the micro-batch id
   (per-partition overwrite — replay rewrites, never duplicates);
4. extend the index with the KEPT docs only, ``if_absent=True`` so a
   replay after a failed commit cannot double-append.

Ordering across micro-batches is the correctness contract: batch N's
decision must see batches 0..N-1 in the index. foreachBatch runs
micro-batches serially, so the extend in step 4 is always visible to
the next trigger.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.curate import curate_batch
from ..functions.dedup import extend_minhash_index

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")


def stream_curate(stream_df: DataFrame, index_dir: str, out_dir: str,
                  staging_root: str,
                  checkpoint_dir: str | None = None,
                  trigger_seconds: int = 10,
                  available_now: bool = False,
                  **curate_kwargs):
    """Start the curation stream over a streaming ``documents``-schema
    DataFrame (e.g. ``spark.readStream.schema(DOCS_SCHEMA)
    .parquet(incoming_dir)``). Decisions land under
    ``{out_dir}/batch=N/`` (read the root as one parquet table);
    kept docs extend ``index_dir`` for the next micro-batch.
    ``curate_kwargs`` pass through to curate_batch (thresholds, cfg).
    Returns the started StreamingQuery.

    The index must exist (dedup.build_minhash_index over the initial
    corpus — possibly empty). At 100 TB the per-trigger cost is the
    curate_batch cost model: everything scales with the micro-batch,
    plus slim fixed-width store scans; nothing rescans stored text."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        stage = f"{staging_root}/batch_{batch_id}"
        (batch_df.write.mode("overwrite")
         .parquet(f"{stage}/documents.parquet"))
        decision = curate_batch(spark, stage, index_dir, **curate_kwargs)
        # one materialization: the decision feeds its own write AND the
        # index extension; recomputing it would re-run the dedup probes
        decision = decision.localCheckpoint(eager=True)
        (decision.write.mode("overwrite")
         .parquet(f"{out_dir}/batch={batch_id}"))
        extend_minhash_index(spark, stage, index_dir,
                             keep=decision.where(F.col("keep")),
                             if_absent=True)

    writer = (stream_df.writeStream
              .foreachBatch(process_batch)
              .outputMode("update"))
    writer = (writer.trigger(availableNow=True) if available_now else
              writer.trigger(processingTime=f"{trigger_seconds} seconds"))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
