"""Structured Streaming tier tests: watermarked windowed aggregation
and the foreachBatch MERGE path (SURVEY.md §2.10 T3/T4 semantics)."""

import os
import time

import pyspark.sql.functions as F
import pytest

from miaplpy_spark.config import EngineConfig, ScaleSpec
from miaplpy_spark.datagen import generate_sequences, prepare_observations
from miaplpy_spark.sources.catalog import TierStore
from miaplpy_spark.streaming.rollup_stream import (
    stream_rollup_1h,
    stream_running_stats,
    stream_slot_counts,
)

CFG = EngineConfig(n_buckets=2, n_samples=8)
SPEC = ScaleSpec(n_docs=3, n_slots=40, tok_lo=8, tok_hi=16,
                 tok_heavy_lo=24, tok_heavy_hi=32)


@pytest.fixture()
def slices(spark, workdir):
    """Two arrival slices of the same sequences table (slots 0-19 then
    20-39) written as parquet for the file stream source."""
    raw = generate_sequences(spark, SPEC, CFG).cache()
    src = os.path.join(workdir, "arrivals")
    os.makedirs(src)
    first = raw.where(F.col("slot") < 20)
    second = raw.where(F.col("slot") >= 20)
    first.write.parquet(os.path.join(src, "slice=0"))
    schema = raw.schema
    raw.unpersist()
    return src, first, second, schema


def test_stream_slot_counts(spark, slices, workdir):
    src, first, second, schema = slices
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "*.parquet")
              .parquet(src + "/slice=*"))
    agg = stream_slot_counts(stream, CFG, watermark="10 hours")
    q = (agg.writeStream.format("memory").queryName("slot_counts")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        n1 = spark.sql("select sum(n_obs) from slot_counts").collect()[0][0]
        assert n1 == first.count()
        # second arrival slice extends the same windows incrementally
        second.write.parquet(os.path.join(src, "slice=1"))
        q.processAllAvailable()
        n2 = spark.sql("select sum(n_obs) from slot_counts").collect()[0][0]
        assert n2 == n1 + second.count()
    finally:
        q.stop()


def test_stream_running_stats_stateful(spark, slices, workdir):
    """applyInPandasWithState carry: after both arrival slices drain
    (one file per trigger), the last emitted row per source equals the
    batch-global Welford statistics over the full table — state
    extension is exact, independent of micro-batch boundaries."""
    import numpy as np

    src, first, second, schema = slices
    second.write.parquet(os.path.join(src, "slice=1"))
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "*.parquet")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/slice=*"))
    q = (stream_running_stats(stream)
         .writeStream.format("memory").queryName("running_stats")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        got = {r["source"]: r for r in spark.sql(
            "select * from (select *, row_number() over "
            "(partition by source order by n desc) as rk "
            "from running_stats) where rk = 1"
        ).collect()}
    finally:
        q.stop()
    full = first.unionByName(second).select("source", "n_tok").toPandas()
    for source, grp in full.groupby("source"):
        x = grp["n_tok"].to_numpy(dtype=np.float64)
        r = got[source]
        assert r["n"] == len(x)
        assert abs(r["mean"] - x.mean()) < 1e-9
        assert abs(r["var"] - x.var(ddof=1)) < 1e-6


def test_stream_rollup_foreachbatch(spark, slices, workdir):
    src, first, second, schema = slices
    store = TierStore(os.path.join(workdir, "tiers"))
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "*.parquet")
              .parquet(src + "/slice=*"))
    obs_stream = prepare_observations(stream, CFG)
    q = stream_rollup_1h(obs_stream, store, CFG,
                         checkpoint_dir=os.path.join(workdir, "ckpt"),
                         trigger_seconds=1)
    try:
        q.processAllAvailable()
        out = store.read(spark, "rollup_1h_stream")
        # slots 0..19 -> hours 0,1 per doc
        assert out.count() == 3 * 2
        assert set(r["hour_idx"] for r in out.select("hour_idx").collect()) == {0, 1}
        # second micro-batch (slots 20-39) must EXTEND the tier, not
        # erase the first micro-batch's hours in the same buckets
        second.write.parquet(os.path.join(src, "slice=1"))
        q.processAllAvailable()
        out = store.read(spark, "rollup_1h_stream")
        assert out.count() == 3 * 4
        assert (set(r["hour_idx"] for r in out.select("hour_idx").collect())
                == {0, 1, 2, 3})
    finally:
        q.stop()


def test_stream_cascade_1d_equals_batch_tier(spark, workdir):
    """Round-4 VERDICT item 7: the streaming 1h->1d leg. After the
    backlog drains (mid-hour file splits, one file per trigger), the
    streamed rollup_1d_stream tier must equal the BATCH 1d tier over
    the full input, scalar-for-scalar — the per-day recompute from the
    complete 1h rows converges exactly like the hourly leg."""
    raw = generate_sequences(spark, SPEC, CFG).cache()
    src = os.path.join(workdir, "arrivals3")
    os.makedirs(src)
    raw.where(F.col("slot") < 15).write.parquet(os.path.join(src, "s=0"))
    schema = raw.schema
    store = TierStore(os.path.join(workdir, "tiers3"))
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "*.parquet")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/s=*"))
    q = stream_rollup_1h(prepare_observations(stream, CFG), store, CFG,
                         checkpoint_dir=os.path.join(workdir, "ckpt3"),
                         trigger_seconds=1, cascade_1d=True)
    cols = ["doc_id", "day_idx", "n_hours", "n_obs", "sum_tok",
            "min_tok", "max_tok"]
    try:
        q.processAllAvailable()
        raw.where(F.col("slot") >= 15).write.parquet(os.path.join(src, "s=1"))
        q.processAllAvailable()
        got = {tuple(r) for r in store.read(spark, "rollup_1d_stream")
               .select(*cols).collect()}
    finally:
        q.stop()
    from miaplpy_spark.operators.rollup import rollup_1d, rollup_1h
    obs = prepare_observations(raw, CFG)
    exp = {tuple(r) for r in rollup_1d(rollup_1h(obs, CFG), CFG)
           .select(*cols).collect()}
    raw.unpersist()
    assert got == exp


def test_staging_partitioned_and_pruned(spark, workdir):
    """Staging is laid out as stage_hour=N partitions; with
    staging_keep_hours the closed hours' directories are aged away
    while the tier stays exact — staging no longer grows with stream
    lifetime."""
    raw = generate_sequences(spark, SPEC, CFG).cache()
    src = os.path.join(workdir, "arr_prune")
    os.makedirs(src)
    raw.where(F.col("slot") < 20).write.parquet(os.path.join(src, "s=0"))
    store = TierStore(os.path.join(workdir, "tiers_prune"))
    stream = (spark.readStream.schema(raw.schema)
              .option("pathGlobFilter", "*.parquet")
              .parquet(src + "/s=*"))
    q = stream_rollup_1h(prepare_observations(stream, CFG), store, CFG,
                         checkpoint_dir=os.path.join(workdir, "ck_prune"),
                         trigger_seconds=1, staging_keep_hours=1)
    try:
        q.processAllAvailable()
        raw.where(F.col("slot") >= 20).write.parquet(os.path.join(src, "s=1"))
        q.processAllAvailable()
        staging = store.path("stream_staging")
        parts = sorted(p for p in os.listdir(staging)
                       if p.startswith("stage_hour="))
        # after hours 2,3 arrive with keep=1, hours < 2 are gone
        assert parts == ["stage_hour=2", "stage_hour=3"], parts
        out = store.read(spark, "rollup_1h_stream")
        assert out.count() == 3 * 4   # tier still complete and exact
    finally:
        q.stop()
    raw.unpersist()


def test_late_arrival_below_prune_boundary_raises(spark, workdir):
    """A replay touching an hour whose staging was aged away must fail
    loudly — recomputing that hour from partial rows would overwrite a
    complete tier window."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    raw = generate_sequences(spark, SPEC, CFG).cache()
    src = os.path.join(workdir, "arr_late")
    os.makedirs(src)
    raw.where(F.col("slot") >= 20).write.parquet(os.path.join(src, "s=0"))
    store = TierStore(os.path.join(workdir, "tiers_late"))
    stream = (spark.readStream.schema(raw.schema)
              .option("pathGlobFilter", "*.parquet")
              .parquet(src + "/s=*"))
    q = stream_rollup_1h(prepare_observations(stream, CFG), store, CFG,
                         checkpoint_dir=os.path.join(workdir, "ck_late"),
                         trigger_seconds=1, staging_keep_hours=0)
    try:
        q.processAllAvailable()   # hours 2,3 processed, boundary -> 3
        raw.where(F.col("slot") < 10).write.parquet(os.path.join(src, "s=1"))
        with pytest.raises(StreamingQueryException,
                           match="below the pruned staging boundary"):
            q.processAllAvailable()
            q.awaitTermination(30)
    finally:
        q.stop()
    raw.unpersist()


def test_stream_rollup_hour_spanning_micro_batches(spark, workdir):
    """An hour whose slots arrive across several micro-batches must
    converge to the same rollup as the batch kernel over the full
    input (the touched-hour recompute path)."""
    raw = generate_sequences(spark, SPEC, CFG).cache()
    src = os.path.join(workdir, "arrivals2")
    os.makedirs(src)
    # split MID-hour: slots 0-14 then 15-39 (hour 1 spans both batches)
    raw.where(F.col("slot") < 15).write.parquet(os.path.join(src, "s=0"))
    schema = raw.schema
    store = TierStore(os.path.join(workdir, "tiers2"))
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "*.parquet")
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/s=*"))
    q = stream_rollup_1h(prepare_observations(stream, CFG), store, CFG,
                         checkpoint_dir=os.path.join(workdir, "ckpt2"),
                         trigger_seconds=1)
    try:
        q.processAllAvailable()
        raw.where(F.col("slot") >= 15).write.parquet(os.path.join(src, "s=1"))
        q.processAllAvailable()
        got = {(r["doc_id"], r["hour_idx"]): (r["n_obs"], r["sum_tok"])
               for r in store.read(spark, "rollup_1h_stream")
               .select("doc_id", "hour_idx", "n_obs", "sum_tok").collect()}
    finally:
        q.stop()
    from miaplpy_spark.operators.rollup import rollup_1h
    exp = {(r["doc_id"], r["hour_idx"]): (r["n_obs"], r["sum_tok"])
           for r in rollup_1h(prepare_observations(raw, CFG), CFG)
           .select("doc_id", "hour_idx", "n_obs", "sum_tok").collect()}
    raw.unpersist()
    assert got == exp
