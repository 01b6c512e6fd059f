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
    finally:
        q.stop()
