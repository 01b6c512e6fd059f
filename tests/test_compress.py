"""Spark round-trip of the compressed tier columns (FIXTURES.md F3
compression_roundtrip, through the engine surface)."""

import numpy as np
import pytest

from miaplpy_spark.config import EngineConfig, ScaleSpec
from miaplpy_spark.datagen import generate_sequences, prepare_observations
from miaplpy_spark.operators.compress import compress_1h, decompress_1h
from miaplpy_spark.operators.rollup import rollup_1h

CFG = EngineConfig(n_buckets=4, n_samples=8)
SPEC = ScaleSpec(n_docs=5, n_slots=480, tok_lo=16, tok_hi=48,
                 tok_heavy_lo=96, tok_heavy_hi=128)


@pytest.fixture(scope="module")
def tier1h(spark):
    obs = prepare_observations(generate_sequences(spark, SPEC, CFG), CFG)
    return rollup_1h(obs, CFG).cache()


def test_compress_roundtrip(spark, tier1h):
    blobs = compress_1h(tier1h, CFG)
    back = decompress_1h(blobs).toPandas()
    orig = tier1h.select("doc_id", "hour_ts", "quality", "mean_ntok").toPandas()
    key = ["doc_id", "hour_ts"]
    back = back.sort_values(key).reset_index(drop=True)
    orig = orig.sort_values(key).reset_index(drop=True)
    assert len(back) == len(orig)
    assert (back["doc_id"] == orig["doc_id"]).all()
    assert (back["hour_ts"].to_numpy() == orig["hour_ts"].to_numpy()).all()
    # quality is float32 in the tier; cast through float64 is exact
    np.testing.assert_array_equal(
        back["quality"].to_numpy(), orig["quality"].to_numpy().astype(np.float64))
    np.testing.assert_array_equal(
        back["mean_ntok"].to_numpy(), orig["mean_ntok"].to_numpy())


def test_compress_ratio_reported(spark, tier1h):
    pdf = compress_1h(tier1h, CFG).toPandas()
    assert (pdf["n_points"] > 0).all()
    # steady hourly cadence: the ts blob must be far below 8B/point
    assert pdf["blob_bytes"].sum() < pdf["raw_bytes"].sum()


def test_retention_ages_hot_rows_into_cold_blobs(spark, tier1h, workdir):
    """apply_retention_1h moves pre-boundary days into the compressed
    cold tier, drops them from hot storage, and the tiered read still
    sees every original row with bit-identical summary values.
    Re-running retention at the same boundary is a no-op."""
    import os

    import pyspark.sql.functions as F

    from miaplpy_spark.operators.compress import (apply_retention_1h,
                                                  read_1h_tiered)
    from miaplpy_spark.sources.catalog import TierStore

    store = TierStore(os.path.join(workdir, "ret_tiers"))
    store.merge_partitions(tier1h, "rollup_1h")
    n_total = tier1h.count()
    boundary = 1  # day 0 ages out, day 1 stays hot
    H = CFG.hours_per_day
    n_old = tier1h.where(F.col("hour_idx") < boundary * H).count()
    assert 0 < n_old < n_total

    stats = apply_retention_1h(spark, store, boundary, CFG)
    assert stats["n_aged"] == n_old
    assert stats["blob_bytes"] < stats["raw_bytes"]

    hot = store.read(spark, "rollup_1h")
    assert hot.count() == n_total - n_old
    assert hot.agg(F.min("hour_idx")).collect()[0][0] >= boundary * H

    tiered = read_1h_tiered(spark, store, CFG)
    assert tiered.count() == n_total
    key = ["doc_id", "hour_ts"]
    got = tiered.select(*key, "quality").toPandas().sort_values(key)
    exp = tier1h.select(*key, F.col("quality").cast("double").alias("quality")
                        ).toPandas().sort_values(key)
    np.testing.assert_array_equal(got["quality"].to_numpy(),
                                  exp["quality"].to_numpy())

    # idempotent: nothing left below the boundary to age
    stats2 = apply_retention_1h(spark, store, boundary, CFG)
    assert stats2["n_aged"] == 0
    assert read_1h_tiered(spark, store, CFG).count() == n_total
