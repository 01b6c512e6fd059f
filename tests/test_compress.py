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
