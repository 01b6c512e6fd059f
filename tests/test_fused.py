"""Fused-cascade kernel: both tiers from one pass must equal the
two-stage pipeline exactly."""

import numpy as np
import pytest

from miaplpy_spark.config import EngineConfig, ScaleSpec
from miaplpy_spark.datagen import generate_sequences, prepare_observations
from miaplpy_spark.operators.fused import rollup_cascade_fused
from miaplpy_spark.operators.rollup import rollup_1d, rollup_1h

CFG = EngineConfig(n_buckets=4, n_samples=8)
SPEC = ScaleSpec(n_docs=5, n_slots=600, tok_lo=8, tok_hi=16,
                 tok_heavy_lo=24, tok_heavy_hi=32)  # 2.5 days per doc


@pytest.fixture(scope="module")
def frames(spark):
    obs = prepare_observations(generate_sequences(spark, SPEC, CFG), CFG)
    fused = rollup_cascade_fused(obs, CFG).cache()
    h = rollup_1h(obs, CFG)
    d = rollup_1d(h, CFG, assume_partitioned=True)
    return fused, h.toPandas(), d.toPandas()


def test_fused_1h_equals_pipeline(frames):
    fused, h, _ = frames
    fh = fused.where("tier = '1h'").toPandas()
    key = ["doc_id", "hour_idx"]
    fh = fh.sort_values(key).reset_index(drop=True)
    h = h.sort_values(key).reset_index(drop=True)
    assert len(fh) == len(h)
    for c in ["n_obs", "n_filled", "sum_tok", "min_tok", "max_tok"]:
        np.testing.assert_array_equal(fh[c].to_numpy(), h[c].to_numpy())
    np.testing.assert_allclose(fh["quality"], h["quality"], atol=1e-6)
    for a, b in zip(fh["linked_phase"], h["linked_phase"]):
        np.testing.assert_allclose(a, b, atol=1e-6)
    assert (fh["hour_ts"].to_numpy() == h["hour_ts"].to_numpy()).all()


def test_fused_1d_equals_pipeline(frames):
    fused, _, d = frames
    fd = fused.where("tier = '1d'").toPandas()
    key = ["doc_id", "day_idx"]
    fd = fd.sort_values(key).reset_index(drop=True)
    d = d.sort_values(key).reset_index(drop=True)
    assert len(fd) == len(d)
    for c in ["n_hours", "n_obs", "n_filled", "sum_tok", "min_tok", "max_tok"]:
        np.testing.assert_array_equal(fd[c].to_numpy(), d[c].to_numpy())
    np.testing.assert_allclose(fd["quality_1d"], d["quality_1d"], atol=1e-5)
    np.testing.assert_allclose(fd["mean_quality_1h"], d["mean_quality_1h"],
                               atol=1e-6)
    for a, b in zip(fd["datum_shift"], d["datum_shift"]):
        np.testing.assert_allclose(
            np.exp(1j * np.asarray(a, dtype=np.float64)),
            np.exp(1j * np.asarray(b, dtype=np.float64)), atol=1e-5)


def test_fused_null_discipline(frames):
    fused, _, _ = frames
    assert fused.where("tier = '1h' AND hour_idx IS NULL").count() == 0
    assert fused.where("tier = '1h' AND n_hours IS NOT NULL").count() == 0
    assert fused.where("tier = '1d' AND hour_idx IS NOT NULL").count() == 0
    assert fused.where("tier = '1d' AND quality_1d IS NULL").count() == 0


def test_fused_honors_shp_filter(spark):
    """cfg.shp_filter must shape the fused ensembles exactly like the
    tiered path (it was previously silently ignored on the fused
    path): with the gate on, fused 1h == tiered 1h, and the gate
    actually changes something vs the ungated run."""
    import pandas as pd

    cfg = EngineConfig(n_buckets=2, n_samples=8, shp_filter=True,
                       shp_test="KS", shp_alpha=0.2)
    obs = prepare_observations(generate_sequences(spark, SPEC, cfg), cfg)
    key = ["doc_id", "hour_idx"]
    fh = (rollup_cascade_fused(obs, cfg).where("tier = '1h'")
          .toPandas().sort_values(key).reset_index(drop=True))
    th = (rollup_1h(obs, cfg).toPandas()
          .sort_values(key).reset_index(drop=True))
    assert len(fh) == len(th)
    np.testing.assert_allclose(fh["quality"], th["quality"], atol=1e-6)
    for a, b in zip(fh["linked_phase"], th["linked_phase"]):
        np.testing.assert_allclose(a, b, atol=1e-6)
    ungated = (rollup_1h(obs, EngineConfig(n_buckets=2, n_samples=8))
               .toPandas().sort_values(key).reset_index(drop=True))
    assert not np.allclose(
        np.concatenate(th["linked_phase"].to_numpy()),
        np.concatenate(ungated["linked_phase"].to_numpy()), atol=1e-6)
