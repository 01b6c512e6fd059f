"""invert_network operator: exact recovery of a smooth per-doc series
from its banded pair network (the full-pipeline closure test)."""

import numpy as np
import pytest

from miaplpy_spark.config import EngineConfig
from miaplpy_spark.operators.network_inversion import invert_network

CFG = EngineConfig(n_buckets=2, n_samples=8)


def test_exact_recovery_from_fake_tier(spark):
    rng = np.random.default_rng(5)
    rows = []
    truths = {}
    for d in range(6):
        n_hours = 24 if d % 2 == 0 else 18  # two window-count groups
        truth = np.concatenate([[0.0], np.cumsum(rng.normal(0, 0.2, n_hours - 1))])
        truths[f"doc{d}"] = truth
        for h in range(n_hours):
            rows.append((f"doc{d}", "web", d % 2, h,
                         [float(truth[h])] * 10))
    df = spark.createDataFrame(
        rows, "doc_id string, source string, bucket int, hour_idx int, "
              "linked_phase array<float>")
    out = invert_network(df, CFG).toPandas()
    assert len(out) == 6
    for _, r in out.iterrows():
        truth = truths[r["doc_id"]]
        ts = np.asarray(r["ts_series"], dtype=np.float64)
        assert len(ts) == len(truth)
        np.testing.assert_allclose(ts, truth - truth[0], atol=1e-4)
        assert r["inv_quality"] > 0.999


def test_quality_degrades_with_noise(spark):
    rng = np.random.default_rng(9)
    rows = []
    for d in range(4):
        # incoherent phases: network residuals large -> low quality
        for h in range(24):
            rows.append((f"noisy{d}", "web", 0, h,
                         [float(rng.uniform(-np.pi, np.pi))] * 10))
    df = spark.createDataFrame(
        rows, "doc_id string, source string, bucket int, hour_idx int, "
              "linked_phase array<float>")
    out = invert_network(df, CFG).toPandas()
    assert (out["inv_quality"] < 0.9).all()
