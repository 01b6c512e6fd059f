"""Skew-salting tests (north_rule; SURVEY.md hard-part #4: validate by
partition-size histograms, not wall-clock): day-salted buckets split a
hot doc across partitions while tier results stay identical."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from miaplpy_spark.config import EngineConfig, ScaleSpec
from miaplpy_spark.datagen import generate_sequences, prepare_observations
from miaplpy_spark.operators.rollup import rollup_1d, rollup_1h

SPEC = ScaleSpec(n_docs=4, n_slots=1920, tok_lo=8, tok_hi=16,
                 tok_heavy_lo=24, tok_heavy_hi=32)  # 8 days per doc
PLAIN = EngineConfig(n_buckets=16, n_samples=8)
SALTED = EngineConfig(n_buckets=16, n_samples=8, salt_by_day=True)


def test_salting_spreads_hot_docs(spark):
    plain = generate_sequences(spark, SPEC, PLAIN)
    salted = generate_sequences(spark, SPEC, SALTED)
    nb_plain = (plain.groupBy("doc_id")
                .agg(F.count_distinct("bucket").alias("nb")).toPandas())
    nb_salt = (salted.groupBy("doc_id")
               .agg(F.count_distinct("bucket").alias("nb")).toPandas())
    assert (nb_plain["nb"] == 1).all()        # unsalted: one bucket per doc
    assert (nb_salt["nb"] >= 4).all()         # salted: spread over >=4

    # partition-size histogram: salted max bucket load must be well
    # below the unsalted hot-bucket load (4 docs into 16 buckets can
    # collide; 32 doc-days spread evenly)
    h_plain = plain.groupBy("bucket").count().toPandas()["count"]
    h_salt = salted.groupBy("bucket").count().toPandas()["count"]
    assert h_salt.max() < h_plain.max()
    # balance: salted load spread within 3x of ideal
    assert h_salt.max() <= 3 * h_salt.mean()


def test_salted_tiers_match_unsalted(spark):
    obs_p = prepare_observations(generate_sequences(spark, SPEC, PLAIN), PLAIN)
    obs_s = prepare_observations(generate_sequences(spark, SPEC, SALTED), SALTED)

    key_h = ["doc_id", "hour_idx"]
    cols_h = key_h + ["n_obs", "n_filled", "sum_tok", "min_tok", "max_tok"]
    h_p = rollup_1h(obs_p, PLAIN).select(*cols_h).toPandas() \
        .sort_values(key_h).reset_index(drop=True)
    h_s = rollup_1h(obs_s, SALTED).select(*cols_h).toPandas() \
        .sort_values(key_h).reset_index(drop=True)
    assert h_p.equals(h_s)

    key_d = ["doc_id", "day_idx"]
    cols_d = key_d + ["n_hours", "n_obs", "sum_tok"]
    d_p = rollup_1d(rollup_1h(obs_p, PLAIN), PLAIN, assume_partitioned=True) \
        .select(*cols_d).toPandas().sort_values(key_d).reset_index(drop=True)
    d_s = rollup_1d(rollup_1h(obs_s, SALTED), SALTED, assume_partitioned=True) \
        .select(*cols_d).toPandas().sort_values(key_d).reset_index(drop=True)
    assert d_p.equals(d_s)
