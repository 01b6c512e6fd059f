"""DSIR importance resampling: NumPy oracle over the black-box
feature table (model math, weights, Gumbel top-k), planted
target-lookalike semantics, and the broadcast/top-k plan pins."""

import math

import numpy as np
import pyspark.sql.functions as F

from miaplpy_spark.functions.dsir import (
    N_BUCKETS, dsir_features, dsir_importance_weights, dsir_sample_topk)
from miaplpy_spark.functions.dsir import _GUMBEL_SEED
from miaplpy_spark.functions.sampling import _MIX_MOD, _MIX_MULT

SF_DIR = "/root/testdata/sf0.001"
TARGET = "src0"


def _gumbel(doc_id: int) -> float:
    u = ((doc_id % _MIX_MOD + _GUMBEL_SEED % _MIX_MOD)
         * _MIX_MULT % _MIX_MOD) / _MIX_MOD
    u = u * (1 - 2e-9) + 1e-9
    return -math.log(-math.log(u))


def _oracle_weights(feats):
    """feats: list of (doc_id, source, bucket, c) rows."""
    ct = np.zeros(N_BUCKETS)
    cr = np.zeros(N_BUCKETS)
    for r in feats:
        (ct if r["source"] == TARGET else cr)[r["bucket"]] += r["c"]
    log_ratio = (np.log((ct + 1) / (ct.sum() + N_BUCKETS))
                 - np.log((cr + 1) / (cr.sum() + N_BUCKETS)))
    w = {}
    for r in feats:
        if r["source"] == TARGET:
            continue
        n, lw = w.get(r["doc_id"], (0, 0.0))
        w[r["doc_id"]] = (n + r["c"], lw + r["c"] * log_ratio[r["bucket"]])
    return w


def test_features_cover_every_bigram(spark):
    feats = dsir_features(spark, SF_DIR).collect()
    per_doc = {}
    for r in feats:
        assert 0 <= r["bucket"] < N_BUCKETS
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["c"]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    assert len(per_doc) == len(docs)
    for d in docs:
        n_bigrams = len(d["text"].split(" ")) - 1
        assert per_doc[d["doc_id"]] == n_bigrams, d["doc_id"]


def test_weights_match_numpy_oracle(spark):
    feats = dsir_features(spark, SF_DIR).collect()
    exp = _oracle_weights(feats)
    got = {r["doc_id"]: r for r in
           dsir_importance_weights(spark, SF_DIR, TARGET).collect()}
    assert set(got) == set(exp)
    for doc_id, (n, lw) in exp.items():
        assert got[doc_id]["n_feat"] == n
        assert abs(got[doc_id]["log_weight"] - lw) < 1e-8, doc_id
        assert got[doc_id]["source"] != TARGET


def test_topk_is_gumbel_argmax_of_weights(spark):
    k = 40
    feats = dsir_features(spark, SF_DIR).collect()
    exp = _oracle_weights(feats)
    scored = sorted(((lw + _gumbel(d), d) for d, (_, lw) in exp.items()),
                    reverse=True)
    want = {d for _, d in scored[:k]}
    got = dsir_sample_topk(spark, SF_DIR, TARGET, k).collect()
    assert len(got) == k
    assert {r["doc_id"] for r in got} == want
    for r in got:
        assert abs(r["score"] - (r["log_weight"] + _gumbel(r["doc_id"])))\
            < 1e-8


def test_planted_lookalikes_outweigh_strangers(spark, tmp_path):
    """Raw docs written in the target slice's vocabulary must carry
    higher importance weights than raw docs from a disjoint
    vocabulary, and fill the top of the selection."""
    marker = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    other = ["one", "two", "three", "four", "five", "six"]

    def doc(vocab, i, n=40):
        return " ".join(vocab[(i + j) % len(vocab)] for j in range(n))

    rows = []
    for i in range(30):                       # the trusted target slice
        rows.append((i, doc(marker, i), "en", "target"))
    for i in range(30, 60):                   # raw lookalikes
        rows.append((i, doc(marker, i), "en", "raw_a"))
    for i in range(60, 90):                   # raw strangers
        rows.append((i, doc(other, i), "en", "raw_b"))
    corpus = str(tmp_path / "c")
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
     .withColumn("n_chars", F.length("text").cast("long"))
     .write.parquet(f"{corpus}/documents.parquet"))

    w = {r["doc_id"]: r["log_weight"] for r in
         dsir_importance_weights(spark, corpus, "target").collect()}
    lookalikes = [w[d] for d in range(30, 60)]
    strangers = [w[d] for d in range(60, 90)]
    assert min(lookalikes) > max(strangers)
    picked = {r["doc_id"] for r in
              dsir_sample_topk(spark, corpus, "target", 30).collect()}
    assert picked == set(range(30, 60))


def test_plan_broadcasts_model_and_takes_ordered_topk(spark):
    plan = (dsir_sample_topk(spark, SF_DIR, TARGET, 10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    # exactly two streaming passes over the corpus (model + scoring) —
    # the round-trip through the tiny model must not add a third scan
    assert plan.count("Scan parquet") == 2, plan[:3000]
