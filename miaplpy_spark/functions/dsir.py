"""DSIR-style data selection (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): score every raw document
by how much more likely its hashed-n-gram features are under a TARGET
distribution (a trusted high-quality slice) than under the raw-corpus
distribution, then draw the training subset by Gumbel top-k over the
log-weights — which is exactly sampling-without-replacement
proportional to the importance weights.

The whole pipeline is importance math over a BUCKETED feature space,
so the model is tiny by construction (``n_buckets`` rows, default
8192) no matter how large the corpus is:

100 TB shape: exactly TWO streaming passes over the corpus and ONE
corpus-scale shuffle. Pass 1 builds the model straight from the
exploded bigrams — one aggregate keyed on the 8192 bucket ids
(map-side partials collapse almost everything), with the smoothing
totals taken by a window over the 8192-row aggregate rather than a
third scan. Pass 2 scores: the bucketed grams broadcast-join the
model and fall into ONE doc-keyed aggregate (sum of log-ratios with
map-side partials). Selection is Gumbel TOP-K
(TakeOrderedAndProject), not a global sort. The Gumbel noise is
derived from the deterministic ``sample_unit`` doc hash, so the
selected subset is reproducible across runs, engines, and cluster
sizes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .sampling import sample_unit

# own decision salt: the Gumbel noise must be independent of the
# split assignment (unsalted stream) and the epoch-copy coin
# (ADVICE r05)
_GUMBEL_SEED = 0x6B311
from .text import _docs

N_BUCKETS = 8192


def _bucketed_grams(spark: SparkSession, sf_dir: str,
                    n_buckets: int = N_BUCKETS) -> DataFrame:
    """One row per word-bigram occurrence: (doc_id, source, bucket).
    Bigrams (not unigrams) so the features carry local word order —
    the DSIR paper's choice — hashed into ``n_buckets`` buckets."""
    d = _docs(spark, sf_dir)
    ws = d.select("doc_id", "source", F.split("text", " ").alias("ws"))
    grams = ws.select(
        "doc_id", "source",
        F.explode(F.expr(
            "transform(sequence(0, size(ws) - 2),"
            " i -> concat(ws[i], ' ', ws[i + 1]))")).alias("g"))
    return grams.select(
        "doc_id", "source",
        F.pmod(F.xxhash64("g"), F.lit(n_buckets)).alias("bucket"))


def dsir_features(spark: SparkSession, sf_dir: str,
                  n_buckets: int = N_BUCKETS) -> DataFrame:
    """Hashed word-bigram bag per document: (doc_id, source, bucket,
    c). The per-doc view of the feature space — the weights path
    below does NOT route through this (it aggregates per-gram rows
    directly so the bucket counts never need a doc-keyed pre-shuffle),
    but it is the table an external auditor or the test oracle reads."""
    return (_bucketed_grams(spark, sf_dir, n_buckets)
            .groupBy("doc_id", "source", "bucket")
            .agg(F.count("*").alias("c")))


def dsir_bucket_model(grams: DataFrame, target_source: str,
                      n_buckets: int = N_BUCKETS) -> DataFrame:
    """Per-bucket log probability ratio log p_target(b) - log p_raw(b)
    with add-1 smoothing, from ONE aggregate over the per-occurrence
    gram table (conditional counts split target vs raw; the smoothing
    totals ride a window over the aggregate's own ≤``n_buckets`` rows,
    so no second pass). 'Raw' is every non-target source — the pool
    selection draws from. Returns (bucket, log_ratio); always
    broadcastable."""
    tgt = F.col("source") == target_source
    per_bucket = grams.groupBy("bucket").agg(
        F.count(F.when(tgt, True)).alias("ct"),
        F.count(F.when(~tgt, True)).alias("cr"))
    w = Window.partitionBy(F.lit(0))
    return per_bucket.select(
        "bucket",
        (F.log((F.col("ct") + 1) / (F.sum("ct").over(w) + n_buckets))
         - F.log((F.col("cr") + 1) / (F.sum("cr").over(w) + n_buckets))
         ).alias("log_ratio"))


def dsir_importance_weights(spark: SparkSession, sf_dir: str,
                            target_source: str,
                            n_buckets: int = N_BUCKETS) -> DataFrame:
    """Per-RAW-document importance log-weight: sum over the doc's
    bigram occurrences of the bucket's log_ratio. Target-source docs
    are the model, not candidates, so they are excluded. The gram →
    model join is broadcast and feeds straight into the single
    doc-keyed aggregate. Returns (doc_id, source, n_feat,
    log_weight)."""
    grams = _bucketed_grams(spark, sf_dir, n_buckets)
    model = dsir_bucket_model(grams, target_source, n_buckets)
    return (grams.filter(F.col("source") != target_source)
            .join(F.broadcast(model), "bucket")
            .groupBy("doc_id", "source")
            .agg(F.count("*").cast("long").alias("n_feat"),
                 F.sum("log_ratio").alias("log_weight")))


def gumbel_col(id_col: str = "doc_id") -> F.Column:
    """Deterministic standard-Gumbel noise: -log(-log(u)) with u the
    splitmix unit hash of the doc id, nudged off 0 so the outer log is
    finite."""
    u = sample_unit(id_col, seed=_GUMBEL_SEED) * (1 - 2e-9) + 1e-9
    return -F.log(-F.log(u))


def dsir_sample_topk(spark: SparkSession, sf_dir: str,
                     target_source: str, k: int,
                     n_buckets: int = N_BUCKETS) -> DataFrame:
    """Gumbel top-k selection: score = log_weight + Gumbel(doc_id),
    take the k highest — equivalent to drawing k docs WITHOUT
    replacement with probability proportional to exp(log_weight)
    (Vieira 2014). Deterministic end to end. Returns (doc_id, source,
    log_weight, score), the selected subset."""
    w = dsir_importance_weights(spark, sf_dir, target_source, n_buckets)
    return (w.select("doc_id", "source", "log_weight",
                     (F.col("log_weight") + gumbel_col()).alias("score"))
            .orderBy(F.desc("score")).limit(k))
