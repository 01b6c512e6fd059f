"""End-to-end corpus curation: the composition a pretraining data
pipeline actually runs over the `documents` table, stitched from the
individually driver-certified operators — quality scoring (q19),
exact dedup (q21), MinHash-LSH near-dup pairs (q26) collapsed by
connected components, and token accounting (q18) — into one
DataFrame graph with a per-doc keep/drop decision and the REASON.

Plan shape at 100 TB: every stage is one of the already-audited
plans (one exchange each, no Python in the hot path except the
bounded component loop over the pair graph, which is orders of
magnitude smaller than the corpus); the final assembly is left joins
of doc-keyed side outputs back onto the doc spine — each side is a
per-doc aggregate (same cardinality). The assembly joins shuffle on
``doc_key = xxhash64(doc_id)`` (plus ``doc_key2`` under
``EngineConfig.wide_doc_key`` — the engine's collision doctrine,
operators/rollup.py:23-29) rather than the variable-length doc_id
string: fixed 8/16-byte shuffle keys through three doc-cardinality
exchanges, the same reason the tier kernels are string-free. Reasons
are evaluated in priority order so a doc dropped for multiple causes
reports the most fundamental one."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..config import DOC_KEY2_SALT, EngineConfig
from .dedup import dedup_keep_list, minhash_lsh_pairs
from .text import _docs, exact_fingerprint, word_gate_stats


def _key_cols(cfg: EngineConfig) -> list[str]:
    return ["doc_key"] + (["doc_key2"]
                          if getattr(cfg, "wide_doc_key", False) else [])


def _with_keys(df: DataFrame, cfg: EngineConfig,
               id_col: str = "doc_id") -> DataFrame:
    """Attach the hashed join key(s) and DROP the string id — side
    outputs join back onto the spine by key alone, so doc_id never
    rides through the assembly shuffles."""
    out = df.withColumn("doc_key", F.xxhash64(id_col))
    if getattr(cfg, "wide_doc_key", False):
        out = out.withColumn(
            "doc_key2", F.xxhash64(F.lit(DOC_KEY2_SALT), F.col(id_col)))
    return out.drop(id_col)


def exact_dup_losers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs whose full-text md5 matches an earlier (smaller doc_id)
    doc — the exact-dedup drop set: deterministic keep-first-by-id,
    one groupBy on the fingerprint."""
    d = _docs(spark, sf_dir)
    fp = d.select("doc_id", exact_fingerprint().alias("fp"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    return (fp.join(keep, "fp")
            .where(F.col("doc_id") != F.col("keeper"))
            .select("doc_id", F.col("keeper").alias("dup_of")))


def curate_corpus(spark: SparkSession, sf_dir: str,
                  min_words: int = 5, max_stopword_ratio: float = 0.9,
                  min_ttr: float = 0.2,
                  near_dup_threshold: float = 0.35,
                  max_dup_word_frac: float = 0.7,
                  max_top_word_frac: float = 0.2,
                  max_top_ngram_frac: float = 0.2,
                  cfg: EngineConfig = EngineConfig()) -> DataFrame:
    """Per-document curation decision (doc_id, lang, n_words, keep,
    reason). Reasons, in priority order:

      exact_dup   byte-identical (lowercased) text, non-canonical copy
      near_dup    MinHash-LSH component member that is not the
                  component's canonical (minimum-id) doc
      too_short   fewer than ``min_words`` whitespace tokens
      repetitive  Gopher-style within-doc repetition (Rae et al. 2021
                  table A1): duplicate-word fraction, top-word
                  fraction, or top-2-gram fraction above threshold —
                  boilerplate, templated spam, generation loops
      low_quality stopword ratio or type/token ratio outside bounds
      kept        survives everything

    Exact dedup outranks near-dup (a byte copy is also a near-dup;
    report the stronger finding); both outrank the quality gates so
    dedup statistics stay comparable across quality-threshold sweeps.
    Repetition sits between too_short and low_quality: a degenerate
    looping doc is a stronger (more specific) drop signal than a
    merely skewed stopword/TTR profile, and Gopher applies its
    repetition filters before the heuristic quality rules.

    The near-dup leg uses the SPINE-TOTAL keep list
    (dedup_keep_list(doc_spine=...)): every doc gets exactly one
    labeled row (singletons keep=true), so the assembly is a plain
    per-doc column rather than a loser-set semi-join."""
    # the spine KEEPS doc_id (the output needs it); the key columns
    # ride alongside and are what the assembly joins shuffle on
    spine = _docs(spark, sf_dir).select("doc_id", "lang")
    spine = spine.withColumn("doc_key", F.xxhash64("doc_id"))
    if getattr(cfg, "wide_doc_key", False):
        spine = spine.withColumn(
            "doc_key2", F.xxhash64(F.lit(DOC_KEY2_SALT), F.col("doc_id")))
    keys = _key_cols(cfg)

    # one fused leg for BOTH the quality scalars and the repetition
    # signals: at 100 TB separate text_quality/repetition_signals legs
    # would scan + explode the text column twice; word_gate_stats
    # derives both gate families from one (doc, word) aggregation and
    # is bit-identical to the standalone certified operators
    gates = _with_keys(word_gate_stats(spark, sf_dir), cfg)
    exact = _with_keys(
        exact_dup_losers(spark, sf_dir)
        .withColumn("is_exact", F.lit(True))
        .select("doc_id", "is_exact"), cfg)
    pairs = minhash_lsh_pairs(spark, sf_dir,
                              verify_threshold=near_dup_threshold)
    near = _with_keys(
        dedup_keep_list(pairs,
                        doc_spine=_docs(spark, sf_dir).select("doc_id"),
                        # auto: curation runs over arbitrary corpora,
                        # where near-dup chain diameter is unbounded —
                        # driver union-find below the edge threshold
                        # (the verified pair graph is orders smaller
                        # than the corpus), star rounds (O(log n) at
                        # any diameter) above it; min-label's 25-sweep
                        # bound blows up on the sf0.1 graph's chains
                        algorithm="auto")
        .select("doc_id", F.col("keep").alias("near_keep")), cfg)

    out = (spine
           .join(gates, keys, "left")
           .join(exact, keys, "left")
           .join(near, keys, "left"))
    reason = (
        F.when(F.col("is_exact"), F.lit("exact_dup"))
         .when(~F.col("near_keep"), F.lit("near_dup"))
         .when(F.coalesce("n_words", F.lit(0)) < min_words,
               F.lit("too_short"))
         .when((F.col("dup_word_frac") > max_dup_word_frac)
               | (F.col("top_word_frac") > max_top_word_frac)
               | (F.col("top_ngram_frac") > max_top_ngram_frac),
               F.lit("repetitive"))
         .when((F.col("stopword_ratio") > max_stopword_ratio)
               | (F.col("ttr") < min_ttr), F.lit("low_quality"))
         .otherwise(F.lit("kept")))
    return out.select(
        "doc_id", "lang",
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        reason.alias("reason"),
        (reason == "kept").alias("keep"))
