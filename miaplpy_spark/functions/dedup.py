"""Near-duplicate detection operators: MinHash+LSH and SimHash.

All JVM-side (hash functions + explodes + groupBy) — no Python UDFs,
so these plans scale to the full corpus: the only shuffles are the
per-doc signature aggregations and the band-bucket self-join, and the
band join only ever materializes docs that share a bucket.

At 100 TB: `minhash_lsh_pairs` is the scale path for what
`text.shingle_jaccard_pairs` computes exactly — bands bound the
candidate set, the exact Jaccard verify runs only on candidates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .text import shingles

MERSENNE = (1 << 61) - 1


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def minhash_signatures(df: DataFrame, n_perm: int = 32, k: int = 3) -> DataFrame:
    """(doc_id, sig array<long>[n_perm]): minimum of a keyed hash per
    permutation over the doc's shingle set."""
    sh = shingles(df, k)
    perms = sh.select(
        "doc_id", "sh",
        F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("perm"))
    mins = (perms
            .select("doc_id", "perm",
                    F.pmod(F.xxhash64("sh", "perm"), F.lit(MERSENNE)).alias("h"))
            .groupBy("doc_id", "perm").agg(F.min("h").alias("mh")))
    return (mins.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("perm", "mh"))).alias("s"))
            .select("doc_id",
                    F.transform("s", lambda x: x["mh"]).alias("sig")))


def minhash_lsh_pairs(spark, sf_dir, n_perm: int = 32, bands: int = 8,
                      k: int = 3, verify_threshold: float = 0.35) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    bands x rows_per_band = n_perm; docs agreeing on ALL rows of any
    band become candidates; candidates are verified against the true
    shingle Jaccard (estimated here from the full signature, which is
    itself an unbiased estimator of Jaccard)."""
    d = _docs(spark, sf_dir)
    sig = minhash_signatures(d, n_perm, k)
    rows_per_band = n_perm // bands
    banded = sig.select(
        "doc_id", "sig",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"))
    banded = banded.select(
        "doc_id", "sig", "band",
        F.xxhash64(F.col("band"),
                   F.slice("sig", F.col("band") * rows_per_band + 1,
                           rows_per_band).cast("string")).alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"),
                    F.col("a.sig").alias("sig1"),
                    F.col("b.sig").alias("sig2"))
            .distinct())
    est = cand.select(
        "doc1", "doc2",
        (F.size(F.filter(F.zip_with("sig1", "sig2", lambda x, y: x == y),
                         lambda v: v)) / F.lit(n_perm)).alias("est_jaccard"))
    return est.where(F.col("est_jaccard") >= verify_threshold)


def simhash(df: DataFrame, nbits: int = 64) -> DataFrame:
    """64-bit SimHash per doc from word hashes: per bit, sign of the
    ±1 vote sum over words; all columnar (explode words x bits)."""
    words = df.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    hashed = words.select("doc_id", F.xxhash64("w").alias("h"))
    bits = hashed.select(
        "doc_id", "h",
        F.explode(F.sequence(F.lit(0), F.lit(nbits - 1))).alias("b"))
    votes = bits.select(
        "doc_id", "b",
        # SQL shiftright accepts a column bit count; the Python wrapper
        # only takes a literal
        (F.expr("shiftright(h, cast(b as int)) & 1") * 2 - 1).alias("v"))
    per_bit = votes.groupBy("doc_id", "b").agg(F.sum("v").alias("s"))
    # shiftleft needs a literal bit count; pow(2, b) is exact for b<53
    # and bit 63 is split out to avoid long overflow
    pow2 = F.when(F.col("b") < 63,
                  F.pow(F.lit(2.0), F.col("b")).cast("long")) \
            .otherwise(F.lit(-(2**63)))
    return (per_bit.groupBy("doc_id")
            .agg(F.sum(F.when(F.col("s") > 0, pow2)
                       .otherwise(F.lit(0).cast("long"))).alias("simhash")))


def simhash_near_pairs(spark, sf_dir, max_hamming: int = 12) -> DataFrame:
    """SimHash near-dup pairs by Hamming distance, blocked on the top
    16 bits (the standard rotate-and-block trick collapsed to one
    block at sandbox scale; at 100 TB use 4 rotations x 16-bit
    blocks)."""
    d = _docs(spark, sf_dir)
    s = simhash(d).withColumn(
        "blk", F.shiftrightunsigned("simhash", 48))
    a, b = s.alias("a"), s.alias("b")
    return (a.join(b, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"),
                    F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
                    .alias("hamming"))
            .where(F.col("hamming") <= max_hamming))
