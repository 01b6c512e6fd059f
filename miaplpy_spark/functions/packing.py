"""Sequence packing: lay the curated corpus out as fixed-length
training sequences (the GPT-style concat-then-split packer — docs are
concatenated in a deterministic shuffled order and cut every
``seq_len`` tokens), assigning every document its global token span
and the training chunks it lands in.

The core is a GLOBAL cumulative sum over ~10^12 documents — the
textbook thing a single window over an unpartitioned ORDER BY cannot
do at scale (one executor would sort everything). It is decomposed
into the classic two-phase scan:

  phase 1  per-bucket cumsum: window partitioned by a deterministic
           hash bucket of doc_id, ordered by doc_id — shuffles the
           corpus ONCE on the bucket key, each bucket sorts locally;
  phase 2  bucket base offsets: per-bucket totals (tiny: n_buckets
           rows, aggregated map-side on the same key) get their own
           cumsum and broadcast back; global offset = bucket base +
           within-bucket offset.

The result is bit-identical to the single-window form (the DuckDB
oracle in tests/test_packing.py runs exactly that), but every stage
is parallel. ``n_buckets`` should scale with the cluster (one to a
few buckets per executor core).

The bucket totals leg is a second streaming scan (its shuffle is
n_buckets partial rows — nothing). Over this repo's documents table
that scan re-tokenizes text; over the engine's real sequences table
(doc_id, tokens, n_tok, source) it reads only the stored (doc_id,
n_tok) columns, so the second pass touches a few bytes per row.

The bucket-then-doc_id order is a feature, not an artifact: a
pretraining run wants documents shuffled, and the multiplicative-hash
bucket order IS a deterministic global shuffle — stable across runs,
engines, and cluster sizes, like everything keyed on
``sample_unit``'s mix.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .sampling import mix_mod
from .text import _docs

N_BUCKETS = 64


def pack_bucket(id_col: str = "doc_id",
                n_buckets: int = N_BUCKETS) -> F.Column:
    """Deterministic shuffle bucket: the splitmix-style integer mix of
    doc_id reduced mod n_buckets. Pure overflow-free int64 arithmetic
    (sampling.mix_mod) so any engine reproduces the packing order from
    doc_id alone at any id magnitude."""
    return F.pmod(mix_mod(F.col(id_col)), F.lit(n_buckets))


def pack_spans(d: DataFrame, seq_len: int = 2048,
               n_buckets: int = N_BUCKETS) -> DataFrame:
    """Two-phase span assignment over any (doc_id, n_tok [, extra
    cols]) DataFrame: adds (bucket, tok_start, tok_end, chunk_first,
    chunk_last, n_chunks); extra columns ride through untouched."""
    d = d.withColumn("bucket", pack_bucket("doc_id", n_buckets))
    within = Window.partitionBy("bucket").orderBy("doc_id")
    ends = d.withColumn("within_end", F.sum("n_tok").over(within))
    totals = d.groupBy("bucket").agg(F.sum("n_tok").alias("btot"))
    over_buckets = Window.orderBy("bucket")      # n_buckets rows only
    bases = totals.select(
        "bucket",
        (F.sum("btot").over(over_buckets) - F.col("btot")).alias("base"))
    packed = (ends.join(F.broadcast(bases), "bucket")
              .withColumn("tok_end", F.col("base") + F.col("within_end"))
              .withColumn("tok_start", F.col("tok_end") - F.col("n_tok"))
              .drop("within_end", "base"))
    return (packed
            .withColumn("chunk_first",
                        F.floor(F.col("tok_start") / seq_len))
            .withColumn("chunk_last",
                        F.floor((F.col("tok_end") - 1) / seq_len))
            .withColumn("n_chunks",
                        F.col("chunk_last") - F.col("chunk_first") + 1))


def pack_sequences(spark: SparkSession, sf_dir: str,
                   seq_len: int = 2048,
                   n_buckets: int = N_BUCKETS) -> DataFrame:
    """Per-document packing assignment over the documents table:
    (doc_id, bucket, n_tok, tok_start, tok_end, chunk_first,
    chunk_last, n_chunks) where [tok_start, tok_end) is the doc's
    span in the global concatenated token stream and chunk_* are the
    ``seq_len``-sized training sequences it occupies (a doc crossing
    a cut boundary spans >1)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    return pack_spans(d, seq_len, n_buckets).select(
        "doc_id", "bucket", "n_tok", "tok_start", "tok_end",
        "chunk_first", "chunk_last", "n_chunks")


def pack_chunks(seqs: DataFrame, seq_len: int = 2048,
                n_buckets: int = N_BUCKETS) -> DataFrame:
    """Materialize the actual training sequences from a (doc_id,
    tokens array<int> [, ...]) DataFrame — the engine's sequences
    table shape: (chunk_id, n_tok, tokens) where every chunk except
    the last has exactly ``seq_len`` tokens and concatenating chunks
    in chunk_id order reproduces the packed token stream exactly
    (per-row token-array equality against the input is what the tests
    pin).

    Plan: span math as above (one corpus shuffle), then each doc emits
    one SLICE of its token array per chunk it spans (explode over the
    chunk range — almost always 1-2 rows per doc) and the slices
    reassemble with ONE further shuffle keyed on chunk_id
    (sort_array(collect_list(struct(tok_start, slice))) + flatten, so
    the within-chunk order never depends on task arrival). Docs with
    empty token arrays are dropped (they occupy no span)."""
    d = (seqs.select("doc_id", "tokens")
         .withColumn("n_tok", F.size("tokens").cast("long"))
         .filter(F.col("n_tok") > 0))
    spans = pack_spans(d, seq_len, n_buckets)
    piece = spans.select(
        "tokens", "tok_start", "tok_end",
        F.explode(F.sequence("chunk_first", "chunk_last"))
         .alias("chunk_id"))
    lo = F.greatest(F.col("chunk_id") * seq_len, F.col("tok_start"))
    hi = F.least((F.col("chunk_id") + 1) * seq_len, F.col("tok_end"))
    sliced = piece.select(
        "chunk_id",
        F.struct(
            lo.alias("at"),
            F.slice("tokens", (lo - F.col("tok_start") + 1).cast("int"),
                    (hi - lo).cast("int")).alias("seg")).alias("p"))
    return (sliced.groupBy("chunk_id")
            .agg(F.flatten(F.sort_array(F.collect_list("p")).getField("seg"))
                 .alias("tokens"))
            .select("chunk_id", F.size("tokens").alias("n_tok"), "tokens"))


def packing_summary(spark: SparkSession, sf_dir: str,
                    seq_len: int = 2048,
                    n_buckets: int = N_BUCKETS) -> DataFrame:
    """One-row packing report: total docs/tokens, number of training
    sequences, docs cut by a chunk boundary, and the padding the tail
    sequence wastes — the numbers a data engineer checks before a
    run."""
    p = pack_sequences(spark, sf_dir, seq_len, n_buckets)
    return p.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.ceil(F.max("tok_end") / seq_len).cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("n_chunks") > 1, 1).otherwise(0))
         .cast("long").alias("n_boundary_docs"),
        (F.ceil(F.max("tok_end") / seq_len) * seq_len
         - F.max("tok_end")).cast("long").alias("tail_pad_tokens"))
