"""Epoch-aware last mile, end to end: mixture sampling with
multi-epoch upsampling -> one row per epoch copy -> fixed-length
chunk packing -> shard export with a verifying manifest. Pins that
the composition conserves tokens exactly (every copy contributes its
full token array once) and that the shard tree round-trips its own
manifest."""

import pyspark.sql.functions as F

from miaplpy_spark.functions.packing import pack_chunks
from miaplpy_spark.functions.sampling import expand_copies, mixture_sample
from miaplpy_spark.functions.shards import (export_training_shards,
                                            verify_shards)

SF_DIR = "/root/testdata/sf0.001"
SEQ_LEN = 128
N_BUCKETS = 16


def _token_arrays(spark):
    """Deterministic int tokens from the documents text: one token per
    whitespace word (so array size == the sampler's n_tokens)."""
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id",
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.pmod(F.hash(w), F.lit(50_000))
                        .cast("int")).alias("tokens")))


def test_epoch_pipeline_conserves_tokens_and_verifies(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    # budget == the whole corpus, weight 4:1 on two of ten equal-sized
    # sources: both targets exceed their supply, so both upsample
    sampled = mixture_sample(spark, SF_DIR, {"src0": 4.0, "src1": 1.0},
                             int(total), upsample=True)
    rows = sampled.collect()
    assert max(r["n_copies"] for r in rows) > 1, "fixture must upsample"
    expected_tokens = sum(r["n_copies"] * r["n_tokens"] for r in rows)

    copies = expand_copies(sampled)
    max_epochs = copies.agg(F.max("copy_idx")).collect()[0][0] + 1
    # distinct ids per epoch copy (the expand_copies docstring recipe)
    corpus = (copies.join(_token_arrays(spark), "doc_id")
              .select((F.col("doc_id") * max_epochs + F.col("copy_idx"))
                      .alias("doc_id"), "tokens"))
    chunks = pack_chunks(corpus, SEQ_LEN, N_BUCKETS)
    got = chunks.agg(F.sum("n_tok").cast("long").alias("t"),
                     F.count("*").alias("n")).collect()[0]
    assert got["t"] == expected_tokens
    assert got["n"] == -(-expected_tokens // SEQ_LEN)

    out = str(tmp_path / "shards")
    man = export_training_shards(spark, chunks, out, n_shards=4)
    assert man.agg(F.sum("n_tokens")).collect()[0][0] == expected_tokens
    checks = verify_shards(spark, out).collect()
    assert len(checks) == 4 and all(r["ok"] for r in checks), checks
