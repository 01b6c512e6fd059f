"""Training-shard export: content totality (the shard tree IS the
chunk set, token arrays bit-equal), deterministic re-export, epoch
reshuffle under a new seed, shard balance, and the verifier catching
a corrupted shard."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from miaplpy_spark.functions.packing import pack_chunks
from miaplpy_spark.functions.shards import (export_training_shards,
                                            shard_assign, verify_shards)

SEQ_LEN = 64
N_SHARDS = 8


@pytest.fixture(scope="module")
def chunks(spark):
    """~1000 packed 64-token chunks from a fixed-seed corpus."""
    rng = np.random.RandomState(3)
    rows = [(i, rng.randint(0, 50_000, size=int(rng.randint(1, 200)))
             .astype(np.int32).tolist()) for i in range(350)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    return pack_chunks(df, SEQ_LEN).localCheckpoint(eager=True)


def _manifest_rows(df):
    return sorted([(r.shard, r.rows, r.n_tokens, r.checksum)
                   for r in df.collect()])


def test_export_is_total_and_bit_equal(spark, chunks, tmp_path):
    out = str(tmp_path / "shards")
    man = export_training_shards(spark, chunks, out, n_shards=N_SHARDS)
    assert man.count() == N_SHARDS
    written = spark.read.parquet(f"{out}/chunks")
    src = {r.chunk_id: r.tokens for r in chunks.collect()}
    got = {r.chunk_id: r.tokens for r in written.collect()}
    assert got == src, "shard tree must hold exactly the input chunks"
    assert man.agg(F.sum("rows")).collect()[0][0] == len(src)
    ok = verify_shards(spark, out)
    assert ok.where(~F.col("ok")).count() == 0


def test_reexport_is_identical(spark, chunks, tmp_path):
    m1 = export_training_shards(spark, chunks, str(tmp_path / "a"),
                                n_shards=N_SHARDS)
    m2 = export_training_shards(spark, chunks, str(tmp_path / "b"),
                                n_shards=N_SHARDS)
    assert _manifest_rows(m1) == _manifest_rows(m2)


def test_epoch_reshuffle_changes_layout_not_content(spark, chunks,
                                                    tmp_path):
    m1 = export_training_shards(spark, chunks, str(tmp_path / "e1"),
                                n_shards=N_SHARDS, seed=17)
    m2 = export_training_shards(spark, chunks, str(tmp_path / "e2"),
                                n_shards=N_SHARDS, seed=18)
    assert _manifest_rows(m1) != _manifest_rows(m2), \
        "a new seed must reshuffle the layout"
    tot = lambda m: (m.agg(F.sum("rows"), F.sum("n_tokens"))
                     .collect()[0][:])
    assert tot(m1) == tot(m2), "content totals must survive reshuffle"
    w2 = spark.read.parquet(str(tmp_path / "e2") + "/chunks")
    src = {r.chunk_id: r.tokens for r in chunks.collect()}
    assert {r.chunk_id: r.tokens for r in w2.collect()} == src


def test_shards_are_balanced(spark, chunks):
    sizes = [r.n for r in
             shard_assign(chunks, n_shards=N_SHARDS)
             .groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == N_SHARDS
    assert max(sizes) <= 2 * min(sizes), sizes


def test_assignment_is_shuffle_free(spark, chunks):
    from miaplpy_spark.plans.explain import count_exchanges

    base = count_exchanges(chunks)
    assert count_exchanges(shard_assign(chunks)) == base


def test_verifier_catches_corruption(spark, chunks, tmp_path):
    out = str(tmp_path / "shards")
    export_training_shards(spark, chunks, out, n_shards=N_SHARDS)
    # flip one token in one row of shard 0 and rewrite that partition
    part = spark.read.parquet(f"{out}/chunks").where("shard = 0")
    bad = part.withColumn(
        "tokens",
        F.when(F.col("chunk_id") == part.agg(F.min("chunk_id"))
               .collect()[0][0],
               F.concat(F.array(F.lit(999999)),
                        F.slice("tokens", 2, SEQ_LEN)))
        .otherwise(F.col("tokens"))).localCheckpoint(eager=True)
    bad.write.mode("overwrite").parquet(f"{out}/chunks/shard=0")
    rep = {r.shard: r for r in verify_shards(spark, out).collect()}
    assert not rep[0].ok and not rep[0].checksum_match
    assert all(rep[s].ok for s in rep if s != 0)


def test_shard_assign_safe_at_design_scale_ids(spark):
    """chunk ids beyond ~3.5e9 overflowed the naive whitener multiply
    under ANSI mode; the reduce-before-multiply form must match the
    documented ((id + seed) * MULT) mod 2^20 formula (Python big-int
    oracle) for huge ids."""
    from miaplpy_spark.functions.sampling import _MIX_MOD, _MIX_MULT
    from miaplpy_spark.functions.shards import SHARD_SEED, shard_assign

    ids = [0, 7, 10 ** 12 + 3, 2 ** 45, 2 ** 62]
    df = spark.createDataFrame(
        [(i, 4, [1, 2, 3, 4]) for i in ids],
        "chunk_id long, n_tok int, tokens array<int>")
    rows = shard_assign(df, n_shards=16).collect()
    for r in rows:
        want = (r["chunk_id"] + SHARD_SEED) * _MIX_MULT % _MIX_MOD
        assert r["ord"] == want, r
        assert r["shard"] == want % 16, r
