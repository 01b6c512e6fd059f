"""Training-shard export — the pipeline's last mile: lay packed
training sequences (``packing.pack_chunks`` output) out as N balanced
shard directories in a deterministic seeded global-shuffle order,
with a per-shard manifest a consumer can re-verify byte-for-byte.

What a trainer needs from the exporter, and how each maps to the
plan:

- **global shuffle**: every epoch wants the chunks in a fresh
  pseudo-random order. The order is a PURE FUNCTION of (chunk_id,
  seed) — a splitmix-style integer mix, the same convention as
  ``sampling.sample_unit`` — so a re-export reproduces the identical
  shard layout with zero coordination, and changing ``seed`` is an
  epoch reshuffle. No ``rand()``: nondeterministic expressions make
  retried tasks write different rows, which silently corrupts a
  partial re-run at scale.
- **balanced shards**: shard = mix mod n_shards. The mix whitens
  sequential chunk_ids, so shard sizes concentrate tightly around
  rows/n_shards (pinned by test) — no long-tail shard that straggles
  the whole first training step.
- **one shuffle total**: assignment and order key are narrow
  projections; the only exchange is the ``repartition(n_shards,
  shard)`` that physically groups each shard, and
  ``sortWithinPartitions`` rides the same exchange (in-shuffle sort,
  no second exchange). The manifest aggregation reuses the written
  files, not a second corpus pass over the source.
- **verifiable manifest**: per shard, row count, token total, and an
  order-complete content checksum — XOR of xxhash64(ord, chunk_id,
  tokens). XOR is commutative, but ``ord`` IS the position key (the
  within-shard sort key), so the checksum still commits to the full
  (position, content) assignment while aggregating map-side with no
  sort. ``verify_shards`` recomputes it from the written files and
  also re-checks the physical row order inside every shard file.

At 10^12 chunks: n_shards scales with the consumer (thousands), the
export is one shuffle of the token payload, the manifest is n_shards
rows, and verification is an embarrassingly parallel scan of the
shard tree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .sampling import mix_mod_salted

SHARD_SEED = 17


def _mix(id_col: str, seed: int) -> F.Column:
    """Deterministic whitener: ((chunk_id + seed) * 2654435761)
    mod 2^20 — pure overflow-free int64 arithmetic, reproducible by
    any engine. Both operands are reduced mod 2^20 BEFORE the
    addition (sampling.mix_mod_salted), so not even the + can
    ANSI-overflow — the claim 'safe at any id magnitude' now holds
    literally (ADVICE r05: the old form added chunk_id + seed first,
    which overflows for chunk_id > 2^63-1-seed); congruence mod 2^20
    makes the result identical wherever the old form was defined.
    Collisions are fine: every ordering use tiebreaks on chunk_id."""
    return mix_mod_salted(F.col(id_col), seed)


def shard_assign(chunks: DataFrame, id_col: str = "chunk_id",
                 n_shards: int = 16, seed: int = SHARD_SEED) -> DataFrame:
    """Append (shard, ord): shard = whitened id mod n_shards, ord =
    the whitened id itself (the within-shard shuffle order; ties break
    on chunk_id). Narrow projection — no shuffle."""
    m = _mix(id_col, seed)
    return (chunks.withColumn("ord", m)
            .withColumn("shard", F.pmod(F.col("ord"), F.lit(n_shards))))


def _shard_checksums(assigned: DataFrame) -> DataFrame:
    return (assigned.groupBy("shard")
            .agg(F.count("*").cast("long").alias("rows"),
                 F.sum("n_tok").cast("long").alias("n_tokens"),
                 F.expr("bit_xor(xxhash64(ord, chunk_id, tokens))")
                  .alias("checksum"))
            .orderBy("shard"))


def export_training_shards(spark: SparkSession, chunks: DataFrame,
                           out_dir: str, n_shards: int = 16,
                           seed: int = SHARD_SEED) -> DataFrame:
    """Write ``chunks`` (chunk_id, n_tok, tokens) as
    ``out_dir/chunks/shard=*/`` parquet in deterministic shuffled
    order plus ``out_dir/manifest`` (shard, rows, n_tokens, checksum,
    plus the (n_shards, seed) parameters on every row). Returns the
    manifest read back from disk.

    The manifest is computed FROM THE WRITTEN FILES, so it certifies
    what landed on disk, not what the plan intended — a failed task
    retry or a concurrent writer cannot produce a manifest that
    matches broken data."""
    assigned = shard_assign(chunks.select("chunk_id", "n_tok", "tokens"),
                            n_shards=n_shards, seed=seed)
    (assigned.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "ord", "chunk_id")
     .write.mode("overwrite").partitionBy("shard")
     .parquet(f"{out_dir}/chunks"))
    written = spark.read.parquet(f"{out_dir}/chunks")
    manifest = (_shard_checksums(written)
                .withColumn("n_shards", F.lit(n_shards).cast("int"))
                .withColumn("seed", F.lit(int(seed)).cast("long")))
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/manifest")
    return spark.read.parquet(f"{out_dir}/manifest")


def verify_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Re-derive every manifest entry from the shard tree and diff.
    Returns one row per shard: (shard, ok, rows_match, tokens_match,
    checksum_match, order_ok) — ``ok`` iff all four hold; shards in
    only one of {manifest, tree} come back with ok=false. ``order_ok``
    re-checks the PHYSICAL row order of each shard file against the
    (ord, chunk_id) sort the exporter promises (monotone within every
    file), which the XOR checksum alone cannot see."""
    man = spark.read.parquet(f"{out_dir}/manifest")
    written = spark.read.parquet(f"{out_dir}/chunks")
    got = _shard_checksums(written)
    # physical order check: row_number in file-arrival order per shard
    # must sort identically to (ord, chunk_id)
    from pyspark.sql import Window

    arrival = Window.partitionBy("shard").orderBy(
        F.monotonically_increasing_id())
    keyed = Window.partitionBy("shard").orderBy("ord", "chunk_id")
    order_ok = (written
                .withColumn("pos", F.row_number().over(arrival))
                .withColumn("want", F.row_number().over(keyed))
                .groupBy("shard")
                .agg((F.sum(F.when(F.col("pos") != F.col("want"), 1)
                            .otherwise(0)) == 0).alias("order_ok")))
    g = got.alias("g")
    m = man.alias("m")
    out = (m.join(g, "shard", "full_outer")
           .join(order_ok, "shard", "left")
           .select(
               "shard",
               (F.col("m.rows") == F.col("g.rows")).alias("rows_match"),
               (F.col("m.n_tokens") == F.col("g.n_tokens"))
               .alias("tokens_match"),
               (F.col("m.checksum") == F.col("g.checksum"))
               .alias("checksum_match"),
               F.coalesce("order_ok", F.lit(False)).alias("order_ok")))
    return out.select(
        "shard",
        (F.coalesce("rows_match", F.lit(False))
         & F.coalesce("tokens_match", F.lit(False))
         & F.coalesce("checksum_match", F.lit(False))
         & F.col("order_ok")).alias("ok"),
        "rows_match", "tokens_match", "checksum_match", "order_ok")
