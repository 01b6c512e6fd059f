"""TierStore metadata must be filesystem-agnostic (round-4 VERDICT
item 2): a URI warehouse (file:, hdfs://, s3a://) routes exists /
content_token through the Hadoop FileSystem API instead of posix
os.listdir/os.walk. file: is the scheme this sandbox can exercise;
the API calls are identical for the cluster schemes."""

import pyspark.sql.functions as F

from miaplpy_spark.config import EngineConfig
from miaplpy_spark.datagen import generate_sequences, prepare_observations
from miaplpy_spark.operators.cascade import run_cascade
from miaplpy_spark.sources.catalog import TierStore

CFG = EngineConfig(n_buckets=2, n_samples=8)


def _obs(spark):
    from miaplpy_spark.config import ScaleSpec
    spec = ScaleSpec(n_docs=3, n_slots=48, tok_lo=8, tok_hi=16,
                     tok_heavy_lo=24, tok_heavy_hi=32)
    return prepare_observations(generate_sequences(spark, spec, CFG), CFG)


def test_uri_warehouse_exists_and_token(spark, tmp_path):
    store = TierStore(f"file:{tmp_path}/wh")
    assert store._has_scheme(store.path("t"))
    assert not store.exists(spark, "t")
    assert store.content_token(spark, "t") == "absent"

    df = spark.range(10).select(
        F.col("id"), F.pmod("id", F.lit(2)).cast("int").alias("bucket"))
    store.merge_partitions(df, "t")
    assert store.exists(spark, "t")
    tok1 = store.content_token(spark, "t")
    assert tok1 not in ("absent", "empty")
    # token is stable across reads, rotates on a committed rewrite
    assert store.content_token(spark, "t") == tok1
    store.merge_partitions(df.where(F.col("bucket") == 0), "t")
    assert store.content_token(spark, "t") != tok1


def test_uri_warehouse_matches_posix_semantics(spark, tmp_path):
    """Same physical directory: the posix and Hadoop-FS token paths
    must agree on existence and rotate together (values differ only in
    mtime granularity, so compare behavior, not bytes)."""
    plain = TierStore(str(tmp_path / "wh2"))
    uri = TierStore(f"file:{tmp_path}/wh2")
    df = spark.range(6).select(
        F.col("id"), F.lit(0).cast("int").alias("bucket"))
    plain.merge_partitions(df, "t")
    assert plain.exists(spark, "t") and uri.exists(spark, "t")
    u1 = uri.content_token(spark, "t")
    p1 = plain.content_token(spark, "t")
    plain.merge_partitions(df, "t")
    assert uri.content_token(spark, "t") != u1
    assert plain.content_token(spark, "t") != p1


def test_cascade_lifecycle_on_uri_warehouse(spark, tmp_path):
    """The checkpointed cascade end-to-end on a file: URI warehouse —
    first run processes, rerun is a full no-op (the exists/token reads
    all happen through the FS API)."""
    store = TierStore(f"file:{tmp_path}/wh3")
    obs = _obs(spark)
    m1 = run_cascade(spark, obs, store, CFG, input_id="fsuri")
    assert m1["raw->1h"]["buckets_processed"] == 2
    m2 = run_cascade(spark, obs, store, CFG, input_id="fsuri")
    assert m2["raw->1h"]["buckets_processed"] == 0
    assert m2["1h->1d"]["buckets_processed"] == 0
    assert store.read(spark, "rollup_1d").count() > 0
