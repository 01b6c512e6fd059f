"""Canonical sequences-table I/O.

Production layout is an Iceberg table (DDL below); the sandbox writes
the same layout as plain parquet. The ingest write pays the bucket
shuffle ONCE so that every downstream tier job, resume, and backfill
can read co-located doc groups.

Shuffle-free rollup reads (``bucketed=True``) have a strict contract:
one sorted file per bucket and file splitting disabled
(``spark.sql.files.maxPartitionBytes`` >= the largest bucket file).
That holds for sandbox-scale tiers; at 100 TB bucket files exceed any
sane split size, so the default rollup path keeps its own exchange and
the bucketed fast path is reserved for compacted medium tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..config import EngineConfig

ICEBERG_DDL = """
CREATE TABLE {catalog}.{ns}.sequences (
    doc_id  STRING,
    slot    INT,
    ts      TIMESTAMP,
    tokens  ARRAY<INT>,
    n_tok   INT,
    source  STRING,
    bucket  INT
)
USING iceberg
PARTITIONED BY (bucket, days(ts))
TBLPROPERTIES (
    'write.distribution-mode' = 'hash',
    'write.parquet.compression-codec' = 'zstd',
    'write.target-file-size-bytes' = '536870912'
)
"""


def write_sequences(df: DataFrame, path: str,
                    cfg: EngineConfig = EngineConfig()) -> None:
    """Ingest write: bucket-shuffled, (doc_key, slot)-sorted files —
    one file per bucket, parquet row order preserved."""
    (df.withColumn("doc_key", F.xxhash64("doc_id"))
       .repartition(cfg.n_buckets, "bucket")
       .sortWithinPartitions("doc_key", "slot")
       .write.mode("overwrite").partitionBy("bucket").parquet(path))


def read_sequences(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_sequences_bucketed(spark: SparkSession, path: str) -> DataFrame:
    """Shuffle-free read honoring the ingest contract. Caller MUST have
    set spark.sql.files.maxPartitionBytes above the largest file so a
    doc never splits across tasks; each task then sees whole, sorted
    doc groups and rollup_1h can run with its exchange elided."""
    return spark.read.option("mergeSchema", "false").parquet(path)
