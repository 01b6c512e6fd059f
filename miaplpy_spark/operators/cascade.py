"""Retention-cascade driver: raw -> 1h -> 1d as incremental,
checkpointed MERGE jobs (SURVEY.md §3.2's Spark replacement of the
patch pipeline; north_rule 'continuous aggregates cascade through
retention tiers').

Per tier:
1. lineage = hash(kernel config + input identity)
2. anti-join the input's buckets against completed checkpoints
   (broadcast — the completed-keys side is tiny)
3. run the rollup kernel on the remaining buckets only
4. MERGE the output per bucket (dynamic partition overwrite /
   Iceberg overwritePartitions)
5. append checkpoint rows (bucket, rows_processed, lineage) — only
   after the write commits (flag-written-last, lib/utils.pyx:1195)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..config import EngineConfig
from ..sources.catalog import TierStore
from .checkpoint import CheckpointLog
from .rollup import rollup_1d, rollup_1h

TIER_1H, TIER_1D = "rollup_1h", "rollup_1d"


def lineage_hash(cfg: EngineConfig, tier: str, input_id: str) -> str:
    payload = json.dumps({"cfg": asdict(cfg), "tier": tier,
                          "input": input_id}, sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _run_tier(
    spark: SparkSession,
    tier: str,
    inp: DataFrame,
    rollup_fn,
    store: TierStore,
    ckpt: CheckpointLog,
    cfg: EngineConfig,
    input_id: str,
    resume: bool,
) -> dict:
    lineage = lineage_hash(cfg, tier, input_id)
    if resume:
        done = ckpt.completed_keys(spark, tier, lineage)
        n_done = done.count()
        if n_done:
            inp = inp.join(F.broadcast(done),
                           inp["bucket"] == done["partition_key"], "left_anti")
    else:
        n_done = 0

    out = rollup_fn(inp, cfg)
    store.merge_partitions(out, tier, partition_col="bucket")

    # rows-processed metrics per bucket, read back from the committed
    # table (cheap: tier tables are orders of magnitude smaller than raw)
    written = store.read(spark, tier)
    if n_done:
        written = written.join(F.broadcast(done),
                               written["bucket"] == done["partition_key"],
                               "left_anti")
    counts = [(r["bucket"], r["cnt"]) for r in
              written.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()]
    ckpt.log_completion(spark, tier, lineage, counts)
    return {
        "tier": tier,
        "lineage": lineage,
        "buckets_skipped": n_done,
        "buckets_processed": len(counts),
        "rows_written": int(sum(c for _, c in counts)),
    }


def run_cascade(
    spark: SparkSession,
    raw_obs: DataFrame,
    store: TierStore,
    cfg: EngineConfig = EngineConfig(),
    input_id: str = "sequences",
    resume: bool = True,
) -> dict:
    """Run both tier jobs; returns per-tier metrics. ``raw_obs`` is the
    output of datagen.prepare_observations (already JVM-side compact).
    Resumable: a rerun after partial failure recomputes only buckets
    missing from the checkpoint log."""
    ckpt = CheckpointLog(store)
    m1 = _run_tier(spark, TIER_1H, raw_obs, rollup_1h, store, ckpt, cfg,
                   input_id, resume)
    df_1h = store.read(spark, TIER_1H)
    m2 = _run_tier(spark, TIER_1D, df_1h, rollup_1d, store, ckpt, cfg,
                   input_id + ">" + m1["lineage"], resume)
    return {"raw->1h": m1, "1h->1d": m2}
