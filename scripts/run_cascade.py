#!/usr/bin/env python
"""Production cascade driver — the spark-submit entry point.

Cluster launch (north_rule):

    zip -r miaplpy_spark.zip miaplpy_spark
    spark-submit \
        --py-files miaplpy_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        --conf spark.executorEnv.OMP_NUM_THREADS=1 \
        scripts/run_cascade.py \
        --input <sequences table/path> --warehouse <tier warehouse> \
        [--incremental] [--scale tiny|small|bench] [--buckets N]

With no --input, a deterministic synthetic sequences table at --scale
is generated (sandbox mode). On a cluster, --warehouse is an Iceberg
namespace (TierStore(use_iceberg=True)); locally it is a directory.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession

from miaplpy_spark.config import SCALES, EngineConfig
from miaplpy_spark.datagen import generate_sequences, prepare_observations
from miaplpy_spark.operators.cascade import run_cascade, run_cascade_incremental
from miaplpy_spark.sources.catalog import TierStore


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="sequences parquet path (else synthetic)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--scale", default="small", choices=sorted(SCALES))
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--salt-by-day", action="store_true",
                    help="bucket on (doc_id, day): spreads hot docs")
    ap.add_argument("--incremental", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--iceberg", action="store_true")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("miaplpy_spark.cascade").getOrCreate()
    kw = {"salt_by_day": args.salt_by_day}
    if args.buckets:
        kw["n_buckets"] = args.buckets
    cfg = EngineConfig(**kw)

    if args.input:
        raw = spark.read.parquet(args.input)
    else:
        raw = generate_sequences(spark, args.scale, cfg)
    obs = prepare_observations(raw, cfg)

    store = TierStore(args.warehouse, use_iceberg=args.iceberg)
    t0 = time.time()
    if args.incremental:
        metrics = run_cascade_incremental(spark, obs, store, cfg)
    else:
        metrics = run_cascade(spark, obs, store, cfg,
                              input_id=args.input or f"synthetic:{args.scale}",
                              resume=not args.no_resume)
    metrics["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
