"""Compressed-series columns for tier tables: delta-of-delta timestamps
+ Gorilla XOR values packed into ``binary`` blobs, one blob per
(doc_id, day) segment (north_rule; see kernels/codecs.py).

At 10^12 scale the hot tier keeps raw columns and the cold tiers keep
only blobs: a day of hourly points shrinks from 24 rows to one ~100-
byte row, and the blob layout preserves mergeability (blobs are
per-partition, so tier MERGE jobs never rewrite neighbors).

Same mapInPandas-with-carry execution shape as the rollup kernels —
encode is pure NumPy bit packing per segment.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import EngineConfig
from ..kernels.codecs import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)


def _group_starts(doc: np.ndarray, win: np.ndarray) -> np.ndarray:
    chg = np.empty(doc.shape[0], dtype=bool)
    chg[0] = True
    chg[1:] = (doc[1:] != doc[:-1]) | (win[1:] != win[:-1])
    return np.flatnonzero(chg)


def _carry_iter(batches, win_of, process):
    """Hold back the last (possibly incomplete) group of each pandas
    batch; flush at partition end. The 1h tier is ~2 orders smaller
    than raw, so pandas batches are fine here."""
    carry = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        doc = pdf["doc_id"].to_numpy()
        starts = _group_starts(doc, win_of(pdf))
        last = starts[-1]
        if last == 0:
            carry = pdf
            continue
        carry = pdf.iloc[last:].reset_index(drop=True)
        yield process(pdf.iloc[:last])
    if carry is not None and len(carry):
        yield process(carry)

COMPRESSED_SCHEMA = (
    "doc_id string, source string, bucket int, day_idx int, n_points int, "
    "ts_blob binary, quality_blob binary, mean_ntok_blob binary, "
    "raw_bytes long, blob_bytes long"
)

DECOMPRESSED_SCHEMA = (
    "doc_id string, source string, bucket int, day_idx int, "
    "hour_ts timestamp, quality double, mean_ntok double"
)


def compress_1h(df_1h: DataFrame, cfg: EngineConfig = EngineConfig(),
                num_partitions: int | None = None) -> DataFrame:
    H = cfg.hours_per_day

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        doc = pdf["doc_id"].to_numpy()
        hour_idx = pdf["hour_idx"].to_numpy()
        day = hour_idx // H
        starts = _group_starts(doc, day)
        ends = np.append(starts[1:], len(pdf))
        ts = (pdf["hour_ts"].astype("int64") // 10**9).to_numpy()
        q = pdf["quality"].to_numpy().astype(np.float64)
        mn = pdf["mean_ntok"].to_numpy().astype(np.float64)
        rows = []
        for s, e in zip(starts, ends):
            tb = encode_dod(ts[s:e])
            qb = encode_gorilla(q[s:e])
            mb = encode_gorilla(mn[s:e])
            rows.append((
                doc[s], pdf["source"].iloc[s], int(pdf["bucket"].iloc[s]),
                int(day[s]), int(e - s), tb, qb, mb,
                int((e - s) * (8 + 8 + 8)), len(tb) + len(qb) + len(mb),
            ))
        return pd.DataFrame(rows, columns=[
            "doc_id", "source", "bucket", "day_idx", "n_points",
            "ts_blob", "quality_blob", "mean_ntok_blob",
            "raw_bytes", "blob_bytes"])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _carry_iter(
            batches, lambda pdf: pdf["hour_idx"].to_numpy() // H, process)

    p = num_partitions or cfg.n_buckets
    return (df_1h.repartition(p, "bucket")
                 .sortWithinPartitions("doc_id", "hour_idx")
                 .mapInPandas(kernel, COMPRESSED_SCHEMA))


COLD_TIER = "rollup_1h_cold"
TIER_1H = "rollup_1h"


def apply_retention_1h(spark, store, day_boundary: int,
                       cfg: EngineConfig = EngineConfig()) -> dict:
    """Retention aging for the 1h tier: rows with ``day_idx <
    day_boundary`` move into the compressed cold tier (one DoD+Gorilla
    blob row per (doc, day) — ~24x fewer rows, summary series only;
    the eigen ensembles age out, which IS the retention downsample).
    The reference keeps only the squeezed/compressed history for
    closed mini-stacks while the current stack stays full-resolution
    (sequential_phase_linking_cy,
    /root/reference/src/miaplpy/lib/utils.pyx:604-666); this operator
    applies the same hot-window/compressed-history split to tier
    storage.

    Cold-tier MERGE is per (bucket, day_idx), so re-running retention
    only rewrites newly-aged days (idempotent), and a rerun with
    nothing left to age is a full no-op (no writes at all). The
    hot-table delete follows the incremental path's
    materialize-then-overwrite composition for the parquet fallback;
    an Iceberg deployment issues ``DELETE FROM rollup_1h WHERE
    hour_idx < boundary`` instead — a metadata-level partition drop
    when the table is partitioned by (bucket, days(hour_ts)).

    Crash window: the cold-merge -> hot-overwrite pair is not atomic
    on the parquet fallback. A crash between the two writes leaves the
    aged days in BOTH tiers, and read_1h_tiered would double-count
    them until retention is re-run (the rerun re-compresses the same
    days into the same (bucket, day_idx) cold partitions — idempotent
    — and then completes the hot overwrite). An Iceberg deployment
    closes the window by committing the cold MERGE and the hot DELETE
    in one multi-table transaction."""
    from pyspark.sql import functions as F

    H = cfg.hours_per_day
    boundary_h = day_boundary * H
    hot = store.read(spark, TIER_1H)
    old = hot.where(F.col("hour_idx") < boundary_h)
    fresh = hot.where(F.col("hour_idx") >= boundary_h)

    # materialize the blobs ONCE: the metrics aggregation and the
    # cold-tier MERGE would otherwise each recompute the compression
    blobs = compress_1h(old, cfg).localCheckpoint(eager=True)
    agg = blobs.agg(F.count("*").alias("n_blobs"),
                    F.sum("n_points").alias("n_aged"),
                    F.sum("raw_bytes").alias("raw_bytes"),
                    F.sum("blob_bytes").alias("blob_bytes")).collect()[0]
    if agg["n_blobs"]:
        store.merge_partitions(blobs, COLD_TIER,
                               partition_col=["bucket", "day_idx"])
        # materialize the survivors BEFORE overwriting the files they
        # are lazily read from (same protocol as run_cascade_incremental)
        fresh = fresh.localCheckpoint(eager=True)
        store.overwrite(fresh, TIER_1H, partition_col="bucket")
    return {"n_aged": int(agg["n_aged"] or 0),
            "n_blobs": int(agg["n_blobs"]),
            "raw_bytes": int(agg["raw_bytes"] or 0),
            "blob_bytes": int(agg["blob_bytes"] or 0)}


def read_1h_tiered(spark, store, cfg: EngineConfig = EngineConfig()) -> DataFrame:
    """Transparent read across retention tiers: hot 1h rows unioned
    with decoded cold blobs, projected to the columns both tiers carry
    (the cold tier keeps the summary series; ensembles exist only
    while hot)."""
    from pyspark.sql import functions as F

    cols = ["doc_id", "source", "bucket", "hour_ts", "quality", "mean_ntok"]
    hot = store.read(spark, TIER_1H).select(
        *[F.col(c).cast("double").alias(c) if c in ("quality", "mean_ntok")
          else F.col(c) for c in cols])
    if not store.exists(spark, COLD_TIER):
        return hot
    cold = decompress_1h(store.read(spark, COLD_TIER)).select(*cols)
    return hot.unionByName(cold)


def codec_roundtrip_events(spark, sf_dir: str,
                           cfg: EngineConfig = EngineConfig()) -> DataFrame:
    """Relational proof that the codec tier is lossless on real data:
    the events table's hourly series (per event_type) goes through
    compress_1h (DoD timestamps + two Gorilla double streams) and
    decompress_1h, then re-emerges as (event_type, h, n_events,
    avg_value) — byte-identical to computing the same aggregates
    directly, because both codecs round-trip exact float64/int64 bit
    patterns. The average divides the pre-rounded sum so the final
    6-dp rounding is deterministic across engines (same rule as
    q02)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.groupBy(
            F.col("event_type").alias("doc_id"),
            F.floor(F.unix_timestamp("ts") / 3600).cast("int")
             .alias("hour_idx"))
        .agg(F.round(F.sum("value"), 4).alias("quality"),
             F.count("*").cast("double").alias("mean_ntok"))
        .withColumn("source", F.lit("events"))
        .withColumn("bucket",
                    F.pmod(F.xxhash64("doc_id"), F.lit(cfg.n_buckets))
                     .cast("int"))
        .withColumn("hour_ts",
                    F.timestamp_seconds(F.col("hour_idx").cast("long") * 3600))
    )
    blobs = compress_1h(hourly, cfg)
    back = decompress_1h(blobs)
    return back.select(
        F.col("doc_id").alias("event_type"),
        F.floor(F.unix_timestamp("hour_ts") / 3600).cast("long").alias("h"),
        F.col("mean_ntok").cast("long").alias("n_events"),
        F.round(F.col("quality") / F.col("mean_ntok"), 6).alias("avg_value"),
    )


def decompress_1h(df_blobs: DataFrame) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # per-blob decode is inherent (one codec stream per row);
            # everything row-repeated is np.repeat'd, not looped
            ts_all, q_all, m_all, lens = [], [], [], []
            for tsb, qb, mb in zip(pdf["ts_blob"], pdf["quality_blob"],
                                   pdf["mean_ntok_blob"]):
                ts = decode_dod(bytes(tsb))
                ts_all.append(ts)
                q_all.append(decode_gorilla(bytes(qb)))
                m_all.append(decode_gorilla(bytes(mb)))
                lens.append(len(ts))
            lens = np.asarray(lens)
            rep = lambda c: np.repeat(pdf[c].to_numpy(), lens)
            yield pd.DataFrame({
                "doc_id": rep("doc_id"),
                "source": rep("source"),
                "bucket": rep("bucket"),
                "day_idx": rep("day_idx"),
                "hour_ts": pd.to_datetime(np.concatenate(ts_all), unit="s"),
                "quality": np.concatenate(q_all),
                "mean_ntok": np.concatenate(m_all),
            })

    return df_blobs.mapInPandas(kernel, DECOMPRESSED_SCHEMA)
