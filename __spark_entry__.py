"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship retention-cascade query on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
training-pipeline operators); each callable (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — matching DuckDB ANSI SQL for EVERY query (46/46):
the engine-native paths (cascade, compressed tier, network inversion,
Delaunay, incremental extension, retention) are certified through
deterministic integer-arithmetic fixtures that Spark and DuckDB
compute identically (miaplpy_spark/oracle_fixtures.py).

Every computed column is aliased identically in both implementations;
float aggregates are rounded identically on both sides; float32-typed
engine outputs are replicated in SQL via CAST(... AS REAL) so both
sides round the same quantum.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType

from miaplpy_spark.functions import (curate, dedup, multimodal, relational,
                                     similarity, text)


def _canon_safe(df: DataFrame) -> DataFrame:
    """Project every array column to canon-safe scalars (size + rounded
    sum): the driver's canonicalizer sorts rows with pandas, which
    cannot factorize list-typed cells. Rows-only checks keep their row
    count and gain two scalar digests per array column."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType):
            c = F.transform(F.col(f.name), lambda x: x.cast("double"))
            cols.append(F.size(f.name).alias(f.name + "_len"))
            cols.append(F.round(
                F.aggregate(c, F.lit(0.0), lambda a, x: a + x), 2
            ).alias(f.name + "_sum"))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _materialize_and_clean(df: DataFrame, workdir: str) -> DataFrame:
    """Eagerly materialize a gate result that reads from a throwaway
    warehouse, then delete the warehouse: the caller collects the
    returned DataFrame lazily, so the on-disk workspace must outlive
    nothing (repeated gate runs otherwise accumulate /tmp warehouses)."""
    import shutil

    out = df.localCheckpoint(eager=True)
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the retention cascade in relational form — 1h windowed
    rollup re-rolled to the 1d tier (partial->final aggregation, the
    raw->1h->1d shape) over /root/testdata/sf0.001."""
    return relational.tier_rollup_1d(spark, "/root/testdata/sf0.001")


def _engine_cascade(spark: SparkSession, sf_dir: str,
                    shp_filter: bool = False) -> DataFrame:
    """The actual engine path, driver-certified: a deterministic
    integer-arithmetic observation fixture runs through the REAL
    mapInArrow cascade (1h phase-linking rollup -> 1d datum re-link;
    eigen kernels, squeeze, gap-fill all execute), then the
    SQL-expressible per-(doc, day) scalars are compared against a
    DuckDB twin of the same arithmetic (oracle_fixtures.py — the
    simulation-against-known-truth recipe of the reference's own
    validation harness, /root/reference/src/miaplpy/simulation.py:
    22-47, upgraded to exact row equality). The eigen columns stay
    pytest-proven (tests/test_kernels.py, tests/test_rollup.py).

    ``shp_filter=True`` (q44) additionally runs the KS SHP-membership
    gate inside the 1h windows (get_shp_row_col_c,
    /root/reference/src/miaplpy/lib/utils.pyx:903-998): the gate only
    shapes the eigen ensemble, so the scalar aggregates remain
    oracle-identical while the driver exercises the gate's code path
    and cost."""
    from miaplpy_spark.config import EngineConfig
    from miaplpy_spark.oracle_fixtures import (fixture_obs,
                                               project_cascade_scalars)
    from miaplpy_spark.operators.rollup import rollup_1d, rollup_1h

    cfg = EngineConfig(n_buckets=4, n_samples=8, shp_filter=shp_filter)
    # q44 uses a different fixture size so the two gates compare
    # different result sets, not one set twice
    n_docs, n_slots = (10, 720) if shp_filter else (12, 960)
    obs = fixture_obs(spark, n_docs=n_docs, n_slots=n_slots, n_samples=8,
                      n_buckets=4)
    tiered = rollup_1d(rollup_1h(obs, cfg), cfg, assume_partitioned=True)
    return project_cascade_scalars(tiered)


def _fused_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified FUSED cascade (operators/fused.py): both tiers
    from one Arrow pass — the worker-boundary-minimizing execution
    shape of the same math as q30's two-stage pipeline. The 1d rows'
    scalar aggregates must match the one-shot DuckDB aggregation of
    the fixture, proving the in-process hourly handoff (no second
    exchange, no second Python crossing) loses nothing."""
    from miaplpy_spark.config import EngineConfig
    from miaplpy_spark.operators.fused import rollup_cascade_fused
    from miaplpy_spark.oracle_fixtures import (fixture_obs,
                                               project_cascade_scalars)

    cfg = EngineConfig(n_buckets=4, n_samples=8)
    obs = fixture_obs(spark, n_docs=9, n_slots=720, n_samples=8,
                      n_buckets=4)
    fused = rollup_cascade_fused(obs, cfg).where(F.col("tier") == "1d")
    return project_cascade_scalars(fused)


def _compressed_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla/DoD compressed cold tier over the fixture cascade's 1h
    output: the driver gate verifies the blob accounting (points per
    (doc, day) segment, raw byte footprint, blob presence) against the
    fixture arithmetic; blob CONTENT losslessness is separately
    driver-proven on real data by q39's decode round-trip."""
    from miaplpy_spark.config import EngineConfig
    from miaplpy_spark.operators.compress import compress_1h
    from miaplpy_spark.operators.rollup import rollup_1h
    from miaplpy_spark.oracle_fixtures import fixture_obs

    cfg = EngineConfig(n_buckets=4, n_samples=8)
    obs = fixture_obs(spark, n_docs=12, n_slots=960, n_samples=8,
                      n_buckets=4)
    blobs = compress_1h(rollup_1h(obs, cfg), cfg)
    return blobs.select(
        "doc_id", "source",
        F.col("day_idx").cast("int").alias("day_idx"),
        F.col("n_points").cast("int").alias("n_points"),
        F.col("raw_bytes").cast("long").alias("raw_bytes"),
        (F.col("blob_bytes") > 0).alias("has_blob"))


def _chain_inversion(spark: SparkSession, method: str) -> DataFrame:
    """One conn=1 chain inversion leg over the planted hourly phase
    tier (oracle_fixtures.fixture_hourly): the sequential-chain pair
    network (J1 with connNum=1, miaplpyApp.py:414-422) is exactly
    determined — the unique least-squares solution is the running sum
    of wrapped phase diffs, which the DuckDB oracle computes as a
    window cumsum, and the zero-residual network pins inv_quality to
    1.0 for every method. L2 / coherence-weighted WLS / IRLS-L1 all
    traverse their full solver paths (weights and IRLS sweeps
    included; the chain makes their answers provably identical)."""
    from miaplpy_spark.config import EngineConfig
    from miaplpy_spark.operators.network_inversion import invert_network
    from miaplpy_spark.oracle_fixtures import (fixture_hourly,
                                               project_inversion_scalars)

    cfg = EngineConfig(n_buckets=4, n_samples=8)
    hourly = fixture_hourly(spark, n_docs=12, n_hours=48, n_buckets=4)
    kw = {"l1_alpha": 0.0} if method == "L1" else {}
    inv = invert_network(hourly, cfg, conn=1, method=method, **kw)
    return (project_inversion_scalars(inv)
            .withColumn("method", F.lit(method.lower())))


def _network_inversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified network inversion, L2 family: the conn=1
    exactly-determined chain solve (method='l2') UNIONed with the
    OVERDETERMINED conn=3 banded solve over the slowly-varying smooth
    fixture (method='l2_banded', _banded_inversion) so BOTH the square
    and the redundant/pseudo-inverse solver paths are certified in one
    driver row budget. Doc-id prefixes differ per leg (invdoc/smdoc),
    so the union is disjoint and row-sortable. Gappy solves stay
    pytest-proven (tests/test_lstsq.py, tests/test_network_inversion
    .py)."""
    return _chain_inversion(spark, "L2").unionByName(
        _banded_inversion(spark, sf_dir).withColumn(
            "method", F.lit("l2_banded")))


def _robust_inversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified robust-method inversions: coherence-weighted
    WLS (A20, dev/ifgram_inversion_L1L2.py:300-340) UNIONed with
    IRLS-L1 (A17, dev/ifgram_inversion_L1L2.py:378-417), both run
    end-to-end on the conn=1 chain where their full solver paths
    (weight mapping, IRLS sweeps) execute yet the exact solution is
    the same closed-form cumsum the oracle computes."""
    return _chain_inversion(spark, "WLS").unionByName(
        _chain_inversion(spark, "L1"))


def _incremental_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified incremental extension (T3/T4: update-mode skip
    + watermark carry, objects/utils.py:1220-1241 /
    objects/inversion_utils.py:149-217): the fixture's first two days
    run through run_cascade_incremental, then the FULL range extends
    the tiers through the watermark path (closed hours kept, the open
    boundary hour recomputed). The final 1h tier's scalar columns must
    equal a single-pass DuckDB aggregation of the whole fixture —
    i.e. the incremental composition is exact, row-for-row."""
    import tempfile

    from miaplpy_spark.config import EngineConfig
    from miaplpy_spark.operators.cascade import run_cascade_incremental
    from miaplpy_spark.oracle_fixtures import fixture_obs
    from miaplpy_spark.sources.catalog import TierStore

    cfg = EngineConfig(n_buckets=4, n_samples=8)
    wh = tempfile.mkdtemp(prefix="q45_wh_")
    store = TierStore(wh)
    obs = fixture_obs(spark, n_docs=8, n_slots=720, n_samples=8,
                      n_buckets=4)
    run_cascade_incremental(spark, obs.where(F.col("slot") < 480),
                            store, cfg)
    run_cascade_incremental(spark, obs, store, cfg)
    tier = store.read(spark, "rollup_1h")
    return _materialize_and_clean(tier.select(
        "doc_id", "source",
        F.col("hour_idx").cast("int").alias("hour_idx"),
        F.col("n_obs").cast("int").alias("n_obs"),
        F.col("n_filled").cast("int").alias("n_filled"),
        "sum_tok",
        F.col("min_tok").cast("int").alias("min_tok"),
        F.col("max_tok").cast("int").alias("max_tok"),
        F.round("mean_ntok", 6).alias("mean_ntok")), wh)


def _checkpointed_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified checkpointed batch cascade (T1/T2 flag-written-
    last protocol, lib/utils.pyx:1195): run_cascade executes twice into
    the same warehouse — the second run must anti-join every bucket
    away against the checkpoint log (a no-op), and the surviving 1d
    tier must equal the one-shot DuckDB aggregation. A non-idempotent
    MERGE or a checkpoint row written before its tier write would
    corrupt the compared rows."""
    import tempfile

    from miaplpy_spark.config import EngineConfig
    from miaplpy_spark.operators.cascade import run_cascade
    from miaplpy_spark.oracle_fixtures import (fixture_obs,
                                               project_cascade_scalars)
    from miaplpy_spark.sources.catalog import TierStore

    cfg = EngineConfig(n_buckets=4, n_samples=8)
    wh = tempfile.mkdtemp(prefix="q51_wh_")
    store = TierStore(wh)
    obs = fixture_obs(spark, n_docs=7, n_slots=720, n_samples=8,
                      n_buckets=4)
    run_cascade(spark, obs, store, cfg, input_id="q51")
    m2 = run_cascade(spark, obs, store, cfg, input_id="q51")
    assert m2["raw->1h"]["buckets_processed"] == 0, m2
    return _materialize_and_clean(
        project_cascade_scalars(store.read(spark, "rollup_1d")), wh)


def _retention_tiered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified retention aging + transparent tiered read: the
    fixture's 1h tier is written, days < 2 age into DoD+Gorilla cold
    blobs (apply_retention_1h), and read_1h_tiered unions hot rows
    with decoded blobs. Every hour must come back exactly once with
    its exact mean — which simultaneously proves the codec round-trip
    on the summary series, the hot/cold split disjointness, and the
    union view (the reference's compressed-history / hot-window split,
    sequential_phase_linking_cy lib/utils.pyx:604-666)."""
    import tempfile

    from miaplpy_spark.config import EngineConfig
    from miaplpy_spark.operators.compress import (apply_retention_1h,
                                                  read_1h_tiered)
    from miaplpy_spark.operators.rollup import rollup_1h
    from miaplpy_spark.oracle_fixtures import fixture_obs
    from miaplpy_spark.sources.catalog import TierStore

    cfg = EngineConfig(n_buckets=4, n_samples=8)
    wh = tempfile.mkdtemp(prefix="q46_wh_")
    store = TierStore(wh)
    obs = fixture_obs(spark, n_docs=8, n_slots=960, n_samples=8,
                      n_buckets=4)
    store.merge_partitions(rollup_1h(obs, cfg), "rollup_1h",
                           partition_col="bucket")
    apply_retention_1h(spark, store, day_boundary=2, cfg=cfg)
    tiered = read_1h_tiered(spark, store, cfg)
    return _materialize_and_clean(tiered.select(
        "doc_id", "source",
        ((F.unix_timestamp("hour_ts") - F.lit(cfg.epoch0))
         / F.lit(cfg.hour_seconds)).cast("int").alias("hour_idx"),
        F.round("mean_ntok", 6).alias("mean_ntok")), wh)


def _banded_inversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified BANDED network inversion (conn=3, the
    reference's default connNum — J1, miaplpyApp.py:414-422): over the
    slowly-varying fixture every wrapped pair diff within the band
    equals the exact unwrapped difference, so the overdetermined
    banded least-squares system is consistent and its unique solution
    is the unwrapped cumsum — which the DuckDB oracle computes as a
    window cumsum. Unlike q32's exactly-determined chain, this gate
    exercises the genuine overdetermined solve (redundant
    observations, pseudo-inverse path) with a value-level oracle."""
    from miaplpy_spark.config import EngineConfig
    from miaplpy_spark.operators.network_inversion import invert_network
    from miaplpy_spark.oracle_fixtures import (fixture_hourly_smooth,
                                               project_banded_inversion)

    cfg = EngineConfig(n_buckets=4, n_samples=8)
    hourly = fixture_hourly_smooth(spark, n_docs=12, n_hours=48,
                                   n_buckets=4)
    inv = invert_network(hourly, cfg, conn=3, method="L2")
    return project_banded_inversion(inv)


def _streaming_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified Structured Streaming ingestion: the fixture's
    observation rows land as FOUR parquet files consumed one file per
    micro-batch (maxFilesPerTrigger=1, availableNow drain), each
    micro-batch driving the batch 1h kernel over its touched hours via
    foreachBatch + staging + (bucket, hour_idx) MERGE
    (streaming/rollup_stream.py). Files split RANDOMLY across hours,
    so hours straddle micro-batches and the gate proves the
    recompute-from-staging convergence: the final streamed tier's
    scalar columns must equal the one-shot DuckDB aggregation exactly
    (T4 carry extension as a stream, objects/inversion_utils.py:
    149-217)."""
    import tempfile

    from miaplpy_spark.config import EngineConfig
    from miaplpy_spark.oracle_fixtures import fixture_obs
    from miaplpy_spark.sources.catalog import TierStore
    from miaplpy_spark.streaming.rollup_stream import (STREAM_TIER,
                                                       stream_rollup_1h)

    from miaplpy_spark.streaming.rollup_stream import STREAM_TIER_1D

    cfg = EngineConfig(n_buckets=4, n_samples=8)
    root = tempfile.mkdtemp(prefix="q49_")
    obs = fixture_obs(spark, n_docs=6, n_slots=480, n_samples=8,
                      n_buckets=4)
    obs.repartition(4).write.parquet(f"{root}/in")
    stream = (spark.readStream.schema(obs.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{root}/in"))
    store = TierStore(f"{root}/wh")
    # cascade_1d drives the streaming 1h->1d leg inside the gate
    # (round-4 VERDICT item 7 folded into q49): the compared rows stay
    # the 1h tier; the 1d leg's row count is asserted below and its
    # exact batch equality is pinned by tests/test_streaming.py
    q = stream_rollup_1h(stream, store, cfg,
                         checkpoint_dir=f"{root}/ckpt",
                         available_now=True, cascade_1d=True)
    # awaitTermination returns False on timeout WITHOUT raising; a
    # partial read of the tier mid-drain must be an error, not a
    # flaky hash mismatch
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("q49 stream drain exceeded 600 s")
    tier = store.read(spark, STREAM_TIER)
    n_1d = store.read(spark, STREAM_TIER_1D).count()
    n_doc_days = (tier.select(
        "doc_id", (F.col("hour_idx") / cfg.hours_per_day).cast("int"))
        .distinct().count())
    assert n_1d == n_doc_days, (n_1d, n_doc_days)
    return _materialize_and_clean(tier.select(
        "doc_id", "source",
        F.col("hour_idx").cast("int").alias("hour_idx"),
        F.col("n_obs").cast("int").alias("n_obs"),
        F.col("n_filled").cast("int").alias("n_filled"),
        "sum_tok",
        F.col("min_tok").cast("int").alias("min_tok"),
        F.col("max_tok").cast("int").alias("max_tok"),
        F.round("mean_ntok", 6).alias("mean_ntok")), root)


def _codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless-codec proof with a full DuckDB oracle: hourly event
    aggregates -> DoD+Gorilla blobs -> decode -> identical values."""
    from miaplpy_spark.operators.compress import codec_roundtrip_events
    return codec_roundtrip_events(spark, sf_dir)


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.extract_features(multimodal.attach_blob(docs))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # retention / window / timeseries operators (SURVEY.md §2.5-2.6)
        "q01_tier_rollup_1h": relational.tier_rollup_1h,
        "q02_tier_rollup_1d": relational.tier_rollup_1d,
        # q03_gap_count was retired from the 50-slot registration in
        # round 5: its semantics (present hours vs span) are a strict
        # subset of q33_gapfill_interp's oracle, whose grid/was_missing
        # columns certify the same gap detection — the freed slot
        # driver-certifies the end-to-end curation composition (q52).
        # relational.gap_count itself remains a library operator.
        "q04_cumsum_daily": relational.cumsum_daily,
        "q05_asof_next_event": relational.asof_next_event,
        "q12_sliding_mean": relational.sliding_mean,
        "q33_gapfill_interp": relational.gapfill_interp,
        # network construction joins (§2.4)
        "q06_seq_pairs": relational.sequential_pairs,
        "q07_single_reference": relational.single_reference_pairs,
        "q08_anti_join": relational.anti_join_users,
        "q34_ministack_network": relational.ministack_network,
        "q43_delaunay_network": relational.delaunay_network,
        "q35_tolerance_asof": relational.tolerance_asof_pairs,
        # masks / filters / quality (§2.2, §2.5)
        "q09_masked_agg": relational.masked_agg,
        "q10_quality_mask": relational.quality_mask,
        "q11_amp_dispersion": relational.amp_dispersion,
        "q13_ref_subtract": relational.reference_subtract,
        "q14_top_users": relational.top_users,
        # scans / star joins / scalar functions (§2.1, §2.9)
        "q15_pricing_summary": relational.pricing_summary,
        "q16_revenue_by_nation": relational.revenue_by_nation,
        "q17_props_sum": relational.props_sum,
        # training-pipeline: text analysis
        "q18_token_count": text.token_count,
        "q19_text_quality": text.text_quality,
        "q20_lang_profile": text.lang_profile,
        "q21_fingerprint_dups": text.fingerprint_dups,
        "q40_bpe_token_count": text.bpe_token_count,
        "q41_lang_id": text.lang_id_heuristic,
        "q22_shingle_jaccard": text.shingle_jaccard_pairs,
        "q47_winnow_fingerprints": text.winnow_fingerprints,
        "q48_cross_source_overlap": text.cross_source_overlap,
        # training-pipeline: similarity search
        "q23_embed_topk": similarity.brute_force_topk,
        "q24_embed_neardup": lambda s, d: similarity.cosine_near_dup_pairs(
            s, d, threshold=0.35),
        "q25_label_centroids": similarity.label_centroids,
        "q38_lsh_neardup": similarity.lsh_near_dup_pairs,
        # the GATE pins the codebook fit to codebook_fit_dir() (env or
        # the sf0.01 default — the directory the oracle fits from and
        # the driver registers views from) so the two sides can never
        # diverge whatever sf_dir the driver passes; the library API
        # (ivf_ann_topk without fit_dir) trains on its own corpus
        "q42_ivf_ann": lambda s, d: similarity.ivf_ann_topk(
            s, d, fit_dir=similarity.codebook_fit_dir()),
        # engine-native paths (fixture-oracled) + hash-family operators
        "q26_minhash_lsh": dedup.minhash_lsh_pairs,
        "q27_simhash_pairs": dedup.simhash_near_pairs,
        "q28_lsh_ann": similarity.lsh_ann_topk,
        "q29_multimodal_features": lambda s, d: _canon_safe(
            _multimodal_features(s, d)),
        "q30_sequence_cascade": _engine_cascade,
        "q44_shp_cascade": lambda s, d: _engine_cascade(s, d,
                                                        shp_filter=True),
        "q31_compressed_tier": _compressed_tier,
        "q45_incremental_cascade": _incremental_cascade,
        "q46_retention_tiered_read": _retention_tiered_read,
        "q49_streaming_cascade": _streaming_cascade,
        "q50_fused_cascade": _fused_cascade,
        "q51_checkpointed_cascade": _checkpointed_cascade,
        "q39_codec_roundtrip": _codec_roundtrip,
        "q32_network_inversion": _network_inversion,
        "q36_weighted_inversion": _robust_inversion,
        # the end-to-end pretraining-curation decision (quality gate +
        # exact dedup + MinHash-LSH near-dup components + priority
        # reasons), driver-certified as ONE composition
        "q52_curate_corpus": curate.curate_corpus,
    }


def _q26_sql(n_perm: int = 32, bands: int = 8, k: int = 3,
             threshold: float = 0.35) -> str:
    """DuckDB twin of dedup.minhash_lsh_pairs: same md5-affine hash
    family reduced mod MINHASH_PRIME (the unreduced family is
    degenerate — see minhash_signatures), same banding, same
    signature-Jaccard verify."""
    from miaplpy_spark.functions.dedup import MINHASH_PRIME

    rpb = n_perm // bands
    mins = ", ".join(
        f"min((h1 + {p + 1} * h2) % {MINHASH_PRIME}) AS m{p}"
        for p in range(n_perm))
    sig_list = ", ".join(f"m{p}" for p in range(n_perm))
    return f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, len(ws) - {k - 2}),
                             i -> array_to_string(ws[i:i+{k - 1}], ' '))) AS sh
               FROM d),
        hs AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h1,
                      CAST(('0x' || substr(md5(sh || '#'), 1, 13)) AS BIGINT) AS h2
               FROM sh),
        sig AS (SELECT doc_id, {mins} FROM hs GROUP BY 1),
        sigl AS (SELECT doc_id, [{sig_list}] AS sig FROM sig),
        banded AS (SELECT doc_id, b.band,
                          CAST(('0x' || substr(
                              md5(b.band || ',' ||
                                  array_to_string(sig[b.band*{rpb}+1 : b.band*{rpb}+{rpb}], ',')),
                              1, 15)) AS BIGINT) AS bucket
                   FROM sigl CROSS JOIN range({bands}) b(band)),
        cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
                 FROM banded a JOIN banded b
                      ON a.band = b.band AND a.bucket = b.bucket
                         AND a.doc_id < b.doc_id),
        est AS (SELECT doc1, doc2,
                       round(list_sum(list_transform(range(1, {n_perm + 1}),
                             i -> CASE WHEN s1.sig[i] = s2.sig[i]
                                       THEN 1 ELSE 0 END)) / {n_perm}.0, 6)
                           AS est_jaccard
                FROM cand JOIN sigl s1 ON doc1 = s1.doc_id
                          JOIN sigl s2 ON doc2 = s2.doc_id)
        SELECT doc1, doc2, est_jaccard FROM est WHERE est_jaccard >= {threshold}
    """


def _q27_sql(nbits: int = 48, max_hamming: int = 12,
             n_bands: int = 3, band_bits: int = 16) -> str:
    """DuckDB twin of dedup.simhash_near_pairs: same 3 x 16-bit band
    blocking (candidates agree on at least one band)."""
    sums = ", ".join(
        f"sum(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(nbits))
    pack = " + ".join(
        f"CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(nbits))
    mask = (1 << band_bits) - 1
    band_eq = " OR ".join(
        f"((a.simhash >> {r * band_bits}) & {mask})"
        f" = ((b2.simhash >> {r * band_bits}) & {mask})"
        for r in range(n_bands))
    return f"""
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM documents),
        h AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) AS h
              FROM w),
        v AS (SELECT doc_id, {sums} FROM h GROUP BY 1),
        s AS (SELECT doc_id, {pack} AS simhash FROM v)
        SELECT a.doc_id AS doc1, b2.doc_id AS doc2,
               CAST(bit_count(xor(a.simhash, b2.simhash)) AS BIGINT) AS hamming
        FROM s a JOIN s b2 ON a.doc_id < b2.doc_id AND ({band_eq})
        WHERE bit_count(xor(a.simhash, b2.simhash)) <= {max_hamming}
    """


def _q28_sql(n_queries: int = 20, k: int = 5, n_planes: int = 8,
             dim: int = 64) -> str:
    """DuckDB twin of similarity.lsh_ann_topk: identical literal plane
    signs (md5-derived, computed by similarity.plane_signs)."""
    from miaplpy_spark.functions.similarity import plane_signs
    signs = plane_signs(n_planes, dim)
    bucket = " + ".join(
        "CASE WHEN list_dot_product(v, ["
        + ", ".join(str(s) for s in signs[j])
        + f"]) > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(n_planes))
    flips = ", ".join(f"xor(bucket, {1 << j})" for j in range(n_planes))
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        bk AS (SELECT vec_id, v, ({bucket}) AS bucket FROM e),
        probes AS (SELECT vec_id AS qid, v AS qv,
                          unnest([bucket, {flips}]) AS bucket
                   FROM bk WHERE vec_id < {n_queries}),
        cand AS (SELECT DISTINCT p.qid, p.qv, c.vec_id AS nid, c.v AS nv
                 FROM probes p JOIN bk c
                      ON p.bucket = c.bucket AND p.qid <> c.vec_id),
        p2 AS (SELECT qid, nid,
                      round(list_dot_product(qv, nv) /
                            (sqrt(list_dot_product(qv, qv)) *
                             sqrt(list_dot_product(nv, nv))), 4) AS sim
               FROM cand),
        r AS (SELECT qid, nid, sim,
                     row_number() OVER (PARTITION BY qid
                           ORDER BY sim DESC, nid) AS rk FROM p2)
        SELECT qid, nid, sim, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= {k}
    """


def _q38_sql(threshold: float = 0.35, n_planes: int = 6,
             dim: int = 64) -> str:
    """DuckDB twin of similarity.lsh_near_dup_pairs: identical literal
    plane signs, same Hamming-1 probe set, exact cosine on candidates."""
    from miaplpy_spark.functions.similarity import plane_signs
    signs = plane_signs(n_planes, dim)
    bucket = " + ".join(
        "CASE WHEN list_dot_product(v, ["
        + ", ".join(str(s) for s in signs[j])
        + f"]) > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(n_planes))
    flips = ", ".join(f"xor(bucket, {1 << j})" for j in range(n_planes))
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        bk AS (SELECT vec_id, v, ({bucket}) AS bucket FROM e),
        pr AS (SELECT vec_id AS id1, v AS v1,
                      unnest([bucket, {flips}]) AS bucket
               FROM bk),
        cand AS (SELECT DISTINCT id1, v1, b.vec_id AS id2, b.v AS v2
                 FROM pr JOIN bk b ON pr.bucket = b.bucket
                      AND id1 < b.vec_id),
        s AS (SELECT id1, id2,
                     round(list_dot_product(v1, v2) /
                           (sqrt(list_dot_product(v1, v1)) *
                            sqrt(list_dot_product(v2, v2))), 4) AS sim
              FROM cand)
        SELECT id1, id2, sim FROM s WHERE sim >= {threshold}
    """


def _q42_sql(n_queries: int = 20, k: int = 5, n_cells: int = 16,
             n_probe: int = 4, dim: int = 64) -> str:
    """DuckDB twin of similarity.ivf_ann_topk: the codebook is a
    driver-side sample model (similarity.fit_ivf_codebook — pure
    NumPy, engine-independent), so the SAME 6-dp centroid literals are
    embedded in both plans; assignment replicates the rounded
    squared-L2 with smallest-cell tiebreak.

    Directory coupling: BOTH the Spark query (via ivf_train_centroids)
    and this SQL resolve the fit corpus through the single
    similarity.codebook_fit_dir() helper ($SPARK_GRAFT_SF_DIR_T2,
    default sf0.01 — the directory the driver registers the DuckDB
    views from), so the two fits cannot diverge whatever sf_dir the
    driver passes at query time."""
    from miaplpy_spark.functions.similarity import (codebook_fit_dir,
                                                    fit_ivf_codebook)
    cents = fit_ivf_codebook(codebook_fit_dir(), n_cells, dim)
    d2 = ("round(list_dot_product(e.v, e.v)"
          " - 2 * list_dot_product(e.v, {c})"
          " + {cc}, 6)")
    cells = " UNION ALL ".join(
        "SELECT {j} AS cell, [{c}] AS c, CAST({cc} AS DOUBLE) AS cc".format(
            j=j, c=", ".join(repr(x) for x in cents[j]),
            cc=repr(float(sum(x * x for x in cents[j]))))
        for j in range(n_cells))
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cf AS ({cells}),
        d1 AS (SELECT e.vec_id, e.v, cf.cell,
                      {d2.format(c="cf.c", cc="cf.cc")} AS d2
               FROM e CROSS JOIN cf),
        a1 AS (SELECT vec_id, v, cell FROM d1
               QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY d2, cell) = 1),
        probes AS (SELECT vec_id AS qid, v AS qv, cell FROM d1
                   WHERE vec_id < {n_queries}
                   QUALIFY row_number() OVER (PARTITION BY vec_id
                         ORDER BY d2, cell) <= {n_probe}),
        cand AS (SELECT p.qid, p.qv, a.vec_id AS nid, a.v AS nv
                 FROM probes p JOIN a1 a ON p.cell = a.cell
                      AND p.qid <> a.vec_id),
        sims AS (SELECT qid, nid,
                        round(list_dot_product(qv, nv) /
                              (sqrt(list_dot_product(qv, qv)) *
                               sqrt(list_dot_product(nv, nv))), 4) AS sim
                 FROM cand),
        r AS (SELECT qid, nid, sim,
                     row_number() OVER (PARTITION BY qid
                           ORDER BY sim DESC, nid) AS rk FROM sims)
        SELECT qid, nid, sim, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= {k}
    """


def _q52_sql(min_words: int = 5, max_stop: float = 0.9,
             min_ttr: float = 0.2, threshold: float = 0.35,
             max_dup: float = 0.7, max_topw: float = 0.2,
             max_topg: float = 0.2) -> str:
    """DuckDB twin of curate.curate_corpus: the q19 quality scalars,
    the q21 exact-fingerprint keep-first-by-id, the q26 MinHash-LSH
    pairs collapsed to connected components by a recursive CTE
    (min-label closure over the symmetric edge list — the same
    fixpoint dedup.connected_components iterates), the Gopher-style
    repetition signals (word counts + 2-gram assembly via list
    lambdas, same rounding as text.repetition_signals), and the
    identical priority CASE. Reuses _q26_sql verbatim for the pair
    leg so the two certifications can never diverge."""
    case = f"""CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
                    WHEN nl.doc_id IS NOT NULL THEN 'near_dup'
                    WHEN COALESCE(q.n_words, 0) < {min_words}
                         THEN 'too_short'
                    WHEN r.dup_word_frac > {max_dup}
                         OR r.top_word_frac > {max_topw}
                         OR r.top_ngram_frac > {max_topg}
                         THEN 'repetitive'
                    WHEN q.stopword_ratio > {max_stop}
                         OR q.ttr < {min_ttr} THEN 'low_quality'
                    ELSE 'kept' END"""
    return f"""
        WITH RECURSIVE
        w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
        qa AS (SELECT doc_id,
                      CAST(count(*) AS BIGINT) AS n_words,
                      CAST(count(DISTINCT w) AS BIGINT) AS n_distinct,
                      CAST(sum(CASE WHEN w IN ('a','the','of','and',
                                               'to','in')
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
               FROM w GROUP BY 1),
        q AS (SELECT doc_id, n_words,
                     round(n_distinct * 1.0 / n_words, 6) AS ttr,
                     round(n_stop * 1.0 / n_words, 6) AS stopword_ratio
              FROM qa),
        wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
        topw AS (SELECT doc_id, max(c) AS top_word_c FROM wc GROUP BY 1),
        g AS (SELECT doc_id,
                     unnest(list_transform(
                         generate_series(1, len(l) - 1),
                         i -> l[i] || ' ' || l[i + 1])) AS g
              FROM (SELECT doc_id, string_split(text, ' ') AS l
                    FROM documents)
              WHERE len(l) >= 2),
        gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
        topg AS (SELECT doc_id, max(c) AS top_gram_c FROM gc GROUP BY 1),
        rep AS (SELECT qa.doc_id,
                       round(1 - qa.n_distinct * 1.0 / qa.n_words, 6)
                           AS dup_word_frac,
                       round(tw.top_word_c * 1.0 / qa.n_words, 6)
                           AS top_word_frac,
                       round(COALESCE(tg.top_gram_c, 0) * 2.0
                             / qa.n_words, 6) AS top_ngram_frac
                FROM qa
                JOIN topw tw ON qa.doc_id = tw.doc_id
                LEFT JOIN topg tg ON qa.doc_id = tg.doc_id),
        ex AS (SELECT doc_id FROM (
                   SELECT doc_id,
                          min(doc_id) OVER (PARTITION BY md5(lower(text)))
                              AS keeper
                   FROM documents)
               WHERE doc_id <> keeper),
        pairs AS (SELECT doc1, doc2 FROM ({_q26_sql(threshold=threshold)})),
        edges AS (SELECT doc1 AS src, doc2 AS dst FROM pairs
                  UNION SELECT doc2, doc1 FROM pairs),
        reach(node, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl
            FROM reach r JOIN edges e ON e.src = r.node),
        comp AS (SELECT node, min(lbl) AS c FROM reach GROUP BY 1),
        nl AS (SELECT node AS doc_id FROM comp WHERE node <> c),
        dec AS (SELECT d.doc_id, d.lang,
                       COALESCE(q.n_words, 0) AS n_words,
                       {case} AS reason
                FROM documents d
                LEFT JOIN q ON d.doc_id = q.doc_id
                LEFT JOIN ex ON d.doc_id = ex.doc_id
                LEFT JOIN nl ON d.doc_id = nl.doc_id
                LEFT JOIN rep r ON d.doc_id = r.doc_id)
        SELECT doc_id, lang, n_words, reason,
               reason = 'kept' AS keep
        FROM dec
    """


def _q29_sql(n_features: int = 16) -> str:
    """DuckDB twin of the multimodal feature path: the stub decoder is
    sha256(payload) bytes -> repeated-digest uint32 (little-endian) ->
    float32 in [0,1], so SQL reconstructs every feature from the hex
    digest and replays _canon_safe's left-fold sum in the same order
    (digest repeats after 8 features)."""
    feats = []
    for i in range(n_features):
        o = (4 * i) % 32
        b = [f"CAST(('0x' || substr(h, {2 * (o + j) + 1}, 2)) AS BIGINT)"
             for j in range(4)]
        v = f"({b[0]} + 256*{b[1]} + 65536*{b[2]} + 16777216*{b[3]})"
        feats.append(f"CAST(CAST({v} / 4294967295.0 AS REAL) AS DOUBLE)")
    fold = " + ".join(feats)
    return f"""
        WITH m AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                               WHEN doc_id % 3 = 1 THEN 'audio/wav'
                               ELSE 'video/mp4' END AS mime,
                          sha256(text) AS h
                   FROM documents)
        SELECT doc_id, mime,
               CAST({n_features} AS INT) AS features_len,
               round(0.0 + {fold}, 2) AS features_sum
        FROM m
    """


def _q43_sql(max_dt: int = 14, max_perp: float = 30.0) -> str:
    """DuckDB twin of relational.delaunay_network via the exact
    empty-circumcircle characterization: an edge (a, b) belongs to the
    Delaunay triangulation iff some triangle (a, b, c) has a
    circumcircle strictly empty of other points (general position).
    The day dimension is tiny (~30 rows), so the O(n^4) SQL — 4060
    triples x 30 containment probes — is trivial for the oracle while
    the engine side stays the driver-side Bowyer-Watson the reference
    also uses driver-side (find_short_baselines.py:30-109)."""
    return f"""
        WITH days AS (SELECT date_trunc('day', ts) AS d,
                             round(avg(value), 6) AS bperp
                      FROM events GROUP BY 1),
        d0 AS (SELECT min(d) AS m FROM days),
        p AS (SELECT row_number() OVER (ORDER BY d) - 1 AS i, d,
                     CAST(date_diff('day', m, d) AS DOUBLE) AS x,
                     bperp AS y
              FROM days, d0),
        tri AS (SELECT a.i ia, b.i ib, c.i ic,
                       a.x ax, a.y ay, b.x bx, b.y byy, c.x cx, c.y cy
                FROM p a JOIN p b ON b.i > a.i JOIN p c ON c.i > b.i),
        cc AS (SELECT *,
                      2 * (ax * (byy - cy) + bx * (cy - ay)
                           + cx * (ay - byy)) AS dd
               FROM tri),
        cen AS (SELECT ia, ib, ic, ax, ay,
                       ((ax*ax + ay*ay) * (byy - cy)
                        + (bx*bx + byy*byy) * (cy - ay)
                        + (cx*cx + cy*cy) * (ay - byy)) / dd AS ux,
                       ((ax*ax + ay*ay) * (cx - bx)
                        + (bx*bx + byy*byy) * (ax - cx)
                        + (cx*cx + cy*cy) * (bx - ax)) / dd AS uy
                FROM cc WHERE abs(dd) > 1e-12),
        emp AS (SELECT ia, ib, ic FROM cen
                WHERE NOT EXISTS (
                    SELECT 1 FROM p q
                    WHERE q.i <> ia AND q.i <> ib AND q.i <> ic
                      AND (q.x - ux) * (q.x - ux) + (q.y - uy) * (q.y - uy)
                          < (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy))),
        e AS (SELECT DISTINCT i, j FROM (
                  SELECT ia AS i, ib AS j FROM emp
                  UNION ALL SELECT ib, ic FROM emp
                  UNION ALL SELECT ia, ic FROM emp))
        SELECT pa.d AS day1, pb.d AS day2,
               CAST(pb.x - pa.x AS BIGINT) AS dt_days,
               round(abs(pb.y - pa.y), 6) AS bperp_diff
        FROM e JOIN p pa ON e.i = pa.i JOIN p pb ON pb.i = e.j
        WHERE pb.x - pa.x <= {max_dt} AND abs(pb.y - pa.y) <= {max_perp}
    """


def _q47_sql(k: int = 3, w: int = 4) -> str:
    """DuckDB twin of text.winnow_fingerprints (same md5-derived
    60-bit k-gram hashes, same w-window min selection)."""
    return f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
        kg AS (SELECT doc_id, len(ws) - {k - 1} AS n_kg,
                      unnest(range(1, greatest(len(ws) - {k - 1}, 0) + 1))
                          AS i, ws
               FROM d),
        h AS (SELECT doc_id, n_kg, i,
                     CAST(('0x' || substr(md5(
                         array_to_string(ws[i:i+{k - 1}], ' ')), 1, 15))
                         AS BIGINT) AS h
              FROM kg),
        m AS (SELECT doc_id, i, n_kg,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
                         AS mh
              FROM h),
        sel AS (SELECT DISTINCT doc_id, mh FROM m
                WHERE i <= n_kg - {w - 1})
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
               CAST(sum(mh % 1000003) AS BIGINT) AS fp_digest
        FROM sel GROUP BY 1
    """


def oracle_sql() -> dict[str, str]:
    from miaplpy_spark.oracle_fixtures import (banded_inversion_oracle_sql,
                                               cascade_oracle_sql,
                                               compress_oracle_sql,
                                               hourly_oracle_sql,
                                               inversion_oracle_sql)
    inv_sql = inversion_oracle_sql(n_docs=12, n_hours=48)
    return {
        "q30_sequence_cascade": cascade_oracle_sql(n_docs=12, n_slots=960),
        "q44_shp_cascade": cascade_oracle_sql(n_docs=10, n_slots=720),
        "q31_compressed_tier": compress_oracle_sql(n_docs=12, n_slots=960),
        "q45_incremental_cascade": hourly_oracle_sql(n_docs=8, n_slots=720),
        "q49_streaming_cascade": hourly_oracle_sql(n_docs=6, n_slots=480),
        "q50_fused_cascade": cascade_oracle_sql(n_docs=9, n_slots=720),
        "q51_checkpointed_cascade": cascade_oracle_sql(n_docs=7, n_slots=720),
        "q46_retention_tiered_read": hourly_oracle_sql(
            n_docs=8, n_slots=960, mean_only=True),
        "q43_delaunay_network": _q43_sql(),
        # q32/q36 are two-leg unions (see _network_inversion /
        # _robust_inversion): the oracle tags each leg with the same
        # method literal the Spark side adds, so row sets align.
        "q32_network_inversion": (
            f"SELECT *, 'l2' AS method FROM ({inv_sql})"
            " UNION ALL "
            f"SELECT *, 'l2_banded' AS method FROM"
            f" ({banded_inversion_oracle_sql(n_docs=12, n_hours=48)})"),
        "q36_weighted_inversion": (
            f"SELECT *, 'wls' AS method FROM ({inv_sql})"
            " UNION ALL "
            f"SELECT *, 'l1' AS method FROM ({inv_sql})"),
        "q47_winnow_fingerprints": _q47_sql(),
        "q48_cross_source_overlap": """
            SELECT md5(lower(array_to_string(
                       string_split(text, ' ')[1:8], ' '))) AS fp,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources
            FROM documents
            GROUP BY 1 HAVING count(*) >= 2
        """,
        "q42_ivf_ann": _q42_sql(),
        "q52_curate_corpus": _q52_sql(),
        "q29_multimodal_features": _q29_sql(),
        "q39_codec_roundtrip": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
                   count(*) AS n_events,
                   round(round(sum(value), 4) / count(*), 6) AS avg_value
            FROM events GROUP BY 1, 2
        """,
        "q26_minhash_lsh": _q26_sql(),
        "q38_lsh_neardup": _q38_sql(),
        "q27_simhash_pairs": _q27_sql(),
        "q28_lsh_ann": _q28_sql(),
        "q01_tier_rollup_1h": """
            SELECT event_type, date_trunc('hour', ts) AS hour_ts,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value,
                   round(avg(value), 6) AS avg_value,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "q02_tier_rollup_1d": """
            WITH h AS (
                SELECT event_type, date_trunc('hour', ts) AS hour_ts,
                       count(*) AS n, sum(value) AS s
                FROM events GROUP BY 1, 2)
            SELECT event_type, date_trunc('day', hour_ts) AS day_ts,
                   CAST(sum(n) AS BIGINT) AS n_events,
                   round(sum(s), 4) AS sum_value,
                   round(round(sum(s), 4) / sum(n), 6) AS avg_value,
                   count(*) AS n_hours
            FROM h GROUP BY 1, 2
        """,
        "q04_cumsum_daily": """
            WITH d AS (
                SELECT event_type, date_trunc('day', ts) AS day_ts,
                       sum(value) AS s
                FROM events GROUP BY 1, 2)
            SELECT event_type, day_ts,
                   round(sum(s) OVER (PARTITION BY event_type ORDER BY day_ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                       AS cum_value
            FROM d
        """,
        "q05_asof_next_event": """
            WITH g AS (
                SELECT user_id,
                       epoch(lead(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)) - epoch(ts) AS gap_s
                FROM events)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                   round(avg(gap_s), 4) AS avg_gap_s
            FROM g WHERE gap_s IS NOT NULL GROUP BY 1
        """,
        "q06_seq_pairs": """
            WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
            idx AS (SELECT d, row_number() OVER (ORDER BY d) AS i FROM days)
            SELECT a.d AS ref_day, b.d AS sec_day,
                   CAST(b.i - a.i AS BIGINT) AS lag
            FROM idx a JOIN idx b ON b.i - a.i BETWEEN 1 AND 3
        """,
        "q07_single_reference": """
            WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
            idx AS (SELECT d, row_number() OVER (ORDER BY d) AS i,
                           count(*) OVER () AS n FROM days),
            ref AS (SELECT d AS ref_day FROM idx WHERE i = (n + 1) // 2)
            SELECT ref_day, d AS sec_day,
                   CAST(date_diff('day', ref_day, d) AS BIGINT) AS dt_days
            FROM idx, ref WHERE d <> ref_day
        """,
        "q08_anti_join": """
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'click' AND user_id NOT IN
                  (SELECT user_id FROM events WHERE event_type = 'purchase')
        """,
        "q34_ministack_network": """
            WITH days AS (SELECT date_trunc('day', ts) AS d,
                                 round(avg(value), 6) AS bperp
                          FROM events GROUP BY 1),
            mn AS (SELECT min(d) AS d0 FROM days),
            s AS (SELECT d, bperp,
                         CAST(date_diff('day', d0, d) // 7 AS BIGINT) AS wk
                  FROM days, mn),
            idx AS (SELECT d, bperp, wk,
                           row_number() OVER (PARTITION BY wk ORDER BY d) AS i,
                           count(*) OVER (PARTITION BY wk) AS n
                    FROM s),
            ref AS (SELECT wk, d AS ref_day, bperp AS ref_b
                    FROM idx WHERE i = (n + 1) // 2),
            intra AS (SELECT ref_day AS day1, d AS day2,
                             'intra' AS pair_type,
                             round(abs(ref_b - bperp), 6) AS bperp_diff
                      FROM idx JOIN ref USING (wk) WHERE d <> ref_day),
            lastd AS (SELECT wk + 1 AS wk, d AS last_day, bperp AS last_b
                      FROM idx WHERE i = n),
            conn AS (SELECT last_day AS day1, d AS day2,
                            'short_baseline' AS pair_type,
                            round(abs(last_b - bperp), 6) AS bperp_diff,
                            row_number() OVER (PARTITION BY idx.wk
                                  ORDER BY abs(last_b - bperp), d) AS rk
                     FROM idx JOIN lastd USING (wk)),
            datum AS (SELECT a.ref_day AS day1, b.ref_day AS day2,
                             'datum' AS pair_type,
                             round(abs(a.ref_b - b.ref_b), 6) AS bperp_diff
                      FROM ref a JOIN ref b ON b.wk = a.wk + 1)
            SELECT day1, day2, pair_type, bperp_diff FROM intra
            UNION ALL
            SELECT day1, day2, pair_type, bperp_diff FROM conn WHERE rk = 1
            UNION ALL
            SELECT day1, day2, pair_type, bperp_diff FROM datum
        """,
        "q35_tolerance_asof": """
            WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d
                          FROM events)
            SELECT a.d AS ref_day,
                   min_by(b.d, date_diff('day', a.d, b.d)) AS sec_day,
                   CAST(min(date_diff('day', a.d, b.d)) AS BIGINT) AS dt_days
            FROM days a JOIN days b
                 ON date_diff('day', a.d, b.d) BETWEEN 6 AND 8
            GROUP BY 1
        """,
        "q09_masked_agg": """
            SELECT l_returnflag, round(sum(v), 2) AS revenue,
                   CAST(count(v) AS BIGINT) AS n_kept,
                   CAST(count(*) AS BIGINT) AS n_total
            FROM (SELECT l_returnflag,
                         CASE WHEN l_discount BETWEEN 0.05 AND 0.07
                                   AND l_quantity < 24
                              THEN l_extendedprice * l_discount END AS v
                  FROM lineitem) GROUP BY 1
        """,
        "q10_quality_mask": """
            SELECT event_type, round(avg(value), 6) AS avg_value
            FROM events GROUP BY 1
            HAVING round(avg(value), 6) >= 40.0
        """,
        "q11_amp_dispersion": """
            SELECT event_type,
                   round(least(stddev_samp(value) / avg(value), 1.0), 6)
                       AS amp_disp,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        """,
        "q12_sliding_mean": """
            WITH d AS (
                SELECT event_type, date_trunc('day', ts) AS day_ts,
                       avg(value) AS v
                FROM events GROUP BY 1, 2)
            SELECT event_type, day_ts,
                   round(avg(v) OVER (PARTITION BY event_type ORDER BY day_ts
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 6)
                       AS smooth_value
            FROM d
        """,
        "q13_ref_subtract": """
            WITH f AS (SELECT event_type, min(date_trunc('day', ts)) AS d0
                       FROM events GROUP BY 1),
            r AS (SELECT e.event_type AS et, avg(e.value) AS ref_v
                  FROM events e JOIN f ON e.event_type = f.event_type
                       AND date_trunc('day', e.ts) = f.d0 GROUP BY 1),
            d AS (SELECT event_type, date_trunc('day', ts) AS day_ts,
                         avg(value) AS v FROM events GROUP BY 1, 2)
            SELECT d.event_type, d.day_ts,
                   round(d.v - r.ref_v, 6) AS rel_value
            FROM d JOIN r ON d.event_type = r.et
        """,
        "q14_top_users": """
            SELECT user_id, round(sum(value), 4) AS total_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1 ORDER BY total_value DESC, user_id LIMIT 10
        """,
        "q15_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "q16_revenue_by_nation": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "q17_props_sum": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6)
                       AS avg_k
            FROM events GROUP BY 1
        """,
        "q18_token_count": """
            SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   CAST(length(text) AS BIGINT) AS n_chars_actual,
                   CAST(n_chars AS BIGINT) AS n_chars_meta
            FROM documents
        """,
        "q19_text_quality": """
            WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                       FROM documents),
            a AS (SELECT doc_id,
                         CAST(count(*) AS BIGINT) AS n_words,
                         CAST(count(DISTINCT w) AS BIGINT) AS n_distinct,
                         round(avg(length(w)), 6) AS avg_word_len,
                         CAST(sum(CASE WHEN w IN ('a','the','of','and','to','in')
                                  THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
                  FROM w GROUP BY 1)
            SELECT doc_id, n_words, n_distinct, avg_word_len,
                   round(n_distinct * 1.0 / n_words, 6) AS ttr,
                   round(n_stop * 1.0 / n_words, 6) AS stopword_ratio
            FROM a
        """,
        "q20_lang_profile": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   round(avg(n_chars), 6) AS avg_chars,
                   round(avg(len(string_split(text, ' '))), 6) AS avg_words
            FROM documents GROUP BY 1
        """,
        "q21_fingerprint_dups": """
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
                   CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dups
            FROM (SELECT source, md5(lower(text)) AS fp FROM documents)
            GROUP BY 1
        """,
        "q40_bpe_token_count": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text),
                        '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
                       AS n_bpe_tokens,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
                   round(len(regexp_extract_all(lower(text),
                         '[a-z]+|[0-9]+|[^a-z0-9\s]')) * 1.0 /
                         len(string_split(text, ' ')), 6) AS fertility
            FROM documents
        """,
        "q41_lang_id": """
            WITH s AS (
                SELECT doc_id, lang,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                       len(list_filter(string_split(text, ' '), x ->
                           list_contains(['customer','join','column','batch','group','key'], x))) AS c_de,
                       len(list_filter(string_split(text, ' '), x ->
                           list_contains(['the','order','table','window','row','hash'], x))) AS c_en,
                       len(list_filter(string_split(text, ' '), x ->
                           list_contains(['slow','agg','merge','vector','value','query'], x))) AS c_es,
                       len(list_filter(string_split(text, ' '), x ->
                           list_contains(['scan','data','query','batch','small','line'], x))) AS c_fr,
                       len(list_filter(string_split(text, ' '), x ->
                           list_contains(['join','small','row','column','part','filter'], x))) AS c_zh
                FROM documents),
            m AS (SELECT *, greatest(c_de, c_en, c_es, c_fr, c_zh) AS top
                  FROM s)
            SELECT doc_id, lang,
                   CASE WHEN c_de = top THEN 'de'
                        WHEN c_en = top THEN 'en'
                        WHEN c_es = top THEN 'es'
                        WHEN c_fr = top THEN 'fr'
                        ELSE 'zh' END AS pred_lang,
                   CAST(top AS BIGINT) AS top_hits,
                   n_words
            FROM m
        """,
        "q22_shingle_jaccard": """
            WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
                       FROM documents WHERE lang = 'zh'),
            sh AS (SELECT DISTINCT doc_id, lang, unnest(
                          list_transform(range(1, len(ws)),
                                         i -> array_to_string(ws[i:i+1], ' ')))
                          AS sh
                   FROM d),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            i AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
                         count(*) AS inter
                  FROM sh a JOIN sh b ON a.sh = b.sh AND a.lang = b.lang
                       AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
            SELECT doc1, doc2,
                   round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM i JOIN sz sa ON doc1 = sa.doc_id
                   JOIN sz sb ON doc2 = sb.doc_id
            WHERE round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) >= 0.04
        """,
        "q23_embed_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 20),
            c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv
                  FROM embeddings),
            p AS (SELECT qid, nid,
                         round(list_dot_product(qv, nv) /
                               (sqrt(list_dot_product(qv, qv)) *
                                sqrt(list_dot_product(nv, nv))), 4) AS sim
                  FROM q, c WHERE qid <> nid),
            r AS (SELECT qid, nid, sim,
                         row_number() OVER (PARTITION BY qid
                               ORDER BY sim DESC, nid) AS rk FROM p)
            SELECT qid, nid, sim, CAST(rk AS BIGINT) AS rk
            FROM r WHERE rk <= 5
        """,
        "q24_embed_neardup": """
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   round(list_dot_product(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                                a.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(b.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]))), 4)
                       AS sim
            FROM embeddings a JOIN embeddings b
                 ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) /
                        (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                               a.embedding::DOUBLE[])) *
                         sqrt(list_dot_product(b.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]))), 4)
                  >= 0.35
        """,
        "q33_gapfill_interp": """
            WITH hourly AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
                       avg(value) AS v
                FROM events GROUP BY 1, 2),
            grid AS (
                SELECT event_type, unnest(range(min(h), max(h) + 1)) AS h
                FROM hourly GROUP BY event_type),
            g AS (
                SELECT grid.event_type, grid.h, hourly.v
                FROM grid LEFT JOIN hourly
                     ON grid.event_type = hourly.event_type
                     AND grid.h = hourly.h),
            f AS (
                SELECT event_type, h, v,
                       last_value(v IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS vp,
                       last_value(CASE WHEN v IS NOT NULL THEN h END
                                  IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS hp,
                       first_value(v IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                           AS vn,
                       first_value(CASE WHEN v IS NOT NULL THEN h END
                                   IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY h
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                           AS hn
                FROM g)
            SELECT event_type, h,
                   round(CASE WHEN v IS NOT NULL THEN v
                              WHEN vp IS NULL THEN vn
                              WHEN vn IS NULL THEN vp
                              ELSE vp + (vn - vp) * (h - hp) / (hn - hp)
                         END, 6) AS filled_value,
                   v IS NULL AS was_missing
            FROM f
        """,
        "q25_label_centroids": """
            SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                   round(avg(embedding[1]), 6) AS c0,
                   round(avg(embedding[2]), 6) AS c1,
                   round(avg(embedding[3]), 6) AS c2,
                   round(avg(embedding[4]), 6) AS c3
            FROM embeddings GROUP BY 1
        """,
    }
