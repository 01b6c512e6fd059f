#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for
the driver; this file holds the extra instrumentation the optimization
guide §1 calls for: per-query isolation with the noop sink, plan
capture, and subsets of the headline set so a single query can be
re-measured quickly).

Usage:
  python bench_extra.py queries [name ...]   # noop-timed queries (min of N)
  python bench_extra.py plans  [name ...]    # write explain("formatted")
                                             #   to plans/r06/<q>_<tag>.txt
  python bench_extra.py cascade              # engine cascade / shp / invert
All timings use the same session config as bench.py (same master,
shuffle partitions, /dev/shm spill dir, scaled driver heap).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("BENCH_QUERY_ROUNDS", "3"))
TAG = os.environ.get("PLAN_TAG", "before")

HEADLINE = [
    "q01_tier_rollup_1h", "q02_tier_rollup_1d", "q04_cumsum_daily",
    "q05_asof_next_event", "q15_pricing_summary", "q16_revenue_by_nation",
    "q19_text_quality", "q22_shingle_jaccard", "q23_embed_topk",
    "q26_minhash_lsh", "q42_ivf_ann", "q52_curate_corpus",
]


def _get_spark(cores: int = CPUS):
    from miaplpy_spark.session import get_spark

    local_dir = (f"/dev/shm/spark-bx-{os.getpid()}"
                 if os.path.isdir("/dev/shm") else None)
    extra = {"spark.local.dir": local_dir} if local_dir else {}
    if "SPARK_DRIVER_MEM" not in os.environ:
        extra["spark.driver.memory"] = f"{max(8, (3 * cores) // 4)}g"
    return get_spark(app_name=f"bench_extra[{cores}]",
                     master=f"local[{cores}]",
                     shuffle_partitions=max(2 * cores, 128),
                     extra_conf=extra)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_queries(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    os.environ.setdefault("SPARK_GRAFT_SF_DIR_T2", SF_DIR)
    spark = _get_spark()
    qs = entrymod.queries()
    names = names or HEADLINE
    # warmup: same as bench.py (first query once, untimed)
    qs[names[0]](spark, SF_DIR).count()
    samples = {n: [] for n in names}
    for _ in range(ROUNDS):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "mins": {n: min(v) for n, v in samples.items()},
        "samples": samples, "sf_dir": SF_DIR}))
    spark.stop()


def dump_plans(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    os.environ.setdefault("SPARK_GRAFT_SF_DIR_T2", SF_DIR)
    spark = _get_spark()
    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names or HEADLINE:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{TAG}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


def time_cascade(which: list[str]) -> None:
    import bench as benchmod

    spark = _get_spark()
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bx_obs_") + "/obs"
    benchmod.prepare_input(spark, tmp)
    out = {}
    which = which or ["cascade", "shp", "invert", "wls", "l1"]
    n = int(os.environ.get("BENCH_CASCADE_RUNS", "4"))
    if "cascade" in which:
        runs = [benchmod.run_cascade_timed(spark, tmp) for _ in range(n)]
        out["cascade"] = min(r["t_total_s"] for r in runs)
        out["cascade_all"] = [r["t_total_s"] for r in runs]
    if "shp" in which:
        runs = [benchmod.run_cascade_timed(spark, tmp, shp_filter=True)
                for _ in range(n)]
        out["cascade_shp"] = min(r["t_total_s"] for r in runs)
        out["cascade_shp_all"] = [r["t_total_s"] for r in runs]
    if {"invert", "wls", "l1"} & set(which):
        from miaplpy_spark.operators.rollup import attach_doc_dim, rollup_1h
        cfg, _ = benchmod._bench_cfg_spec()
        tier_dir = tmp + "_1h"
        attach_doc_dim(
            rollup_1h(spark.read.parquet(tmp), cfg),
            spark.read.parquet(tmp + "_dim")
        ).write.mode("overwrite").parquet(tier_dir)
        for key, method in (("invert", "L2"), ("wls", "WLS"), ("l1", "L1")):
            if key not in which:
                continue
            runs = [benchmod.run_invert_timed(spark, tier_dir, method)
                    for _ in range(max(3, n - 1))]
            out[key] = min(r["t_total_s"] for r in runs)
            out[key + "_all"] = [r["t_total_s"] for r in runs]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if mode == "queries":
        time_queries(rest)
    elif mode == "plans":
        dump_plans(rest)
    elif mode == "cascade":
        time_cascade(rest)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
