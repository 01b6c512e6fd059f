"""Network inversion operator: per-doc pairwise phase network ->
least-squares time series (the reference's final pipeline stage,
network_inversion.py -> dev/ifgram_inversion_L1L2.py, grafted onto the
hourly tier).

Graft: the per-pixel stack of unwrapped interferograms becomes, per
doc, the sequential pair network over its hourly linked phases
(connNum=3 banded pairs, J1 semantics); the design matrix is built
ONCE on the driver and captured in the kernel closure (constant
hoisting P7, the reference builds it once at :1466); the solve batches
every doc with the same window count through one lstsq (P3's
vectorized whole-box fast path).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import EngineConfig
from ..kernels.lstsq import (
    design_matrices,
    estimate_timeseries_batch,
    network_temporal_coherence,
)
from .rollup import _pa_schema

INVERSION_SCHEMA = (
    "doc_id string, source string, bucket int, n_hours int, "
    "ts_series array<float>, inv_quality float"
)


def sequential_pairs_idx(n: int, conn: int = 3) -> list[tuple[int, int]]:
    """J1 banded pair network over window indexes 0..n-1."""
    return [(i, j) for i in range(n) for j in range(i + 1, min(i + conn + 1, n))]


def invert_network(df_1h: DataFrame, cfg: EngineConfig = EngineConfig(),
                   conn: int = 3, num_partitions: int | None = None) -> DataFrame:
    """hourly tier -> per-doc inverted time series + network temporal
    coherence. One exchange (by bucket); per-doc phase series assembled
    in the kernel; docs sharing a window count solve in one batch."""
    theta = F.atan2(
        F.aggregate(F.transform("linked_phase", lambda x: F.sin(x)),
                    F.lit(0.0), lambda a, x: a + x),
        F.aggregate(F.transform("linked_phase", lambda x: F.cos(x)),
                    F.lit(0.0), lambda a, x: a + x))
    slim = df_1h.select(
        "doc_id",
        F.xxhash64("doc_id").alias("doc_key"),
        "source", "bucket", "hour_idx",
        theta.cast("double").alias("theta"))

    out_schema = _pa_schema(INVERSION_SCHEMA)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # accumulate whole partition: per-doc series are tiny (one
        # scalar per hour) so partition state is bounded
        doc_key, hour, th = [], [], []
        doc_id, source, bucket = [], [], []
        seen = {}
        for batch in batches:
            dk = batch.column("doc_key").to_numpy()
            doc_key.append(dk)
            hour.append(batch.column("hour_idx").to_numpy())
            th.append(batch.column("theta").to_numpy())
            ids = batch.column("doc_id")
            srcs = batch.column("source")
            bks = batch.column("bucket").to_numpy()
            for i in range(len(dk)):
                k = int(dk[i])
                if k not in seen:
                    seen[k] = (ids[i].as_py(), srcs[i].as_py(), int(bks[i]))
        if not doc_key:
            return
        dk = np.concatenate(doc_key)
        hr = np.concatenate(hour)
        t = np.concatenate(th)
        order = np.lexsort((hr, dk))
        dk, hr, t = dk[order], hr[order], t[order]
        starts = np.flatnonzero(np.concatenate([[True], dk[1:] != dk[:-1]]))
        ends = np.append(starts[1:], dk.shape[0])

        by_n: dict[int, list[int]] = {}
        for g, (s, e) in enumerate(zip(starts, ends)):
            by_n.setdefault(int(e - s), []).append(g)

        rows = {k: [] for k in ("doc_id", "source", "bucket", "n_hours",
                                "ts_series", "inv_quality")}
        for n, groups in by_n.items():
            if n < 2:
                continue
            pairs = sequential_pairs_idx(n, conn)
            tbase = np.arange(n, dtype=np.float64)
            A, _ = design_matrices(pairs, tbase)
            Y = np.empty((len(pairs), len(groups)))
            for c, g in enumerate(groups):
                s = starts[g]
                series = t[s:s + n]
                diffs = np.array([series[j] - series[i] for i, j in pairs])
                Y[:, c] = np.angle(np.exp(1j * diffs))  # rewrap idiom
            ts = estimate_timeseries_batch(A, Y)
            q = network_temporal_coherence(A, ts[1:], Y)
            for c, g in enumerate(groups):
                k = int(dk[starts[g]])
                did, src, bk = seen[k]
                rows["doc_id"].append(did)
                rows["source"].append(src)
                rows["bucket"].append(bk)
                rows["n_hours"].append(n)
                rows["ts_series"].append(ts[:, c].astype(np.float32))
                rows["inv_quality"].append(float(q[c]))
        if not rows["doc_id"]:
            return
        G = len(rows["doc_id"])
        flat, offsets, off = [], [0], 0
        for a in rows["ts_series"]:
            flat.append(a)
            off += len(a)
            offsets.append(off)
        arrays = [
            pa.array(rows["doc_id"], pa.string()),
            pa.array(rows["source"], pa.string()),
            pa.array(rows["bucket"], pa.int32()),
            pa.array(rows["n_hours"], pa.int32()),
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     pa.array(np.concatenate(flat))),
            pa.array(np.array(rows["inv_quality"], dtype=np.float32)),
        ]
        yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    # partition by doc_key (not bucket): the inversion groups WHOLE
    # docs, and under salt_by_day a doc's hourly rows span buckets
    p = num_partitions or cfg.n_buckets
    return (slim.repartition(p, "doc_key")
                .mapInArrow(kernel, INVERSION_SCHEMA))
