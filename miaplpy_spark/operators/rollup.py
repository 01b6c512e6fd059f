"""Windowed rollup kernels: raw -> 1h and 1h -> 1d tiers.

Execution shape (the engine's core design decision):

    obs.repartition(n_buckets, "bucket")
       .sortWithinPartitions("doc_id", "slot")
       .mapInPandas(kernel, TIER_SCHEMA)

NOT ``groupBy(doc, window).applyInPandas`` — that would invoke Python
once per (doc, window) group (~10 rows each), re-creating the
reference's per-pixel-loop bottleneck (lib/utils.pyx:1110-1187) that
capped its scaling efficiency at 0.55-0.63. Instead each Arrow batch
carries thousands of complete windows; the kernel reshapes them into
one (G, T, S) stack and runs ONE batched eigendecomposition
(SURVEY.md P3/P8: the reference's "vectorize the common case" trick,
promoted to the whole pipeline).

Window semantics: each 1h window (= 10 raw slots = one mini-stack,
defaults/miaplpyApp_auto.cfg:19) is phase-linked independently and
emits its squeezed carry (squeeze_images, lib/utils.pyx:470-487); the
1d tier re-links the 24 carries and applies the datum adjustment
(datum_connect, lib/utils.pyx:732-796). Independent windows + datum is
the reference's own 'mini_stacks' composition and is what makes the
cascade embarrassingly parallel; the strict prepend-the-carry
sequential mode (lib/utils.pyx:641-660) is available in
kernels.phase_linking.sequential_phase_linking for exact-equivalence
tests.

Gap handling: aggregates cover PRESENT rows only; the eigen ensemble
is gap-filled by vectorized linear interpolation (north_rule; the
filled count is exposed as ``n_filled``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import EngineConfig
from ..kernels import phase_linking as pl
from ..kernels.gapfill import fill_dense_batch

ROLLUP_1H_SCHEMA = (
    "doc_id string, source string, bucket int, hour_ts timestamp, "
    "hour_idx int, n_obs int, n_filled int, sum_tok long, min_tok int, "
    "max_tok int, mean_ntok double, linked_phase array<float>, "
    "squeezed_re array<float>, squeezed_im array<float>, quality float"
)

ROLLUP_1D_SCHEMA = (
    "doc_id string, source string, bucket int, day_ts timestamp, "
    "day_idx int, n_hours int, n_obs int, n_filled int, sum_tok long, "
    "min_tok int, max_tok int, mean_ntok double, mean_quality_1h double, "
    "quality_1d float, datum_shift array<float>, "
    "adjusted_phase array<float>, squeezed_re array<float>, "
    "squeezed_im array<float>"
)


def _group_starts(doc: np.ndarray, win: np.ndarray) -> np.ndarray:
    chg = np.empty(doc.shape[0], dtype=bool)
    chg[0] = True
    chg[1:] = (doc[1:] != doc[:-1]) | (win[1:] != win[:-1])
    return np.flatnonzero(chg)


def _link_batch(Z: np.ndarray, method: str, lag: int = 0):
    """(G, T, S) ensemble -> (vec (G,T), quality (G,), squeezed (G,S)).

    Batched correlation + regularization + EMI-with-EVD-fallback; the
    squeeze is one einsum over the whole batch.
    """
    coh = pl.est_corr_batch(Z)
    if method == "SBW":
        n = coh.shape[-1]
        i = np.arange(n)
        band = np.abs(i[:, None] - i[None, :]) < lag
        coh = np.where(band[None], coh, 0).astype(np.complex64)

    G, T = coh.shape[0], coh.shape[1]
    vec = np.empty((G, T), dtype=np.complex64)
    if method in ("EMI", "sequential_EMI", "PTA", "sequential_PTA", "SBW"):
        status, abscoh = pl.regularize_matrix_batch(np.abs(coh).astype(np.float32))
        ok = status == 0
        if ok.any():
            try:
                vec[ok] = pl.emi_phase_batch(coh[ok], abscoh[ok])
            except np.linalg.LinAlgError:
                # a matrix can pass the float32 Cholesky probe yet be
                # singular to float64 inv (e.g. duplicate rows from
                # edge-extended gap-fill); downgrade those to EVD —
                # the reference's fallback chain (lib/utils.pyx:538-551)
                for b in np.flatnonzero(ok):
                    try:
                        vec[b] = pl.emi_phase(coh[b], abscoh[b])
                    except np.linalg.LinAlgError:
                        vec[b] = pl.evd_phase(coh[b])
        if (~ok).any():
            vec[~ok] = pl.evd_phase_batch(coh[~ok])
    else:
        vec = pl.evd_phase_batch(coh)

    quality = pl.gam_pta_batch(np.angle(coh), vec)
    vm = np.exp(1j * np.angle(vec)).astype(np.complex64)
    squeezed = np.einsum("gts,gt->gs", Z, vm.conj(), optimize=True) / np.sqrt(T)
    return vec, quality, squeezed.astype(np.complex64)


def _carry_iter(batches: Iterator[pd.DataFrame], win_of, process):
    """Shared batch-carry loop: hold back the (possibly incomplete)
    last group of each Arrow batch; flush it at partition end. Rows
    arrive sorted by (doc_id, window) within the partition."""
    carry = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        doc = pdf["doc_id"].to_numpy()
        win = win_of(pdf)
        starts = _group_starts(doc, win)
        last = starts[-1]
        if last == 0:
            carry = pdf
            continue
        carry = pdf.iloc[last:].reset_index(drop=True)
        yield process(pdf.iloc[:last])
    if carry is not None and len(carry):
        yield process(carry)


def make_rollup_1h_kernel(cfg: EngineConfig):
    T, S = cfg.slots_per_hour, cfg.n_samples
    epoch0, hour_seconds = cfg.epoch0, cfg.hour_seconds
    method, lag = cfg.method, cfg.sbw_lag

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        doc = pdf["doc_id"].to_numpy()
        slot = pdf["slot"].to_numpy()
        hour = slot // T
        sih = slot % T
        starts = _group_starts(doc, hour)
        G = starts.shape[0]
        gid = np.cumsum(
            np.concatenate([[True], (doc[1:] != doc[:-1]) | (hour[1:] != hour[:-1])])
        ) - 1

        z = (np.stack(pdf["z_re"].to_numpy()).astype(np.float32)
             + 1j * np.stack(pdf["z_im"].to_numpy()).astype(np.float32))

        dense = np.zeros((G, T, S), dtype=np.complex64)
        present = np.zeros((G, T), dtype=bool)
        dense[gid, sih] = z
        present[gid, sih] = True

        re = fill_dense_batch(dense.real.astype(np.float64), present)
        im = fill_dense_batch(dense.imag.astype(np.float64), present)
        Z = (re + 1j * im).astype(np.complex64)

        vec, quality, squeezed = _link_batch(Z, method, lag)

        ends = np.append(starts[1:], n)
        n_obs = (ends - starts).astype(np.int32)
        sum_tok = np.add.reduceat(pdf["sum_tok"].to_numpy(), starts)
        min_tok = np.minimum.reduceat(pdf["min_tok"].to_numpy(), starts)
        max_tok = np.maximum.reduceat(pdf["max_tok"].to_numpy(), starts)
        ntok = pdf["n_tok"].to_numpy().astype(np.float64)
        mean_ntok = np.add.reduceat(ntok, starts) / n_obs

        hour_g = hour[starts]
        lp = np.angle(vec).astype(np.float32)
        return pd.DataFrame({
            "doc_id": doc[starts],
            "source": pdf["source"].to_numpy()[starts],
            "bucket": pdf["bucket"].to_numpy()[starts],
            "hour_ts": pd.to_datetime(epoch0 + hour_g * hour_seconds, unit="s"),
            "hour_idx": hour_g.astype(np.int32),
            "n_obs": n_obs,
            "n_filled": (T - n_obs).astype(np.int32),
            "sum_tok": sum_tok.astype(np.int64),
            "min_tok": min_tok.astype(np.int32),
            "max_tok": max_tok.astype(np.int32),
            "mean_ntok": mean_ntok,
            "linked_phase": list(lp),
            "squeezed_re": list(squeezed.real.astype(np.float32)),
            "squeezed_im": list(squeezed.imag.astype(np.float32)),
            "quality": quality,
        })

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _carry_iter(
            batches, lambda pdf: pdf["slot"].to_numpy() // T, process
        )

    return kernel


def rollup_1h(obs: DataFrame, cfg: EngineConfig = EngineConfig(),
              num_partitions: int | None = None) -> DataFrame:
    """raw observations -> 1h tier. One shuffle (by bucket), then the
    kernel runs map-side; output stays partitioned by bucket for the
    1d tier and the MERGE write (partitioning reuse, no second
    shuffle)."""
    p = num_partitions or cfg.n_buckets
    return (obs.repartition(p, "bucket")
               .sortWithinPartitions("doc_id", "slot")
               .mapInPandas(make_rollup_1h_kernel(cfg), ROLLUP_1H_SCHEMA))


def make_rollup_1d_kernel(cfg: EngineConfig):
    H, S, T = cfg.hours_per_day, cfg.n_samples, cfg.slots_per_hour
    epoch0, day_seconds = cfg.epoch0, cfg.day_seconds
    method = cfg.method

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        doc = pdf["doc_id"].to_numpy()
        hour_idx = pdf["hour_idx"].to_numpy()
        day = hour_idx // H
        hid = hour_idx % H
        starts = _group_starts(doc, day)
        G = starts.shape[0]
        gid = np.cumsum(
            np.concatenate([[True], (doc[1:] != doc[:-1]) | (day[1:] != day[:-1])])
        ) - 1

        sq = (np.stack(pdf["squeezed_re"].to_numpy()).astype(np.float32)
              + 1j * np.stack(pdf["squeezed_im"].to_numpy()).astype(np.float32))
        lp_h = np.stack(pdf["linked_phase"].to_numpy()).astype(np.float32)

        dense = np.zeros((G, H, S), dtype=np.complex64)
        present = np.zeros((G, H), dtype=bool)
        dense[gid, hid] = sq
        present[gid, hid] = True
        re = fill_dense_batch(dense.real.astype(np.float64), present)
        im = fill_dense_batch(dense.imag.astype(np.float64), present)
        SQ = (re + 1j * im).astype(np.complex64)

        # datum pass: re-link the squeezed carries (datum_connect A11)
        vec, quality_1d, day_squeezed = _link_batch(SQ, method)
        datum = np.angle(vec).astype(np.float32)  # (G, H)

        # adjusted series: hourly linked phase + datum shift, rewrapped
        lp_dense = np.zeros((G, H, T), dtype=np.float32)
        lp_dense[gid, hid] = lp_h
        adj = np.angle(np.exp(1j * (lp_dense + datum[:, :, None]))).astype(np.float32)
        adj = adj.reshape(G, H * T)

        ends = np.append(starts[1:], n)
        n_hours = (ends - starts).astype(np.int32)
        n_obs = np.add.reduceat(pdf["n_obs"].to_numpy(), starts).astype(np.int32)
        n_filled = np.add.reduceat(pdf["n_filled"].to_numpy(), starts).astype(np.int32)
        sum_tok = np.add.reduceat(pdf["sum_tok"].to_numpy(), starts)
        min_tok = np.minimum.reduceat(pdf["min_tok"].to_numpy(), starts)
        max_tok = np.maximum.reduceat(pdf["max_tok"].to_numpy(), starts)
        w_mean = (np.add.reduceat(
            pdf["mean_ntok"].to_numpy() * pdf["n_obs"].to_numpy(), starts) / n_obs)
        mean_q = np.add.reduceat(pdf["quality"].to_numpy().astype(np.float64),
                                 starts) / n_hours

        day_g = day[starts]
        return pd.DataFrame({
            "doc_id": doc[starts],
            "source": pdf["source"].to_numpy()[starts],
            "bucket": pdf["bucket"].to_numpy()[starts],
            "day_ts": pd.to_datetime(epoch0 + day_g * day_seconds, unit="s"),
            "day_idx": day_g.astype(np.int32),
            "n_hours": n_hours,
            "n_obs": n_obs,
            "n_filled": n_filled,
            "sum_tok": sum_tok.astype(np.int64),
            "min_tok": min_tok.astype(np.int32),
            "max_tok": max_tok.astype(np.int32),
            "mean_ntok": w_mean,
            "mean_quality_1h": mean_q,
            "quality_1d": quality_1d,
            "datum_shift": list(datum),
            "adjusted_phase": list(adj),
            "squeezed_re": list(day_squeezed.real.astype(np.float32)),
            "squeezed_im": list(day_squeezed.imag.astype(np.float32)),
        })

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _carry_iter(
            batches, lambda pdf: pdf["hour_idx"].to_numpy() // H, process
        )

    return kernel


def rollup_1d(df_1h: DataFrame, cfg: EngineConfig = EngineConfig(),
              num_partitions: int | None = None) -> DataFrame:
    p = num_partitions or cfg.n_buckets
    return (df_1h.repartition(p, "bucket")
                 .sortWithinPartitions("doc_id", "hour_idx")
                 .mapInPandas(make_rollup_1d_kernel(cfg), ROLLUP_1D_SCHEMA))
