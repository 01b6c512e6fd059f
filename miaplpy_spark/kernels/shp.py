"""Statistically-homogeneous-neighbor (SHP) membership tests.

The reference decides rollup-group membership with a two-sample KS test
of amplitude distributions against a precomputed critical distance
(get_shp_row_col_c, /root/reference/src/miaplpy/lib/utils.pyx:903-998;
ks_lut_cy, lib/utils.pyx:859-877). Here the test is vectorized with
``np.searchsorted`` over whole batches; the LUT threshold is computed
once on the driver and captured in the UDF closure (constant hoisting,
SURVEY.md P7).
"""

from __future__ import annotations

import numpy as np


def ks_lut(n1: int, n2: int, alpha: float = 0.05) -> float:
    """Critical KS distance: smallest d in [0.01, 1) step 0.001 whose
    asymptotic p-value (2·Σ_{t=1..100}(−1)^{t−1}exp(−2v²t²) with
    v = d·(√N+0.12+0.11/√N), N = n1·n2/(n1+n2)) is <= alpha."""
    N = (n1 * n2) / (n1 + n2)
    distances = np.arange(0.01, 1, 0.001, dtype=np.float32)
    value = distances * (np.sqrt(N) + 0.12 + 0.11 / np.sqrt(N))
    t = np.arange(1, 101, dtype=np.float64)
    terms = ((-1.0) ** (t - 1))[None, :] * np.exp(
        -2.0 * (value[:, None] ** 2) * (t[None, :] ** 2)
    )
    pvalue = np.clip(2.0 * terms.sum(axis=1), 0.0, 1.0)
    hits = np.nonzero(pvalue <= alpha)[0]
    return float(distances[hits[0]]) if hits.size else 0.1


def ecdf_distance(data1: np.ndarray, data2: np.ndarray) -> float:
    """Max ECDF gap between two SORTED same-length 1-D samples."""
    data_all = np.sort(np.concatenate([data1, data2]))
    nx = data1.shape[0]
    cdf1 = np.searchsorted(data1, data_all, side="right")
    cdf2 = np.searchsorted(data2, data_all, side="right")
    return float(np.max(np.abs(cdf1 - cdf2)) / nx)


def ks2_sample_test(ref_sorted: np.ndarray, test_sorted: np.ndarray,
                    threshold: float) -> bool:
    """1 = same distribution (distance <= critical threshold)."""
    return ecdf_distance(ref_sorted, test_sorted) <= threshold


def ecdf_distance_batch(ref_sorted: np.ndarray, tests_sorted: np.ndarray) -> np.ndarray:
    """Distance of one sorted reference (N,) against a batch of sorted
    candidates (B, N) — vectorized over the batch."""
    B, N = tests_sorted.shape
    ref_tiled = np.broadcast_to(ref_sorted, (B, N))
    data_all = np.sort(np.concatenate([ref_tiled, tests_sorted], axis=1), axis=1)
    out = np.empty(B, dtype=np.float64)
    for b in range(B):  # searchsorted has no batched axis; N is tiny (<=stack depth)
        c1 = np.searchsorted(ref_sorted, data_all[b], side="right")
        c2 = np.searchsorted(tests_sorted[b], data_all[b], side="right")
        out[b] = np.max(np.abs(c1 - c2)) / N
    return out
