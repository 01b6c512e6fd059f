"""Delaunay network kernel tests (J3, pure NumPy Bowyer-Watson)."""

import numpy as np
import pytest

from miaplpy_spark.kernels.delaunay import (
    delaunay_edges,
    delaunay_pairs,
    delaunay_triangles,
)


def test_square_has_five_edges():
    pts = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=float)
    e = delaunay_edges(pts)
    assert len(e) == 5  # 4 sides + 1 diagonal
    sides = {(0, 1), (0, 2), (1, 3), (2, 3)}
    assert sides <= e


def test_triangle_count_euler():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 100, (40, 2))
    tris = delaunay_triangles(pts)
    edges = delaunay_edges(pts)
    # planar triangulation of n points with h hull points:
    # T = 2n - 2 - h, E = 3n - 3 - h  =>  E - T = n - 1
    assert len(edges) - len(tris) == len(pts) - 1
    assert len(edges) <= 3 * len(pts) - 6


def test_empty_circumcircle_property_sampled():
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 10, (25, 2))
    tris = delaunay_triangles(pts)
    from miaplpy_spark.kernels.delaunay import _circumcircle_contains
    for t in tris[:10]:
        tri = pts[list(t)]
        for k in range(25):
            if k in t:
                continue
            assert not _circumcircle_contains(tri, pts[k]), (t, k)


def _exact_delaunay_edges(pts: np.ndarray) -> set:
    """Oracle by definition: edge (a,b) is Delaunay iff some triangle
    (a,b,c) has a circumcircle strictly empty of other points — the
    same O(n^4) characterization the driver's q43 DuckDB oracle runs."""
    n = pts.shape[0]
    edges = set()
    for a in range(n):
        for b in range(a + 1, n):
            for c in range(b + 1, n):
                A, B, C = pts[a], pts[b], pts[c]
                dd = 2 * (A[0] * (B[1] - C[1]) + B[0] * (C[1] - A[1])
                          + C[0] * (A[1] - B[1]))
                if abs(dd) < 1e-12:
                    continue
                sa, sb, sc = (A @ A), (B @ B), (C @ C)
                ux = (sa * (B[1] - C[1]) + sb * (C[1] - A[1])
                      + sc * (A[1] - B[1])) / dd
                uy = (sa * (C[0] - B[0]) + sb * (A[0] - C[0])
                      + sc * (B[0] - A[0])) / dd
                r2 = (A[0] - ux) ** 2 + (A[1] - uy) ** 2
                d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
                d2[[a, b, c]] = np.inf
                if (d2 < r2).any():
                    continue
                edges.update({(a, b), (b, c), (a, c)})
    return edges


@pytest.mark.parametrize("seed,n", [(0, 12), (1, 20), (2, 30), (3, 25)])
def test_matches_exact_empty_circumcircle_definition(seed, n):
    """Bowyer-Watson output == the definitional Delaunay edge set
    (guards super-triangle finiteness artifacts on skewed clouds; the
    x-axis spread vs y-axis spread mirrors the (days, bperp) plane)."""
    rng = np.random.default_rng(seed)
    pts = np.column_stack([rng.uniform(0, 30, n), rng.uniform(40, 60, n)])
    assert delaunay_edges(pts) == _exact_delaunay_edges(pts)


def test_nearest_neighbor_edge_present():
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 50, (30, 2))
    e = delaunay_edges(pts)
    for i in range(30):
        d = np.linalg.norm(pts - pts[i], axis=1)
        d[i] = np.inf
        j = int(np.argmin(d))
        assert (min(i, j), max(i, j)) in e


def test_pairs_threshold_filter():
    t = np.arange(0, 600, 12, dtype=float)  # 50 dates, 12-day cadence
    rng = np.random.default_rng(5)
    bp = rng.uniform(-300, 300, t.shape[0])
    pairs = delaunay_pairs(t, bp, max_temporal_days=120, max_perp=200)
    assert pairs
    for i, j in pairs:
        assert t[j] - t[i] <= 120 and t[j] >= t[i]
        assert abs(bp[j] - bp[i]) <= 200


def test_degenerate_inputs():
    assert delaunay_triangles(np.zeros((2, 2))) == []
    # collinear points: no valid triangles, must not crash
    pts = np.column_stack([np.arange(5.0), np.arange(5.0)])
    delaunay_triangles(pts)


def test_duplicate_points_are_jittered():
    """Exact duplicates must not degenerate the circumcircle test; all
    returned indices refer to original rows."""
    import numpy as np

    from miaplpy_spark.kernels.delaunay import delaunay_triangles

    pts = np.array([[0, 0], [1, 0], [0, 1], [1, 1],
                    [0, 0], [1, 1], [0.5, 0.5], [0.5, 0.5]], dtype=float)
    tris = delaunay_triangles(pts)
    assert len(tris) >= 4
    assert all(max(t) < len(pts) for t in tris)
    # deterministic across calls
    assert tris == delaunay_triangles(pts.copy())


def test_collinear_point_on_hull_edge():
    """A point exactly ON a hull edge's supporting line must split the
    edge, not survive as a degenerate zero-area triangle (the symbolic
    1-super predicate counts on-line points as inside the limiting
    disk)."""
    pts = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 1.0], [1.0, 0.0]])
    e = delaunay_edges(pts)
    assert (0, 1) not in e          # the split edge
    assert {(0, 3), (1, 3), (2, 3)} <= e
    assert e == _exact_delaunay_edges(pts)
