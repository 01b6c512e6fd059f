"""Driver-side Delaunay pair network (J3).

The reference builds its short-baseline interferogram network from a
Delaunay triangulation of acquisitions in the (scaled-time, bperp)
plane, keeping edges under temporal/perpendicular thresholds
(find_short_baselines.py:30-109; scipy.spatial.Delaunay at :62). The
date dimension is tiny (10^2), so this runs on the driver and the pair
list broadcasts — no distributed geometry needed. scipy is absent in
this environment; this is a plain Bowyer-Watson implementation.
"""

from __future__ import annotations

import numpy as np


def _circumcircle_contains(tri: np.ndarray, p: np.ndarray) -> bool:
    """Is p strictly inside the circumcircle of triangle tri (3x2)?"""
    ax, ay = tri[0] - p
    bx, by = tri[1] - p
    cx, cy = tri[2] - p
    det = ((ax * ax + ay * ay) * (bx * cy - cx * by)
           - (bx * bx + by * by) * (ax * cy - cx * ay)
           + (cx * cx + cy * cy) * (ax * by - bx * ay))
    # orientation sign of the triangle
    o = ((tri[1][0] - tri[0][0]) * (tri[2][1] - tri[0][1])
         - (tri[2][0] - tri[0][0]) * (tri[1][1] - tri[0][1]))
    return det > 0 if o > 0 else det < 0


def _orient(a, b, c) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])


def _in_disk(allp: np.ndarray, n: int, tri: tuple, i: int) -> bool:
    """In-circumdisk test with the super vertices treated SYMBOLICALLY
    as points at infinity (indices >= n). A finite-size super triangle
    is never 'far enough' for near-degenerate hulls (its vertices fall
    inside the giant circumcircles of flat hull triangles and corrupt
    the hull); the t -> infinity limits of the in-circle predicate are
    exact half-plane tests instead:

    - 1 super vertex, finite edge (a, b): the circumdisk tends to the
      half-plane bounded by line(a, b) on the super vertex's side.
    - 2 super vertices, finite vertex a: the disk tends to the
      half-plane bounded by the line through a parallel to the
      super-super direction, on the supers' side.
    - 3 super vertices: the initial triangle; contains every point.
    """
    p = allp[i]
    sup = [v for v in tri if v >= n]
    if not sup:
        return _circumcircle_contains(allp[list(tri)], p)
    fin = [v for v in tri if v < n]
    if len(sup) == 1:
        a, b = allp[fin[0]], allp[fin[1]]
        oa = _orient(a, b, p)
        # a point EXACTLY ON a hull edge's supporting line sits on the
        # limiting circle; counting it inside breaks the degeneracy
        # the standard way (the cavity swallows the super triangle,
        # so re-triangulation splits (a, b) through p instead of
        # emitting a zero-area (a, b, p) triangle)
        if oa == 0.0:
            return True
        return oa * _orient(a, b, allp[sup[0]]) > 0
    if len(sup) == 2:
        a = allp[fin[0]]
        s1, s2 = allp[sup[0]], allp[sup[1]]
        v = s2 - s1
        cp = v[0] * (p[1] - a[1]) - v[1] * (p[0] - a[0])
        cs = v[0] * (s1[1] - a[1]) - v[1] * (s1[0] - a[0])
        return cp * cs > 0
    return True


def delaunay_triangles(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson over (n, 2) points; returns index triangles."""
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    if n < 3:
        return []
    # exact duplicates make the circumcircle test degenerate: jitter
    # every repeated point in place by an index-derived offset
    # (deterministic, and triangle indices keep referring to the
    # original rows)
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0)
    _, first_idx, inv = np.unique(pts.round(12), axis=0,
                                  return_index=True, return_inverse=True)
    dup = np.flatnonzero(first_idx[inv] != np.arange(n))
    if dup.size:
        eps = 1e-9 * span
        pts[dup, 0] += eps * (dup + 1)
        pts[dup, 1] += eps * ((dup + 1) % 7 + 1)
    mid = pts.mean(axis=0)
    super_pts = np.array([
        mid + [-20 * span, -10 * span],
        mid + [20 * span, -10 * span],
        mid + [0, 20 * span],
    ])
    allp = np.vstack([pts, super_pts])
    s0, s1, s2 = n, n + 1, n + 2
    tris: list[tuple[int, int, int]] = [(s0, s1, s2)]
    for i in range(n):
        bad = [t for t in tris if _in_disk(allp, n, t, i)]
        # boundary polygon of the bad region = edges appearing once
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        tris = [t for t in tris if t not in bad]
        for (a, b), c in edge_count.items():
            if c == 1:
                tris.append((a, b, i))
    return [t for t in tris if max(t) < n]


def delaunay_edges(points: np.ndarray) -> set[tuple[int, int]]:
    edges: set[tuple[int, int]] = set()
    for a, b, c in delaunay_triangles(points):
        for e in ((a, b), (b, c), (a, c)):
            edges.add((min(e), max(e)))
    return edges


def delaunay_pairs(
    tbase_days: np.ndarray,
    bperp: np.ndarray,
    max_temporal_days: float = 120.0,
    max_perp: float = 200.0,
    time_scale: float = 1.0,
) -> list[tuple[int, int]]:
    """J3 network: Delaunay in the (scaled-time, bperp) plane, edges
    filtered by temporal and perpendicular baselines (the reference's
    thresholds default 120 d / 200 m)."""
    pts = np.column_stack([np.asarray(tbase_days) * time_scale,
                           np.asarray(bperp)])
    out = []
    for i, j in sorted(delaunay_edges(pts)):
        if abs(tbase_days[j] - tbase_days[i]) <= max_temporal_days and \
           abs(bperp[j] - bperp[i]) <= max_perp:
            out.append((i, j) if tbase_days[i] <= tbase_days[j] else (j, i))
    return out
