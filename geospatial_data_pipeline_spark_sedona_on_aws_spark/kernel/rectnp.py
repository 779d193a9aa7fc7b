"""Vectorized (numpy) rectilinear union — the hot-path twin of the pure-Python
Klee sweep in kernel/geom.py (union_area_rectilinear / union_rects_decompose).

Used by the fused dissolve-clip-area operator (operators/dissolve.py), which
is the engine's implementation of the reference's ST_Union_Aggr + ST_Area core
(reference spark_job/process_geodata.py:110-139). Semantics are identical to
the geom.py functions (tests/test_kernel.py cross-checks them); this module
exists because the final aggregation runs once per group inside a pandas UDF
and must stay O(vectorized) for groups with millions of member rectangles.

Method: coordinate compression + a 2D difference grid. Each rectangle
(x1, y1, x2, y2) adds +1/-1 at its four corner cells of the compressed grid;
a double cumsum yields per-cell coverage counts; covered-cell extents give
the exact union area (and, for decompose, the disjoint-rect partition).
The grid is O(#unique-x × #unique-y) cells; when that exceeds MAX_CELLS the
input is split at the median y-coordinate and the halves are processed
independently (clipping at the cut keeps the result exact), bounding peak
memory regardless of group size.
"""

from __future__ import annotations

import numpy as np

MAX_CELLS = 1 << 24  # 16M cells × 4B = 64 MB peak per task

def _compress(rects: np.ndarray):
    xs = np.unique(rects[:, [0, 2]])
    ys = np.unique(rects[:, [1, 3]])
    ix1 = np.searchsorted(xs, rects[:, 0])
    ix2 = np.searchsorted(xs, rects[:, 2])
    iy1 = np.searchsorted(ys, rects[:, 1])
    iy2 = np.searchsorted(ys, rects[:, 3])
    return xs, ys, ix1, iy1, ix2, iy2

def _coverage(rects: np.ndarray):
    """Boolean coverage grid over compressed cells; cell (i, j) covers
    [ys[i], ys[i+1]) × [xs[j], xs[j+1])."""
    xs, ys, ix1, iy1, ix2, iy2 = _compress(rects)
    grid = np.zeros((len(ys), len(xs)), dtype=np.int32)
    np.add.at(grid, (iy1, ix1), 1)
    np.add.at(grid, (iy2, ix2), 1)
    np.add.at(grid, (iy1, ix2), -1)
    np.add.at(grid, (iy2, ix1), -1)
    np.cumsum(grid, axis=0, out=grid)
    np.cumsum(grid, axis=1, out=grid)
    return xs, ys, grid[:-1, :-1] > 0

def _split_y(rects: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mid = float(np.median(rects[:, [1, 3]]))
    lo = rects[rects[:, 1] < mid].copy()
    hi = rects[rects[:, 3] > mid].copy()
    np.minimum(lo[:, 3], mid, out=lo[:, 3])
    np.maximum(hi[:, 1], mid, out=hi[:, 1])
    return lo, hi

def _needs_split(rects: np.ndarray) -> bool:
    if 4 * len(rects) * len(rects) <= MAX_CELLS:
        return False
    nx = len(np.unique(rects[:, [0, 2]]))
    ny = len(np.unique(rects[:, [1, 3]]))
    return nx * ny > MAX_CELLS and ny > 2

def _clean(rects: np.ndarray) -> np.ndarray:
    rects = np.asarray(rects, dtype=np.float64).reshape(-1, 4)
    return rects[(rects[:, 2] > rects[:, 0]) & (rects[:, 3] > rects[:, 1])]

def union_area(rects: np.ndarray) -> float:
    """Exact union area of (n, 4) axis-aligned rectangles (x1, y1, x2, y2)."""
    rects = _clean(rects)
    if len(rects) == 0:
        return 0.0
    if _needs_split(rects):
        lo, hi = _split_y(rects)
        if len(lo) < len(rects) and len(hi) < len(rects):
            return union_area(lo) + union_area(hi)
    xs, ys, cov = _coverage(rects)
    dy = np.diff(ys)
    dx = np.diff(xs)
    return float(dy @ cov.astype(np.float64) @ dx)

def union_decompose(rects: np.ndarray) -> np.ndarray:
    """Union of (n, 4) axis-aligned rectangles as an (m, 4) array of
    *disjoint* rectangles — the mergeable partial state for two-level
    (map-side-combined) union aggregation. Vertically-adjacent grid rows
    with identical x-coverage are coalesced, so m stays near-minimal."""
    rects = _clean(rects)
    if len(rects) == 0:
        return rects
    if _needs_split(rects):
        lo, hi = _split_y(rects)
        if len(lo) < len(rects) and len(hi) < len(rects):
            return np.concatenate([union_decompose(lo), union_decompose(hi)])
    xs, ys, cov = _coverage(rects)
    nrows = cov.shape[0]
    # band = run of consecutive row-strips with identical coverage
    new_band = np.empty(nrows, dtype=bool)
    new_band[0] = True
    if nrows > 1:
        new_band[1:] = (cov[1:] != cov[:-1]).any(axis=1)
    starts = np.flatnonzero(new_band)
    ends = np.append(starts[1:], nrows)
    out = []
    for s, e in zip(starts, ends):
        row = cov[s]
        if not row.any():
            continue
        d = np.diff(np.concatenate(([False], row, [False])).astype(np.int8))
        for a, b in zip(np.flatnonzero(d == 1), np.flatnonzero(d == -1)):
            out.append((xs[a], ys[s], xs[b], ys[e]))
    return np.array(out, dtype=np.float64).reshape(-1, 4)
