"""Delaunay triangulation and Voronoi diagrams (pure Python, deterministic).

Delaunay = lexicographic scan triangulation + Lawson flips:
1. points sorted lexicographically; each new point fans triangles to the
   hull edges it can see (the classic O(n²) scan triangulation — always a
   full triangulation of the convex hull, no super-triangle, so there is
   no "stolen sliver" failure mode a finite super-triangle has);
2. Lawson edge flips until every internal edge is locally Delaunay —
   by the local-to-global Delaunay lemma the result IS the Delaunay
   triangulation. Each flip lexicographically increases the triangle
   angle vector, so the loop terminates.

Voronoi cells are computed independently as half-plane intersections
clipped to an envelope — exactly the cell definition, no duality
bookkeeping. Sedona's ST_DelaunayTriangles / ST_VoronoiPolygons expose
the same construction via JTS.

Numerical notes: the incircle predicate is the lifted 3×3 determinant on
coordinates RELATIVE to the query point; for integer / half-integer
fixture lattices every term is an integer well under 2^53, so it is
exact there. Cocircular ties (det == 0) are legal-edge by convention —
any of the valid triangulations results, and every invariant the oracles
check (triangle count 2n−2−b with b boundary points, total area = hull
area, Voronoi partition of the clip envelope) holds for all of them.
Determinism: fixed insertion order, deterministic flip queue, canonical
output ordering.
"""

from __future__ import annotations

def _incircle(ax, ay, bx, by, cx, cy, dx, dy) -> float:
    """> 0 iff d is strictly inside the circumcircle of CCW triangle
    (a, b, c)."""
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    return (adx * (bdy * cd - bd * cdy)
            - ady * (bdx * cd - bd * cdx)
            + ad * (bdx * cdy - bdy * cdx))

def _orient(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

def _scan_triangulation(pts):
    """Triangulation of the hull by lexicographic insertion: each point
    fans to every strictly visible hull edge. Returns (triangles, ok);
    all-collinear input → ([], True) with no triangles."""
    n = len(pts)
    tris = []
    # leading collinear chain
    chain = [0, 1]
    i = 2
    while i < n and _orient(*pts[chain[0]], *pts[chain[-1]],
                            *pts[i]) == 0:
        chain.append(i)
        i += 1
    if i == n:
        return [], True  # fully collinear
    # first non-collinear point: fan across the chain
    p = i
    side = _orient(*pts[chain[0]], *pts[chain[-1]], *pts[p])
    for a, b in zip(chain, chain[1:]):
        if side > 0:
            tris.append((a, b, p))
        else:
            tris.append((b, a, p))
    # hull as a CCW cyclic list. Collinear chain vertices STAY on the
    # hull (they are boundary points and must keep receiving triangle
    # fans); for p on the right of the chain the CCW walk is
    # c0 → p → ck → ... → c1.
    hull = chain + [p] if side > 0 else [chain[0], p] + chain[:0:-1]
    for p in range(i + 1, n):
        px, py = pts[p]
        m = len(hull)
        vis = [_orient(*pts[hull[k]], *pts[hull[(k + 1) % m]],
                       px, py) < 0 for k in range(m)]
        if not any(vis):
            # unreachable for a lexicographically new point outside a
            # CCW hull: every such point strictly sees >= 1 edge (edges
            # it is collinear with sit next to one it sees)
            raise ValueError("scan triangulation: no visible hull edge")
        # visible edges form one contiguous arc; find its start
        start = next(k for k in range(m)
                     if vis[k] and not vis[(k - 1) % m])
        arc = []
        k = start
        while vis[k]:
            arc.append(k)
            k = (k + 1) % m
        for k in arc:
            a, b = hull[k], hull[(k + 1) % m]
            if _orient(*pts[a], *pts[b], px, py) < 0:
                tris.append((b, a, p))
        # replace hull[start+1 .. start+len(arc)-1] span with p
        keep_from = (start + len(arc)) % m
        new_hull = [hull[start]]
        new_hull.append(p)
        k = keep_from
        while k != start:
            new_hull.append(hull[k])
            k = (k + 1) % m
        hull = new_hull
    return tris, True

def delaunay(points):
    """Delaunay triangulation of a 2D point set.

    Returns (pts, triangles): the deduped lexicographically-sorted points
    and CCW (i, j, k) index triples in canonical order. Fewer than 3
    distinct points, or all collinear → (pts, [])."""
    pts = sorted(set((float(x), float(y)) for x, y in points))
    n = len(pts)
    if n < 3:
        return pts, []
    tris, _ = _scan_triangulation(pts)
    if not tris:
        return pts, []
    # Lawson flips to Delaunay
    tri_set = set()
    edge_map: dict = {}

    def add(t):
        tri_set.add(t)
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edge_map.setdefault((min(e), max(e)), set()).add(t)

    def drop(t):
        tri_set.discard(t)
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            k = (min(e), max(e))
            s = edge_map.get(k)
            if s is not None:
                s.discard(t)
                if not s:
                    del edge_map[k]

    for t in tris:
        add(t)
    queue = sorted(edge_map.keys())
    guard = 20 * n * n + 1000
    while queue and guard > 0:
        guard -= 1
        e = queue.pop()
        owners = edge_map.get(e)
        if not owners or len(owners) != 2:
            continue
        t1, t2 = sorted(owners)
        u, v = e
        w1 = next(x for x in t1 if x not in e)
        w2 = next(x for x in t2 if x not in e)
        a, b, c = (pts[i] for i in t1)
        d = pts[w2]
        if _incircle(a[0], a[1], b[0], b[1], c[0], c[1],
                     d[0], d[1]) <= 0:
            continue
        # illegal edge: flip (u, v) -> (w1, w2); new triangles oriented
        if _orient(*pts[w1], *pts[w2], *pts[u]) == 0 or \
                _orient(*pts[w1], *pts[w2], *pts[v]) == 0:
            continue  # degenerate quad: no valid flip (exact-tie guard)
        drop(t1)
        drop(t2)
        for (x, y, z) in ((w1, w2, u), (w1, w2, v)):
            if _orient(*pts[x], *pts[y], *pts[z]) < 0:
                x, y = y, x
            m = min(x, y, z)
            if m == y:
                x, y, z = y, z, x
            elif m == z:
                x, y, z = z, x, y
            add((x, y, z))
        for ne in ((min(w1, w2), max(w1, w2)),
                   (min(u, w1), max(u, w1)), (min(u, w2), max(u, w2)),
                   (min(v, w1), max(v, w1)), (min(v, w2), max(v, w2))):
            queue.append(ne)
    canon = []
    for (i, j, k) in tri_set:
        m = min(i, j, k)
        if m == i:
            canon.append((i, j, k))
        elif m == j:
            canon.append((j, k, i))
        else:
            canon.append((k, i, j))
    canon.sort()
    return pts, canon

def _halfplane_clip(poly, ax, ay, bx, by):
    """Clip a convex polygon (list of (x, y), CCW) to the half-plane of
    points p with |p−a| <= |p−b| — the perpendicular-bisector side
    containing a. Sutherland–Hodgman single-edge pass."""
    mx, my = (ax + bx) / 2.0, (ay + by) / 2.0
    nx, ny = ax - bx, ay - by

    def val(p):
        return (p[0] - mx) * nx + (p[1] - my) * ny

    out = []
    m = len(poly)
    for i in range(m):
        p, q = poly[i], poly[(i + 1) % m]
        vp, vq = val(p), val(q)
        if vp >= 0:
            out.append(p)
            if vq < 0:
                t = vp / (vp - vq)
                out.append((p[0] + t * (q[0] - p[0]),
                            p[1] + t * (q[1] - p[1])))
        elif vq >= 0:
            t = vp / (vp - vq)
            out.append((p[0] + t * (q[0] - p[0]),
                        p[1] + t * (q[1] - p[1])))
    return out

def voronoi_cells(points, env=None):
    """Voronoi cells of a 2D point set, clipped to `env` (x1, y1, x2, y2).

    Each cell is the intersection of the clip rectangle with the n−1
    perpendicular-bisector half-planes — O(n²) overall, robust, exactly
    the cell definition. Default envelope: the points' bbox expanded by
    its diameter (the JTS VoronoiDiagramBuilder default shape).
    Returns (pts, cells): deduped-sorted points and one convex CCW
    polygon (possibly []) per point."""
    pts = sorted(set((float(x), float(y)) for x, y in points))
    if not pts:
        return [], []
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    if env is None:
        w = max(xs) - min(xs)
        h = max(ys) - min(ys)
        pad = max(w, h, 1.0)
        env = (min(xs) - pad, min(ys) - pad,
               max(xs) + pad, max(ys) + pad)
    x1, y1, x2, y2 = env
    base = [(x1, y1), (x2, y1), (x2, y2), (x1, y2)]
    cells = []
    for i, (ax, ay) in enumerate(pts):
        cell = base
        for j, (bx, by) in enumerate(pts):
            if i == j or not cell:
                continue
            cell = _halfplane_clip(cell, ax, ay, bx, by)
        cells.append(cell)
    return pts, cells

def concave_hull(points, length_ratio: float):
    """Concave hull by Delaunay border erosion (the JTS
    ConcaveHullByLengthRatio construction): starting from the Delaunay
    triangulation (= convex hull region), repeatedly remove the border
    triangle whose border edge is the LONGEST, while that edge is longer
    than  minLen + ratio·(maxLen − minLen)  (computed over all Delaunay
    edges) and removal keeps the region simply connected (the vertex
    opposite the border edge must be interior, and the triangle must
    expose exactly one border edge). ratio=1 → convex hull; ratio→0 →
    maximally eroded.

    Returns the hull as one CCW ring (list of (x, y)), or None when the
    input has no 2D extent."""
    import heapq
    import math

    pts, tris = delaunay(points)
    if not tris:
        return None
    edge_tris: dict = {}
    for t in tris:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edge_tris.setdefault((min(e), max(e)), set()).add(t)

    def elen(e):
        (ax, ay), (bx, by) = pts[e[0]], pts[e[1]]
        return math.hypot(ax - bx, ay - by)

    lens = [elen(e) for e in edge_tris]
    lo, hi = min(lens), max(lens)
    r = max(0.0, min(1.0, length_ratio))
    # lo + 1.0*(hi-lo) can round BELOW hi, which would erode the longest
    # hull edge at ratio=1 — the ratio endpoints are pinned exactly
    limit = hi if r >= 1.0 else lo + r * (hi - lo)
    alive = set(tris)
    border = {e for e, ts in edge_tris.items() if len(ts) == 1}
    border_verts: dict = {}
    for e in border:
        for v in e:
            border_verts[v] = border_verts.get(v, 0) + 1
    heap = [(-elen(e), e) for e in border]
    heapq.heapify(heap)
    while heap:
        negl, e = heapq.heappop(heap)
        if -negl <= limit:
            break
        if e not in border:
            continue
        owners = [t for t in edge_tris.get(e, ()) if t in alive]
        if len(owners) != 1:
            continue
        t = owners[0]
        opp = next(v for v in t if v not in e)
        if opp in border_verts:
            continue  # removal would pinch the region
        t_edges = [(min(a, b), max(a, b))
                   for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))]
        if sum(1 for te in t_edges if te in border) != 1:
            continue
        alive.discard(t)
        border.discard(e)
        for v in e:
            border_verts[v] -= 1
            if border_verts[v] == 0:
                del border_verts[v]
        for te in t_edges:
            if te == e:
                continue
            border.add(te)
            for v in te:
                border_verts[v] = border_verts.get(v, 0) + 1
            heapq.heappush(heap, (-elen(te), te))
    # assemble the boundary ring from the border edges
    nxt: dict = {}
    for (u, v) in border:
        nxt.setdefault(u, []).append(v)
        nxt.setdefault(v, []).append(u)
    start = min(nxt)
    ring = [start]
    prev = None
    cur = start
    for _ in range(len(border)):
        cands = [w for w in nxt[cur] if w != prev]
        if not cands:
            break
        prev, cur = cur, cands[0]
        if cur == start:
            break
        ring.append(cur)
    out = [pts[i] for i in ring]
    # orient CCW
    acc = 0.0
    n = len(out)
    for i in range(n):
        x1, y1 = out[i]
        x2, y2 = out[(i + 1) % n]
        acc += x1 * y2 - x2 * y1
    return out if acc >= 0 else out[::-1]
