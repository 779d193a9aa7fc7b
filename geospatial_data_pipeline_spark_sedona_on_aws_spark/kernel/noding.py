"""Line noding and polygonization (PostGIS ST_Node / ST_Polygonize).

Pure-Python planar-arrangement kernel, same contract as the rest of
kernel/: tuples in, tuples out, deterministic canonical output.

- ``node_segments``: fully node a set of segments — split every segment
  at every proper crossing, T-touch, and collinear-overlap endpoint,
  dedupe by undirected endpoints. Output is the CANONICAL SEGMENT FORM
  (each noded edge as its own 2-point piece, sorted); GEOS merges
  chains between degree-2 nodes instead — same arrangement, different
  grouping, documented deviation.
- ``polygonize``: extract the bounded faces of the noded arrangement by
  half-edge rotation (sort outgoing edges by angle at each vertex; the
  successor of u->v is the clockwise-next edge after v->u around v),
  which traverses every interior face exactly once counter-clockwise.
  Faces from a connected component that lies strictly inside a face of
  ANOTHER component become holes of that face (the GEOS Polygonizer's
  hole-assignment semantics — the nested-squares case).

Determinism: all arithmetic is +,-,*,/ on the input coordinates
(crossing parameters are single divisions); angular order uses
math.atan2, whose platform variation cannot reorder edges (distinct
directions differ by far more than 1 ulp after noding dedupes
coincident edges). Canonical output order: segments by endpoint pair,
polygons by their lexicographically smallest shell vertex; shells CCW,
holes CW, each ring rotated to start at its smallest vertex.
"""

from __future__ import annotations

import math

from .geom import GeomError


def _cross(ox, oy, ax, ay, bx, by) -> float:
    return (ax - ox) * (by - oy) - (bx - ox) * (ay - oy)


def _cuts_for_pair(s1, s2):
    """Parameters (t on s1, u on s2) where the two segments meet:
    proper crossings, T-touches, and collinear-overlap endpoints."""
    (x1, y1), (x2, y2) = s1
    (x3, y3), (x4, y4) = s2
    d1x, d1y = x2 - x1, y2 - y1
    d2x, d2y = x4 - x3, y4 - y3
    denom = d1x * d2y - d1y * d2x
    if denom != 0:
        t = ((x3 - x1) * d2y - (y3 - y1) * d2x) / denom
        u = ((x3 - x1) * d1y - (y3 - y1) * d1x) / denom
        if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
            return [(t, u)]
        return []
    # parallel: collinear overlap splits each segment at the other's
    # interior endpoints
    if _cross(x1, y1, x2, y2, x3, y3) != 0:
        return []
    out = []

    def param(px, py, ax, ay, dx, dy):
        return ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)

    for px, py in ((x3, y3), (x4, y4)):
        t = param(px, py, x1, y1, d1x, d1y)
        if 0.0 <= t <= 1.0:
            u = 0.0 if (px, py) == (x3, y3) else 1.0
            out.append((t, u))
    for px, py in ((x1, y1), (x2, y2)):
        u = param(px, py, x3, y3, d2x, d2y)
        if 0.0 <= u <= 1.0:
            t = 0.0 if (px, py) == (x1, y1) else 1.0
            out.append((t, u))
    return out


def node_segments(segments):
    """Fully node undirected segments ((x1,y1),(x2,y2)); returns the
    deduped, canonically sorted list of noded 2-point pieces."""
    segs = [((float(ax), float(ay)), (float(bx), float(by)))
            for (ax, ay), (bx, by) in segments
            if (ax, ay) != (bx, by)]
    # cuts[i]: param -> THE node point. Both segments of a crossing get
    # the SAME point object (computed once on the first segment, or the
    # exact endpoint when the param is 0/1): evaluating a1 + t*d1 and
    # a3 + u*d2 separately can differ in the last ulp, which would emit
    # two nearly-equal nodes for one crossing — an inconsistent
    # arrangement no downstream walk can repair
    cuts: list[dict] = [{} for _ in segs]

    def at(seg, t):
        (ax, ay), (bx, by) = seg
        if t == 0.0:
            return (ax, ay)
        if t == 1.0:
            return (bx, by)
        return (ax + t * (bx - ax), ay + t * (by - ay))

    for i, s in enumerate(segs):
        cuts[i][0.0] = s[0]
        cuts[i][1.0] = s[1]
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            for t, u in _cuts_for_pair(segs[i], segs[j]):
                t = min(max(t, 0.0), 1.0)
                u = min(max(u, 0.0), 1.0)
                # endpoint params keep their exact endpoints; a proper
                # interior-interior crossing shares one computed point
                p = cuts[i].get(t)
                if p is None:
                    p = at(segs[i], t) if t in (0.0, 1.0) else None
                q = cuts[j].get(u)
                if q is None:
                    q = at(segs[j], u) if u in (0.0, 1.0) else None
                shared = p if p is not None else (
                    q if q is not None else at(segs[i], t))
                cuts[i].setdefault(t, shared)
                cuts[j].setdefault(u, shared)
    pieces = set()
    for seg, ts in zip(segs, cuts):
        pts = []
        for t in sorted(ts):
            p = ts[t]
            if not pts or pts[-1] != p:
                pts.append(p)
        for a, b in zip(pts, pts[1:]):
            pieces.add((a, b) if a <= b else (b, a))
    return _snap_nodes(sorted(pieces))


def _snap_nodes(pieces):
    """Merge node points that differ only by float rounding (THREE
    concurrent lines: two different pairs compute the same crossing with
    different last-ulp rounding — the shared-point rule above only
    covers one pair). Greedy cluster over the sorted point set at a
    ~1e-9 relative tolerance, every cluster snapped to its smallest
    member; exact-arithmetic fixtures (integer/half-integer crossings)
    produce exactly-equal nodes, so their points are singletons and pass
    through bit-identically."""
    nodes = sorted({p for seg in pieces for p in seg})
    remap = {}
    # sliding window of representatives whose x is still within eps of
    # the scan point — NOT just the single previous rep: an unrelated
    # node (e.g. a vertical segment's endpoint sharing the smaller ulp-
    # sibling's x) can sort lexicographically BETWEEN two ulp-sibling
    # crossing nodes, and the one-back greedy would then fail to merge
    # them (r10, closes the r9 ADVICE three-concurrent-lines gap). Each
    # point snaps to the smallest in-window rep within its eps box.
    window: list[tuple] = []
    for p in nodes:
        window = [r for r in window
                  if p[0] - r[0] <= 1e-9 * (1.0 + max(abs(r[0]),
                                                      abs(r[1])))]
        for rep in window:        # insertion order = sorted = smallest-first
            eps = 1e-9 * (1.0 + max(abs(rep[0]), abs(rep[1])))
            if abs(p[0] - rep[0]) <= eps and abs(p[1] - rep[1]) <= eps:
                remap[p] = rep
                break
        else:
            window.append(p)
            remap[p] = p
    out = set()
    for a, b in pieces:
        a2, b2 = remap[a], remap[b]
        if a2 != b2:
            out.add((a2, b2) if a2 <= b2 else (b2, a2))
    return sorted(out)


def _faces(pieces):
    """All closed faces of one noded arrangement via half-edge rotation.
    Returns vertex cycles; interior faces come out counter-clockwise
    (positive signed area), the unbounded boundary clockwise."""
    outgoing = {}
    for a, b in pieces:
        outgoing.setdefault(a, []).append(b)
        outgoing.setdefault(b, []).append(a)
    order = {}
    for v, nbrs in outgoing.items():
        nbrs = sorted(set(nbrs),
                      key=lambda p: math.atan2(p[1] - v[1], p[0] - v[0]))
        order[v] = {p: nbrs[(i - 1) % len(nbrs)]
                    for i, p in enumerate(nbrs)}
    unused = {(a, b) for a, b in pieces} | {(b, a) for a, b in pieces}
    faces = []
    while unused:
        start = min(unused)
        cycle = []
        e = start
        while True:
            cycle.append(e[0])
            unused.discard(e)
            # successor of u->v: clockwise-next neighbor after u around v
            e = (e[1], order[e[1]][e[0]])
            if e == start:
                break
            if e not in unused:
                raise GeomError("non-manifold traversal")  # pragma: no cover
        faces.append(cycle)
    return faces


def _signed_area(ring) -> float:
    x0, y0 = ring[0]
    acc = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        acc += (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    return acc / 2.0


def _canon_ring(ring, ccw: bool):
    """Rotate to the smallest vertex; orient as asked."""
    if (_signed_area(ring) > 0) != ccw:
        ring = ring[::-1]
    k = ring.index(min(ring))
    return ring[k:] + ring[:k]


def _point_in_ring(x, y, ring) -> bool:
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if xi > x:
                inside = not inside
    return inside


def _components(pieces):
    """Split the arrangement into connected components (union-find on
    shared vertices) — hole assignment is across components only."""
    parent = {}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in pieces:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for seg in pieces:
        comps.setdefault(find(seg[0]), []).append(seg)
    return list(comps.values())


def polygonize(segments):
    """PostGIS ST_Polygonize over a segment soup: node, extract interior
    faces per connected component, assign a component's outer boundary
    as a hole of a face from another component when nested. Returns
    polygons as [[shell, hole, ...]] ring lists (kernel/geom layout:
    rings unclosed, shell CCW, holes CW), canonically sorted."""
    # dangles pruned BEFORE the component split: a whisker joining two
    # nested rings must not fuse them into one component, or the hole
    # assignment below (cross-component only) would silently skip them
    pieces = _prune_cut_edges(_prune_dangles(node_segments(segments)))
    shells = []          # (ring, component id, |area|)
    outers = []          # (outer boundary CW cycle, component id)
    for ci, comp in enumerate(_components(pieces)):
        for cycle in _faces(comp):
            if len(cycle) < 3:
                continue
            sa = _signed_area(cycle)
            if sa > 0:
                shells.append((cycle, ci, sa))
            elif sa < 0:
                outers.append((cycle, ci))
    # a component's outer boundary nested inside another component's
    # face becomes that face's hole — assigned to the INNERMOST
    # (smallest-area) containing shell, so triple nesting resolves to
    # the immediately enclosing face only
    holes_of = {i: [] for i in range(len(shells))}
    for outer, cj in outers:
        px, py = outer[0]
        best = None
        for i, (shell, ci, area) in enumerate(shells):
            if ci == cj:
                continue
            if _point_in_ring(px, py, shell):
                if best is None or area < shells[best][2]:
                    best = i
        if best is not None:
            holes_of[best].append(_canon_ring(list(outer), ccw=False))
    polys = []
    for i, (shell, ci, _area) in enumerate(shells):
        ring = _canon_ring(list(shell), ccw=True)
        holes = sorted(holes_of[i], key=lambda r: r[0])
        polys.append([ring] + holes)
    polys.sort(key=lambda p: p[0][0])
    return polys


def _prune_cut_edges(pieces):
    """Remove cut edges (bridges): edges whose two directed halves lie
    in the SAME face cycle — a bridge between two rings is traversed
    once in each direction by one walk, which would otherwise emit a
    self-touching shell with the bridge run twice. GEOS's Polygonizer
    deletes cut edges before forming polygons; removing a bridge can
    split a component (nested rings joined by a bar → hole assignment
    re-applies) and can expose new dangles, so prune and iterate to the
    fixed point."""
    pieces = list(pieces)
    while pieces:
        cycles = _faces(pieces)
        cut = set()
        for cycle in cycles:
            seen = set()
            n = len(cycle)
            for i in range(n):
                a, b = cycle[i], cycle[(i + 1) % n]
                und = (a, b) if a <= b else (b, a)
                if und in seen:
                    cut.add(und)
                seen.add(und)
        if not cut:
            return pieces
        pieces = _prune_dangles([p for p in pieces if p not in cut])
    return pieces


def _prune_dangles(pieces):
    pieces = list(pieces)
    while True:
        deg = {}
        for a, b in pieces:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = [(a, b) for a, b in pieces if deg[a] > 1 and deg[b] > 1]
        if len(keep) == len(pieces):
            return keep
        pieces = keep
