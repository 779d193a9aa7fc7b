"""Geometry primitives: WKT I/O, area, clipping, rectilinear union.

Internal representation (no classes — cheap to pickle into pandas UDFs):

    geometry       = list[polygon]              # a MultiPolygon; [] = EMPTY
    polygon        = list[ring]                 # ring 0 = outer, rest = holes
    ring           = list[(x: float, y: float)] # closed implicitly (no repeat)

Semantics parity targets (what the reference exercises — see SURVEY.md §2.4):
  parse_wkt / to_wkt       <-> Sedona ST_GeomFromWKT / ST_AsText
                               (reference spark_job/process_geodata.py:102,167)
  make_valid               <-> ST_MakeValid (:102,113,126)
  area                     <-> ST_Area (:122-123)
  clip_convex              <-> ST_Intersection against a convex clip (:127-130)
  union_area_rectilinear   <-> area(ST_Union_Aggr(...)) for axis-aligned input
                               (:110-113 dissolve step)
"""

from __future__ import annotations

import math

class GeomError(ValueError):
    pass

# ---------------------------------------------------------------- WKT I/O

def _parse_ring(text: str) -> list[tuple[float, float]]:
    # fast path: uniform 2-D rings ('x y, x y, ...') tokenize in one C-side
    # pass; the count check (2 numbers per comma-group) routes anything
    # else — Z groups, short groups — to the per-pair loop below, whose
    # behavior (take first two, raise on <2) is preserved exactly
    nums = text.replace(",", " ").split()
    if len(nums) == 2 * (text.count(",") + 1):
        fl = list(map(float, nums))
        pts = list(zip(fl[0::2], fl[1::2]))
    else:
        pts = []
        for pair in text.split(","):
            xy = pair.split()
            if len(xy) < 2:
                raise GeomError(f"bad coordinate {pair!r}")
            pts.append((float(xy[0]), float(xy[1])))
    # drop explicit closing point
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts.pop()
    if len(pts) < 3:
        raise GeomError("ring with <3 distinct points")
    return pts

def _split_top_level(text: str) -> list[str]:
    """Split 'a),(b' style bodies at top-level '),(' boundaries.

    Implemented with str.find jumps instead of a per-character loop: ring
    bodies are ~1 KB of coordinate text, and skipping straight between
    parens/commas keeps the scan in C (217 µs -> ~4 µs per call on the
    buffered-WKT reparse hot path, r7 profile)."""
    parts, start, pos, depth = [], 0, 0, 0
    n = len(text)
    while pos < n:
        if depth == 0:
            ic = text.find(",", pos)
            io = text.find("(", pos)
            if ic == -1 and io == -1:
                break
            if ic != -1 and (io == -1 or ic < io):
                parts.append(text[start:ic])
                start = pos = ic + 1
            else:
                depth = 1
                pos = io + 1
        else:
            io = text.find("(", pos)
            ic = text.find(")", pos)
            if ic == -1:
                break  # unbalanced: fall through with the tail, as before
            if io != -1 and io < ic:
                depth += 1
                pos = io + 1
            else:
                depth -= 1
                pos = ic + 1
    parts.append(text[start:])
    return parts

def _strip_parens(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise GeomError(f"expected parenthesized body, got {s[:40]!r}")
    return s[1:-1]

def parse_wkt(wkt: str) -> list[list[list[tuple[float, float]]]]:
    """Parse POLYGON / MULTIPOLYGON (the only types the reference moves —
    its sources serialize PostGIS polygons with ST_AsText,
    reference spark_job/process_geodata.py:167,173)."""
    if wkt is None:
        return []
    s = wkt.strip()
    if s[:5].upper() == "SRID=":
        # EWKT prefix: SRID is metadata, not geometry (geomtypes has the
        # same strip; some areal scalars call this parser directly)
        semi = s.find(";")
        if semi == -1:
            raise GeomError("EWKT with SRID= but no ';'")
        s = s[semi + 1:].lstrip()
    up = s.upper()
    if "EMPTY" in up:
        return []
    if up.startswith("POLYGON"):
        body = _strip_parens(s[len("POLYGON"):])
        return [[_parse_ring(_strip_parens(r)) for r in _split_top_level(body)]]
    if up.startswith("MULTIPOLYGON"):
        body = _strip_parens(s[len("MULTIPOLYGON"):])
        polys = []
        for poly_txt in _split_top_level(body):
            pbody = _strip_parens(poly_txt)
            polys.append([_parse_ring(_strip_parens(r)) for r in _split_top_level(pbody)])
        return polys
    raise GeomError(f"unsupported WKT type: {s[:30]!r}")

def _fmt(v: float) -> str:
    # float.is_integer is a C builtin — measurably cheaper than the
    # int(v) round trip on the WKT-serialization hot path (r7)
    try:
        if v.is_integer() and -1e15 < v < 1e15:
            return str(int(v))
    except AttributeError:  # plain int (GeoJSON render fallback)
        return str(v)
    return repr(v)

def _ring_wkt(ring: list[tuple[float, float]]) -> str:
    pts = list(ring) + [ring[0]]
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts) + ")"

def to_wkt(geom: list) -> str:
    if not geom:
        return "POLYGON EMPTY"
    if len(geom) == 1:
        return "POLYGON (" + ", ".join(_ring_wkt(r) for r in geom[0]) + ")"
    return "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(_ring_wkt(r) for r in poly) + ")" for poly in geom
    ) + ")"

# ---------------------------------------------------------------- measures

def _ring_signed_area(ring: list[tuple[float, float]]) -> float:
    # translate to the first vertex before the shoelace: projected
    # coordinates run to ~1e7 m (EPSG:3857/5880), where raw cross products
    # (~5e13) round at ~0.01 m² per term and the area of a metres-sized
    # polygon drowns in cancellation noise; the shoelace is exactly
    # translation-invariant, so anchoring costs nothing
    x0, y0 = ring[0]
    acc = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        acc += (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    return acc / 2.0

def area(geom: list) -> float:
    """Planar area; holes subtracted (shoelace)."""
    total = 0.0
    for poly in geom:
        if not poly:
            continue
        total += abs(_ring_signed_area(poly[0]))
        for hole in poly[1:]:
            total -= abs(_ring_signed_area(hole))
    return total

def convex_hull(points: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Convex hull of a point set (Andrew's monotone chain), returned as a
    CCW ring without the closing vertex. Collinear boundary points are
    dropped (strict turns only), so the hull of a subdivided rectangle edge
    is the 4-corner rectangle. <3 distinct points → the degenerate input."""
    pts = sorted(set(points))
    if len(pts) < 3:
        return pts
    def half(seq):
        out: list[tuple[float, float]] = []
        for p in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out
    lower = half(pts)
    upper = half(reversed(pts))
    return lower[:-1] + upper[:-1]

def hull_of_geom(geom: list) -> list:
    """ST_ConvexHull: hull of every vertex of the (multi)polygon, as a
    single-polygon geometry."""
    pts = [p for poly in geom for ring in poly for p in ring]
    h = convex_hull(pts)
    if len(h) < 3:
        return []
    return [[h]]

def simplify_polyline(xs: list[float], ys: list[float],
                      tol: float) -> list[int]:
    """Douglas–Peucker on an open polyline; returns the kept vertex
    indices (always includes both endpoints). Iterative stack form — no
    Python recursion limit on pathological inputs."""
    n = len(xs)
    if n <= 2:
        return list(range(n))
    keep = [False] * n
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        ax, ay = xs[i], ys[i]
        bx, by = xs[j], ys[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best, best_d2 = -1, tol * tol
        for k in range(i + 1, j):
            if seg2 == 0.0:
                ex, ey = xs[k] - ax, ys[k] - ay
                d2 = ex * ex + ey * ey
            else:
                cross = dx * (ys[k] - ay) - dy * (xs[k] - ax)
                d2 = cross * cross / seg2
            if d2 > best_d2:
                best, best_d2 = k, d2
        if best >= 0:
            keep[best] = True
            stack.append((i, best))
            stack.append((best, j))
    return [k for k in range(n) if keep[k]]

def bounds(geom: list) -> tuple[float, float, float, float]:
    xs = [x for poly in geom for ring in poly for x, _ in ring]
    ys = [y for poly in geom for ring in poly for _, y in ring]
    if not xs:
        return (math.inf, math.inf, -math.inf, -math.inf)
    return (min(xs), min(ys), max(xs), max(ys))

# ---------------------------------------------------------------- validity

def _dedupe(ring: list[tuple[float, float]]) -> list[tuple[float, float]]:
    out = []
    for p in ring:
        if not out or p != out[-1]:
            out.append(p)
    if len(out) > 1 and out[0] == out[-1]:
        out.pop()
    return out

def normalize(geom: list) -> list:
    """buffer(0)-style cleanup: drop duplicate vertices, drop degenerate
    rings, orient outers CCW and holes CW. The reference uses ST_Buffer(g, 0)
    exactly as this kind of topology rinse (spark_job/process_geodata.py:125)."""
    out = []
    for poly in geom:
        rings = []
        for i, ring in enumerate(poly):
            r = _dedupe(ring)
            if len(r) < 3 or _ring_signed_area(r) == 0.0:
                continue
            sa = _ring_signed_area(r)
            want_ccw = i == 0
            if (sa > 0) != want_ccw:
                r = r[::-1]
            rings.append(r)
        if rings:
            out.append(rings)
    return out

def _has_self_intersections(geom: list) -> bool:
    """Any two edges of the same polygon properly crossing (interior-to-
    interior)? Endpoint touching is allowed — that's valid topology."""
    for poly in geom:
        edges = []
        for ring in poly:
            n = len(ring)
            for i in range(n):
                edges.append((ring[i], ring[(i + 1) % n]))
        m = len(edges)
        for i in range(m):
            (ax1, ay1), (ax2, ay2) = edges[i]
            for j in range(i + 1, m):
                (bx1, by1), (bx2, by2) = edges[j]
                d1x, d1y = ax2 - ax1, ay2 - ay1
                d2x, d2y = bx2 - bx1, by2 - by1
                den = d1x * d2y - d1y * d2x
                if den == 0:
                    continue
                t = ((bx1 - ax1) * d2y - (by1 - ay1) * d2x) / den
                u = ((bx1 - ax1) * d1y - (by1 - ay1) * d1x) / den
                if 1e-12 < t < 1 - 1e-12 and 1e-12 < u < 1 - 1e-12:
                    return True
    return False

def make_valid(geom: list) -> list:
    """Validity repair (ST_MakeValid semantics under the even-odd rule):
    vertex dedupe + ring re-orientation always; when a polygon self-
    intersects (bowtie, folded ring, crossing hole), re-node it through the
    general banded sweep — the even-odd trapezoid decomposition of the raw
    edge set IS the valid multipolygon the drawing represents."""
    # detect on the RAW (deduped) rings: a symmetric bowtie has signed area
    # exactly 0 and would be dropped as degenerate by normalize() before the
    # repair could see it
    raw = [[_dedupe(r) for r in poly] for poly in geom]
    raw = [[r for r in poly if len(r) >= 3] for poly in raw]
    raw = [poly for poly in raw if poly]
    if not _has_self_intersections(raw):
        return normalize(raw)
    from . import boolean as B
    return normalize(B.union_geom([raw]))

# ---------------------------------------------------------------- clipping

def _is_convex(ring: list[tuple[float, float]]) -> bool:
    n = len(ring)
    sign = 0
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        x3, y3 = ring[(i + 2) % n]
        cross = (x2 - x1) * (y3 - y2) - (y2 - y1) * (x3 - x2)
        if cross != 0:
            s = 1 if cross > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return True

def clip_convex(subject: list, clip_ring: list[tuple[float, float]]) -> list:
    """Sutherland–Hodgman: intersect each subject polygon with a convex clip
    ring. Exact for convex clips (our region fixtures are rectangles);
    general×general intersection is the phase-2 boolean-op core."""
    if _ring_signed_area(clip_ring) < 0:
        clip_ring = clip_ring[::-1]
    out_geom = []
    for poly in subject:
        new_rings = []
        for ring in poly:
            clipped = _sh_clip(ring, clip_ring)
            if len(clipped) >= 3:
                clipped = _dedupe(clipped)
                if len(clipped) >= 3 and _ring_signed_area(clipped) != 0.0:
                    new_rings.append(clipped)
        if new_rings:
            out_geom.append(new_rings)
    return out_geom

def _sh_clip(subject: list[tuple[float, float]],
             clip_ring: list[tuple[float, float]]) -> list[tuple[float, float]]:
    output = list(subject)
    n = len(clip_ring)
    for i in range(n):
        if not output:
            return []
        cx1, cy1 = clip_ring[i]
        cx2, cy2 = clip_ring[(i + 1) % n]
        ex, ey = cx2 - cx1, cy2 - cy1

        def inside(p):
            return ex * (p[1] - cy1) - ey * (p[0] - cx1) >= 0

        def intersect(a, b):
            dx, dy = b[0] - a[0], b[1] - a[1]
            denom = ex * dy - ey * dx
            if denom == 0:
                return b
            t = (ey * (a[0] - cx1) - ex * (a[1] - cy1)) / denom
            return (a[0] + t * dx, a[1] + t * dy)

        inp, output = output, []
        prev = inp[-1]
        prev_in = inside(prev)
        for cur in inp:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    output.append(intersect(prev, cur))
                output.append(cur)
            elif prev_in:
                output.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
    return output

def rect_clip(x1: float, y1: float, x2: float, y2: float,
              gx1: float, gy1: float, gx2: float, gy2: float
              ) -> tuple[float, float, float, float] | None:
    """Rect ∩ rect fast path; None when empty."""
    ix1, iy1 = max(x1, gx1), max(y1, gy1)
    ix2, iy2 = min(x2, gx2), min(y2, gy2)
    if ix2 <= ix1 or iy2 <= iy1:
        return None
    return (ix1, iy1, ix2, iy2)

# ------------------------------------------------------- rectilinear union

def union_area_rectilinear(rects: list[tuple[float, float, float, float]]) -> float:
    """Klee's measure in 2D via coordinate compression + row sweep: exact
    union area of axis-aligned rectangles (x1, y1, x2, y2). O(n·k) over
    compressed rows — the area-only fast path behind the fused
    dissolve-clip-area operator (reference dissolve: ST_Union_Aggr at
    spark_job/process_geodata.py:113 followed by ST_Area at :122)."""
    rects = [r for r in rects if r[2] > r[0] and r[3] > r[1]]
    if not rects:
        return 0.0
    ys = sorted({y for r in rects for y in (r[1], r[3])})
    total = 0.0
    for i in range(len(ys) - 1):
        y_lo, y_hi = ys[i], ys[i + 1]
        # x-intervals of rects spanning this row, merged
        xs = sorted((r[0], r[2]) for r in rects if r[1] <= y_lo and r[3] >= y_hi)
        covered = 0.0
        cur_lo = cur_hi = None
        for lo, hi in xs:
            if cur_hi is None or lo > cur_hi:
                if cur_hi is not None:
                    covered += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        if cur_hi is not None:
            covered += cur_hi - cur_lo
        total += covered * (y_hi - y_lo)
    return total

def union_rects_decompose(
    rects: list[tuple[float, float, float, float]]
) -> list[tuple[float, float, float, float]]:
    """Union of axis-aligned rectangles as a list of *disjoint* rectangles
    (same sweep as union_area_rectilinear, keeping the pieces and coalescing
    vertically-adjacent rows with identical x-coverage).

    This is the geometry-valued ST_Union_Aggr for rectilinear input, and the
    mergeable partial state for the two-level salted union (SURVEY.md §4.3:
    union is associative+commutative, so salt-bucket partials then re-union)."""
    rects = [r for r in rects if r[2] > r[0] and r[3] > r[1]]
    if not rects:
        return []
    ys = sorted({y for r in rects for y in (r[1], r[3])})
    rows: list[tuple[float, float, tuple]] = []  # (y_lo, y_hi, x-intervals)
    for i in range(len(ys) - 1):
        y_lo, y_hi = ys[i], ys[i + 1]
        xs = sorted((r[0], r[2]) for r in rects if r[1] <= y_lo and r[3] >= y_hi)
        merged = []
        cur_lo = cur_hi = None
        for lo, hi in xs:
            if cur_hi is None or lo > cur_hi:
                if cur_hi is not None:
                    merged.append((cur_lo, cur_hi))
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        if cur_hi is not None:
            merged.append((cur_lo, cur_hi))
        if merged:
            if rows and rows[-1][1] == y_lo and rows[-1][2] == tuple(merged):
                rows[-1] = (rows[-1][0], y_hi, rows[-1][2])
            else:
                rows.append((y_lo, y_hi, tuple(merged)))
    return [(lo, y1, hi, y2) for y1, y2, ivs in rows for lo, hi in ivs]

def rects_to_geom(rects: list[tuple[float, float, float, float]]) -> list:
    """One multipolygon from bounds tuples. CONTRACT: rects must be
    pairwise disjoint (e.g. a union_decompose result). OGC multipolygons
    forbid overlapping members; feeding overlaps builds an *invalid*
    geometry whose area follows even-odd parity (overlap XORs out), not
    union. To union overlapping rects, pass each as its own geometry to
    boolean.union_geom / union_area (fuzz-verified semantics)."""
    return [[[(x1, y1), (x2, y1), (x2, y2), (x1, y2)]] for x1, y1, x2, y2 in rects]

def is_rectilinear_rect(poly: list) -> tuple[float, float, float, float] | None:
    """If the polygon is a plain axis-aligned rectangle (4 corners, no holes),
    return its bounds — enables the Klee fast path in the dissolve operator."""
    if len(poly) != 1 or len(poly[0]) != 4:
        return None
    xs = sorted({x for x, _ in poly[0]})
    ys = sorted({y for _, y in poly[0]})
    if len(xs) != 2 or len(ys) != 2:
        return None
    corners = {(x, y) for x in xs for y in ys}
    if set(poly[0]) != corners:
        return None
    return (xs[0], ys[0], xs[1], ys[1])

def rectilinear_decompose(geom: list) -> list[tuple[float, float, float, float]]:
    """Decompose an arbitrary *rectilinear* geometry (axis-aligned edges only;
    any shape — L/T/U polygons, holes, multipolygons) into disjoint rectangles
    by even-odd scanline: split the y-range at every vertex, and within each
    band pair up the crossings of the band midline with vertical edges.

    Raises GeomError on any non-axis-parallel edge — that input needs the
    general boolean-ops kernel (SURVEY.md §7 phase 2)."""
    rects: list[tuple[float, float, float, float]] = []
    for poly in geom:
        fast = is_rectilinear_rect(poly)
        if fast is not None:
            rects.append(fast)
            continue
        edges = []
        for ring in poly:
            n = len(ring)
            for i in range(n):
                (ax, ay), (bx, by) = ring[i], ring[(i + 1) % n]
                if ax != bx and ay != by:
                    raise GeomError(
                        "rectilinear_decompose: non-axis-parallel edge "
                        "(general kernel required)")
                if ax == bx and ay != by:
                    edges.append((ax, min(ay, by), max(ay, by)))
        ys = sorted({y for ring in poly for _, y in ring})
        for y_lo, y_hi in zip(ys, ys[1:]):
            mid = (y_lo + y_hi) / 2.0
            xs = sorted(x for x, e_lo, e_hi in edges if e_lo < mid < e_hi)
            for a, b in zip(xs[::2], xs[1::2]):
                rects.append((a, y_lo, b, y_hi))
    return rects
