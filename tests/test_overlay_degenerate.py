"""Adversarial overlay robustness: degenerate input classes (VERDICT r9 #2).

The reference delegates §2.6 set operations to JTS's noded overlay
(server-plugin pipes Union.java:30-62 etc.), which survives degenerate
real-world inputs.  This suite pins the engine's own kernel
(spatial_spark/geom/clip.py) on exactly the classes where a heuristic
overlay breaks: shared collinear borders (adjacent nation polygons),
slivers around the snap tolerance (1e-9), rings touching at a vertex,
duplicate/collinear redundant vertices, perturbed shared borders (each
side carrying its own near-copy of the border), and near-coincident
operands inside the canonicalization radius (2x snap).

Oracle: exact closed-form areas where the class admits one, plus the
overlay algebra identities that hold for ANY pair at kernel resolution:
    area(A) + area(B) == area(A∪B) + area(A∩B)
    area(A−B) == area(A) − area(A∩B)
    area(AΔB) == area(A∪B) − area(A∩B)
(no external spatial library exists in this environment; the identities
catch every lost/duplicated region without one).

r10 regression anchors: difference(A, A shrunk by ~1.2e-9) returned ALL
of A and union(A, A grown by ~1.2e-9) returned EMPTY before the
classification/canonicalization consistency fix in _overlay_once.
"""

import math
import random

import numpy as np
import pytest

from spatial_spark.geom.algorithms import area
from spatial_spark.geom.clip import difference, intersection, sym_difference, union
from spatial_spark.geom.core import GTYPE_MULTIPOLYGON, GTYPE_POLYGON, Geometry


def poly(pts):
    r = np.array(list(pts) + [pts[0]], dtype=float)
    return Geometry(GTYPE_POLYGON, [r])


def rect(x0, y0, x1, y1):
    return poly([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


def _ops(a, b):
    return (area(union(a, b)), area(intersection(a, b)),
            area(difference(a, b)), area(sym_difference(a, b)))


def assert_conserved(a, b, name="", tol=1e-6):
    u, i, d, s = _ops(a, b)
    A, B = area(a), area(b)
    assert abs((A + B) - (u + i)) <= tol * max(1.0, A + B), \
        f"{name}: A+B={A + B!r} != U+I={u + i!r}"
    assert abs(d - (A - i)) <= tol * max(1.0, A), \
        f"{name}: D={d!r} != A-I={A - i!r}"
    assert abs(s - (u - i)) <= tol * max(1.0, u), \
        f"{name}: S={s!r} != U-I={u - i!r}"
    return u, i, d, s


# ---------------------------------------------------------------------------
# deterministic degenerate classes with exact closed forms
# ---------------------------------------------------------------------------
def test_shared_border_closed_forms():
    cases = [
        # (name, a, b, exp_union, exp_inter, exp_diff)
        ("full shared edge", rect(0, 0, 1, 1), rect(1, 0, 2, 1),
         2.0, 0.0, 1.0),
        ("partial shared edge", rect(0, 0, 1, 1), rect(1, 0.25, 2, 0.75),
         1.5, 0.0, 1.0),
        ("T-junction border", rect(0, 0, 1, 1),
         poly([(1, 0), (2, 0), (2, 1), (1, 1), (1, 0.6), (1, 0.3)]),
         2.0, 0.0, 1.0),
        ("vertex touch", rect(0, 0, 1, 1), rect(1, 1, 2, 2), 2.0, 0.0, 1.0),
        ("duplicate vertices", poly([(0, 0), (1, 0), (1, 0), (1, 1),
                                     (0, 1), (0, 1)]),
         rect(0.5, 0, 1.5, 1), 1.5, 0.5, 0.5),
        ("overlapping collinear edges", rect(0, 0, 2, 1), rect(1, 0, 3, 1),
         3.0, 1.0, 1.0),
        ("corner plus overlap", rect(0, 0, 1, 1), rect(0.5, 0.5, 1.5, 1.5),
         1.75, 0.25, 0.75),
        ("identical", rect(0, 0, 1, 1), rect(0, 0, 1, 1), 1.0, 1.0, 0.0),
        ("contained sharing edge", rect(0, 0, 2, 2), rect(0, 0, 1, 1),
         4.0, 1.0, 3.0),
        ("L-shape two shared borders", rect(0, 0, 1, 1),
         Geometry(GTYPE_POLYGON, [np.array(
             [(1, 0), (2, 0), (2, 2), (0, 2), (0, 1), (1, 1), (1, 0)],
             dtype=float)]),
         4.0, 0.0, 1.0),
        ("shared diagonal (slanted edge)",
         poly([(0, 0), (1, 0), (1, 1)]), poly([(0, 0), (1, 1), (0, 1)]),
         1.0, 0.0, 0.5),
    ]
    for name, a, b, eu, ei, ed in cases:
        u, i, d, s = assert_conserved(a, b, name)
        assert abs(u - eu) <= 1e-6, f"{name}: U={u} exp {eu}"
        assert abs(i - ei) <= 1e-6, f"{name}: I={i} exp {ei}"
        assert abs(d - ed) <= 1e-6, f"{name}: D={d} exp {ed}"


def test_slanted_shared_edge_fuzz():
    """Two triangles sharing an arbitrary-angle edge: union = sum of
    areas, intersection measure-zero — the general (non-rect-fast-path)
    shared collinear border."""
    rng = random.Random(42)
    for t in range(200):
        ang = rng.uniform(0, math.pi)
        x0, y0 = rng.uniform(-5, 5), rng.uniform(-5, 5)
        length = rng.uniform(0.5, 3)
        p = (x0, y0)
        q = (x0 + length * math.cos(ang), y0 + length * math.sin(ang))
        h1, h2 = rng.uniform(0.2, 2), rng.uniform(0.2, 2)
        nx, ny = -math.sin(ang), math.cos(ang)
        mx, my = (p[0] + q[0]) / 2, (p[1] + q[1]) / 2
        a = poly([p, q, (mx + nx * h1, my + ny * h1)])
        b = poly([q, p, (mx - nx * h2, my - ny * h2)])
        u, i, d, s = assert_conserved(a, b, f"slant-{t}")
        exp_u = length * (h1 + h2) / 2
        assert abs(u - exp_u) <= 1e-6 * max(1, exp_u), f"slant-{t}: U={u}"
        assert i <= 1e-6, f"slant-{t}: I={i}"


def test_sliver_spectrum():
    """Slivers of width 1e-6 down through 1e-11 (straddling the 1e-9
    snap): inside-sliver and shared-edge-outside-sliver against a unit
    square.  Below resolution the kernel may return the measure-zero
    answer; the error bound is max(w, resolution) per op."""
    for w in (1e-6, 1e-7, 1e-8, 1e-9, 1e-10, 1e-11):
        a = rect(0, 0, 1, 1)
        b_in = poly([(1 - w, 0), (1, 0), (1, 1), (1 - w, 1)])
        b_out = poly([(1, 0), (1 + w, 0), (1 + w, 1), (1, 1)])
        u, i, d, s = assert_conserved(a, b_in, f"sliver-in-{w:g}", tol=1e-5)
        assert abs(u - 1.0) <= 1e-5
        assert i <= w + 1e-8
        u, i, d, s = assert_conserved(a, b_out, f"sliver-out-{w:g}", tol=1e-5)
        assert abs(u - (1.0 + w)) <= 1e-5
        assert i <= 1e-8


def test_near_coincident_regression():
    """r10 finds: operands identical up to a perturbation INSIDE the
    endpoint-canonicalization radius (1..2x snap).  Before the fix,
    difference(A, A shrunk by 1.21e-9) returned ALL of A (error ~1) and
    union(A, A grown by 1.21e-9) returned EMPTY.  At kernel resolution
    the right answers are the measure-zero ones."""
    a = rect(0, 0, 1, 1)
    for e in (1.0e-9, 1.21e-9, 1.5e-9, 1.9e-9, 2.1e-9, 5e-9):
        shrunk = poly([(e, e), (1 - e, e), (1 - e, 1 - e), (e, 1 - e)])
        grown = poly([(-e, -e), (1 + e, -e), (1 + e, 1 + e), (-e, 1 + e)])
        for b, kind in ((shrunk, "shrunk"), (grown, "grown")):
            u, i, d, s = _ops(a, b)
            bound = 16 * max(e, 1e-9)  # measure of the sliver frame + slack
            assert abs(u - 1.0) <= bound, f"{kind}-{e:g}: U={u!r}"
            assert abs(i - 1.0) <= bound, f"{kind}-{e:g}: I={i!r}"
            assert d <= bound, f"{kind}-{e:g}: D={d!r}"
            assert s <= 2 * bound, f"{kind}-{e:g}: S={s!r}"


def test_near_coincident_rotation():
    """Same square, one copy rotated by a tiny angle about the center —
    every vertex moves ~eps/sqrt(2); all four ops must stay within the
    perturbation measure of the identical-operand answers."""
    base = [(0, 0), (1, 0), (1, 1), (0, 1)]
    for eps in (1e-7, 1e-9, 1e-11):
        c, s_ = math.cos(eps), math.sin(eps)
        rot = [((x - .5) * c - (y - .5) * s_ + .5,
                (x - .5) * s_ + (y - .5) * c + .5) for x, y in base]
        a, b = poly(base), poly(rot)
        u, i, d, s = assert_conserved(a, b, f"rot-{eps:g}", tol=1e-4)
        assert abs(u - 1.0) <= 1e-4 and abs(i - 1.0) <= 1e-4


def test_perturbed_shared_border_fuzz():
    """Adjacent polygons where B's copy of the shared border carries
    extra vertices displaced off the line by ±delta (1e-12..1e-7) —
    the messy-OSM adjacent-nations class.  The algebra identities must
    hold to 1e-4 across the whole delta spectrum."""
    rng = random.Random(7)
    for t in range(200):
        delta = 10 ** rng.uniform(-12, -7)
        n_extra = rng.randint(1, 4)
        ys = sorted(rng.uniform(0.05, 0.95) for _ in range(n_extra))
        pert_desc = [(1.0 + rng.choice([-1, 1]) * delta, y)
                     for y in reversed(ys)]
        a = rect(0, 0, 1, 1)
        b = poly([(2, 0), (2, 1), (1, 1)] + pert_desc + [(1, 0)])
        u, i, d, s = assert_conserved(a, b, f"pert-{t} d={delta:.2e}",
                                      tol=1e-4)
        assert abs(u - 2.0) <= 1e-4, f"pert-{t}: U={u}"


def test_sliver_gap_fuzz():
    """Tiles separated by a gap of width 1e-12..1e-6: union must be the
    two tiles (minus at most the gap measure), intersection empty."""
    rng = random.Random(13)
    for t in range(80):
        g = 10 ** rng.uniform(-12, -6)
        a = rect(0, 0, 1, 1)
        b = poly([(1 + g, 0), (2, 0), (2, 1), (1 + g, 1)])
        u, i, d, s = assert_conserved(a, b, f"gap-{t} g={g:.2e}", tol=1e-4)
        assert abs(u - 2.0) <= 1e-4 and i <= 1e-6


def test_grid_tiling_union_fold():
    """Union-fold of an n x n tiling of unit cells (every interior border
    shared, every interior corner degree-4): exact area n^2."""
    for n in (2, 3, 4):
        acc = None
        for i in range(n):
            for j in range(n):
                cell = rect(i, j, i + 1, j + 1)
                acc = cell if acc is None else union(acc, cell)
        assert abs(area(acc) - n * n) <= 1e-6, f"n={n}: {area(acc)}"


def test_perturbed_tiling_union_fold():
    """3x3 tiling where every tile carries ITS OWN perturbed copy of each
    shared corner (±delta, 1e-11..1e-8) — the real-world digitization
    mess.  The fold must stay within 1e-3 of 9."""
    rng = random.Random(99)
    for t in range(25):
        delta = 10 ** rng.uniform(-11, -8)
        acc = None
        for i in range(3):
            for j in range(3):
                pts = [(i, j), (i + 1, j), (i + 1, j + 1), (i, j + 1)]
                pts = [(x + rng.uniform(-delta, delta),
                        y + rng.uniform(-delta, delta)) for x, y in pts]
                cell = poly(pts)
                acc = cell if acc is None else union(acc, cell)
        got = area(acc)
        assert abs(got - 9.0) <= 1e-3, f"tiling-{t} d={delta:.2e}: {got}"


def test_hole_touching_shell_conservation():
    """Shell with a diamond hole whose apex touches the shell boundary,
    overlaid with a rectangle crossing both — ring-touching-ring noding."""
    rng = random.Random(31)
    for t in range(60):
        s = rng.uniform(1, 3)
        shell = np.array([(0, 0), (s, 0), (s, s), (0, s), (0, 0)],
                         dtype=float)
        hw = rng.uniform(0.1, s / 2 * 0.9)
        cx = s / 2
        hole = np.array([(cx, s), (cx - hw, s - hw), (cx, s - 2 * hw),
                         (cx + hw, s - hw), (cx, s)], dtype=float)[::-1].copy()
        a = Geometry(GTYPE_POLYGON, [shell, hole])
        b = poly([(cx - hw / 2, s - 3 * hw), (cx + s, s - 3 * hw),
                  (cx + s, s + 1), (cx - hw / 2, s + 1)])
        assert_conserved(a, b, f"hole-touch-{t}", tol=1e-4)


def test_duplicate_collinear_vertices_fuzz():
    """Shared border where A carries duplicate vertices and B carries
    duplicate + collinear redundant vertices ON the border."""
    rng = random.Random(55)
    for t in range(60):
        x = rng.uniform(-2, 2)
        a = poly([(x, 0), (x + 1, 0), (x + 1, 0), (x + 1, 1),
                  (x + 0.5, 1), (x, 1)])
        b = poly([(x + 1, 0), (x + 2, 0), (x + 2, 1), (x + 1, 1),
                  (x + 1, 0.7), (x + 1, 0.7), (x + 1, 0.3)])
        u, i, d, s = assert_conserved(a, b, f"dupcol-{t}")
        assert abs(u - 2.0) <= 1e-6 and i <= 1e-6


def test_zero_width_spike_conservation():
    """Input polygon with a zero-width antenna spike (degenerate ring
    section) overlapped by a clean rectangle."""
    rng = random.Random(77)
    for t in range(40):
        x = rng.uniform(0.2, 0.8)
        a = poly([(0, 0), (1, 0), (1, 1), (x, 1), (x, 1.5), (x, 1), (0, 1)])
        b = poly([(0.5, 0.5), (1.5, 0.5), (1.5, 1.2), (0.5, 1.2)])
        assert_conserved(a, b, f"spike-{t}", tol=1e-4)


def test_bowtie_multipolygon_vertex_touch():
    """Multipolygon whose two parts touch at a single point, overlaid
    with a rectangle covering the touch point."""
    rng = random.Random(101)
    t1 = Geometry(GTYPE_POLYGON,
                  [np.array([(0, 0), (1, 1), (0, 2), (0, 0)], dtype=float)])
    t2 = Geometry(GTYPE_POLYGON,
                  [np.array([(2, 0), (1, 1), (2, 2), (2, 0)], dtype=float)])
    m = Geometry(GTYPE_MULTIPOLYGON, [t1, t2])
    for t in range(40):
        c = rng.uniform(0.5, 1.5)
        b = poly([(c - 0.3, 0.7), (c + 0.3, 0.7), (c + 0.3, 1.3),
                  (c - 0.3, 1.3)])
        assert_conserved(m, b, f"bowtie-{t}", tol=1e-4)


def test_fan_shared_edge_multi_vertex_fuzz():
    """Two SIMPLE fans sharing an edge (1-3 extra vertices per side,
    random angle, scales 1e-2..1e3): union = A+B exactly, intersection
    measure-zero — the multi-vertex generalization of the slanted
    shared-edge class across 5 decades of coordinate scale."""
    rng = random.Random(77001)
    for t in range(250):
        sc = 10 ** rng.uniform(-2, 3)
        ang = rng.uniform(0, 2 * math.pi)
        x0, y0 = rng.uniform(-9, 9) * sc, rng.uniform(-9, 9) * sc
        ln = rng.uniform(0.1, 2) * sc
        p = (x0, y0)
        q = (x0 + ln * math.cos(ang), y0 + ln * math.sin(ang))
        nx, ny = -math.sin(ang), math.cos(ang)

        def fan(side, m):
            pts = [p, q] if side > 0 else [q, p]
            for j in range(m):
                f = (j + 1) / (m + 1)
                h = rng.uniform(0.1, 1.5) * sc * side
                pos = (1 - f) if side > 0 else f   # keep the ring simple
                pts.append((p[0] + (q[0] - p[0]) * pos + nx * h,
                            p[1] + (q[1] - p[1]) * pos + ny * h))
            return poly(pts)

        a = fan(1, rng.randint(1, 3))
        b = fan(-1, rng.randint(1, 3))
        u, i, d, s = assert_conserved(a, b, f"fan-{t}", tol=1e-4)
        A, B = area(a), area(b)
        assert abs(u - (A + B)) <= 1e-4 * max(1.0, A + B), f"fan-{t}"
        assert i <= 1e-4 * max(1.0, A + B), f"fan-{t}"


def test_general_near_coincident_fuzz():
    """General (non-axis) convex-ish polygons vs per-vertex-perturbed
    copies, noise 1e-12..1e-6 relative across scales 1e-1..1e2 — the
    zigzag-noding class where the r10 campaign caught phantom rings
    (intersection LARGER than its inputs; union holding a detached
    'hole').  The assembled-soundness check + area-bound snap
    escalation must keep every op within the algebra identities."""
    rng = random.Random(77002)
    for t in range(250):
        sc = 10 ** rng.uniform(-1, 2)
        m = rng.randint(3, 7)
        cx, cy = rng.uniform(-5, 5) * sc, rng.uniform(-5, 5) * sc
        angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(m))
        if min(b2 - a2 for a2, b2 in zip(angs, angs[1:])) < 0.15:
            continue
        rads = [rng.uniform(0.5, 1.5) * sc for _ in range(m)]
        base = [(cx + r * math.cos(a2), cy + r * math.sin(a2))
                for a2, r in zip(angs, rads)]
        eps = 10 ** rng.uniform(-12, -6) * sc
        pert = [(x + rng.uniform(-eps, eps), y + rng.uniform(-eps, eps))
                for x, y in base]
        assert_conserved(poly(base), poly(pert),
                         f"nearco-{t} eps={eps:.1e}", tol=1e-3)


def test_point_membership_oracle():
    """Independent semantics oracle: sample points off every boundary and
    require membership in the overlay result to equal the boolean of the
    input memberships — catches topology errors area identities can't."""
    from spatial_spark.geom.algorithms import point_in_polygon
    rng = random.Random(2024)
    for t in range(40):
        # two random quads sharing a border segment with a T junction
        x = rng.uniform(-1, 1)
        a = rect(x, 0, x + 1, 1)
        b = poly([(x + 1, 0), (x + 2, 0), (x + 2, 1), (x + 1, 1),
                  (x + 1, rng.uniform(0.3, 0.7))])
        u_g, i_g, d_g = union(a, b), intersection(a, b), difference(a, b)
        for _ in range(50):
            px, py = x + rng.uniform(-0.5, 2.5), rng.uniform(-0.5, 1.5)
            # skip points near any boundary (classification tolerance)
            if (min(abs(px - x), abs(px - x - 1), abs(px - x - 2)) < 1e-6
                    or min(abs(py), abs(py - 1)) < 1e-6):
                continue
            in_a = point_in_polygon(px, py, a) == 2
            in_b = point_in_polygon(px, py, b) == 2
            assert (point_in_polygon(px, py, u_g) == 2) == (in_a or in_b)
            assert (point_in_polygon(px, py, i_g) == 2) == (in_a and in_b)
            assert (point_in_polygon(px, py, d_g) == 2) == \
                (in_a and not in_b)
