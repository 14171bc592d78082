"""Ellipsoidal geodesic length (functions/geodesic.py) — VERDICT r9 #7.

Reference precedent: OrthodromicLength.java:34-75 delegates to
GeoTools' ellipsoidal GeodeticCalculator; the engine keeps spherical
haversine as the reference-parity default and adds the WGS84 Vincenty
tier validated here against published closed forms and test vectors.
"""

import math
import random

import numpy as np
import pytest

from spatial_spark.functions.geodesic import (GEO_A, GEO_B, GEO_F,
                                              geodesic_length_m,
                                              vincenty_ctes, vincenty_m)

# WGS84 quarter meridian, the standard closed form (elliptic integral;
# published value 10 001 965.729 m)
QUARTER_MERIDIAN_M = 10_001_965.729


def test_meridian_closed_form():
    assert abs(float(vincenty_m(0.0, 0.0, 90.0, 0.0))
               - QUARTER_MERIDIAN_M) < 5e-3
    # meridian arcs add: 0→45→90 equals 0→90 (meridians are geodesics)
    two = float(vincenty_m(0, 10, 45, 10)) + float(vincenty_m(45, 10, 90, 10))
    assert abs(two - QUARTER_MERIDIAN_M) < 5e-3


def test_equator_closed_form():
    """The equator is a geodesic of the ellipsoid: distance = a·Δλ
    exactly (the series is exact there, cos²α = 0)."""
    for dl in (0.5, 1.0, 10.0, 90.0):
        want = GEO_A * math.radians(dl)
        assert abs(float(vincenty_m(0.0, 7.0, 0.0, 7.0 + dl)) - want) < 1e-6


def test_vincenty_standard_line():
    """Geoscience Australia / Vincenty's standard test vector:
    Flinders Peak → Buninyong = 54 972.271 m."""
    lat1 = -(37 + 57 / 60 + 3.72030 / 3600)
    lon1 = 144 + 25 / 60 + 29.52440 / 3600
    lat2 = -(37 + 39 / 60 + 10.15610 / 3600)
    lon2 = 143 + 55 / 60 + 35.38390 / 3600
    assert abs(float(vincenty_m(lat1, lon1, lat2, lon2)) - 54_972.271) < 1e-2


def test_symmetry_zero_and_haversine_band():
    """d(a,b) == d(b,a); d(a,a) == 0; the spherical R=6371 distance
    agrees within the flattening band (|sphere/geodesic − 1| < 0.6%)
    away from the antipodal zone."""
    rng = random.Random(4)
    for _ in range(300):
        lat1, lon1 = rng.uniform(-85, 85), rng.uniform(-180, 180)
        lat2, lon2 = rng.uniform(-85, 85), rng.uniform(-180, 180)
        d = float(vincenty_m(lat1, lon1, lat2, lon2))
        dr = float(vincenty_m(lat2, lon2, lat1, lon1))
        assert abs(d - dr) <= 1e-6 * max(1.0, d)
        assert float(vincenty_m(lat1, lon1, lat1, lon1)) == 0.0
        # spherical law of cosines, R = 6371 km (the engine default)
        s = (math.sin(math.radians(lat1)) * math.sin(math.radians(lat2))
             + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
             * math.cos(math.radians(lon2 - lon1)))
        sphere = math.acos(max(-1.0, min(1.0, s))) * 6_371_000.0
        if d > 1000.0 and sphere < 19_000_000.0:   # off the antipodal zone
            assert abs(sphere / d - 1.0) < 0.006, (lat1, lon1, lat2, lon2)


def test_triangle_inequality_fuzz():
    rng = random.Random(9)
    for _ in range(200):
        pts = [(rng.uniform(-80, 80), rng.uniform(-180, 180))
               for _ in range(3)]
        d01 = float(vincenty_m(pts[0][0], pts[0][1], pts[1][0], pts[1][1]))
        d12 = float(vincenty_m(pts[1][0], pts[1][1], pts[2][0], pts[2][1]))
        d02 = float(vincenty_m(pts[0][0], pts[0][1], pts[2][0], pts[2][1]))
        assert d02 <= d01 + d12 + 1e-6


def test_kernel_matches_sql_text(spark):
    """The dual-engine SQL (vincenty_ctes) equals the numpy kernel to
    sub-mm in BOTH engines — the same contract as the CRS tiers."""
    import duckdb
    rng = random.Random(21)
    rows = [(rng.uniform(-85, 85), rng.uniform(-180, 180),
             rng.uniform(-85, 85), rng.uniform(-180, 180))
            for _ in range(60)]
    vals = ", ".join(
        "(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in r) + ")"
        for r in rows)
    base_duck = (f"SELECT * FROM (VALUES {vals}) "
                 f"AS t(lat1, lon1, lat2, lon2)")
    base_spark = (f"SELECT * FROM VALUES {vals} "
                  f"AS t(lat1, lon1, lat2, lon2)")
    tail = " SELECT lat1, geodesic_m FROM _vin_out"
    duck = duckdb.connect().execute(
        vincenty_ctes(base_duck) + tail).fetchall()
    spk = spark.sql(vincenty_ctes(base_spark) + tail).collect()
    got_d = {round(r[0], 9): r[1] for r in duck}
    for r in spk:
        want = float(vincenty_m(*[x for x in rows
                                  if round(x[0], 9) == round(r[0], 9)][0]))
        assert abs(r["geodesic_m"] - want) < 1e-3
        # JVM Math vs C libm differ in trig tails: nanometer-scale
        assert abs(got_d[round(r["lat1"], 9)] - r["geodesic_m"]) < 1e-6


def test_geometry_length_and_udf(spark):
    """geodesic_length_m sums per-segment distances over linestrings
    and polygon rings; the registered st_length_geodesic UDF matches."""
    from spatial_spark.functions import register_all
    from spatial_spark.geom.wkt import from_wkt
    register_all(spark)
    g = from_wkt("LINESTRING (0 0, 1 0, 1 1)")
    want = float(vincenty_m(0, 0, 0, 1)) + float(vincenty_m(0, 1, 1, 1))
    assert abs(geodesic_length_m(g) - want) < 1e-9
    ring = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 0))")
    per = (float(vincenty_m(0, 0, 0, 1)) + float(vincenty_m(0, 1, 1, 1))
           + float(vincenty_m(1, 1, 0, 0)))
    assert abs(geodesic_length_m(ring) - per) < 1e-9
    got = spark.sql(
        "SELECT st_length_geodesic(st_geomfromtext("
        "'LINESTRING (0 0, 1 0, 1 1)')) AS m").first()["m"]
    assert abs(got - want) < 1e-9


def test_near_antipodal_documented_envelope():
    """Near-antipodal pairs sit in Vincenty's classical non-convergence
    zone: the fixed-step iterate stays FINITE and within the spherical
    error envelope (a defined, documented output — never NaN/inf)."""
    d = float(vincenty_m(0.0, 0.0, 0.0, 179.999))
    assert np.isfinite(d)
    assert abs(d - math.pi * GEO_A) / (math.pi * GEO_A) < 0.01
    d2 = float(vincenty_m(10.0, 0.0, -10.0, 179.995))
    assert np.isfinite(d2) and d2 > 1.9e7


def test_inverse_convergence_flag_and_antipodal_guard():
    """VERDICT r10 ask #8: vincenty_inverse_m flags the classical
    non-convergence zone; st_distance_geodesic raises there instead of
    returning a non-survey-grade number, and returns the exact kernel
    distance everywhere else."""
    from spatial_spark.functions.geodesic import (geodesic_distance_m,
                                                  vincenty_inverse_m)
    from spatial_spark.geom.wkt import from_wkt

    # ordinary pairs: converged, distance == the length-kernel's number
    rng = random.Random(11)
    for _ in range(200):
        lat1, lon1 = rng.uniform(-80, 80), rng.uniform(-180, 180)
        # keep the second point well away from the antipode
        lat2 = max(-80.0, min(80.0, lat1 + rng.uniform(-40, 40)))
        lon2 = lon1 + rng.uniform(-90, 90)
        d, ok = vincenty_inverse_m(lat1, lon1, lat2, lon2)
        assert bool(ok)
        assert float(d) == float(vincenty_m(lat1, lon1, lat2, lon2))
    # the near-antipodal zone is flagged, not silently wrong
    _, ok = vincenty_inverse_m(0.0, 0.0, 0.0, 179.999)
    assert not bool(ok)
    _, ok = vincenty_inverse_m(10.0, 0.0, -10.0, 179.995)
    assert not bool(ok)
    # …and the guarded point-pair function raises there
    p = from_wkt("POINT (0 0)")
    q = from_wkt("POINT (179.999 0)")
    with pytest.raises(ValueError, match="antipodal"):
        geodesic_distance_m(p, q)
    # Flinders Peak → Buninyong through the guarded function
    fp = from_wkt("POINT (144.42486788888888 -37.95103341666667)")
    bu = from_wkt("POINT (143.92649552777777 -37.65282113888889)")
    assert abs(geodesic_distance_m(fp, bu) - 54_972.271) < 5e-2
    # non-points refuse
    with pytest.raises(TypeError):
        geodesic_distance_m(from_wkt("LINESTRING (0 0, 1 1)"), p)


def test_st_distance_geodesic_udf(spark):
    """The registered SQL function runs the guarded kernel."""
    from spatial_spark.functions import register_all
    register_all(spark)
    row = spark.sql(
        "SELECT st_distance_geodesic(st_point(0.0D, 0.0D), "
        "st_point(1.0D, 0.0D)) AS d").collect()[0]
    # one degree of longitude along the equator: a * pi/180 exactly
    assert abs(row.d - GEO_A * math.pi / 180.0) < 1e-6
