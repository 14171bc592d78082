"""Shapefile + OSM importer tests (reference: ShapefileImporter / OSMImporter
golden behaviors on tiny fixtures, cf. TestOSMImportBase / two-street.osm)."""

import os
import textwrap

import pytest
from pyspark.sql import functions as F

from spatial_spark.geom import Geometry, from_wkb, from_wkt, to_wkt
from spatial_spark.geom.algorithms import area
from spatial_spark.io.shapefile import (
    import_shapefile, read_shapefile, write_shapefile,
)
from spatial_spark.io.osm import (
    assemble_multipolygons, assemble_way_geometries, import_osm, parse_osm_xml,
)

TWO_STREET_OSM = textwrap.dedent("""\
    <?xml version='1.0' encoding='UTF-8'?>
    <osm version="0.6">
      <node id="1" lon="12.9710" lat="56.0538"/>
      <node id="2" lon="12.9740" lat="56.0545"/>
      <node id="3" lon="12.9776" lat="56.0561"/>
      <node id="4" lon="12.9814" lat="56.0572"/>
      <node id="10" lon="12.99" lat="56.05"/>
      <node id="11" lon="12.995" lat="56.05"/>
      <node id="12" lon="12.995" lat="56.055"/>
      <node id="13" lon="12.99" lat="56.055"/>
      <way id="100">
        <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/>
        <tag k="highway" v="residential"/><tag k="name" v="Villagatan"/>
      </way>
      <way id="200">
        <nd ref="10"/><nd ref="11"/><nd ref="12"/><nd ref="13"/><nd ref="10"/>
        <tag k="building" v="yes"/>
      </way>
      <relation id="300">
        <member type="way" ref="200" role="outer"/>
        <tag k="type" v="multipolygon"/>
      </relation>
    </osm>
""")


def test_shapefile_roundtrip_points(ctx, tmp_path):
    rows = [(Geometry.point(1.5, 2.5), {"name": "a", "val": 7}),
            (Geometry.point(-3.0, 4.0), {"name": "b", "val": 9})]
    shp = str(tmp_path / "pts.shp")
    write_shapefile(rows, shp)
    geoms, attrs, crs = read_shapefile(shp)
    assert [to_wkt(g) for g in geoms] == ["POINT (1.5 2.5)", "POINT (-3 4)"]
    assert attrs[0]["name"] == "a" and attrs[0]["val"] == 7
    layer = import_shapefile(ctx, shp, "shp_pts")
    assert layer.count() == 2
    assert "name" in layer.attribute_names()


def test_shapefile_roundtrip_polygons(ctx, tmp_path):
    poly = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    line = from_wkt("LINESTRING (0 0, 5 5, 10 0)")
    shp1 = str(tmp_path / "polys.shp")
    write_shapefile([(poly, {"kind": "sq"})], shp1)
    geoms, attrs, _ = read_shapefile(shp1)
    assert area(geoms[0]) == pytest.approx(96.0)  # hole preserved
    shp2 = str(tmp_path / "lines.shp")
    write_shapefile([(line, {})], shp2)
    geoms2, _, _ = read_shapefile(shp2)
    assert to_wkt(geoms2[0]) == "LINESTRING (0 0, 5 5, 10 0)"


def test_osm_parse_and_assembly(spark, tmp_path):
    osm_path = str(tmp_path / "two-street.osm")
    with open(osm_path, "w") as f:
        f.write(TWO_STREET_OSM)
    tables = parse_osm_xml(spark, osm_path)
    assert tables["osm_nodes"].count() == 8
    assert tables["osm_way_nds"].count() == 9
    geoms = {r["way_id"]: (from_wkb(r["geom"]), r["gtype"])
             for r in assemble_way_geometries(tables).collect()}
    g100, t100 = geoms[100]
    assert t100 == 2  # LineString street
    assert to_wkt(g100).startswith("LINESTRING (12.971 56.0538, 12.974")
    g200, t200 = geoms[200]
    assert t200 == 3  # closed building way -> Polygon
    assert area(g200) == pytest.approx(0.005 * 0.005)
    mp = {r["rel_id"]: from_wkb(r["geom"])
          for r in assemble_multipolygons(tables).collect()}
    assert area(mp[300]) == pytest.approx(0.005 * 0.005)


def test_osm_import_layer(ctx, spark, tmp_path):
    osm_path = str(tmp_path / "mini.osm")
    with open(osm_path, "w") as f:
        f.write(TWO_STREET_OSM)
    layer, tables = import_osm(ctx, osm_path, "osm_mini")
    assert layer.count() == 2
    # FilterOSMAttributes parity: filter layer by tag via the tags map column
    named = layer.df().filter(F.col("tags")["name"] == "Villagatan")
    assert named.count() == 1
    # window search over the imported layer
    res = layer.bbox_search(12.97, 56.05, 12.98, 56.06)
    assert res.count() >= 1


def test_render_layer_png(ctx, spark, tmp_path):
    from spatial_spark.io.render import render_layer, render_to_file, render_tiles
    layer = ctx.create_wkt_layer("render_me")
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
         (2, "LINESTRING (0 0, 10 10)"),
         (3, "POINT (5 5)")],
        "id long, wkt string")
    layer.add(df, wkt="wkt")
    png = render_layer(layer, width=64, height=64)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(png) > 100
    p = render_to_file(layer, str(tmp_path / "out.png"), width=32, height=32)
    assert os.path.getsize(p) > 50
    tiles = render_tiles(layer.df(), (0, 0, 10, 10), 2, 2, tile_px=32).collect()
    assert len(tiles) == 4
    assert all(t["png"][:8] == b"\x89PNG\r\n\x1a\n" for t in tiles)


def test_export_sinks(ctx, spark, tmp_path):
    from spatial_spark.io.export import export_geojson, export_lines
    import json
    layer = ctx.create_wkt_layer("exp")
    layer.add(spark.createDataFrame(
        [(1, "POINT (1 2)", "a"), (2, "LINESTRING (0 0, 1 1)", "b")],
        "id long, wkt string, name string"), wkt="wkt")
    p = export_geojson(layer, str(tmp_path / "out.geojson"))
    fc = json.load(open(p))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2
    names = {f["properties"]["name"] for f in fc["features"]}
    assert names == {"a", "b"}
    d = export_lines(layer, str(tmp_path / "wkts"), fmt="wkt")
    lines = spark.read.text(d).collect()
    assert len(lines) == 2 and any("POINT" in r["value"] for r in lines)


def test_export_geojsonl_distributed(ctx, spark, tmp_path):
    from spatial_spark.io.export import export_geojsonl
    import json
    layer = ctx.create_wkt_layer("expl")
    layer.add(spark.createDataFrame(
        [(1, "POINT (1 2)", "a"), (2, "POINT (3 4)", "b")],
        "id long, wkt string, name string"), wkt="wkt")
    d = export_geojsonl(layer, str(tmp_path / "features"))
    feats = [json.loads(r["value"]) for r in spark.read.text(d).collect()]
    assert len(feats) == 2
    assert {f["properties"]["name"] for f in feats} == {"a", "b"}
    assert all(f["type"] == "Feature" and "coordinates" in f["geometry"]
               for f in feats)


def test_export_render_never_collect(ctx, spark, tmp_path, monkeypatch):
    """Scale guard: the streamed sinks must not funnel rows through
    DataFrame.collect (r1/r2 verdict scale-killer)."""
    from pyspark.sql import DataFrame as SparkDF
    from spatial_spark.io.export import export_geojson
    from spatial_spark.io.render import render_to_file
    layer = ctx.create_wkt_layer("noc")
    layer.add(spark.createDataFrame(
        [(1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "a"),
         (2, "POINT (2 2)", "b")],
        "id long, wkt string, name string"), wkt="wkt")

    def boom(self):
        raise AssertionError("driver-side collect() in a streamed sink")

    monkeypatch.setattr(SparkDF, "collect", boom)
    p = export_geojson(layer, str(tmp_path / "nc.geojson"))
    import json
    fc = json.load(open(p))
    assert len(fc["features"]) == 2
    png_path = render_to_file(layer, str(tmp_path / "nc.png"),
                              width=32, height=32)
    assert os.path.getsize(png_path) > 50


def test_named_conversion_functions(ctx, spark):
    """SpatialFunctions.java:46-136 parity surface."""
    from spatial_spark.functions.conversion import (
        as_geometry, as_map, native_to_wkt, wkt_to_geojson,
    )
    layer = ctx.create_wkt_layer("convs")
    layer.add(spark.createDataFrame(
        [(7, "POINT (3 4)", "x")], "id long, wkt string, name string"),
        wkt="wkt")
    # decodeGeometry / nodeAsWKT / extractAttributes on a layer row
    g = layer.decode_geometry(7)
    assert tuple(g.data) == (3.0, 4.0)
    assert layer.node_as_wkt(7) == "POINT (3 4)"
    attrs = layer.extract_attributes(7)
    assert attrs["name"] == "x" and attrs["id"] == 7 and "geom" not in attrs
    import pytest
    with pytest.raises(KeyError):
        layer.node_as_wkt(99)
    # asMap / asGeometry / wktToGeoJson / neo4jGeometryToWkt
    m = as_map("POINT (1 2)")
    assert m == {"type": "Point", "coordinates": [1.0, 2.0]}
    assert as_geometry(m).gtype == 1
    assert wkt_to_geojson("POINT (1 2)")["type"] == "Point"
    assert wkt_to_geojson(None) is None
    assert native_to_wkt((1.0, 2.0)) == "POINT (1 2)"
    assert native_to_wkt([(0.0, 0.0), (1.0, 1.0)]) == "LINESTRING (0 0, 1 1)"


def test_sld_styled_render(ctx, spark, tmp_path):
    """StyledImageExporter SLD subset: rule colors reach the raster."""
    from spatial_spark.io.render import render_layer
    from spatial_spark.io.sld import parse_sld, resolve_color
    sld = """<?xml version="1.0"?>
    <StyledLayerDescriptor xmlns="http://www.opengis.net/sld"
        xmlns:ogc="http://www.opengis.net/ogc">
      <NamedLayer><UserStyle><FeatureTypeStyle>
        <Rule>
          <ogc:Filter><ogc:And>
            <ogc:PropertyIsEqualTo>
              <ogc:Function name="geometryType">
                <ogc:PropertyName>the_geom</ogc:PropertyName>
              </ogc:Function>
              <ogc:Literal>Polygon</ogc:Literal>
            </ogc:PropertyIsEqualTo>
            <ogc:PropertyIsEqualTo>
              <ogc:PropertyName>rank</ogc:PropertyName>
              <ogc:Literal>1</ogc:Literal>
            </ogc:PropertyIsEqualTo>
          </ogc:And></ogc:Filter>
          <PolygonSymbolizer><Fill>
            <CssParameter name="fill">#FF0000</CssParameter>
          </Fill></PolygonSymbolizer>
        </Rule>
        <Rule>
          <LineSymbolizer><Stroke>
            <CssParameter name="stroke">#00FF00</CssParameter>
          </Stroke></LineSymbolizer>
        </Rule>
      </FeatureTypeStyle></UserStyle></NamedLayer>
    </StyledLayerDescriptor>"""
    rules = parse_sld(sld)
    assert rules[0]["geometry_type"] == "Polygon"
    assert rules[0]["property"] == "rank" and rules[0]["value"] == "1"
    assert rules[0]["fill"] == (255, 0, 0)
    assert rules[1]["stroke"] == (0, 255, 0)
    # resolve: polygon rank=1 -> red; polygon rank=2 -> catch-all green
    assert resolve_color(rules, 3, {"rank": 1}) == (255, 0, 0)
    assert resolve_color(rules, 3, {"rank": 2}) == (0, 255, 0)
    layer = ctx.create_wkt_layer("sld_render")
    layer.add(spark.createDataFrame(
        [(1, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))", 1),
         (2, "POLYGON ((10 10, 14 10, 14 14, 10 14, 10 10))", 2)],
        "id long, wkt string, rank int"), wkt="wkt")
    png = render_layer(layer, width=48, height=48, sld=sld)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------- datastore
def test_datastore_layer_types_and_rw(ctx, spark):
    from spatial_spark.io.datastore import SpatialDataStore
    store = SpatialDataStore(ctx)
    store.create_schema("ds_pts", kind="point", x="lon", y="lat")
    w = store.get_feature_writer("ds_pts")
    w.write(spark.createDataFrame(
        [(1, 10.0, 45.0, "a"), (2, 11.0, 46.0, "b"), (3, 50.0, -3.0, "c")],
        "id long, lon double, lat double, name string"))
    assert "ds_pts" in store.get_type_names()
    src = store.get_feature_source("ds_pts")
    assert src.features().count() == 3
    assert "zkey" not in src.features().columns         # internals hidden
    assert {f.name for f in store.get_schema("ds_pts")} >= {"xmin", "name"}
    # bbox goes through the layer's pruned search path
    assert src.bbox(9.0, 44.0, 12.0, 47.0).count() == 2
    assert src.cql("name = 'c'").count() == 1
    b = src.bounds()
    assert b[0] == 10.0 and b[3] == 46.0


def test_datastore_external_shapefile_and_geojsonl(ctx, spark, tmp_path):
    from spatial_spark.io.datastore import SpatialDataStore
    from spatial_spark.io.export import export_geojsonl
    store = SpatialDataStore(ctx)
    # shapefile source
    shp = str(tmp_path / "ext.shp")
    write_shapefile([(Geometry.point(1.0, 2.0), {"name": "x"}),
                     (Geometry.point(30.0, 40.0), {"name": "y"})], shp)
    src = store.register_file("ext_shp", shp)
    assert src.features().count() == 2
    assert src.bbox(0.0, 0.0, 10.0, 10.0).count() == 1
    assert src.cql("name = 'y'").count() == 1
    # geojsonl source: round-trip a layer through the export sink
    layer = ctx.create_wkt_layer("ds_exp")
    layer.add(spark.createDataFrame(
        [(1, "POINT (1 2)", "a"), (2, "LINESTRING (0 0, 5 5)", "b")],
        "id long, wkt string, name string"), wkt="wkt")
    d = export_geojsonl(layer, str(tmp_path / "feats"))
    gsrc = store.register_file("ext_gjl", d, fmt="geojsonl")
    got = gsrc.features()
    assert got.count() == 2
    assert got.filter("xmax = 5.0").count() == 1        # line bbox decoded
    names = {r["properties"] for r in got.collect()}
    assert any('"name": "a"' in n or '"name":"a"' in n for n in names)
    # duplicate registration rejected
    import pytest as _pt
    with _pt.raises(ValueError):
        store.register_file("ext_shp", shp)


def test_datastore_external_fgb_and_delta(ctx, spark, tmp_path):
    """r14: the facade registers .fgb files and Delta tables as
    feature types (fmt inferred from the extension / _delta_log dir);
    bbox and CQL run through the same FeatureSource API."""
    from pyspark.sql import functions as F

    from spatial_spark.functions.scalar import register_all
    from spatial_spark.io.datastore import SpatialDataStore
    from spatial_spark.io.delta import export_delta
    from spatial_spark.io.flatgeobuf import export_fgb
    register_all(spark)
    store = SpatialDataStore(ctx)
    pts = (spark.createDataFrame(
        [(i, f"POINT ({i * 10} {i * 5})", f"n{i}",
          float(i * 10), float(i * 5)) for i in range(4)],
        "id long, wkt string, name string, px double, py double")
        .withColumn("geom", F.expr("st_geomfromtext(wkt)"))
        .drop("wkt", "id"))
    fgb = str(tmp_path / "pts.fgb")
    export_fgb(pts.drop("px", "py"), fgb, name="pts")
    fsrc = store.register_file("ext_fgb", fgb)          # inferred
    assert fsrc.features().count() == 4
    assert fsrc.bbox(5.0, 0.0, 25.0, 50.0).count() == 2
    assert fsrc.cql("name = 'n3'").count() == 1
    dtab = str(tmp_path / "dtab")
    export_delta(pts.withColumn("xmin", F.col("px"))
                 .withColumn("ymin", F.col("py"))
                 .withColumn("xmax", F.col("px"))
                 .withColumn("ymax", F.col("py"))
                 .drop("px", "py"), dtab)
    dsrc = store.register_file("ext_delta", dtab)       # _delta_log dir
    assert dsrc.features().count() == 4
    assert dsrc.bbox(5.0, 0.0, 25.0, 50.0).count() == 2
    assert dsrc.cql("name = 'n0'").count() == 1


def test_load_table_timestamp_variants(spark, tmp_path):
    """events.ts must load as TIMESTAMP whether the parquet holds
    TIMESTAMP(NANOS) (surfaced as bigint nanos via nanosAsLong) or
    TIMESTAMP(MICROS) without timezone (surfaced as timestamp_ntz).
    Regression guard for the r3 events_daily break (CORRECTNESS_r03)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from spatial_spark.io.tables import load_table

    micros = [1704067200_000000, 1704070800_500000]       # 2024-01-01 UTC
    for sub, typ, vals in [
        ("nanos", pa.timestamp("ns"), [m * 1000 for m in micros]),
        ("ntz", pa.timestamp("us"), micros),
    ]:
        d = tmp_path / sub
        d.mkdir()
        tbl = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                        "ts": pa.array(vals, typ)})
        pq.write_table(tbl, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", sub
        got = sorted(r.epoch for r in
                     df.selectExpr("unix_micros(ts) AS epoch").collect())
        assert got == micros, sub


def _synth_osm(path, n_nodes=120, n_ways=15):
    """Synthetic OSM XML big enough to split across chunks."""
    lines = ['<?xml version="1.0" encoding="UTF-8"?>', '<osm version="0.6">']
    for i in range(1, n_nodes + 1):
        lines.append(f'  <node id="{i}" lon="{i * 0.01:.4f}" lat="{i * 0.005:.4f}">')
        lines.append(f'    <tag k="name" v="n{i}"/>')
        lines.append('  </node>')
    for w in range(1, n_ways + 1):
        lines.append(f'  <way id="{1000 + w}">')
        for s in range(6):
            lines.append(f'    <nd ref="{(w * 7 + s) % n_nodes + 1}"/>')
        lines.append('    <tag k="highway" v="residential"/>')
        lines.append('  </way>')
    lines.append('  <relation id="5000">')
    lines.append('    <member type="way" ref="1001" role="outer"/>')
    lines.append('    <tag k="type" v="multipolygon"/>')
    lines.append('  </relation>')
    lines.append('</osm>')
    path.write_text("\n".join(lines))
    return str(path)


def test_osm_parse_distributed_chunks(spark, tmp_path):
    """Chunked parse must agree with single-chunk parse no matter where
    the byte splits land (per-chunk XML recovery)."""
    from spatial_spark.io.osm import parse_osm_xml
    p = _synth_osm(tmp_path / "chunky.osm")
    whole = parse_osm_xml(spark, p, chunk_bytes=1 << 30)
    tiny = parse_osm_xml(spark, p, chunk_bytes=700)   # many mid-element splits
    for name in whole:
        a = sorted(map(tuple, whole[name].collect()))
        b = sorted(map(tuple, tiny[name].collect()))
        assert a == b, name
    assert len(sorted(map(tuple, whole["osm_nodes"].collect()))) == 120


def test_osm_parse_no_driver_materialization(spark, tmp_path, monkeypatch):
    """r3 verdict ask #9: the parse must not createDataFrame a driver-side
    element list — elements are read and parsed inside executor tasks."""
    from spatial_spark.io import osm as osm_mod
    p = _synth_osm(tmp_path / "nodriver.osm")
    calls = []
    orig = type(spark).createDataFrame

    def spy(self, data, *a, **kw):
        calls.append(data)
        return orig(self, data, *a, **kw)

    monkeypatch.setattr(type(spark), "createDataFrame", spy)
    tables = osm_mod.parse_osm_xml(spark, p)
    n = tables["osm_nodes"].count()
    assert n == 120
    for data in calls:
        assert not (isinstance(data, list) and len(data) > 10), \
            "driver-side element list materialized"


def test_osm_parse_quote_and_comment_edges(tmp_path):
    """ADVICE r4: a raw '>' inside a quoted attribute value must not be
    mistaken for the tag close (worst case: preceded by '/', which used to
    flag a self-closing element), and element-start text inside an XML
    comment must not be parsed as a real element."""
    from spatial_spark.io.osm import _parse_chunk
    xml = (
        '<?xml version="1.0"?>\n<osm version="0.6">\n'
        # attribute value containing '/>': first '>' is inside quotes
        '  <node id="1" lon="1.0" lat="2.0" user="a/>b">\n'
        '    <tag k="name" v="kept"/>\n'
        '  </node>\n'
        '  <!-- disabled: <node id="99" lon="0" lat="0"/> -->\n'
        '  <node id="2" lon="3.0" lat="4.0"/>\n'
        '  <!-- a comment\n     spanning lines <way id="77"> -->\n'
        '  <way id="10"><nd ref="1"/><nd ref="2"/></way>\n'
        '</osm>\n'
    )
    p = tmp_path / "edges.osm"
    p.write_text(xml)
    rows = _parse_chunk(str(p), 0, p.stat().st_size)
    nodes = {r[1] for r in rows if r[0] == "node"}
    ways = {r[1] for r in rows if r[0] == "way"}
    tags = {(r[1], r[8], r[9]) for r in rows if r[0] == "node_tag"}
    assert nodes == {1, 2}, rows          # 99 (commented) excluded, 1 parsed whole
    assert ways == {10}                    # 77 (commented) excluded
    assert (1, "name", "kept") in tags     # node 1 was not cut at the fake '/>'
    # chunk splits landing inside the comment must not resurrect node 99
    size = p.stat().st_size
    split_rows = []
    for s, e in [(0, size // 3), (size // 3, 2 * size // 3), (2 * size // 3, size)]:
        split_rows.extend(_parse_chunk(str(p), s, e))
    assert {r[1] for r in split_rows if r[0] == "node"} <= {1, 2, 99}
    assert sorted(split_rows) == sorted(rows) or \
        {r[1] for r in split_rows if r[0] == "node"} == {1, 2}


def test_osm_user_activity(spark, tmp_path):
    """OsmAnalysisTest parity: contributor metadata survives the parse and
    aggregates to per-user activity stats with a deterministic rank."""
    from spatial_spark.io.osm import osm_user_activity, parse_osm_xml
    xml = (
        '<?xml version="1.0"?>\n<osm version="0.6">\n'
        '  <node id="1" lon="1" lat="1" user="alice" uid="7"'
        '        timestamp="2020-01-01T10:00:00Z" changeset="100" version="2"/>\n'
        '  <node id="2" lon="2" lat="2" user="alice" uid="7"'
        '        timestamp="2020-01-02T10:00:00Z" changeset="101" version="1"/>\n'
        '  <node id="3" lon="3" lat="3" user="bob" uid="9"'
        '        timestamp="2020-03-05T00:00:00Z" changeset="102" version="1"/>\n'
        '  <node id="4" lon="4" lat="4"/>\n'
        '  <way id="10" user="alice" uid="7" timestamp="2020-01-02T11:00:00Z"'
        '       changeset="101" version="1"><nd ref="1"/><nd ref="2"/></way>\n'
        '  <relation id="20" user="bob" uid="9"'
        '            timestamp="2020-03-06T00:00:00Z" changeset="103" version="1">\n'
        '    <member type="way" ref="10" role="outer"/>\n'
        '  </relation>\n'
        '</osm>\n'
    )
    p = tmp_path / "users.osm"
    p.write_text(xml)
    tables = parse_osm_xml(spark, str(p))
    rows = {r.user: r for r in osm_user_activity(tables).collect()}
    assert set(rows) == {"alice", "bob"}
    a, b = rows["alice"], rows["bob"]
    assert (a.n_nodes, a.n_ways, a.n_relations, a.n_edits) == (2, 1, 0, 3)
    assert (b.n_nodes, b.n_ways, b.n_relations, b.n_edits) == (1, 0, 1, 2)
    assert a.user_rank == 1 and b.user_rank == 2
    assert a.active_days == 2 and b.active_days == 2
    assert str(a.first_ts).startswith("2020-01-01")
    assert str(a.last_ts).startswith("2020-01-02")
    # the anonymous node still parses as an element, just without a user
    assert tables["osm_nodes"].count() == 4


# ---------------------------------------------------------------------------
# GeoParquet 1.0 sink/source (io/geoparquet.py)
# ---------------------------------------------------------------------------
def test_geoparquet_roundtrip_and_metadata(spark, tmp_path):
    """Write → footers carry spec-correct `geo` metadata (per-file bbox,
    geometry_types, WKB encoding) → read back identical; DuckDB (an
    external parquet reader) sees the `geo` key too."""
    import json

    import duckdb
    from pyspark.sql import functions as F
    from spatial_spark.functions.scalar import register_all
    from spatial_spark.io.geoparquet import (geoparquet_dataset_meta,
                                             read_geoparquet,
                                             write_geoparquet)
    register_all(spark)
    df = spark.sql("""
      SELECT id, st_geomfromtext(wkt) AS geom FROM VALUES
        (1, 'POINT (1 2)'), (2, 'LINESTRING (0 0, 4 4)'),
        (3, 'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
        (4, 'MULTIPOINT ((9 9), (-1 -3))') AS t(id, wkt)
    """)
    path = str(tmp_path / "gp")
    manifest = write_geoparquet(df.repartition(2), path)
    assert sum(m["n_rows"] for m in manifest) == 4

    meta = geoparquet_dataset_meta(path)
    assert meta["version"] == "1.0.0"
    assert meta["encoding"] == "WKB"
    assert meta["primary_column"] == "geom"
    assert meta["bbox"] == [-1.0, -3.0, 9.0, 9.0]
    assert set(meta["geometry_types"]) == {"Point", "LineString",
                                           "Polygon", "MultiPoint"}

    back, meta2 = read_geoparquet(spark, path)
    got = {r.id: r.w for r in back.select(
        "id", F.expr("st_astext(geom)").alias("w")).collect()}
    assert got == {1: "POINT (1 2)", 2: "LINESTRING (0 0, 4 4)",
                   3: "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
                   4: "MULTIPOINT ((9 9), (-1 -3))"}

    # each FILE's bbox covers exactly its own rows (spec granularity)
    con = duckdb.connect()
    for m in manifest:
        kv = dict(con.execute(
            f"SELECT key, value FROM parquet_kv_metadata('{path}/{m['file']}')"
        ).fetchall())
        geo = json.loads(kv[b"geo"])
        assert geo["columns"]["geom"]["bbox"] == [
            m["xmin"], m["ymin"], m["xmax"], m["ymax"]]


def test_geoparquet_layer_export_import(spark, ctx, tmp_path):
    """Layer → export_geoparquet → import_geoparquet → same geometries;
    crs dict passes through verbatim."""
    from pyspark.sql import functions as F
    from spatial_spark.io.geoparquet import (export_geoparquet,
                                             geoparquet_dataset_meta,
                                             import_geoparquet)
    src = ctx.create_wkt_layer("gp_src")
    src.add(spark.createDataFrame(
        [(1, "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"),
         (2, "POINT (5 5)")], "id long, wkt string"), wkt="wkt")
    path = str(tmp_path / "gp_layer")
    crs = {"type": "GeographicCRS", "name": "WGS 84"}
    export_geoparquet(src, path, crs=crs)
    meta = geoparquet_dataset_meta(path)
    assert meta["crs"] == crs

    back = import_geoparquet(ctx, path, "gp_back")
    rows = {r.id: r.a for r in back.df().select(
        "id", F.expr("round(st_area(geom), 9)").alias("a")).collect()}
    assert rows == {1: 9.0, 2: 0.0}


# ---------------------------------------------------------------------------
# OSM PBF source (io/osmpbf.py)
# ---------------------------------------------------------------------------
def _pbf_fixture(path, n_nodes=60, blob_size=25, compress=True):
    from spatial_spark.io.osmpbf import build_osm_pbf
    nodes = [dict(id=i, lon=round(10.0 + i * 1e-4, 7),
                  lat=round(45.0 - i * 2e-4, 7),
                  tags={"name": f"n{i}"} if i % 3 == 0 else None,
                  user=f"u{i % 4}", uid=i % 4,
                  ts_ms=1357000000000 + i * 1000,
                  changeset=100 + i, version=1 + i % 2)
             for i in range(1, n_nodes + 1)]
    ways = [dict(id=w, refs=[w, w + 1, w + 2],
                 tags={"highway": "residential"},
                 user="mapper", uid=9, ts_ms=1357000500000,
                 changeset=200, version=3) for w in range(1, 11)]
    rels = [dict(id=5, members=[("way", 1, "outer"), ("way", 2, "inner")],
                 tags={"type": "multipolygon"}, user="r", uid=1,
                 ts_ms=1357000600000, changeset=300, version=1)]
    return build_osm_pbf(nodes, ways, rels, str(path),
                         elements_per_blob=blob_size,
                         compress=compress), nodes, ways, rels


def test_osm_pbf_distributed_parse_matches_fixture(spark, tmp_path):
    """parse_osm_pbf (multi-blob, zlib, delta-coded dense nodes, string
    tables) reproduces the fixture exactly: coords, tags, contributor
    metadata, way chains, relation members."""
    from spatial_spark.io.osmpbf import parse_osm_pbf

    path, nodes, ways, rels = _pbf_fixture(tmp_path / "f.osm.pbf")
    t = parse_osm_pbf(spark, path)
    got_nodes = {r.node_id: r for r in t["osm_nodes"].collect()}
    assert len(got_nodes) == len(nodes)
    for n in nodes:
        r = got_nodes[n["id"]]
        assert abs(r.lon - n["lon"]) < 1e-9 and abs(r.lat - n["lat"]) < 1e-9
        assert r.user == n["user"] and r.uid == n["uid"]
        assert r.changeset == n["changeset"] and r.version == n["version"]
        assert r.ts == "2013-01-01T00:26:%02dZ" % (40 + n["id"]) \
            if n["id"] <= 19 else True
    tags = {(r.node_id, r.k): r.v for r in t["osm_node_tags"].collect()}
    assert tags[(3, "name")] == "n3" and (1, "name") not in tags
    nds = sorted((r.way_id, r.seq, r.node_id)
                 for r in t["osm_way_nds"].collect())
    assert nds[:3] == [(1, 0, 1), (1, 1, 2), (1, 2, 3)]
    mem = sorted((r.rel_id, r.seq, r.type, r.ref, r.role)
                 for r in t["osm_members"].collect())
    assert mem == [(5, 0, "way", 1, "outer"), (5, 1, "way", 2, "inner")]


def test_osm_pbf_uncompressed_and_assembly(spark, tmp_path):
    """raw (uncompressed) blobs parse too, and the shared downstream
    way-geometry assembly works on the PBF tables verbatim."""
    from spatial_spark.io.osm import assemble_way_geometries
    from spatial_spark.io.osmpbf import parse_osm_pbf

    path, nodes, ways, _ = _pbf_fixture(tmp_path / "r.osm.pbf",
                                        compress=False)
    t = parse_osm_pbf(spark, path)
    geoms = assemble_way_geometries(t)
    assert geoms.count() == len(ways)


def test_mvt_golden_bytes_and_roundtrip(spark):
    """MVT 2.1 (r12): the command stream matches the PUBLIC spec's
    worked examples byte for byte (point [9,50,34]; multipoint
    [17,10,14,3,9]; linestring [9,4,4,18,0,16,16,0]; polygon
    [9,6,12,18,10,12,24,44,15]), tags/values round-trip through the
    keys/values tables, and mvt_tiles produces tiles whose decoded
    features equal the Column-computed integers."""
    from pyspark.sql import functions as F

    from spatial_spark.io.mvt import (_encode_geometry, decode_mvt,
                                      encode_mvt, mvt_tiles,
                                      tile_local_sql)

    assert _encode_geometry(1, [[(25, 17)]]) == [9, 50, 34]
    assert _encode_geometry(1, [[(5, 7), (3, 2)]]) == [17, 10, 14, 3, 9]
    assert _encode_geometry(2, [[(2, 2), (2, 10), (10, 10)]]) == \
        [9, 4, 4, 18, 0, 16, 16, 0]
    assert _encode_geometry(3, [[(3, 6), (8, 12), (20, 34)]]) == \
        [9, 6, 12, 18, 10, 12, 24, 44, 15]
    buf = encode_mvt(
        [(7, 1, [[(25, 17)]], {"name": "a", "rank": 3, "ok": True,
                               "score": 1.5}),
         (8, 3, [[(3, 6), (8, 12), (20, 34)]], {"rank": 3})],
        name="t", extent=512)
    layer = decode_mvt(buf)[0]
    assert (layer["name"], layer["extent"], layer["version"]) == \
        ("t", 512, 2)
    f0, f1 = layer["features"]
    assert f0["tags"] == {"name": "a", "rank": 3, "ok": True,
                          "score": 1.5}
    assert f1["parts"] == [[(3, 6), (8, 12), (20, 34)]]
    # value table dedup: rank=3 shared between features
    assert buf.count(b"rank") == 1

    # DataFrame sink: decoded integers == Column-computed integers
    pts = spark.createDataFrame(
        [(i, (i * 37) % 360 - 180.0, (i * 23) % 160 - 80.0)
         for i in range(200)], "id long, lon double, lat double")
    tiles = {(r["tile_x"], r["tile_y"]): bytes(r["mvt"])
             for r in mvt_tiles(pts, 2, layer_name="pts").collect()}
    tx, ty, px, py = tile_local_sql(2, "lon", "lat")
    want = {}
    for r in pts.selectExpr("id", f"{tx} AS tx", f"{ty} AS ty",
                            f"{px} AS px", f"{py} AS py").collect():
        want.setdefault((r["tx"], r["ty"]), {})[r["id"]] = \
            (r["px"], r["py"])
    assert set(tiles) == set(want)
    total = 0
    for key, buf in tiles.items():
        layer = decode_mvt(buf)[0]
        assert layer["name"] == "pts"
        got = {f["id"]: f["parts"][0][0] for f in layer["features"]}
        assert got == want[key], key
        total += len(got)
    assert total == 200


def test_mvt_split_feature_encode_matches_encode_mvt():
    """r15: mvt_tiles_geoms encodes feature blobs in a parallel map
    stage and concatenates them per tile — the split path
    (_encode_feature_notags + _assemble_layer_notags) must stay
    byte-identical to one encode_mvt call over the same tag-less
    features, or tile bytes change under the refactor."""
    from spatial_spark.io.mvt import (_assemble_layer_notags,
                                      _encode_feature_notags,
                                      _w_bytes, encode_mvt)

    feats = [(7, 1, [[(25, 17)]]),
             (8, 2, [[(2, 2), (2, 10), (10, 10)], [(0, 0), (5, 5)]]),
             (11, 3, [[(3, 6), (8, 12), (20, 34)]])]
    whole = encode_mvt([(fid, g, parts, {}) for fid, g, parts in feats],
                       name="seg", extent=512)
    body = bytearray()
    for fid, g, parts in feats:
        body += _w_bytes(2, _encode_feature_notags(fid, g, parts))
    split = _assemble_layer_notags(bytes(body), "seg", 512)
    assert split == whole
    # empty tile body: header + extent only, still identical
    assert _assemble_layer_notags(b"", "seg", 4096) == \
        encode_mvt([], name="seg", extent=4096)


def test_mvt_polygon_tiling_with_clipping(spark):
    """r12: the polygon MVT path — WKB rects explode to the tiles
    their bbox covers, clip through the EXACT overlay kernel against
    each tile envelope, and pack; decoded rings equal the closed-form
    clipped rectangles in tile-integer coordinates.  Fixture at z=1
    with extent 4 and lat=0-symmetric rects so every expected vertex
    is derivable by hand through the mercator y."""
    import math

    from pyspark.sql import functions as F

    from spatial_spark.functions.scalar import register_all
    from spatial_spark.io.mvt import _tile_envelope, decode_mvt, \
        mvt_tiles_geoms
    register_all(spark)

    # z=1: four tiles; a rect spanning lon -90..90, lat symmetric so
    # it crosses all four; plus one rect fully inside tile (0, 0)
    # (at extent 64 its ring keeps >= 3 distinct grid points)
    rows = [
        (1, "POLYGON ((-90 -40, 90 -40, 90 40, -90 40, -90 -40))"),
        (2, "POLYGON ((-135 50, -100 50, -100 70, -135 70, -135 50))"),
    ]
    from spatial_spark.functions.scalar import st_bbox
    df = (spark.createDataFrame(rows, "id long, wkt string")
          .withColumn("geom", F.expr("st_geomfromtext(wkt)"))
          .withColumn("_bbox", st_bbox("geom"))
          .select("id", "geom", "_bbox.xmin", "_bbox.ymin",
                  "_bbox.xmax", "_bbox.ymax"))
    tiles = {(r["tile_x"], r["tile_y"]):
             decode_mvt(bytes(r["mvt"]))[0]
             for r in mvt_tiles_geoms(df, 1, extent=64).collect()}
    # rect 1 appears in all four tiles; rect 2 only in (0, 0)
    assert set(tiles) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert [f["id"] for f in tiles[(0, 0)]["features"]] == [1, 2]
    for key in ((0, 1), (1, 0), (1, 1)):
        assert [f["id"] for f in tiles[key]["features"]] == [1]

    def local(x, y, tx, ty, z=1, extent=64):
        n = 1 << z
        xn = (x + 180.0) / 360.0
        yn = (1.0 - math.log(math.tan(math.radians(y))
                             + 1.0 / math.cos(math.radians(y)))
              / math.pi) / 2.0
        return (int(min(max(math.floor(extent * (xn * n - tx)), 0),
                        extent - 1)),
                int(min(max(math.floor(extent * (yn * n - ty)), 0),
                        extent - 1)))

    # tile (1, 0) = lon 0..180, lat 0..85: rect 1 clips to
    # lon 0..90, lat 0..40 — verify the decoded ring vertex SET
    f = tiles[(1, 0)]["features"][0]
    ring = set(f["parts"][0])
    want = {local(x, y, 1, 0) for x, y in
            ((0.0, 0.0), (90.0, 0.0), (90.0, 40.0), (0.0, 40.0))}
    assert ring == want, (ring, want)
    # the envelope helper inverts the tile math
    lon0, lat0, lon1, lat1 = _tile_envelope(1, 1, 0)
    assert abs(lon0 - 0.0) < 1e-9 and abs(lon1 - 180.0) < 1e-9
    assert abs(lat0 - 0.0) < 1e-9 and abs(lat1 - 85.05112878) < 1e-6


def _ring_area2(ring):
    """Twice the signed surveyor-formula area of an open ring."""
    n = len(ring)
    return sum(ring[i][0] * ring[(i + 1) % n][1]
               - ring[(i + 1) % n][0] * ring[i][1] for i in range(n))


def test_mvt_ring_winding_and_fastpath(spark):
    """r13: MVT 2.1 ring orientation — exterior rings POSITIVE
    surveyor-formula area in tile (y-down) integer coords, holes
    negative — and the INCLUDE_ALL fast classification: interior
    tiles of a large polygon skip the overlay kernel (classified
    'inside' from the segment-bbox sweep + one point-in-polygon
    test) yet still emit the full tile rectangle, byte-compatible
    with what the exact clip would quantize to."""
    from pyspark.sql import functions as F

    from spatial_spark.functions.scalar import register_all, st_bbox
    from spatial_spark.io.mvt import (_tile_classify, _tile_envelope,
                                      decode_mvt, mvt_tiles_geoms)
    register_all(spark)

    # polygon lon -120..120 lat -60..60 with hole -40..40 / -30..30:
    # covers most z=3 tiles; tile (5,3) (lon 45..90, lat 0..40.98) is
    # strictly interior — no boundary segment near it
    wkt = ("POLYGON ((-120 -60, 120 -60, 120 60, -120 60, -120 -60), "
           "(-40 -30, 40 -30, 40 30, -40 30, -40 -30))")
    df = (spark.createDataFrame([(1, wkt)], "id long, wkt string")
          .withColumn("geom", F.expr("st_geomfromtext(wkt)"))
          .withColumn("_bbox", st_bbox("geom"))
          .select("id", "geom", "_bbox.xmin", "_bbox.ymin",
                  "_bbox.xmax", "_bbox.ymax"))
    ext = 256
    tiles = {(r["tile_x"], r["tile_y"]):
             decode_mvt(bytes(r["mvt"]))[0]
             for r in mvt_tiles_geoms(df, 3, extent=ext).collect()}

    # every decoded polygon: first ring positive area, rest negative
    shells = 0
    for layer in tiles.values():
        for f in layer["features"]:
            assert f["type"] == "polygon"
            a0 = _ring_area2(f["parts"][0])
            assert a0 > 0, "exterior ring must be positive-area"
            shells += 1
            for hole in f["parts"][1:]:
                assert _ring_area2(hole) < 0
    assert shells >= 10

    # hole winding: at z=2 a hole strictly inside tile (1,1)
    # (lon -90..0, lat 0..66.5) survives the clip as a second ring
    wkt2 = ("POLYGON ((-120 -60, 120 -60, 120 60, -120 60, -120 -60), "
            "(-80 10, -10 10, -10 50, -80 50, -80 10))")
    df2 = (spark.createDataFrame([(2, wkt2)], "id long, wkt string")
           .withColumn("geom", F.expr("st_geomfromtext(wkt)"))
           .withColumn("_bbox", st_bbox("geom"))
           .select("id", "geom", "_bbox.xmin", "_bbox.ymin",
                   "_bbox.xmax", "_bbox.ymax"))
    tiles2 = {(r["tile_x"], r["tile_y"]):
              decode_mvt(bytes(r["mvt"]))[0]
              for r in mvt_tiles_geoms(df2, 2, extent=ext).collect()}
    f11 = tiles2[(1, 1)]["features"][0]
    assert len(f11["parts"]) == 2
    assert _ring_area2(f11["parts"][0]) > 0
    assert _ring_area2(f11["parts"][1]) < 0, \
        "interior ring must be negative-area"

    # classification: (5,3) interior, (0,0) outside-ish corner tile
    # (lon -180..-135 lat 66..85 — beyond the polygon), (2,3) boundary
    # (contains the hole's west edge at lon -40)
    from spatial_spark.geom.wkt import from_wkt
    g = from_wkt(wkt)
    assert _tile_classify(g, *_box4(3, 5, 3)) == "inside"
    assert _tile_classify(g, *_box4(3, 0, 0)) == "outside"
    assert _tile_classify(g, *_box4(3, 3, 3)) is None
    # a tile strictly inside the HOLE classifies outside (center
    # point-in-polygon honors holes) — hole spans lon/lat ±40/±30;
    # z=5 tile (16, 16) = lon 0..11.25, lat -10.8..0: inside the hole
    assert _tile_classify(g, *_box4(5, 16, 16)) == "outside"

    # the interior tile's emitted geometry is the full tile rectangle
    f = tiles[(5, 3)]["features"][0]
    assert set(f["parts"][0]) == {(0, 0), (ext - 1, 0),
                                  (ext - 1, ext - 1), (0, ext - 1)}


def _box4(z, tx, ty):
    from spatial_spark.io.mvt import _tile_envelope
    return _tile_envelope(z, tx, ty)


def test_mvt_linestring_tiling(spark):
    """r13: LINESTRING features clip to tile envelopes (clip_line via
    geom/clip.intersection) and pack as gtype-2 MVT features with the
    same floor-quantization as polygons."""
    from pyspark.sql import functions as F

    from spatial_spark.functions.scalar import register_all, st_bbox
    from spatial_spark.io.mvt import decode_mvt, mvt_tiles_geoms
    register_all(spark)

    # a line from (-90, 0) to (90, 40): crosses tiles (0,0) and (1,0)
    # at z=1 (the lat>=0 half), entering (1,0) exactly at lon 0 lat 20
    rows = [(7, "LINESTRING (-90 0, 90 40)")]
    df = (spark.createDataFrame(rows, "id long, wkt string")
          .withColumn("geom", F.expr("st_geomfromtext(wkt)"))
          .withColumn("_bbox", st_bbox("geom"))
          .select("id", "geom", "_bbox.xmin", "_bbox.ymin",
                  "_bbox.xmax", "_bbox.ymax"))
    tiles = {(r["tile_x"], r["tile_y"]):
             decode_mvt(bytes(r["mvt"]))[0]
             for r in mvt_tiles_geoms(df, 1, extent=64).collect()}
    assert set(tiles) == {(0, 0), (1, 0)}
    for key in tiles:
        (f,) = tiles[key]["features"]
        assert f["type"] == "linestring" and f["id"] == 7
        assert len(f["parts"]) == 1 and len(f["parts"][0]) == 2
    # endpoints: (-90, 0) is the mid-point of tile (0,0) in x and the
    # bottom edge (equator, yn=0.5 -> py clamps to 63); lon 0 lat 20
    # is the tile (1,0) entry at px=0
    p00 = tiles[(0, 0)]["features"][0]["parts"][0]
    assert p00[0] == (32, 63)
    p10 = tiles[(1, 0)]["features"][0]["parts"][0]
    assert p10[0][0] == 0 and p10[1][0] == 32


def test_flatbuffers_golden_bytes():
    """r13: the from-scratch FlatBuffers wire layer matches a
    HAND-DERIVED byte layout computed straight from the public
    flatbuffers binary spec (vtable = [u16 vtable_size, u16
    table_size, u16 field offsets]; table headed by an i32 vtable
    back-offset; root uoffset32 at position 0) — one table, one ubyte
    field (slot 0, value 5), padded and finished."""
    from spatial_spark.io.flatgeobuf import (_FBBuilder, _fb_root,
                                             _fb_scalar)
    b = _FBBuilder()
    b.start_table(1)
    b.slot_scalar(0, "B", 5, 0)
    buf = b.finish(b.end_table())
    want = bytes([0x0C, 0, 0, 0,      # root uoffset -> index 12
                  0, 0,               # pad to minalign
                  0x06, 0, 0x08, 0,   # vtable: size 6, table size 8
                  0x07, 0,            # field 0 at table+7
                  0x06, 0, 0, 0,      # table: soffset back 6 -> vtable
                  0, 0, 0,            # pad
                  0x05])              # the field byte
    assert buf == want, buf.hex()
    t = _fb_root(buf)
    assert _fb_scalar(buf, t, 0, "B", 0) == 5
    # absent slot reads the default
    assert _fb_scalar(buf, t, 1, "B", 9) == 9


def test_flatgeobuf_roundtrip_and_spark_source(ctx, spark, tmp_path):
    """r13 (VERDICT r12 ask #8): FlatGeobuf interchange — (a) magic
    bytes + header fields per the public spec; (b) every geometry
    class round-trips bytes -> Geometry -> bytes; (c) typed
    properties (long/double/string/bool) survive; (d) fgb_source
    parallelizes per file into layer-core columns; (e) export_fgb
    streams a DataFrame into a file read_fgb and import_fgb accept;
    (f) a packed-index header offset is honored (index skipped)."""
    from pyspark.sql import functions as F

    from spatial_spark.geom.core import Geometry
    from spatial_spark.geom.wkt import from_wkt
    from spatial_spark.io.flatgeobuf import (MAGIC, export_fgb,
                                             fgb_source, import_fgb,
                                             read_fgb, write_fgb)

    geoms = [
        from_wkt("POINT (3 4)"),
        from_wkt("LINESTRING (0 0, 1 1, 2 0)"),
        from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0),"
                 " (1 1, 2 1, 2 2, 1 2, 1 1))"),
        from_wkt("MULTIPOINT ((1 2), (3 4))"),
        from_wkt("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"),
        from_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)),"
                 " ((5 5, 6 5, 6 6, 5 6, 5 5)))"),
    ]
    columns = [("name", 11), ("rank", 7), ("score", 10), ("ok", 2)]
    feats = [(g, {"name": f"f{i}", "rank": i * 10, "score": i + 0.5,
                  "ok": i % 2 == 0}) for i, g in enumerate(geoms)]
    buf = write_fgb(feats, name="roundtrip", columns=columns,
                    crs_code=4326)
    assert buf[:8] == MAGIC
    doc = read_fgb(buf)
    assert doc["name"] == "roundtrip" and doc["crs_code"] == 4326
    assert doc["columns"] == columns
    assert doc["envelope"] == [0.0, 0.0, 6.0, 6.0]
    assert len(doc["features"]) == len(feats)
    from spatial_spark.geom.wkt import to_wkt
    for (g0, p0), (g1, p1) in zip(feats, doc["features"]):
        assert to_wkt(g0) == to_wkt(g1)
        assert p1 == p0
    # byte-stable re-encode (writer determinism)
    assert write_fgb(doc["features"], name="roundtrip",
                     columns=columns, crs_code=4326) == buf

    # (d) Spark source over two files
    p1 = str(tmp_path / "a.fgb")
    p2 = str(tmp_path / "b.fgb")
    with open(p1, "wb") as f:
        f.write(buf)
    with open(p2, "wb") as f:
        f.write(write_fgb(feats[:2], name="b", columns=columns))
    df = fgb_source(spark, [p1, p2])
    assert df.count() == 8
    got = df.filter("name = 'f2'").select("gtype", "xmin", "ymax",
                                          "rank", "score").collect()
    assert [(r["gtype"], r["xmin"], r["ymax"], r["rank"], r["score"])
            for r in got] == [(3, 0.0, 4.0, 20, 2.5)]

    # (e) export a core DataFrame and read it back
    src = (spark.createDataFrame(
        [(i, f"POINT ({i} {i + 1})", f"n{i}", i * 2) for i in range(5)],
        "id long, wkt string, label string, v long")
        .withColumn("geom", F.expr("st_geomfromtext(wkt)"))
        .drop("wkt", "id"))
    out = str(tmp_path / "export.fgb")
    n = export_fgb(src, out, name="exported")
    assert n == 5
    back = read_fgb(out)
    assert back["name"] == "exported"
    assert sorted(p["label"] for _, p in back["features"]) == \
        [f"n{i}" for i in range(5)]
    layer = import_fgb(ctx, out, "fgb_imported")
    assert layer.df().count() == 5

    # (f) index-skip: patch the header's index_node_size field (u16,
    # field 9) to 16 and splice the 80-byte packed index a conformant
    # writer emits for 1 feature (spec calcTreeSize is a do-while:
    # even one leaf gets a root level above it — 2 nodes * 40 bytes)
    # — read_fgb must skip it and still decode the feature
    one = write_fgb(feats[:1], name="ix", columns=columns)
    import struct as _s

    from spatial_spark.io.flatgeobuf import _fb_field, _fb_root
    hlen = _s.unpack_from("<I", one, 8)[0]
    head_end = 12 + hlen
    hbuf = bytearray(one[12:head_end])
    pos = _fb_field(bytes(hbuf), _fb_root(bytes(hbuf)), 9)
    assert pos is not None and _s.unpack_from("<H", hbuf, pos)[0] == 0
    _s.pack_into("<H", hbuf, pos, 16)
    spliced = one[:12] + bytes(hbuf) + b"\x00" * 80 + one[head_end:]
    doc2 = read_fgb(spliced)
    assert len(doc2["features"]) == 1
    assert to_wkt(doc2["features"][0][0]) == to_wkt(feats[0][0])
    # the multi-level sizes too: 16 leaves -> 17 nodes; 17 -> 20
    from spatial_spark.io.flatgeobuf import _packed_index_size
    assert _packed_index_size(1, 16) == 2 * 40
    assert _packed_index_size(16, 16) == 17 * 40
    assert _packed_index_size(17, 16) == 20 * 40
    assert _packed_index_size(257, 16) == (257 + 17 + 2 + 1) * 40


def test_flatgeobuf_bbox_pushdown(spark, tmp_path):
    """r13: fgb_source(bbox=) — files whose HEADER envelope misses
    the window are pruned driver-side from header-only reads, and
    surviving files' features are envelope-filtered; an empty prune
    still returns the typed empty frame."""
    from spatial_spark.geom.core import Geometry
    from spatial_spark.io.flatgeobuf import (fgb_source, read_fgb_header,
                                             write_fgb)
    cols = [("tag", 11)]
    west = [(Geometry.point(-100.0 - i, 10.0), {"tag": f"w{i}"})
            for i in range(4)]
    east = [(Geometry.point(100.0 + i, 10.0), {"tag": f"e{i}"})
            for i in range(4)]
    pw = str(tmp_path / "west.fgb")
    pe = str(tmp_path / "east.fgb")
    with open(pw, "wb") as f:
        f.write(write_fgb(west, name="west", columns=cols))
    with open(pe, "wb") as f:
        f.write(write_fgb(east, name="east", columns=cols))
    hdr = read_fgb_header(pw)
    assert hdr["name"] == "west" and hdr["features_count"] == 4
    assert hdr["envelope"] == [-103.0, 10.0, -100.0, 10.0]

    # window over the east cluster only: west file never reaches a task
    df = fgb_source(spark, [pw, pe], bbox=(90.0, 0.0, 110.0, 20.0))
    assert df.rdd.getNumPartitions() == 1   # one surviving file
    tags = sorted(r["tag"] for r in df.collect())
    assert tags == ["e0", "e1", "e2", "e3"]
    # intra-file feature filter: a window catching only 2 east points
    df2 = fgb_source(spark, [pw, pe], bbox=(100.5, 0.0, 102.5, 20.0))
    assert sorted(r["tag"] for r in df2.collect()) == ["e1", "e2"]
    # window hitting nothing: typed empty frame, zero tasks
    df3 = fgb_source(spark, [pw, pe], bbox=(0.0, 50.0, 1.0, 51.0))
    assert df3.count() == 0 and "tag" in df3.columns


def test_flatgeobuf_distributed_export(spark, tmp_path):
    """r13: export_fgb_dir — each partition writes ONE conformant
    .fgb from its own task (no driver funnel); the manifest rows
    carry per-file envelope + count; fgb_source over the parts
    reproduces the dataset and the bbox pushdown prunes part files."""
    from pyspark.sql import functions as F

    from spatial_spark.functions.scalar import register_all
    from spatial_spark.io.flatgeobuf import export_fgb_dir, fgb_source
    register_all(spark)
    src = (spark.createDataFrame(
        [(i, f"POINT ({(i % 8) * 40 - 140} {i % 50})", f"t{i}", i)
         for i in range(64)],
        "id long, wkt string, tag string, v long")
        .withColumn("geom", F.expr("st_geomfromtext(wkt)"))
        .drop("wkt", "id")
        .repartition(4, "v"))
    out = str(tmp_path / "parts")
    manifest = export_fgb_dir(src, out, name="dist").collect()
    paths = sorted(r["path"] for r in manifest)
    assert 1 < len(paths) <= 4
    assert sum(r["n_features"] for r in manifest) == 64
    back = fgb_source(spark, paths)
    assert back.count() == 64
    assert sorted(r["tag"] for r in back.collect()) == \
        sorted(f"t{i}" for i in range(64))
    # per-file envelopes are honest: pushdown over them prunes parts
    west = fgb_source(spark, paths, bbox=(-145.0, -1.0, -135.0, 51.0))
    got = {r["tag"] for r in west.collect()}
    assert got == {f"t{i}" for i in range(64) if i % 8 == 0}


def test_flatgeobuf_manifest_prune_and_schema_guard(spark, tmp_path):
    """r14: (a) fgb_source(manifest=) prunes files from the
    export_fgb_dir manifest alone — zero per-file header reads for
    pruning; (b) heterogeneous multi-file column lists RAISE instead
    of silently dropping/nulling columns; (c) a geometry-less feature
    (spec-legal) survives write->read->fgb_source as a null-geom row
    and is skipped by import_fgb."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from spatial_spark.functions.scalar import register_all
    from spatial_spark.geom.core import Geometry
    from spatial_spark.io.flatgeobuf import (export_fgb_dir, fgb_source,
                                             read_fgb, write_fgb)
    register_all(spark)
    src = (spark.createDataFrame(
        [(i, f"POINT ({(i % 4) * 90 - 135} {i % 40})", f"m{i}")
         for i in range(32)],
        "id long, wkt string, tag string")
        .withColumn("geom", F.expr("st_geomfromtext(wkt)"))
        .drop("wkt", "id")
        .repartition(4, "tag"))
    out = str(tmp_path / "mparts")
    manifest = export_fgb_dir(src, out, name="m").cache()
    paths = sorted(r["path"] for r in manifest.collect())

    # (a) manifest-driven pruning matches header-driven pruning, and
    # an r14 manifest (carrying columns_json) plans with ZERO header
    # reads — schema and envelopes both come from metadata
    from spatial_spark.io import flatgeobuf as fgb_mod
    win = (-140.0, -1.0, -130.0, 41.0)
    opens = {"n": 0}
    real = fgb_mod.read_fgb_header

    def counting(path):
        opens["n"] += 1
        return real(path)
    fgb_mod.read_fgb_header = counting
    try:
        via_manifest = fgb_source(spark, paths, bbox=win,
                                  manifest=manifest)
    finally:
        fgb_mod.read_fgb_header = real
    assert opens["n"] == 0, opens
    via_headers = fgb_source(spark, paths, bbox=win)
    assert (sorted(r["tag"] for r in via_manifest.collect())
            == sorted(r["tag"] for r in via_headers.collect())
            == sorted(f"m{i}" for i in range(32) if i % 4 == 0))
    manifest.unpersist()

    # (b) heterogeneous schemas raise loudly
    pa = str(tmp_path / "a.fgb")
    pb = str(tmp_path / "b.fgb")
    with open(pa, "wb") as f:
        f.write(write_fgb([(Geometry.point(0, 0), {"x": 1})],
                          columns=[("x", 6)]))
    with open(pb, "wb") as f:
        f.write(write_fgb([(Geometry.point(1, 1), {"y": 2})],
                          columns=[("y", 6)]))
    with _pytest.raises(ValueError, match="heterogeneous"):
        fgb_source(spark, [pa, pb])

    # (c) geometry-less feature: kept by the source, skipped on import
    pn = str(tmp_path / "nullgeom.fgb")
    with open(pn, "wb") as f:
        f.write(write_fgb([(Geometry.point(5, 5), {"x": 1}),
                           (None, {"x": 2})], columns=[("x", 6)]))
    doc = read_fgb(pn)
    assert doc["features"][1][0] is None
    assert doc["features"][1][1] == {"x": 2}
    rows = fgb_source(spark, pn).orderBy("x").collect()
    assert len(rows) == 2
    assert rows[1]["geom"] is None and rows[1]["x"] == 2
    # a window never matches the extent-less feature
    assert fgb_source(spark, pn, bbox=(4, 4, 6, 6)).count() == 1


def test_flatgeobuf_export_null_geometry_roundtrip(spark, tmp_path):
    """ADVICE r14 low: export_fgb of a frame containing null-geometry
    rows (which fgb_source itself emits for spec-legal geometry-less
    features) must encode them as geometry-less features, not crash —
    so fgb_source -> export_fgb round-trips such a file."""
    import pytest as _pytest
    from spatial_spark.geom.core import Geometry
    from spatial_spark.io.flatgeobuf import (export_fgb, fgb_source,
                                             read_fgb, write_fgb)
    src = str(tmp_path / "ng_src.fgb")
    with open(src, "wb") as f:
        f.write(write_fgb([(Geometry.point(5, 5), {"x": 1}),
                           (None, {"x": 2}),
                           (Geometry.point(7, 8), {"x": 3})],
                          columns=[("x", 6)]))
    df = fgb_source(spark, src)
    assert df.filter("geom is null").count() == 1
    out = str(tmp_path / "ng_out.fgb")
    cnt = export_fgb(df.orderBy("x"), out)
    assert cnt == 3
    doc = read_fgb(out)
    geoms = [g for g, _ in doc["features"]]
    props = [p for _, p in doc["features"]]
    assert sum(g is None for g in geoms) == 1
    assert sorted(p["x"] for p in props) == [1, 2, 3]
    # the header envelope covers only the real geometries
    assert tuple(doc["envelope"]) == (5.0, 5.0, 7.0, 8.0)
    # and the round-trip of the round-trip still reads
    back = fgb_source(spark, out)
    assert back.count() == 3 and \
        back.filter("geom is null").count() == 1


def test_datastore_external_iceberg(ctx, spark, tmp_path):
    """r15: Iceberg tables register as feature types too (fmt
    inferred from the metadata/ dir); bbox and CQL run through the
    same FeatureSource API."""
    from pyspark.sql import functions as F

    from spatial_spark.functions.scalar import register_all
    from spatial_spark.io.datastore import SpatialDataStore
    from spatial_spark.io.iceberg import export_iceberg
    register_all(spark)
    store = SpatialDataStore(ctx)
    pts = (spark.createDataFrame(
        [(i, f"POINT ({i * 10} {i * 5})", f"n{i}",
          float(i * 10), float(i * 5)) for i in range(4)],
        "id long, wkt string, name string, px double, py double")
        .withColumn("geom", F.expr("st_geomfromtext(wkt)"))
        .drop("wkt", "id"))
    itab = str(tmp_path / "itab")
    export_iceberg(pts.withColumn("xmin", F.col("px"))
                   .withColumn("ymin", F.col("py"))
                   .withColumn("xmax", F.col("px"))
                   .withColumn("ymax", F.col("py"))
                   .drop("px", "py").coalesce(1), itab)
    isrc = store.register_file("ext_ice", itab)         # metadata/ dir
    assert isrc.features().count() == 4
    assert isrc.bbox(5.0, 0.0, 25.0, 50.0).count() == 2
    assert isrc.cql("name = 'n0'").count() == 1
