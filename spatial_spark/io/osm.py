"""OSM XML source — normalized tables + distributed geometry assembly.

Parity: OSMImporter.java (1753 LoC StAX parser building a node/way/relation
graph, then reIndex creating geometries; OSMGeometryEncoder.java:250-330
polygon/multipolygon assembly).  Spark-first shape: the XML parses into five
normalized DataFrames —

    osm_nodes(node_id, lon, lat)               osm_node_tags(node_id, k, v)
    osm_ways(way_id)                           osm_way_tags(way_id, k, v)
    osm_way_nds(way_id, seq, node_id)
    osm_relations(rel_id), osm_members(rel_id, seq, type, ref, role),
    osm_rel_tags(rel_id, k, v)

— and geometry assembly is a join + collect_list job (way → ordered node
chain → LineString/Polygon), the reference's graph walk re-expressed as
shuffle-friendly relational ops.  Closed ways with area-ish tags become
polygons (OSMGeometryEncoder heuristic); multipolygon relations stitch
member ways into outer/inner rings with unclosed-way healing.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom import GTYPE_LINESTRING, GTYPE_MULTIPOLYGON, GTYPE_POLYGON, Geometry
from ..geom.wkb import to_wkb

# tags whose presence makes a closed way a polygon (OSMGeometryEncoder
# area heuristic)
AREA_TAGS = {"building", "landuse", "natural", "leisure", "amenity", "area",
             "place", "boundary"}


def parse_osm_xml(spark: SparkSession, path: str) -> dict:
    """Stream-parse .osm XML into the normalized DataFrames."""
    nodes, node_tags = [], []
    ways, way_tags, way_nds = [], [], []
    rels, rel_tags, members = [], [], []

    for _, elem in ET.iterparse(path, events=("end",)):
        if elem.tag == "node":
            nid = int(elem.get("id"))
            nodes.append((nid, float(elem.get("lon")), float(elem.get("lat"))))
            for t in elem.findall("tag"):
                node_tags.append((nid, t.get("k"), t.get("v")))
            elem.clear()
        elif elem.tag == "way":
            wid = int(elem.get("id"))
            ways.append((wid,))
            for seq, nd in enumerate(elem.findall("nd")):
                way_nds.append((wid, seq, int(nd.get("ref"))))
            for t in elem.findall("tag"):
                way_tags.append((wid, t.get("k"), t.get("v")))
            elem.clear()
        elif elem.tag == "relation":
            rid = int(elem.get("id"))
            rels.append((rid,))
            for seq, m in enumerate(elem.findall("member")):
                members.append((rid, seq, m.get("type"), int(m.get("ref")),
                                m.get("role") or ""))
            for t in elem.findall("tag"):
                rel_tags.append((rid, t.get("k"), t.get("v")))
            elem.clear()

    return {
        "osm_nodes": spark.createDataFrame(
            nodes or [(0, 0.0, 0.0)], "node_id long, lon double, lat double"
        ).limit(len(nodes)),
        "osm_node_tags": spark.createDataFrame(
            node_tags or [(0, "", "")], "node_id long, k string, v string"
        ).limit(len(node_tags)),
        "osm_ways": spark.createDataFrame(ways or [(0,)], "way_id long"
                                          ).limit(len(ways)),
        "osm_way_tags": spark.createDataFrame(
            way_tags or [(0, "", "")], "way_id long, k string, v string"
        ).limit(len(way_tags)),
        "osm_way_nds": spark.createDataFrame(
            way_nds or [(0, 0, 0)], "way_id long, seq int, node_id long"
        ).limit(len(way_nds)),
        "osm_relations": spark.createDataFrame(rels or [(0,)], "rel_id long"
                                               ).limit(len(rels)),
        "osm_rel_tags": spark.createDataFrame(
            rel_tags or [(0, "", "")], "rel_id long, k string, v string"
        ).limit(len(rel_tags)),
        "osm_members": spark.createDataFrame(
            members or [(0, 0, "", 0, "")],
            "rel_id long, seq int, type string, ref long, role string"
        ).limit(len(members)),
    }


def assemble_way_geometries(tables: dict) -> DataFrame:
    """way_id → WKB geometry: ordered node chain → LineString; closed ways
    with area tags → Polygon.  (ExtractOSMPoints/OSMGeometryEncoder parity,
    as joins + collect_list instead of graph traversal.)"""
    nds = tables["osm_way_nds"]
    nodes = tables["osm_nodes"]
    chains = (nds.join(nodes, "node_id")
              .groupBy("way_id")
              .agg(F.sort_array(F.collect_list(F.struct("seq", "lon", "lat")))
                   .alias("vs")))
    area_ways = (tables["osm_way_tags"]
                 .filter(F.col("k").isin(list(AREA_TAGS)))
                 .select("way_id").distinct()
                 .withColumn("is_area", F.lit(True)))
    chains = chains.join(area_ways, "way_id", "left")

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("way_id", T.LongType()),
        T.StructField("geom", T.BinaryType()),
        T.StructField("gtype", T.IntegerType()),
    ])

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            coords = np.array([[v["lon"], v["lat"]] for v in r["vs"]])
            closed = len(coords) >= 4 and (coords[0] == coords[-1]).all()
            if closed and r.get("is_area"):
                g = Geometry(GTYPE_POLYGON, [coords])
            else:
                g = Geometry(GTYPE_LINESTRING, coords)
            rows.append((r["way_id"], to_wkb(g), g.gtype))
        return pd.DataFrame(rows, columns=["way_id", "geom", "gtype"])

    return chains.mapInPandas(lambda it: (build(pdf) for pdf in it), out_schema)


def assemble_multipolygons(tables: dict) -> DataFrame:
    """Multipolygon relations → WKB MultiPolygon: member ways stitched into
    rings (endpoint matching heals unclosed ways, OSMGeometryEncoder
    closeCoords parity), outer/inner roles → shells/holes."""
    mp_rels = (tables["osm_rel_tags"]
               .filter((F.col("k") == "type") & (F.col("v") == "multipolygon"))
               .select("rel_id").distinct())
    members = tables["osm_members"].join(mp_rels, "rel_id").filter(F.col("type") == "way")
    nds = tables["osm_way_nds"]
    nodes = tables["osm_nodes"]
    way_chains = (nds.join(nodes, "node_id")
                  .groupBy("way_id")
                  .agg(F.sort_array(F.collect_list(F.struct("seq", "lon", "lat")))
                       .alias("vs")))
    joined = (members.join(way_chains, members.ref == way_chains.way_id)
              .select("rel_id", "seq", "role", "vs")
              .groupBy("rel_id")
              .agg(F.sort_array(F.collect_list(F.struct("seq", "role", "vs")))
                   .alias("ms")))

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("rel_id", T.LongType()),
        T.StructField("geom", T.BinaryType()),
    ])

    def stitch_rings(ways: list) -> list:
        """Chain way fragments into closed rings by endpoint matching."""
        frags = [np.array([[v["lon"], v["lat"]] for v in vs]) for vs in ways]
        rings = []
        while frags:
            cur = frags.pop(0)
            guard = 0
            while not (len(cur) >= 4 and (cur[0] == cur[-1]).all()) and guard <= len(frags) + 1:
                guard += 1
                for i, f in enumerate(frags):
                    if (f[0] == cur[-1]).all():
                        cur = np.vstack([cur, f[1:]])
                        frags.pop(i)
                        guard = 0
                        break
                    if (f[-1] == cur[-1]).all():
                        cur = np.vstack([cur, f[::-1][1:]])
                        frags.pop(i)
                        guard = 0
                        break
                else:
                    break
            if len(cur) >= 3:
                if (cur[0] != cur[-1]).any():
                    cur = np.vstack([cur, cur[:1]])  # closeCoords healing
                rings.append(cur)
        return rings

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..geom.algorithms import point_in_ring
        rows = []
        for _, r in pdf.iterrows():
            outers = stitch_rings([m["vs"] for m in r["ms"] if m["role"] != "inner"])
            inners = stitch_rings([m["vs"] for m in r["ms"] if m["role"] == "inner"])
            polys = [[o] for o in outers]
            for h in inners:
                for p in polys:
                    if point_in_ring(float(h[0][0]), float(h[0][1]), p[0]):
                        p.append(h)
                        break
            if not polys:
                continue
            g = (Geometry(GTYPE_POLYGON, polys[0]) if len(polys) == 1
                 else Geometry(GTYPE_MULTIPOLYGON,
                               [Geometry(GTYPE_POLYGON, p) for p in polys]))
            rows.append((r["rel_id"], to_wkb(g)))
        return pd.DataFrame(rows, columns=["rel_id", "geom"])

    return joined.mapInPandas(lambda it: (build(pdf) for pdf in it), out_schema)


def import_osm(ctx, path: str, layer_name: str):
    """spatial.importOSM parity (OsmSpatialProcedures.java:57-96): parse,
    assemble way geometries, attach tags as a map column, write the layer."""
    tables = parse_osm_xml(ctx.spark, path)
    geoms = assemble_way_geometries(tables)
    tags = (tables["osm_way_tags"]
            .groupBy("way_id")
            .agg(F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("tags")))
    df = (geoms.join(tags, "way_id", "left")
          .withColumnRenamed("way_id", "id"))
    layer = ctx.create_layer(layer_name)
    layer.add(df.drop("gtype"))
    return layer, tables
