"""OSM XML source — normalized tables + distributed geometry assembly.

Parity: OSMImporter.java (1753 LoC StAX parser building a node/way/relation
graph, then reIndex creating geometries; OSMGeometryEncoder.java:250-330
polygon/multipolygon assembly).  Spark-first shape: the XML parses into five
normalized DataFrames —

    osm_nodes(node_id, lon, lat, user, uid, ts, changeset, version)
    osm_node_tags(node_id, k, v)
    osm_ways(way_id, user, uid, ts, changeset, version)
    osm_way_tags(way_id, k, v)     osm_way_nds(way_id, seq, node_id)
    osm_relations(rel_id, user, uid, ts, changeset, version)
    osm_members(rel_id, seq, type, ref, role), osm_rel_tags(rel_id, k, v)

— element rows carry the contributor metadata the reference models as
changeset/user nodes (OSMImporter user wiring; analyzed by
osm_user_activity, OsmAnalysisTest parity)

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


# top-level OSM element starts; \b-like boundary via the [ \t\r\n/>] probe
_ELEM_RE = None  # compiled lazily inside executors (regex not picklable-cheap)


def _parse_chunk(path: str, start: int, end: int, read_step: int = 1 << 22):
    """Parse the top-level OSM elements whose START offset lies in
    [start, end) of the file, yielding denormalized union rows.

    Chunk recovery: scan forward from ``start`` to the first element-start
    tag; the LAST element may extend past ``end`` — keep reading until its
    close tag so element boundaries never need to align with chunks.  Each
    task opens the file itself (local/shared FS), so no element list ever
    exists on the driver."""
    import re
    elem_re = re.compile(rb"<(node|way|relation)[ \t\r\n/>]")

    with open(path, "rb") as fh:
        fh.seek(start)
        # the whole chunk plus one step of margin: element-start tags can
        # then only be cut at the margin edge, where extend() recovers
        buf = fh.read(end - start + read_step)

        def extend():
            more = fh.read(read_step)
            if not more:
                return False
            nonlocal buf
            buf += more
            return True

        def tag_close(from_pos):
            # Offset of the '>' that ends the tag opened at from_pos.
            # XML allows a raw '>' inside quoted attribute values, so the
            # first '>' is not necessarily the tag close: track quote state.
            i = from_pos
            quote = 0
            while True:
                while i >= len(buf):
                    if not extend():
                        return len(buf) - 1
                c = buf[i]
                if quote:
                    if c == quote:
                        quote = 0
                elif c in (34, 39):  # '"' or "'"
                    quote = c
                elif c == 62:  # '>'
                    return i
                i += 1

        pos = 0
        rows = []
        while True:
            m = elem_re.search(buf, pos)
            while m is None and len(buf) - pos < 64 and extend():
                m = elem_re.search(buf, pos)
            if m is None or start + m.start() >= end:
                break
            # element-start text inside an XML comment is not an element:
            # skip past the comment instead of emitting phantom rows.  (A
            # chunk that BEGINS mid-comment can't see the opener — same
            # accepted blind spot as beginning mid-CDATA; OSM dumps carry
            # comments only between elements.)
            cm = buf.find(b"<!--", pos, m.start() + 1)
            if cm != -1 and cm <= m.start():
                cend = buf.find(b"-->", cm)
                while cend == -1 and extend():
                    cend = buf.find(b"-->", cm)
                pos = cend + 3 if cend != -1 else len(buf)
                continue
            kind = m.group(1).decode()
            close = b"</" + m.group(1) + b">"
            # element ends at its self-closing '/>' (before any child tag)
            # or at the matching close tag; extend the buffer as needed
            gt = tag_close(m.start())
            if gt > m.start() and buf[gt - 1:gt] == b"/":
                span_end = gt + 1
            else:
                while True:
                    span_end = buf.find(close, m.start())
                    if span_end != -1:
                        span_end += len(close)
                        break
                    if not extend():
                        span_end = len(buf)
                        break
            try:
                elem = ET.fromstring(buf[m.start():span_end])
            except ET.ParseError:
                pos = m.start() + 1
                continue
            _emit_elem(kind, elem, rows)
            pos = span_end
        return rows


def _elem_meta(elem) -> tuple:
    """Contributor metadata carried on every OSM element (the reference's
    changeset/user model, OSMImporter user node wiring): (user, uid,
    timestamp, changeset, version) — None when the dump omits them."""
    uid, cs, ver = elem.get("uid"), elem.get("changeset"), elem.get("version")
    return (elem.get("user"), int(uid) if uid else None,
            elem.get("timestamp"), int(cs) if cs else None,
            int(ver) if ver else None)


_PAD = (None, None, None, None, None)


def _emit_elem(kind: str, elem, rows: list) -> None:
    """Append union rows (kind,id,lon,lat,seq,ref,mtype,role,k,v,
    user,uid,ts,changeset,version)."""
    if kind == "node":
        nid = int(elem.get("id"))
        rows.append(("node", nid, float(elem.get("lon")),
                     float(elem.get("lat")), None, None, None, None,
                     None, None) + _elem_meta(elem))
        for t in elem.findall("tag"):
            rows.append(("node_tag", nid, None, None, None, None, None, None,
                         t.get("k"), t.get("v")) + _PAD)
    elif kind == "way":
        wid = int(elem.get("id"))
        rows.append(("way", wid, None, None, None, None, None, None,
                     None, None) + _elem_meta(elem))
        for seq, nd in enumerate(elem.findall("nd")):
            rows.append(("way_nd", wid, None, None, seq, int(nd.get("ref")),
                         None, None, None, None) + _PAD)
        for t in elem.findall("tag"):
            rows.append(("way_tag", wid, None, None, None, None, None, None,
                         t.get("k"), t.get("v")) + _PAD)
    else:
        rid = int(elem.get("id"))
        rows.append(("rel", rid, None, None, None, None, None, None,
                     None, None) + _elem_meta(elem))
        for seq, m in enumerate(elem.findall("member")):
            rows.append(("member", rid, None, None, seq, int(m.get("ref")),
                         m.get("type"), m.get("role") or "", None, None) + _PAD)
        for t in elem.findall("tag"):
            rows.append(("rel_tag", rid, None, None, None, None, None, None,
                         t.get("k"), t.get("v")) + _PAD)


_UNION_SCHEMA = ("kind string, id long, lon double, lat double, seq int, "
                 "ref long, mtype string, role string, k string, v string, "
                 "user string, uid long, ts string, changeset long, "
                 "version int")


def parse_osm_xml(spark: SparkSession, path: str,
                  chunk_bytes: int = 64 << 20) -> dict:
    """Distributed parse of .osm XML into the normalized DataFrames.

    The file splits into byte-offset chunks, one executor task each
    (mapInPandas over a range of offsets) — no driver-side element list,
    unlike the reference's single-threaded StAX importer
    (OSMImporter.java:1416-1554).  Per-chunk XML recovery (scan to the
    first element start, finish the last element past the boundary) makes
    the split safe at any offset, so a planet-scale file parses at the
    cluster's aggregate read bandwidth.  The union frame is cached; the
    eight normalized tables are filters/projections of it."""
    import os

    import pandas as pd

    size = max(os.path.getsize(path), 1)
    n_chunks = max(1, min((size + chunk_bytes - 1) // chunk_bytes,
                          spark.sparkContext.defaultParallelism * 4))
    step = (size + n_chunks - 1) // n_chunks
    offsets = spark.range(n_chunks).select(
        (F.col("id") * step).alias("start"),
        F.least((F.col("id") + 1) * step, F.lit(size)).alias("end"))

    cols = ["kind", "id", "lon", "lat", "seq", "ref", "mtype", "role", "k",
            "v", "user", "uid", "ts", "changeset", "version"]

    def run(batches):
        for pdf in batches:
            for s, e in zip(pdf["start"], pdf["end"]):
                yield pd.DataFrame(_parse_chunk(path, int(s), int(e)),
                                   columns=cols)

    un = offsets.mapInPandas(run, _UNION_SCHEMA).cache()
    return tables_from_union(un)


def tables_from_union(un: DataFrame) -> dict:
    """Split the cached 15-column union frame into the eight normalized
    OSM tables (shared by the XML and PBF sources — the union row
    format is the source-independent contract)."""
    def tbl(kind, *sel):
        return un.filter(F.col("kind") == kind).select(*sel)

    meta = ["user", "uid", "ts", "changeset", "version"]
    return {
        "osm_nodes": tbl("node", F.col("id").alias("node_id"), "lon", "lat",
                         *meta),
        "osm_node_tags": tbl("node_tag", F.col("id").alias("node_id"), "k", "v"),
        "osm_ways": tbl("way", F.col("id").alias("way_id"), *meta),
        "osm_way_tags": tbl("way_tag", F.col("id").alias("way_id"), "k", "v"),
        "osm_way_nds": tbl("way_nd", F.col("id").alias("way_id"), "seq",
                           F.col("ref").alias("node_id")),
        "osm_relations": tbl("rel", F.col("id").alias("rel_id"), *meta),
        "osm_rel_tags": tbl("rel_tag", F.col("id").alias("rel_id"), "k", "v"),
        "osm_members": tbl("member", F.col("id").alias("rel_id"), "seq",
                           F.col("mtype").alias("type"), "ref", "role"),
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


def osm_user_activity(tables: dict) -> DataFrame:
    """Per-contributor edit statistics — the OsmAnalysisTest.java:99-176
    analysis (changeset/user walk → per-user counts, activity span, days
    active, activity rank) re-expressed as one keyed aggregation over the
    element tables instead of a graph traversal.

    Returns ``(user, uid, n_nodes, n_ways, n_relations, n_edits,
    first_ts, last_ts, active_days, user_rank)``; rank 1 = most edits
    (ties by name, deterministic).  OSM timestamps are ISO-8601 strings →
    ``to_timestamp`` directly.  Scale shape: union of projections, one
    groupBy(user) with map-side combine; the global rank is DISTRIBUTED —
    a range repartition on the rank key, per-partition row_number, plus a
    broadcast of per-partition cumulative offsets (#shuffle-partition
    rows), so no single task ever sorts the whole contributor frame
    (OSM planet has ~10M users; the old bare ``Window.orderBy`` funneled
    them all through one task)."""
    from pyspark.sql import Window

    frames = []
    for tname, kind in (("osm_nodes", "node"), ("osm_ways", "way"),
                        ("osm_relations", "rel")):
        frames.append(tables[tname].select(
            "user", "uid", "ts", F.lit(kind).alias("kind")))
    un = frames[0].unionByName(frames[1]).unionByName(frames[2])
    acts = (un.filter(F.col("user").isNotNull())
            .withColumn("t", F.to_timestamp("ts")))
    agg = (acts.groupBy("user", "uid")
           .agg(F.sum((F.col("kind") == "node").cast("long")).alias("n_nodes"),
                F.sum((F.col("kind") == "way").cast("long")).alias("n_ways"),
                F.sum((F.col("kind") == "rel").cast("long")).alias("n_relations"),
                F.count(F.lit(1)).alias("n_edits"),
                F.min("t").alias("first_ts"), F.max("t").alias("last_ts"),
                F.countDistinct(F.to_date("t")).alias("active_days")))
    # Distributed global rank: range-partition on the rank key so
    # partition i holds strictly higher-ranked rows than partition i+1,
    # row_number within each partition, then add the cumulative row
    # counts of the preceding partitions (a #partitions-row broadcast).
    # Identical output to a bare Window.orderBy, without the
    # single-task global sort.
    key = [F.desc("n_edits"), F.asc("user")]
    base = (agg.repartitionByRange(*key)
            .withColumn("_pid", F.spark_partition_id()))
    lw = Window.partitionBy("_pid").orderBy(*key)
    loc = base.withColumn("_lr", F.row_number().over(lw))
    ow = (Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1))
    offs = (loc.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
            .withColumn("_off", F.coalesce(F.sum("_n").over(ow), F.lit(0)))
            .select("_pid", "_off"))
    return (loc.join(F.broadcast(offs), "_pid")
            .withColumn("user_rank",
                        (F.col("_lr") + F.col("_off")).cast("int"))
            .drop("_pid", "_lr", "_off"))
