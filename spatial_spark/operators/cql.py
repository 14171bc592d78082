"""CQL (OGC Common Query Language) subset → Spark SQL translation.

Parity: FilterCQL.java:35-52 + SearchCQL.java:39-69 evaluate ECQL per record
via GeoTools; Utilities.extractEnvelopeFromFilter (:65-119) additionally
mines the expression for an envelope to seed the index search.  Here the
translator emits a Spark SQL string; the envelope mining emerges naturally —
BBOX(...) becomes pure bbox-column range predicates that Catalyst pushes
into the scan, and spatial predicates get an automatic bbox conjunct.

Scope: the subset the reference's tests exercise (DynamicLayer.java:106-149,
GeoPipesDocTest:154-225): BBOX, INTERSECTS/WITHIN/CONTAINS, comparisons,
LIKE, IS [NOT] NULL, AND/OR/NOT, geometryType().
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from ..geom import from_wkt

_GEOM_PROPS = ("the_geom", "geometry", "geom")


def cql_to_sql(expr: str, strict: bool = True, has_geom: bool = True) -> str:
    """Translate the CQL subset to a Spark SQL predicate string.

    strict=True (default) raises on CQL spatial constructs the translator
    failed to rewrite (wrong arity, malformed WKT) instead of letting them
    fall through to a confusing Spark analysis error.  has_geom=False
    targets point layers (no WKB column): distance predicates compile to
    the pure-column spherical formula on (xmin, ymin)."""
    s = expr

    # BBOX(the_geom, x1, y1, x2, y2) → bbox-intersects column predicate
    def bbox_repl(m):
        x1, y1, x2, y2 = (float(v) for v in m.group(2, 3, 4, 5))
        return (f"(xmax >= {min(x1, x2)!r} AND xmin <= {max(x1, x2)!r} AND "
                f"ymax >= {min(y1, y2)!r} AND ymin <= {max(y1, y2)!r})")

    s = re.sub(
        r"BBOX\s*\(\s*(\w+)\s*,\s*([-\d.eE]+)\s*,\s*([-\d.eE]+)\s*,"
        r"\s*([-\d.eE]+)\s*,\s*([-\d.eE]+)\s*\)",
        bbox_repl, s, flags=re.I)

    # DWITHIN(the_geom, POINT(x y), d, units) → orthodromic distance test
    # (ECQL extension; units: meters | kilometers, reference distances are
    # great-circle km via OrthodromicDistance.java:90-97).  Runs BEFORE the
    # plain spatial predicates so WITHIN's pattern cannot nibble at it.
    def dwithin_repl(m):
        wkt = m.group(2).strip()
        g = from_wkt(wkt)
        if g.gtype != 1:
            raise ValueError("DWITHIN: probe geometry must be a POINT")
        x, y = float(g.data[0]), float(g.data[1])
        dist = float(m.group(3))
        unit = m.group(4).lower()
        km = {"meters": dist / 1000.0, "kilometers": dist}.get(unit)
        if km is None:
            raise ValueError(f"DWITHIN: unknown units {unit!r}")
        if has_geom:
            return (f"st_sphere_distance(geom, CAST({x!r} AS DOUBLE), "
                    f"CAST({y!r} AS DOUBLE)) <= {km!r}")
        return (f"st_distance_sphere(CAST({x!r} AS DOUBLE), "
                f"CAST({y!r} AS DOUBLE), xmin, ymin) <= {km!r}")

    s = re.sub(
        r"DWITHIN\s*\(\s*(\w+)\s*,\s*([A-Z]+[A-Z0-9 ]*\([^)]*\)+)\s*,"
        r"\s*([-\d.eE]+)\s*,\s*(\w+)\s*\)",
        dwithin_repl, s, flags=re.I)

    # Spatial predicates with WKT literal → st_* + envelope conjunct
    def spatial_repl(m):
        op = m.group(1).lower()
        wkt = m.group(3).strip()
        g = from_wkt(wkt)
        e = g.envelope()
        fn = {"intersects": "st_intersects", "within": "st_within",
              "contains": "st_contains", "touches": "st_touches",
              "crosses": "st_crosses", "overlaps": "st_overlaps",
              "disjoint": "st_disjoint", "equals": "st_equals"}[op]
        exact = f"{fn}(geom, st_geomfromtext('{wkt}'))"
        if op == "disjoint":
            return exact
        # two-phase: envelope conjunct first (pushdown), exact refine second
        return (f"(xmax >= {e[0]!r} AND xmin <= {e[2]!r} AND "
                f"ymax >= {e[1]!r} AND ymin <= {e[3]!r} AND {exact})")

    s = re.sub(
        r"(INTERSECTS|WITHIN|CONTAINS|TOUCHES|CROSSES|OVERLAPS|DISJOINT|EQUALS)"
        r"\s*\(\s*(\w+)\s*,\s*([A-Z]+[A-Z0-9 ]*\([^)]*\)+)\s*\)",
        spatial_repl, s, flags=re.I)

    # geometryType(the_geom) → st_geometrytype(geom)
    s = re.sub(r"geometryType\s*\(\s*(\w+)\s*\)", "st_geometrytype(geom)", s, flags=re.I)

    # normalize geometry property names to our column
    for p in _GEOM_PROPS:
        s = re.sub(rf"\b{p}\b", "geom", s)

    # CQL operators → SQL
    s = re.sub(r"<>", "!=", s)

    if strict:
        leftover = re.search(
            r"\b(BBOX|INTERSECTS|DWITHIN|WITHIN|CONTAINS|TOUCHES|CROSSES"
            r"|OVERLAPS|DISJOINT|EQUALS)\s*\(", s, flags=re.I)
        if leftover:
            raise ValueError(
                f"CQL: could not translate {leftover.group(1).upper()}(...) — "
                f"check argument count/WKT in: {expr!r}")
    return s


def cql_filter(layer, expression: str) -> DataFrame:
    """spatial.cql (:838-848)."""
    df = layer.df()
    return df.filter(cql_to_sql(expression, has_geom="geom" in df.columns))
