"""SLD (Styled Layer Descriptor) subset: parse + per-feature style resolve.

Parity: StyledImageExporter.java renders layers through GeoTools with SLD
styles like neo.sld.xml / osm-server-plugin/sld/rank.sld — rules filtered
on ``geometryType(the_geom)`` and property equality, colored by
``CssParameter`` fill/stroke.  This subset covers exactly that shape:

- ``Rule`` elements anywhere in the document,
- ``ogc:PropertyIsEqualTo`` filters (optionally nested under ``ogc:And``)
  on the geometryType function or a plain property name,
- hex ``CssParameter name="fill"/"stroke"`` colors.

First matching rule wins (SLD painter's-model order).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _hex_rgb(s: str):
    s = s.strip().lstrip("#")
    return tuple(int(s[i:i + 2], 16) for i in (0, 2, 4))


def parse_sld(xml_str: str) -> list:
    """SLD XML → list of rule dicts {geometry_type, property, value,
    fill, stroke} in document order."""
    root = ET.fromstring(xml_str)
    rules = []
    for rule_el in root.iter():
        if _local(rule_el.tag) != "Rule":
            continue
        r = {"geometry_type": None, "property": None, "value": None,
             "fill": None, "stroke": None}
        for eq in rule_el.iter():
            if _local(eq.tag) != "PropertyIsEqualTo":
                continue
            fn = prop = lit = None
            for ch in eq:
                t = _local(ch.tag)
                if t == "Function" and ch.attrib.get("name") == "geometryType":
                    fn = "geometryType"
                elif t == "PropertyName":
                    prop = (ch.text or "").strip()
                elif t == "Literal":
                    lit = (ch.text or "").strip()
            if fn == "geometryType":
                r["geometry_type"] = lit
            elif prop:
                r["property"], r["value"] = prop, lit
        for css in rule_el.iter():
            if _local(css.tag) != "CssParameter":
                continue
            nm = css.attrib.get("name")
            txt = (css.text or "").strip()
            if nm in ("fill", "stroke") and txt.startswith("#") and r[nm] is None:
                r[nm] = _hex_rgb(txt)
        rules.append(r)
    return rules


_GTYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon",
                4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon"}


def resolve_color(rules: list, gtype, attrs: dict):
    """First matching rule's stroke-or-fill RGB for a feature, else None.
    A rule's geometryType matches the single or Multi variant."""
    gname = _GTYPE_NAMES.get(int(gtype)) if gtype is not None else None
    base = gname.replace("Multi", "") if gname else None
    for r in rules:
        if r["geometry_type"] and r["geometry_type"] not in (gname, base):
            continue
        if r["property"] is not None:
            v = attrs.get(r["property"])
            if v is None or str(v) != str(r["value"]):
                continue
        color = r["stroke"] or r["fill"]
        if color:
            return color
    return None
