"""Pure-NumPy geometry kernel (the engine's JTS/Shapely substitute).

Only ever executed inside Arrow-batched pandas UDFs or driver-side plan
construction; the Spark-side canonical encoding is WKB + (gtype, bbox) cols.
"""

from .core import (  # noqa: F401
    GTYPE_GEOMETRY, GTYPE_LINESTRING, GTYPE_MULTILINESTRING, GTYPE_MULTIPOINT,
    GTYPE_MULTIPOLYGON, GTYPE_POINT, GTYPE_POLYGON, GTYPE_NAMES, NAME_GTYPES,
    Geometry, envelopes_intersect, envelope_covers,
)
from .wkt import from_wkt, to_wkt  # noqa: F401
from .wkb import from_wkb, to_wkb  # noqa: F401
from . import algorithms, predicates, clip  # noqa: F401
