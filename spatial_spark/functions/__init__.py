from .scalar import REGISTRY, register_all, wkb_lit  # noqa: F401
from . import columns  # noqa: F401
from .conversion import (  # noqa: F401
    as_geometry, as_map, decode_geometry, extract_attributes, native_to_wkt,
    node_as_wkt, wkt_to_geojson,
)
