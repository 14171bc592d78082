from .search import bbox_search, closest, intersects_search, within_distance  # noqa: F401
from .join import spatial_join, within_distance_join  # noqa: F401
from .agg import (  # noqa: F401
    density_islands, intersect_all, keep_max, keep_min, union_all,
)
from .cql import cql_filter, cql_to_sql  # noqa: F401
