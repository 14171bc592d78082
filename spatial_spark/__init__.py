"""spatial_spark — a PySpark-native spatial analytics engine.

Re-expresses the capabilities of neo4j-contrib/spatial (layers, spatial
predicates, geometry processing pipelines, k-NN / within-distance search,
format import/export) as idiomatic Spark DataFrame/SQL operators, plus the
large-scale training-data operators (dedup, similarity, text, multimodal)
that a 100 TB pipeline needs.  See SURVEY.md for the blueprint.
"""

from .session import get_spark  # noqa: F401
from .layer import Layer, SpatialContext  # noqa: F401
from .functions import register_all, wkb_lit  # noqa: F401

__version__ = "0.1.0"
