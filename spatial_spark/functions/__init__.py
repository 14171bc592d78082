from .scalar import REGISTRY, register_all, wkb_lit  # noqa: F401
from . import columns  # noqa: F401
