"""Layer catalog — the engine's equivalent of the reference's layer nodes.

The reference anchors each layer on a ``SpatialLayer``-labeled node whose
properties carry name/encoder/index/CRS/geometry-type plus discovered
attribute schema (Constants.java:32-49, EditableLayerImpl.java:122-129,
DefaultLayer.java:156-185).  Here that property bag is a JSON catalog file
next to the warehouse directory; each layer's data is a Parquet table with
the fixed core columns:

    id bigint, geom binary (WKB), gtype int,
    xmin, ymin, xmax, ymax double,      -- persisted bbox (AbstractGeometryEncoder:64-92)
    zkey bigint                          -- SFC clustering key (write layout)

plus ordinary typed attribute columns.  At 100 TB the catalog would live in
a metastore table; the JSON file is the local stand-in with the same schema.
"""

from __future__ import annotations

import json
import os
import threading
import time

_LOCK = threading.Lock()

CORE_COLUMNS = ("id", "geom", "gtype", "xmin", "ymin", "xmax", "ymax", "zkey")


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self.path = os.path.join(warehouse, "_layers.json")

    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, data: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # -- DDL (spatial.addLayer / removeLayer / layers / layerMeta parity) ----
    def add_layer(self, name: str, *, encoder: str, crs: str = "WGS84",
                  geometry_type: str | None = None, config: dict | None = None) -> dict:
        with _LOCK:
            data = self._read()
            if name in data:
                raise ValueError(f"layer {name!r} already exists")
            meta = {
                "name": name,
                "path": os.path.join(self.warehouse, name),
                "encoder": encoder,
                "crs": crs,
                "geometry_type": geometry_type,
                "config": config or {},
                "created_ms": int(time.time() * 1000),
                "attrs": {},
                "views": {},  # DynamicLayerConfig equivalents: name -> predicate
            }
            data[name] = meta
            self._write(data)
            return meta

    def get(self, name: str) -> dict:
        data = self._read()
        if name not in data:
            raise KeyError(f"no such layer {name!r}")
        return data[name]

    def exists(self, name: str) -> bool:
        return name in self._read()

    def layers(self) -> list:
        return sorted(self._read())

    def update(self, name: str, **fields) -> None:
        with _LOCK:
            data = self._read()
            data[name].update(fields)
            self._write(data)

    def record_attrs(self, name: str, attrs: dict) -> None:
        """Discovered-attribute persistence (EditableLayerImpl.java:224-237:
        every property seen on added records is memorized with its type)."""
        with _LOCK:
            data = self._read()
            data[name].setdefault("attrs", {}).update(attrs)
            self._write(data)

    def merge_stats(self, name: str, stats: dict, replace: bool = False) -> None:
        """Write-time layer statistics (count, gtype min/max, bbox) collected
        by an Observation during the write job — the metadata that lets every
        search plan WITHOUT running a Spark job first (the reference reads
        the same facts off its layer node: DefaultLayer.getGeometryType,
        Layer.getIndex().count()/getBoundingBox()).

        Append merges monotonically (count adds, mins/maxes combine)."""
        with _LOCK:
            data = self._read()
            cur = {} if replace else (data[name].get("stats") or {})
            merged = dict(cur)
            for k, v in stats.items():
                if v is None:
                    continue
                if k == "count":
                    merged[k] = int(cur.get(k, 0)) + int(v)
                elif k in ("gtype_min", "xmin", "ymin", "rect_min"):
                    merged[k] = v if k not in cur else min(cur[k], v)
                elif k in ("gtype_max", "xmax", "ymax"):
                    merged[k] = v if k not in cur else max(cur[k], v)
                else:
                    merged[k] = v
            data[name]["stats"] = merged
            self._write(data)

    def add_view(self, name: str, view_name: str, predicate: str) -> None:
        """DynamicLayerConfig (DynamicLayer.java:37-217): a named read-only
        filtered view stored as a SQL predicate."""
        with _LOCK:
            data = self._read()
            data[name].setdefault("views", {})[view_name] = predicate
            self._write(data)

    def remove_layer(self, name: str) -> None:
        import shutil
        with _LOCK:
            data = self._read()
            meta = data.pop(name, None)
            self._write(data)
        if meta and os.path.exists(meta["path"]):
            shutil.rmtree(meta["path"])
