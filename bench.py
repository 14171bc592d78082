"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced through full execution with the noop sink (count()
alone would let Catalyst prune the expensive columns).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "within_distance", "knn", "bbox_window", "spatial_join", "spatial_join_agg",
    "distance_join", "st_area_rects", "extract_points", "orthodromic_length",
    "zorder_keys", "tpch_q1", "revenue_by_nation", "dedup_exact",
    "minhash_pairs", "simhash_pairs", "quality_scores", "lang_id",
    "knn_cosine", "events_daily",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod
    from spatial_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm up JVM + python workers + view registration outside the timings
    entrymod._setup(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    spark.sql("SELECT st_area(st_geomfromtext('POINT (0 0)'))").collect()

    timings = {}
    t_all = time.time()
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# {name} failed: {str(e)[:200]}", file=sys.stderr)
    total = round(time.time() - t_all, 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
