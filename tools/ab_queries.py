"""Interleaved A/B timing of declared queries between the working tree's
`__spark_entry__` and an alternate entry-file snapshot (e.g. HEAD),
in ONE Spark session so ambient throttling hits both variants equally
(guide §1; this sandbox shows 2-4x bursty noise between processes).

    python tools/ab_queries.py <sf_dir> <old_entry.py> <reps> q1 q2 ...

For each query: alternates OLD,NEW,OLD,NEW... `reps` times each, prints
per-rep times and min-of-reps for both, plus a JSON summary.
"""
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    sf_dir, old_path, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    import __spark_entry__ as new_entry
    old_entry = _load(old_path, "old_spark_entry")
    from spatial_spark.session import get_spark
    spark = get_spark("ab_queries")
    new_entry._setup(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    spark.sql("SELECT st_area(st_geomfromtext('POINT (0 0)'))").collect()
    qs_new, qs_old = new_entry.queries(), old_entry.queries()
    summary = {}
    for name in names:
        t_old, t_new = [], []
        for rep in range(reps):
            for tag, fn, acc in (("old", qs_old[name], t_old),
                                 ("new", qs_new[name], t_new)):
                spark.sparkContext.setJobDescription(
                    f"ab:{name}:{tag}#{rep}")
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                acc.append(round(time.time() - t0, 3))
        summary[name] = {"old": min(t_old), "new": min(t_new)}
        print(f"{name:26s} old {' '.join(f'{t:7.2f}' for t in t_old)} "
              f"min={min(t_old):6.2f} | new "
              f"{' '.join(f'{t:7.2f}' for t in t_new)} "
              f"min={min(t_new):6.2f}", flush=True)
    print("JSON:" + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
