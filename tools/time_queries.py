"""Time a subset of declared queries exactly the way bench.py does
(min-of-N reps, noop sink, local[$SPARK_GRAFT_CPUS]) without running the
whole headline set.  Usage:

    python tools/time_queries.py <sf_dir> [reps] q1 q2 ...

Prints one `name rep_times... best` line per query plus a JSON summary —
for interleaved A/B measurement during optimization rounds (guide §1).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    if sys.argv[2].isdigit():
        reps, names = int(sys.argv[2]), sys.argv[3:]
    else:
        reps, names = 2, sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    import __spark_entry__ as entry
    from spatial_spark.session import get_spark
    spark = get_spark("time_queries")
    entry._setup(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    spark.sql("SELECT st_area(st_geomfromtext('POINT (0 0)'))").collect()
    qs = entry.queries()
    out = {}
    for name in names:
        fn = qs[name]
        times = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"time:{name}#{rep}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        out[name] = min(times)
        print(f"{name:28s} {' '.join(f'{t:7.3f}' for t in times)} "
              f"best={min(times):7.3f}", flush=True)
    print("JSON:" + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
