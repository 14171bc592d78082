"""Dump .explain("formatted") for declared queries to plans/<dir>/.

    python tools/dump_plans.py <sf_dir> <out_dir> <suffix> q1 q2 ...

Writes <out_dir>/<q>_<suffix>.txt per query (the judge checks plan
claims against these files — guide §1.1/§7.2).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as entry
    from spatial_spark.session import get_spark
    spark = get_spark("dump_plans")
    entry._setup(spark, sf_dir)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan.splitlines())} lines -> {path}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
