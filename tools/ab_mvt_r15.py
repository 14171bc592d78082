"""Interleaved A/B for the r15 session-4 mvt_tiles_geoms restructure
(per-(tile, feature) clip+encode in a balanced map stage, per-tile
concat) — OLD io/mvt.py side-loaded from git HEAD in the SAME session,
variants alternated per rep so ambient throttling hits both equally
(guide §1).

    python tools/ab_mvt_r15.py <sf_dir> <reps>
"""
import importlib.util
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _load_old(rel_path, mod_name):
    src = subprocess.check_output(
        ["git", "-C", ROOT, "show", f"HEAD:{rel_path}"]).decode()
    path = os.path.join(ROOT, *mod_name.split(".")[:-1],
                        mod_name.split(".")[-1] + ".py")
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(mod_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod, path


def main() -> int:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from spatial_spark.session import get_spark
    spark = get_spark("ab_mvt_r15")
    entry._setup(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    spark.sql("SELECT st_area(st_geomfromtext('POINT (0 0)'))").collect()

    old_mvt, old_path = _load_old("spatial_spark/io/mvt.py",
                                  "spatial_spark.io._old_mvt")
    import spatial_spark.io.mvt as new_mvt

    par = spark.sparkContext.defaultParallelism

    def lines_df():
        return (spark.sql(f"""
                SELECT p_partkey AS id, {entry._MVTP_X0} AS x0,
                       {entry._MVTP_Y0} AS y0,
                       {entry._MVTP_X0} + {entry._MVTP_W} AS x1
                FROM part""")
                .repartition(par)
                .withColumn("geom", F.expr(
                    "st_geomfromtext(concat('LINESTRING (', x0, ' ', y0,"
                    " ', ', x1, ' ', y0, ')'))"))
                .selectExpr("id", "geom", "x0 AS xmin", "y0 AS ymin",
                            "x1 AS xmax", "y0 AS ymax"))

    def polys_df():
        return (spark.sql(f"""
                SELECT p_partkey AS id, {entry._MVTP_X0} AS x0,
                       {entry._MVTP_Y0} AS y0,
                       {entry._MVTP_X0} + {entry._MVTP_W} AS x1,
                       {entry._MVTP_Y0} + {entry._MVTP_H} AS y1
                FROM part""")
                .repartition(par)
                .withColumn("geom", F.expr(
                    "st_geomfromtext(concat('POLYGON ((', x0, ' ', y0,"
                    " ', ', x1, ' ', y0, ', ', x1, ' ', y1, ', ',"
                    " x0, ' ', y1, ', ', x0, ' ', y0, '))'))"))
                .selectExpr("id", "geom", "x0 AS xmin", "y0 AS ymin",
                            "x1 AS xmax", "y1 AS ymax"))

    cases = {
        "mvt_lines_enc": (lines_df, "seg"),
        "mvt_polys_enc": (polys_df, "parts"),
    }
    summary = {}
    for name, (mk, lname) in cases.items():
        t_old, t_new = [], []
        for rep in range(reps):
            for tag, mod, acc in (("old", old_mvt, t_old),
                                  ("new", new_mvt, t_new)):
                spark.sparkContext.setJobDescription(
                    f"ab_mvt:{name}:{tag}#{rep}")
                t0 = time.time()
                mod.mvt_tiles_geoms(mk(), 2, layer_name=lname).write \
                   .format("noop").mode("overwrite").save()
                acc.append(round(time.time() - t0, 3))
        summary[name] = {"old": min(t_old), "new": min(t_new)}
        print(f"{name:16s} old {' '.join(f'{t:6.2f}' for t in t_old)} "
              f"min={min(t_old):6.2f} | new "
              f"{' '.join(f'{t:6.2f}' for t in t_new)} "
              f"min={min(t_new):6.2f}", flush=True)
    # result-identity: tile bytes must match between old and new paths
    for name, (mk, lname) in cases.items():
        a = {(r["tile_x"], r["tile_y"]): bytes(r["mvt"]) for r in
             old_mvt.mvt_tiles_geoms(mk(), 2, layer_name=lname).collect()}
        b = {(r["tile_x"], r["tile_y"]): bytes(r["mvt"]) for r in
             new_mvt.mvt_tiles_geoms(mk(), 2, layer_name=lname).collect()}
        assert a == b, f"{name}: tile bytes differ"
        print(f"{name}: {len(a)} tiles byte-identical", flush=True)
    print("JSON:" + json.dumps(summary))
    os.unlink(old_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
