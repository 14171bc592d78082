"""Physical-plan regression guards.

The scale story depends on plan *shapes* (SCALE.md): filters pushed into the
parquet scan, SFC key ranges present, broadcasts chosen for small sides,
partial aggregation before shuffles.  These tests pin those shapes so a
refactor can't silently regress them.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df, execute: bool = False) -> str:
    if execute:  # AQE finalizes join strategy only at runtime
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def point_layer(ctx, spark):
    layer = ctx.create_point_layer("plan_pts", x="lon", y="lat")
    rows = [(i, (i * 7919 % 36000) / 100 - 180.0, (i * 104729 % 17000) / 100 - 85.0)
            for i in range(5000)]
    layer.add(spark.createDataFrame(rows, "id long, lon double, lat double"))
    return layer


def test_within_distance_pushdown(point_layer):
    plan = _plan(point_layer.within_distance(10.0, 45.0, 100.0))
    # SFC key ranges and bbox conjuncts must reach the scan's data filters
    assert "zkey" in plan
    assert "FileScan parquet" in plan
    scan = plan[plan.index("FileScan parquet"):]
    assert "DataFilters" in scan and "zkey" in scan.split("DataFilters")[1][:2000]
    # the probe-side trig constant-folds (no per-row sin/cos of literals)
    assert "SIN(RADIANS(10.0))" not in plan


def test_bbox_search_no_python(point_layer):
    plan = _plan(point_layer.bbox_search(0, 0, 20, 20))
    # pure-column path: no Python/Arrow eval in the plan at all
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # codegen stage marker: Spark prints `*(n)` for whole-stage-codegen'd ops
    assert "*(1)" in plan


def test_spatial_join_broadcasts_small_side(ctx, spark):
    from spatial_spark.operators.join import spatial_join
    ctx2 = ctx
    a = spark.createDataFrame(
        [(i, float(i % 10), float(i % 7)) for i in range(500)],
        "id long, x double, y double")
    a = (a.withColumn("geom", F.expr("st_point(x, y)"))
         .withColumn("gtype", F.lit(1))
         .withColumn("xmin", F.col("x")).withColumn("ymin", F.col("y"))
         .withColumn("xmax", F.col("x")).withColumn("ymax", F.col("y")))
    b = spark.createDataFrame([(1, 0.0, 0.0, 5.0, 5.0)],
                              "id long, xmin double, ymin double, xmax double, ymax double")
    b = (b.withColumn("geom", F.expr("st_make_box(xmin, ymin, xmax, ymax)"))
         .withColumn("gtype", F.lit(3)))
    plan = _plan(spatial_join(a, b, "within"), execute=True)
    assert "Broadcast" in plan  # small side broadcast, no grid shuffle


def test_groupby_partial_aggregation(spark, sf_dir):
    from spatial_spark.io.tables import load_table
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = _plan(agg)
    # map-side partial + final aggregate around one shuffle
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan
