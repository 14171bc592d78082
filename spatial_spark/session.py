"""SparkSession factory tuned for this engine.

Local-mode settings per the driver environment (local[32], single JVM);
the same builder settings are what we'd ship for a 1000-executor cluster,
minus the master/memory lines which come from spark-submit there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "spatial_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(8, cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata uses parquet TIMESTAMP(NANOS), illegal for Spark's
        # reader — surface as long nanos; io.tables.load_table converts
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPATIAL_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
