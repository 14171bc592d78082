"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

The generator writes naive nanosecond timestamps (parquet TIMESTAMP(NANOS)),
which Spark's parquet reader rejects outright.  With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.get_spark)
those columns surface as LongType nanos; this loader converts them to real
timestamps (micros, UTC) so downstream code sees normal TIMESTAMP columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# nanosecond-timestamp columns per table (from the generator's schema)
NANOS_TS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # nanosAsLong is a runtime SQL conf: set it here so sessions we didn't
    # build (e.g. the driver's) can read the TIMESTAMP(NANOS) files too
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in NANOS_TS.get(name, ()):
        dt = dict(df.dtypes).get(col)
        if dt == "bigint":
            # TIMESTAMP(NANOS) surfaced as long nanos via nanosAsLong
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dt == "timestamp_ntz":
            # TIMESTAMP(MICROS) without TZ: reinterpret as UTC instant (the
            # session TZ is pinned to UTC, so this is a pure type change)
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
