"""Trajectory analytics: stay-point (dwell) detection over ping streams.

A stay point is where a moving entity STOPPED — the home/work/POI signal
every trajectory pipeline extracts first (Li et al. 2008, "Mining user
similarity based on location history").  The textbook algorithm is a
per-user sequential scan with a moving anchor (each point compared to
the anchor until distance > d, then a duration check) — order-dependent
and inherently serial.  This operator implements the GRID-STAY variant:
a stay is a maximal run of consecutive pings that (a) fall in the same
hex cell and (b) have no time gap larger than ``max_gap_s``; runs
dwelling at least ``min_stay_s`` are emitted.  The hex cell replaces
the anchor-radius ball (cell circumradius ≈ the radius knob), which
makes the operator declarative — two window functions and one keyed
aggregation — and gives the SQL oracle the exact same semantics.
Documented difference from Li et al.: a slow drift across a cell
boundary splits a stay the anchor formulation would keep (and the
anchor formulation splits stays the grid keeps when the anchor lands
near an edge) — both are threshold artifacts of the same magnitude.

Scale shape: hex assignment is map-only Column math; the run windows
partition by user (per-key cardinality = one user's pings — trajectory
data's natural shard); the stay aggregation is one keyed agg on
(user, run).  Nothing driver-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stay_points"]


def stay_points(df: DataFrame, cell_size: float, min_stay_s: int,
                max_gap_s: int, user_col: str = "user_id",
                ts_col: str = "ts", x_col: str = "lon",
                y_col: str = "lat") -> DataFrame:
    """Stay points per user: maximal same-hex, gap-bounded ping runs
    dwelling ≥ ``min_stay_s`` seconds.

    Returns (user, hex_q, hex_r, n_pings, cx, cy, arrive_s, depart_s,
    dwell_s): centroid = mean ping position (rounded to 6), timestamps
    as epoch seconds.  Ties and ordering are deterministic: pings sort
    by (ts, x, y) within a user."""
    from pyspark.sql import Window

    from .tiles import with_hex

    hexed = with_hex(df, cell_size, x_col, y_col)
    sec = F.unix_timestamp(F.col(ts_col))
    base = hexed.select(
        F.col(user_col).alias("user"),
        sec.alias("s"),
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        "hex_q", "hex_r")
    w = Window.partitionBy("user").orderBy("s", "x", "y")
    flagged = (base
               .withColumn("new_run", F.when(
                   F.lag("hex_q").over(w).isNull()
                   | (F.lag("hex_q").over(w) != F.col("hex_q"))
                   | (F.lag("hex_r").over(w) != F.col("hex_r"))
                   | ((F.col("s") - F.lag("s").over(w))
                      > F.lit(int(max_gap_s))),
                   1).otherwise(0))
               .withColumn("run", F.sum("new_run").over(
                   w.rowsBetween(Window.unboundedPreceding, 0))))
    stays = (flagged.groupBy("user", "run", "hex_q", "hex_r")
             .agg(F.count(F.lit(1)).alias("n_pings"),
                  F.round(F.avg("x"), 6).alias("cx"),
                  F.round(F.avg("y"), 6).alias("cy"),
                  F.min("s").alias("arrive_s"),
                  F.max("s").alias("depart_s")))
    return (stays
            .withColumn("dwell_s", F.col("depart_s") - F.col("arrive_s"))
            .filter(F.col("dwell_s") >= F.lit(int(min_stay_s)))
            .select("user", "hex_q", "hex_r", "n_pings", "cx", "cy",
                    "arrive_s", "depart_s", "dwell_s"))
