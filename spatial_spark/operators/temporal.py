"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join — the standard event-pipeline shapes (attribution, feature
backfill, session enrichment).

Both avoid the naive range-predicate join (which Catalyst can only run
as a broadcast-nested-loop or a huge inequality sort-merge):

* `asof_join` — union the two streams, per-entity window ordered by
  (ts, side), carry the last right-side payload forward with
  `last(..., ignoreNulls)`.  One shuffle on the entity key, state is a
  single row per partition frame — the 100 TB shape.
* `range_join` — bin both sides on a fixed interval grid; an interval
  replicates to each bin it covers, points join their bin, an exact
  containment filter refines.  The equi-join on (key, bin) replaces the
  inequality join, the same trick the PBSM spatial join plays in 2-D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              tolerance=None) -> DataFrame:
    """For each left row: the latest right row with
    ``right_ts <= left_ts`` for the same `on` key (backward as-of).

    Output: left columns + right columns prefixed ``r_`` (NULL when no
    prior right row, or none within `tolerance` — a Column/literal in
    the timestamp's own units when given).

    Ties (equal timestamps) resolve right-row-first, so a right row at
    exactly left_ts matches — ASOF-standard and DuckDB-compatible.

    ``tolerance`` compares ``left_ts - right_ts`` directly, so it must be
    in the timestamp columns' own units: a number for numeric ts columns,
    an INTERVAL literal (e.g. ``F.expr("INTERVAL 5 MINUTES")``) for
    TIMESTAMP columns — a bare number against TIMESTAMPs would silently
    never match, so that combination raises."""
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]

    l_tag = (left.withColumn("_ts", F.col(left_ts))
             .withColumn("_side", F.lit(1))
             .select(on, "_ts", "_side",
                     *[F.col(c) for c in lcols if c != on],
                     *[F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}")
                       for c in rcols]))
    r_tag = (right.withColumn("_ts", F.col(right_ts))
             .withColumn("_side", F.lit(0))
             .select(on, "_ts", "_side",
                     *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                       for c in lcols if c != on],
                     *[F.col(c).alias(f"r_{c}") for c in rcols]))

    from pyspark.sql import Window
    w = (Window.partitionBy(on).orderBy(F.col("_ts").asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # ONE select carrying every right column over the same window frame —
    # a withColumn-per-column loop builds N nested projections (N analysis
    # passes, brittle plans on wide right frames; r3 verdict)
    carried = l_tag.unionByName(r_tag).select(
        on, "_ts", "_side",
        *[F.col(c) for c in lcols if c != on],
        *[F.last(F.col(f"r_{c}"), ignorenulls=True).over(w).alias(f"r_{c}")
          for c in rcols])
    out = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        if isinstance(tolerance, (int, float)) and \
                str(left.schema[left_ts].dataType).startswith("Timestamp"):
            raise TypeError(
                "numeric tolerance against TIMESTAMP columns never matches "
                "(ts - ts yields INTERVAL); pass an INTERVAL expression, "
                'e.g. F.expr("INTERVAL 5 MINUTES")')
        # beyond-tolerance matches null out (keep the left row — as-of is
        # a left join); guard every carried column, not just the ts
        keep = (F.col(f"r_{right_ts}").isNotNull()
                & ((F.col("_ts") - F.col(f"r_{right_ts}")) <= tolerance))
        for c in rcols:
            out = out.withColumn(
                f"r_{c}", F.when(keep, F.col(f"r_{c}")))
    return out.drop("_ts", "_side")


def range_join(points: DataFrame, intervals: DataFrame, on: str,
               ts_col: str, start_col: str, end_col: str,
               bin_width) -> DataFrame:
    """Join each `points` row to every `intervals` row of the same `on`
    key whose [start, end] contains its `ts_col` (inclusive).

    `bin_width` must be in the column's units (e.g. seconds for
    timestamps cast to long).  Intervals replicate to ceil(len/width)+1
    bins — pick bin_width near the typical interval length so the
    replication factor stays O(1)."""
    p = points.withColumn("_bin",
                          F.floor(F.col(ts_col).cast("double") / bin_width))
    i = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(start_col).cast("double") / bin_width),
            F.floor(F.col(end_col).cast("double") / bin_width))))
    i = i.select([F.col(c).alias(f"i_{c}") if c != "_bin" else F.col(c)
                  for c in i.columns])
    joined = p.join(i, (p["_bin"] == i["_bin"])
                    & (p[on] == i[f"i_{on}"])).drop("_bin")
    return (joined
            .filter((F.col(ts_col) >= F.col(f"i_{start_col}"))
                    & (F.col(ts_col) <= F.col(f"i_{end_col}")))
            .drop(f"i_{on}"))
