"""Ordered-funnel analysis over an event stream — the classic product
analytics operator (how many users did step1, then step2 AFTER step1,
then step3 after that), greedy-earliest semantics: per user, the
earliest step-1 event starts the chain and each later stage binds to
its earliest strictly-later occurrence.

Spark-first shape: ONE shuffle.  Events are filtered to the funnel's
step types, grouped per user into a time-sorted array, and the chain is
computed by a JVM higher-order ``aggregate`` fold over that array (no
window-per-stage, no k passes over the corpus, no Python).  Per-user
state is k timestamps; per-user event lists are bounded by that user's
activity — the same per-entity assumption every sessionizer makes.
The final stage counts are one tiny aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "funnel_timings", "retention"]


def _chains(events: DataFrame, steps: list, user_col: str,
            ts_col: str, type_col: str) -> DataFrame:
    """Per-user greedy-earliest chain struct (``chain.t0..t{k-1}``) —
    the shared single-shuffle core of funnel() and funnel_timings()."""
    k = len(steps)
    fields = ", ".join(f"'t{i}', CAST(NULL AS TIMESTAMP)"
                       for i in range(k))
    branches = []
    for i, st in enumerate(steps):
        lit = st.replace("'", "''")
        prev_ok = "" if i == 0 else \
            f" AND acc.t{i - 1} IS NOT NULL AND x.ts > acc.t{i - 1}"
        keep = ", ".join(
            f"'t{j}', {'x.ts' if j == i else f'acc.t{j}'}"
            for j in range(k))
        branches.append(
            f"WHEN acc.t{i} IS NULL AND x.et = '{lit}'{prev_ok} "
            f"THEN named_struct({keep})")
    fold = (f"aggregate(seq, named_struct({fields}), "
            f"(acc, x) -> CASE {' '.join(branches)} ELSE acc END)")

    per_user = (events
                .filter(F.col(type_col).isin(*steps))
                .select(F.col(user_col).alias("u"),
                        F.struct(F.col(ts_col).alias("ts"),
                                 F.col(type_col).alias("et")).alias("e"))
                .groupBy("u")
                .agg(F.array_sort(F.collect_list("e")).alias("seq"))
                .select(F.expr(fold).alias("chain")))
    return per_user


def funnel(events: DataFrame, steps: list,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Per-stage completion counts for the ordered ``steps`` chain.

    Returns ``(step_idx, step, n_users)`` — users whose chain reached
    each stage (monotonically non-increasing down the funnel).  Later
    stages require a STRICTLY later event time than the stage before.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    k = len(steps)
    per_user = _chains(events, steps, user_col, ts_col, type_col)
    counts = per_user.agg(*[
        F.coalesce(
            F.sum(F.col(f"chain.t{i}").isNotNull().cast("long")),
            F.lit(0).cast("long")).alias(f"c{i}")
        for i in range(k)])  # coalesce: an empty stream counts 0, not NULL
    stack = ", ".join(
        f"{i}, '{s.replace(chr(39), chr(39) * 2)}', c{i}"
        for i, s in enumerate(steps))
    return counts.select(F.expr(
        f"stack({k}, {stack}) AS (step_idx, step, n_users)"))


def retention(events: DataFrame, user_col: str = "user_id",
              ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users are cohorted by their first active
    ISO week; each later active week increments that cohort's
    ``weeks_since`` bucket.  Returns ``(cohort_week 'yyyy-MM-dd',
    weeks_since int, n_users)`` — the classic retention triangle (the
    week is a string so every fetch path renders it identically).

    Shape: distinct (user, week) → per-user min week (both keyed aggs
    with map-side combine) → one re-join on the user key → final keyed
    agg.  Nothing is corpus-wide except the user-keyed shuffles."""
    wk = F.date_trunc("week", F.col(ts_col))
    per = (events.select(F.col(user_col).alias("u"), wk.alias("w"))
           .distinct())
    cohort = per.groupBy("u").agg(F.min("w").alias("c"))
    return (per.join(cohort, "u")
            .groupBy(F.date_format("c", "yyyy-MM-dd").alias("cohort_week"),
                     (F.datediff("w", "c") / 7).cast("int")
                     .alias("weeks_since"))
            .agg(F.countDistinct("u").alias("n_users")))


def funnel_timings(events: DataFrame, steps: list,
                   user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type") -> DataFrame:
    """Time-to-convert for users completing the WHOLE chain: count plus
    exact p50/p95 seconds between the chain's first and last stage
    (rounded to 3 decimals — cross-engine float discipline).  Same
    single-shuffle chain core as funnel(); the percentile aggregates
    see one duration per completed user."""
    if len(steps) < 2:
        raise ValueError("funnel_timings needs at least two steps")
    k = len(steps)
    per_user = _chains(events, steps, user_col, ts_col, type_col)
    dur = (per_user
           .filter(F.col(f"chain.t{k - 1}").isNotNull())
           .select((F.col(f"chain.t{k - 1}").cast("double")
                    - F.col("chain.t0").cast("double")).alias("secs")))
    return dur.agg(
        F.count(F.lit(1)).alias("n_completed"),
        F.round(F.expr("percentile(secs, 0.5D)"), 3).alias("p50_secs"),
        F.round(F.expr("percentile(secs, 0.95D)"), 3).alias("p95_secs"))
