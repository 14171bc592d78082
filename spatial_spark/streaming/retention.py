"""Streaming weekly-cohort retention — the stateful-stream twin of
operators/funnel.retention (VERDICT r6 ask #8; the funnel twin at
streaming/funnel.py is the pattern).

Batch retention answers "of the users whose FIRST active ISO week was
W, how many were active in week W+k" after the fact; the streaming twin
emits each (user, cohort, weeks_since) cell the moment it first
happens, so the retention triangle accretes live.

State per user is ONE cohort week plus a seen-weeks bitmap
(``n_words``×63 weeks, default 252 weeks ≈ 4.8 years; 63 bits per
signed-int64 word so no stored value ever sets the sign bit) — bounded
regardless of event volume, managed by ``applyInPandasWithState``.

Ordering contract (same no-rewind monotonicity as the funnel twin):
events are processed time-sorted WITHIN each micro-batch, and the
cohort is pinned to the earliest week seen in STREAM order.  An event
arriving in a later batch with a timestamp before the pinned cohort
week cannot re-cohort the user (that would invalidate already-emitted
cells); it is dropped, and the batch operator over the landed store is
the exact reconciliation.  With batches arriving in time order the
stream's aggregated emissions equal the batch triangle exactly
(equivalence-pinned in tests)."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["retention_stream"]

_DAY_NS = 86_400_000_000_000


def retention_stream(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", n_words: int = 4) -> DataFrame:
    """Emit ``(user, cohort_week 'yyyy-MM-dd', weeks_since)`` the FIRST
    time each user is active in each week (append mode).  Aggregating
    emissions by (cohort_week, weeks_since) yields exactly the batch
    ``retention`` triangle when batches arrive in time order.

    ``n_words`` sizes the per-user seen-week bitmap (63 weeks per
    word — bit 63 stays clear because the state column is a SIGNED
    int64: ``1 << 63`` overflows LongType and would crash the stream
    the first time a user is active ~1.2 years after cohort, ADVICE
    r7); activity beyond the bitmap horizon is dropped with the same
    reconcile-via-batch contract as late events."""
    max_weeks = n_words * 63
    # The cohort field is named per STATE-LAYOUT VERSION (ADVICE r8):
    # v2 packs 63 weeks/word (v1 packed 64).  Restarting from a
    # pre-change checkpoint must FAIL FAST with a schema-mismatch error
    # instead of silently reinterpreting old bit positions (weeks would
    # shift across words, duplicating/dropping emissions) — the field
    # rename makes the old checkpoint's state schema incompatible.
    state_schema = T.StructType(
        [T.StructField("cohort_days_v2", T.LongType())]
        + [T.StructField(f"w{i}", T.LongType()) for i in range(n_words)])
    out_schema = T.StructType([
        T.StructField("user", T.LongType()),
        T.StructField("cohort_week", T.StringType()),
        T.StructField("weeks_since", T.IntegerType()),
    ])

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            st = list(state.get)
            cohort_days, words = st[0], list(st[1:])
        else:
            cohort_days, words = None, [0] * n_words
        weeks = []   # Monday-truncated, as epoch days
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            monday = ts.dt.normalize() - pd.to_timedelta(
                ts.dt.weekday, unit="D")
            weeks.extend(monday.astype("int64") // _DAY_NS)
        rows = {"user": [], "cohort_week": [], "weeks_since": []}
        for wd in sorted(weeks):
            if cohort_days is None:
                cohort_days = wd
            k = (wd - cohort_days) // 7
            if k < 0 or k >= max_weeks:
                continue  # pre-cohort late event / beyond bitmap horizon
            word, bit = divmod(int(k), 63)
            if words[word] & (1 << bit):
                continue  # this (user, week) cell already emitted
            words[word] |= 1 << bit
            rows["user"].append(key[0])
            rows["cohort_week"].append(
                pd.Timestamp(cohort_days * _DAY_NS).strftime("%Y-%m-%d"))
            rows["weeks_since"].append(int(k))
        if cohort_days is not None:
            state.update((cohort_days, *words))
        yield pd.DataFrame(rows)

    return (events.groupBy(F.col(user_col))
            .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                    GroupStateTimeout.NoTimeout))
