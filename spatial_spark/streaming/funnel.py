"""Streaming funnel tracking — the stateful-stream twin of
operators/funnel.funnel: per-user chain state advances micro-batch by
micro-batch and every stage advance is EMITTED as it happens (the live
"user just converted" feed a batch funnel can only reconstruct later).

State per user is k timestamps (the greedy-earliest chain), managed by
``applyInPandasWithState`` — bounded regardless of event volume.
Ordering contract: events are processed time-sorted WITHIN each
micro-batch; an event arriving in a later batch with an earlier
timestamp cannot rewind the chain (at-least-once-style monotonicity —
the batch operator on the landed store is the exact reconciliation,
same greedy semantics)."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["funnel_stream"]


def funnel_stream(events: DataFrame, steps: list,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Emit ``(user, step_idx, step, ts)`` whenever a user's funnel
    chain advances.  Works on a streaming DataFrame (append mode)."""
    k = len(steps)
    idx = {s: i for i, s in enumerate(steps)}
    state_schema = T.StructType(
        [T.StructField(f"t{i}", T.LongType()) for i in range(k)])
    out_schema = T.StructType([
        T.StructField("user", T.LongType()),
        T.StructField("step_idx", T.IntegerType()),
        T.StructField("step", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        chain = list(state.get) if state.exists else [None] * k
        rows = {"user": [], "step_idx": [], "step": [], "ts": []}
        evs = []
        for pdf in pdfs:
            for ts, et in zip(pdf[ts_col], pdf[type_col]):
                if et in idx:
                    evs.append((ts.value, et))
        for tns, et in sorted(evs):
            i = idx[et]
            if chain[i] is None and (i == 0 or (chain[i - 1] is not None
                                                and tns > chain[i - 1])):
                chain[i] = tns
                rows["user"].append(key[0])
                rows["step_idx"].append(i)
                rows["step"].append(et)
                rows["ts"].append(pd.Timestamp(tns))
        state.update(tuple(chain))
        yield pd.DataFrame(rows)

    keyed = events.filter(F.col(type_col).isin(*steps)) \
        .groupBy(F.col(user_col))
    return keyed.applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
