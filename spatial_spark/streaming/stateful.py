"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming surface; these are the engine's extension
axis for training-data pipelines: streaming exact-dedup (drop repeats of a
key) and per-key running aggregates — the two stateful shapes a 100 TB
ingest actually needs.

TTL note: pass ``ttl_ms`` only for genuinely continuous queries — with a
processing-time timeout the engine schedules extra micro-batches until every
key's timer fires, so an availableNow (bounded) run would spin on empty
timeout batches until the full TTL elapses.  Default is NoTimeout (state
lives for the query's lifetime; bound it with watermark+TTL in production).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(events: DataFrame, key_cols: list,
                    ttl_ms: int | None = None) -> DataFrame:
    """Emit only the first event per key; suppress repeats.  The streaming
    analogue of operators.dedup.exact_dedup."""
    keyed = events.withColumn(
        "_k", F.md5(F.concat_ws("\x01", *[F.col(c).cast("string")
                                          for c in key_cols])))
    out_schema = events.schema
    state_schema = T.StructType([T.StructField("seen", T.IntegerType())])
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)

    def dedup_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if ttl_ms and state.hasTimedOut:
            state.remove()
            return
        first_time = not state.exists
        if first_time:
            state.update((1,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        emitted = not first_time
        for pdf in pdfs:
            if not emitted and len(pdf):
                yield pdf.drop(columns=["_k"]).head(1)
                emitted = True
            # drain remaining batches either way

    return keyed.groupBy("_k").applyInPandasWithState(
        dedup_fn, out_schema, state_schema, "append", timeout)


def running_user_stats(events: DataFrame,
                       ttl_ms: int | None = None) -> DataFrame:
    """Per-user running (n_events, sum_value) emitted on every update —
    a keyed stateful aggregate."""
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ])
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)

    def stats_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if ttl_ms and state.hasTimedOut:
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        stats_fn, out_schema, state_schema, "update", timeout)


def zone_transitions_stream(events: DataFrame, zone,
                            entity_col: str = "user_id",
                            ts_col: str = "ts") -> DataFrame:
    """Streaming twin of events.zone_transitions: per-entity last-zone
    state, emit (entity, from_zone, to_zone) on change.  Events are
    assumed per-entity time-ordered within a microbatch (sort locally);
    cross-batch order is the state's job."""
    z = events.withColumn("_zone", zone)
    out_schema = T.StructType([
        T.StructField(entity_col, events.schema[entity_col].dataType),
        T.StructField("from_zone", T.LongType()),
        T.StructField("to_zone", T.LongType()),
    ])
    state_schema = T.StructType([T.StructField("last", T.LongType())])

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        last = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for zv in pdf["_zone"]:
                zv = int(zv)
                if last is not None and zv != last:
                    rows.append((key[0], last, zv))
                last = zv
        if last is not None:
            state.update((last,))
        if rows:
            yield pd.DataFrame(rows, columns=[entity_col, "from_zone",
                                              "to_zone"])

    return z.groupBy(entity_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
