"""Streaming stay-point detection — the stateful twin of
operators/trajectory.stay_points: per-user run state folds micro-batch
by micro-batch, and a stay is EMITTED the moment it CLOSES (the ping
stream moved to another cell or went silent past the gap) — the live
"user just left a dwell" feed the batch operator can only reconstruct
later.

State per user is one open run: (hex_q, hex_r, n, sum_x, sum_y,
arrive_s, depart_s) — bounded regardless of ping volume.  Hex
assignment happens BEFORE the stateful group (the same pure-Column
cube-rounding math as the batch path), so batch and stream agree
cell-for-cell.  Ordering contract: pings sort by timestamp within each
micro-batch; a ping arriving in a later batch with an earlier timestamp
extends or splits forward, never rewinds (the batch operator over the
landed store is the exact reconciliation).  Still-open runs are not
emitted — they have not ended.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stay_points_stream"]


def stay_points_stream(pings: DataFrame, cell_size: float,
                       min_stay_s: int, max_gap_s: int,
                       user_col: str = "user_id", ts_col: str = "ts",
                       x_col: str = "lon", y_col: str = "lat") -> DataFrame:
    """Emit ``(user, hex_q, hex_r, n_pings, cx, cy, arrive_s, depart_s,
    dwell_s)`` whenever a qualifying stay CLOSES.  Works on streaming
    (append mode) and batch DataFrames alike."""
    from ..operators.tiles import with_hex

    hexed = with_hex(pings, cell_size, x_col, y_col).select(
        F.col(user_col).alias("user"),
        F.unix_timestamp(F.col(ts_col)).alias("s"),
        F.col(x_col).alias("x"), F.col(y_col).alias("y"),
        "hex_q", "hex_r")

    state_schema = T.StructType([
        T.StructField("hq", T.LongType()), T.StructField("hr", T.LongType()),
        T.StructField("n", T.LongType()), T.StructField("sx", T.DoubleType()),
        T.StructField("sy", T.DoubleType()),
        T.StructField("arr", T.LongType()), T.StructField("dep", T.LongType()),
    ])
    out_schema = T.StructType([
        T.StructField("user", T.LongType()),
        T.StructField("hex_q", T.LongType()),
        T.StructField("hex_r", T.LongType()),
        T.StructField("n_pings", T.LongType()),
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
        T.StructField("arrive_s", T.LongType()),
        T.StructField("depart_s", T.LongType()),
        T.StructField("dwell_s", T.LongType()),
    ])

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        run = list(state.get) if state.exists else None
        out = []

        def close(nxt=None):
            nonlocal run
            if run is not None:
                hq, hr, n, sx, sy, arr, dep = run
                if dep - arr >= min_stay_s:
                    out.append((key[0], hq, hr, n, round(sx / n, 6),
                                round(sy / n, 6), arr, dep, dep - arr))
            run = nxt

        evs = []
        for pdf in pdfs:
            evs.extend(zip(pdf["s"], pdf["x"], pdf["y"],
                           pdf["hex_q"], pdf["hex_r"]))
        for s, x, y, hq, hr in sorted(evs):
            s, hq, hr = int(s), int(hq), int(hr)
            if run is not None and run[0] == hq and run[1] == hr \
                    and s - run[6] <= max_gap_s:
                run[2] += 1
                run[3] += float(x)
                run[4] += float(y)
                run[6] = max(run[6], s)
            else:
                close([hq, hr, 1, float(x), float(y), s, s])
        if run is not None:
            state.update(tuple(run))
        yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return hexed.groupBy("user").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
