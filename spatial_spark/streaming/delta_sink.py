"""Streaming Delta Lake sink with the spec's own exactly-once
primitive (r14 — the streaming leg of io/delta.py).

Structured Streaming's foreachBatch is at-least-once across restarts;
the Delta protocol closes the gap with the ``txn`` action: a sink
records ``{appId, version=batch_id}`` in the SAME atomic commit as its
adds, and a replayed batch (restart from checkpoint, or a re-run of an
availableNow stream against the same source) finds its version already
covered by the table's replayed txn state and skips — the idempotence
contract delta-spark's streaming sink implements, here via
``export_delta(txn=...)``.

Contrast with streaming/ingest.py's layer sink, which needs a
SIDE-CHANNEL epoch marker log because parquet directories have no
transaction log; a Delta table carries the marker inside the commit.
"""
from __future__ import annotations

from ..io.delta import export_delta

__all__ = ["delta_stream_sink"]


def delta_stream_sink(stream_df, path: str, checkpoint: str,
                      app_id: str, name: str | None = None,
                      partition_by: list | None = None,
                      available_now: bool = True):
    """Start an exactly-once streaming append into the Delta table at
    ``path``.  ``app_id`` keys the txn state — one logical stream per
    appId; a second stream into the same table needs its own.  Returns
    the StreamingQuery."""

    def write_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        export_delta(batch_df, path, mode="append", name=name,
                     partition_by=partition_by,
                     txn=(app_id, batch_id))

    writer = (stream_df.writeStream
              .foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
