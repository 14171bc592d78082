"""Streaming ingest into a spatial layer.

The reference ingests via procedure calls (spatial.addNode / addWKT —
SpatialProcedures.java add* family) one transaction at a time; the
Spark-first equivalent is a Structured Streaming sink: a stream of point
events (or WKT rows) lands in the layer's zkey-clustered parquet store
micro-batch by micro-batch, through the same `Layer.add` chokepoint as
batch writes — so encoding, SFC clustering, write-time stats and the
optional id-index sidecar all apply to streamed data unchanged.

foreachBatch is the right shape here (not a raw file sink): the layer
write is a *transformation* (encode + repartitionByRange + observe), and
foreachBatch gives exactly-once-per-epoch batch semantics with the
checkpoint tracking which source files/offsets are committed.  At scale
the source swaps to Kafka and nothing else changes.

Caveat (documented, inherent to SFC-clustered appends): each micro-batch
range-partitions independently, so long-running streams accrete
per-batch file sets; compact periodically (re-`add` with
mode="overwrite", or the Delta/Iceberg OPTIMIZE equivalent at 100 TB —
the same seam as Layer._rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_into_layer(stream_df: DataFrame, layer, checkpoint: str,
                      geom: str = "geom", wkt: str | None = None,
                      x: str | None = None, y: str | None = None,
                      available_now: bool = True):
    """Start a streaming write of ``stream_df`` into ``layer``.

    Column conventions mirror ``Layer.add`` (point x/y columns, WKT
    string column, or WKB ``geom``).  Returns the StreamingQuery; pass
    ``available_now=False`` for a continuous micro-batch stream.
    """
    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        layer.add(batch_df, geom=geom, wkt=wkt, x=x, y=y, mode="append")

    writer = (stream_df.writeStream
              .foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
