"""Streaming ingest into a spatial layer.

The reference ingests via procedure calls (spatial.addNode / addWKT —
SpatialProcedures.java add* family) one transaction at a time; the
Spark-first equivalent is a Structured Streaming sink: a stream of point
events (or WKT rows) lands in the layer's zkey-clustered parquet store
micro-batch by micro-batch, through the same `Layer.add` chokepoint as
batch writes — so encoding, SFC clustering, write-time stats and the
optional id-index sidecar all apply to streamed data unchanged.

foreachBatch is the right shape here (not a raw file sink): the layer
write is a *transformation* (encode + repartitionByRange + observe).
foreachBatch is AT-LEAST-ONCE, not exactly-once (ADVICE r5): the stream
checkpoint tracks which source offsets are committed, but if the driver
dies after Layer.add's non-transactional parquet append and before the
epoch commits, the restarted query replays the epoch.  We make the
replay idempotent with a layer-side epoch log (one marker file per
committed epoch, keyed by checkpoint identity + epoch_id, written AFTER
the append): a replayed epoch whose marker exists is skipped.  The
residual window — append done, marker not yet written — is a crash
inside two local filesystem ops; on a transactional table format
(Delta/Iceberg) the epoch id rides the commit itself and the window
disappears.  At scale the source swaps to Kafka and nothing else
changes.

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
    import hashlib

    spark = stream_df.sparkSession

    # layer-side epoch log: markers live next to the layer store, keyed by
    # the checkpoint identity so two independent streams into one layer
    # cannot collide on epoch numbering.  The key is the HADOOP-QUALIFIED
    # checkpoint URI (scheme + authority + absolute path), not
    # os.path.abspath: a relative checkpoint restarted from a different
    # cwd, or an s3a://-style checkpoint, still resolves to the same key,
    # and all marker I/O goes through the Hadoop FileSystem API so remote
    # layer stores keep idempotency too (r6 advice).
    def _fs_path(path_str: str):
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = p.getFileSystem(conf)
        return fs, fs.makeQualified(p)

    ckpt_fs, ckpt_qualified = _fs_path(checkpoint)
    log_dir = (layer.path + "_epochs/"
               + hashlib.md5(str(ckpt_qualified).encode()).hexdigest()[:12])

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        fs, marker = _fs_path(log_dir + f"/epoch-{epoch_id}")
        if fs.exists(marker):
            return  # replayed epoch (at-least-once restart): already appended
        if batch_df.isEmpty():
            return
        layer.add(batch_df, geom=geom, wkt=wkt, x=x, y=y, mode="append")
        out = fs.create(marker, True)
        out.write(bytearray(b"committed"))
        out.close()

    writer = (stream_df.writeStream
              .foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
