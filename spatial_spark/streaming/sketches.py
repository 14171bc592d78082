"""Streaming cross-batch dedup via an accreting Bloom seen-set.

`streaming/dedup.py` dedups within a WATERMARK horizon — state is
exact but bounded by time.  This module is the complement for
unbounded horizons: a Bloom filter of every key ever admitted, carried
across micro-batches as a tiny parquet bitmap (operators/sketch.py),
so state is bounded by the FILTER size (m_bits/8 bytes, forever)
instead of the stream's lifetime.  The trade is the Bloom contract:
nothing previously admitted is ever re-admitted (no false negatives);
~fpr of genuinely-new rows are wrongly dropped.

Per micro-batch (foreachBatch):
  1. in-batch exact dedup on the key (the bloom can only see PRIOR
     batches),
  2. filter against the current bloom (definitely-new survivors),
  3. append survivors to the output store,
  4. fold the survivors' positions into the bloom (union + bit_or —
     sketches are DataFrames, so accretion is the same aggregation as
     construction) and publish it with write-temp + atomic rename.

Replay safety mirrors streaming/ingest.py: an epoch-marker log keyed
by the Hadoop-qualified checkpoint URI makes at-least-once replays
idempotent — a replayed epoch whose marker exists skips entirely.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_with_bloom(stream_df: DataFrame, out_path: str,
                            bloom_path: str, checkpoint: str,
                            key_col: str = "text", id_col: str = "doc_id",
                            m_bits: int = 1 << 20, k: int = 5,
                            available_now: bool = True):
    """Start the bloom-dedup stream; returns the StreamingQuery.

    ``out_path`` accretes the admitted rows (parquet appends);
    ``bloom_path`` holds the current bitmap (atomically swapped each
    batch).  Determinism: positions are md5 arithmetic, so which rows
    are admitted is exactly reproducible — pinned against a Python
    replay in tests."""
    import hashlib

    from ..operators.sketch import bloom_filter_new, build_bloom

    spark = stream_df.sparkSession
    # marker key = the HADOOP-QUALIFIED checkpoint URI (same rationale
    # as streaming/ingest.py: a relative path restarted from another
    # cwd must not change the key).  The marker writes and the bloom
    # swap below are local-fs ops — on a remote store, route them
    # through spatial_spark.manifest (the commit seam) instead.
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        jp = jvm.org.apache.hadoop.fs.Path(checkpoint)
        ckpt_id = str(jp.getFileSystem(conf).makeQualified(jp))
    except Exception:
        ckpt_id = os.path.abspath(checkpoint)
    ckpt_key = hashlib.md5(ckpt_id.encode()).hexdigest()[:12]
    log_dir = bloom_path + "_epochs/" + ckpt_key

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(log_dir, f"epoch-{epoch_id}")
        if os.path.exists(marker):
            return  # replayed epoch: already admitted + folded
        if batch_df.isEmpty():
            return
        # 1. in-batch exact dedup (min id per key — deterministic)
        w_keys = (batch_df.groupBy(key_col)
                  .agg(F.min(id_col).alias(id_col)))
        batch = batch_df.join(w_keys, [key_col, id_col], "left_semi")
        # 2. filter against the prior bloom
        have_bloom = os.path.exists(bloom_path)
        if have_bloom:
            bloom = spark.read.parquet(bloom_path)
            new = bloom_filter_new(batch, bloom, key_col=key_col,
                                   id_col=id_col, m_bits=m_bits, k=k)
        else:
            new = batch
        new = new.persist()
        try:
            # 3. admit survivors
            new.write.mode("append").parquet(out_path)
            # 4. fold their positions into the bloom and publish
            delta = build_bloom(new, key_col=key_col, m_bits=m_bits, k=k)
            if have_bloom:
                delta = (spark.read.parquet(bloom_path)
                         .unionByName(delta)
                         .groupBy("word").agg(F.expr("bit_or(bits)")
                                              .alias("bits")))
            tmp = bloom_path + ".tmp"
            delta.coalesce(1).write.mode("overwrite").parquet(tmp)
            old = bloom_path + ".old"
            if os.path.exists(bloom_path):
                shutil.rmtree(old, ignore_errors=True)
                os.rename(bloom_path, old)
            os.rename(tmp, bloom_path)
            shutil.rmtree(old, ignore_errors=True)
        finally:
            new.unpersist()
        os.makedirs(log_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("committed")

    writer = (stream_df.writeStream
              .foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
