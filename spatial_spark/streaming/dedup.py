"""Streaming exact deduplication — the online twin of
operators/dedup.exact_dedup for ingest-time pipelines (a crawler feed
repeats documents across fetches; dedup BEFORE landing keeps the layer
store and every downstream batch pass smaller).

Spark-first shape: ``dropDuplicatesWithinWatermark`` keyed on a content
fingerprint.  The state store holds ONE row per distinct fingerprint
seen inside the watermark horizon — the md5 (16 bytes) plus the event
time, never the document payload, so state size is bounded by
(distinct-docs-per-horizon x ~40 bytes) regardless of document size.
Late duplicates beyond the horizon are NOT caught (that is the
documented trade of every watermarked streaming op); run the batch
``exact_dedup`` over the landed store on a compaction cadence to catch
stragglers — same fingerprint definition, so the two passes agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dedup_stream"]


def dedup_stream(stream_df: DataFrame, text_col: str = "text",
                 ts_col: str = "ts", delay: str = "10 minutes",
                 fingerprint_col: str | None = None) -> DataFrame:
    """Drop all-but-first occurrences of each document (by md5 of
    ``text_col``, or a precomputed ``fingerprint_col``) across
    micro-batches, with duplicate state expiring ``delay`` behind the
    event-time watermark.

    Returns a streaming DataFrame with the input columns (the helper
    fingerprint column is dropped again); attach any sink —
    ``stream_into_layer`` composes directly.
    """
    if fingerprint_col is None:
        out = stream_df.withColumn("_fp", F.md5(F.col(text_col)))
        key, added = "_fp", True
    else:
        out, key, added = stream_df, fingerprint_col, False
    out = (out.withWatermark(ts_col, delay)
           .dropDuplicatesWithinWatermark([key]))
    return out.drop("_fp") if added else out
