"""Content-defined chunking (CDC) + chunk-level dedup.

Fixed-size chunking breaks dedup the moment one byte is inserted — every
later chunk shifts.  Content-defined chunking cuts wherever a rolling
fingerprint of the LOCAL content hits a pattern, so an edit only
perturbs the chunks that overlap it and identical regions of two
documents chunk identically regardless of offset.  This is the storage
/ crawl-dedup workhorse (LBFS, rsync, FastCDC) applied to a training
corpus: shared-chunk statistics find page templates, mirrored articles
and syndicated wire copy that document-level hashing misses.

Chunking rule (basic Rabin/LBFS CDC, no min/max bound): position ``i``
(1-based, ``i >= k``) ends a chunk iff

    H(text[i-k+1 .. i]) % divisor == 0

with H a k-gram hash.  Expected chunk length = ``divisor`` characters.
Boundaries depend ONLY on the k characters behind them — no sequential
dependence on earlier cuts — which is exactly what makes the operator
embarrassingly parallel AND oracle-expressible in SQL.  (FastCDC's
min/max-length bounds re-introduce a left-to-right dependence; they cut
metadata overhead, not recall, and a bounded variant belongs in a
mapInPandas kernel if ever needed — documented, not silently skipped.)

H = the first 8 hex nibbles of md5 as an integer (u32): md5 exists
byte-identically in Spark and DuckDB, so the oracle replays the exact
boundary set (same pattern as the sampling/HLL operators' md5 buckets).

Scale shape: the position explode is map-only and STREAMING — offsets
explode first and the gram hash is computed post-explode in the same
codegen stage as the boundary filter, so no per-document array of
positions or grams is ever materialized (safe for multi-MB documents).
The window shuffle carries only (doc_id, cut) rows — per-key
cardinality bounded by doc_length / divisor — and the document text
rejoins once per chunk for the chunk_md5 projection.  Chunk-hash
aggregation is one keyed agg over (chunk_md5).  Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_hash_u32(gram) -> F.Column:
    """First 8 md5 nibbles as an exact integer in [0, 2^32)."""
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")


def cdc_chunks(df: DataFrame, k: int = 8, divisor: int = 64,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content-defined chunks of every document.

    Returns (id_col, chunk_no, start, chunk_len, chunk_md5) — chunk_no
    1-based in document order, ``start`` the 1-based character offset.
    Documents shorter than ``k`` yield one whole-document chunk; the
    final chunk always ends at the document end."""
    from pyspark.sql import Window

    text = F.trim(F.col(text_col))
    base = df.select(F.col(id_col), text.alias("_t"),
                     F.length(text).alias("_len"))

    # Candidate cut positions: explode offsets FIRST and compute the
    # gram hash post-explode, inside the same codegen stage as the
    # filter — no per-row array of positions or grams is ever
    # materialized (a transform-then-explode would hold an O(len) array
    # per document row, an executor-OOM / 2^31-element risk on multi-MB
    # documents).  Only the tiny (id, cut) rows survive into the window
    # shuffle; the document text rejoins ONCE PER CHUNK afterwards —
    # the old shape carried the full text on every boundary row, i.e.
    # O(len²/divisor) bytes per document through the shuffle.
    interior = (base
                .select(id_col, "_t", "_len",
                        F.explode(F.sequence(
                            F.lit(k), F.greatest("_len", F.lit(k))))
                        .alias("i"))
                .filter((F.col("i") < F.col("_len"))
                        & (_gram_hash_u32(
                            F.expr(f"substring(_t, i - {k} + 1, {k})"))
                           % divisor == 0))
                .select(id_col, F.col("i").alias("cut")))
    # sentinel cut at len closes the last chunk (interior excludes
    # i == len, so the union is exactly the distinct cut set)
    sentinel = base.select(id_col, F.col("_len").alias("cut"))
    cuts = interior.unionByName(sentinel)

    w = Window.partitionBy(id_col).orderBy("cut")
    bounds = (cuts
              .withColumn("chunk_no",
                          F.row_number().over(w))
              .withColumn("start",
                          F.coalesce(F.lag("cut").over(w) + 1, F.lit(1)))
              .withColumn("chunk_len", F.col("cut") - F.col("start") + 1))
    chunks = (bounds
              .join(base.select(id_col, "_t"), id_col)
              .withColumn("chunk_md5",
                          F.md5(F.expr("substring(_t, start, chunk_len)"))))
    return chunks.select(id_col, "chunk_no", "start", "chunk_len",
                         "chunk_md5")


def cdc_shared_chunks(df: DataFrame, k: int = 8, divisor: int = 64,
                      min_docs: int = 2, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Chunks shared across documents: (chunk_md5, chunk_len, n_docs,
    n_occurrences) for every chunk appearing in ≥ ``min_docs`` distinct
    documents.  One keyed aggregation over the chunk table — the
    cross-document template/boilerplate detector."""
    ch = cdc_chunks(df, k=k, divisor=divisor,
                    text_col=text_col, id_col=id_col)
    return (ch.groupBy("chunk_md5")
            .agg(F.max("chunk_len").alias("chunk_len"),
                 F.countDistinct(id_col).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_docs") >= min_docs))


def cdc_dedup_ratio(df: DataFrame, k: int = 8, divisor: int = 64,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Corpus-level chunk-dedup summary (1 row): total chunk bytes,
    bytes after chunk-store dedup (each distinct chunk kept once), and
    the dedup ratio — the storage-planner's number."""
    ch = cdc_chunks(df, k=k, divisor=divisor,
                    text_col=text_col, id_col=id_col)
    per = ch.groupBy("chunk_md5").agg(
        F.max("chunk_len").alias("chunk_len"),
        F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.sum(F.col("chunk_len") * F.col("n")).alias("total_chars"),
        F.sum("chunk_len").alias("unique_chars"),
        F.round(F.sum(F.col("chunk_len") * F.col("n"))
                / F.sum("chunk_len"), 6).alias("dedup_ratio"))
