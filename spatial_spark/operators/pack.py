"""Sequence packing — the concat-then-chunk step of a training-data
pipeline (GPT-style pretraining batches: documents are concatenated into
one token stream per shard and cut into fixed ``seq_len`` windows).

This operator assigns each document its position in that stream — which
pack (context window) it starts in and at what offset — WITHOUT
materializing the stream: a prefix sum of token counts is enough, and
Spark's window aggregation computes it with one shuffle + sort per
stream.

Scale shape: packing is inherently sequential *per stream*, so the
parallel unit is the stream key (``by`` — shard / language / source
bucket).  A single global stream (``by=None``) forces a one-partition
window sort and is only for small inputs; at 100 TB always pack per
shard, which is also what trainers do (each data-parallel rank reads its
own shard's stream).

Reference scope note: the reference engine has no packing operator; this
belongs to the pipeline-operator axis (SURVEY §2 extension), alongside
dedup/sampling/quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count_ws


def pack_sequences(df: DataFrame, seq_len: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   by: str | None = None,
                   token_col: str | None = None) -> DataFrame:
    """Per-document packing positions for fixed-size context windows.

    Documents are ordered by ``id_col`` within each ``by`` stream (a
    deterministic, engine-independent order — no RNG, reproducible like
    operators/sample.py) and laid head-to-tail; ``pack_id`` is the
    window index ``floor(tokens_before / seq_len)`` the document STARTS
    in, ``pack_offset`` its offset inside that window.  Token counts
    come from ``token_col`` if given (pre-tokenized pipelines), else the
    whitespace count of ``text_col``.

    Returns ``(id_col, [by], n_tokens, pack_id, pack_offset)``.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n_tok = (F.col(token_col) if token_col
             else token_count_ws(text_col)).cast("long")
    d = df.withColumn("n_tokens", n_tok)
    w = (Window.partitionBy(by) if by else
         Window.partitionBy(F.lit(0))).orderBy(id_col)
    before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_before")
    cols = [id_col] + ([by] if by else []) + ["n_tokens"]
    return (d.select(*cols, before)
            .select(*cols,
                    F.floor(F.col("_before") / seq_len).alias("pack_id"),
                    (F.col("_before") % seq_len).alias("pack_offset")))


def pack_stats(packed: DataFrame, seq_len: int,
               by: str | None = None) -> DataFrame:
    """Stream-level packing summary: windows used, total tokens, and the
    fill fraction ``total_tokens / (n_packs * seq_len)`` — the padding
    waste a trainer would see.  Runs off pack_sequences' output (one
    partial aggregation; no re-scan of the text)."""
    keys = [by] if by else []
    # the stream is contiguous, so its length is just the token sum and
    # the window count is one ceil — no re-derivation from positions
    agg = (packed.groupBy(*keys)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
                F.ceil(F.sum("n_tokens") / F.lit(float(seq_len)))
                .alias("n_packs")))
    return agg.withColumn(
        "fill_frac",
        F.col("total_tokens") / (F.col("n_packs") * F.lit(float(seq_len))))


def chunk_documents(df: DataFrame, window: int, stride: int | None = None,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Sliding-window chunking: cut each document's token sequence into
    ``window``-token chunks starting every ``stride`` tokens (default:
    non-overlapping, ``stride = window``) — the per-document alternative
    to pack_sequences when examples must not cross document boundaries
    (long-context SFT samples, embedding inputs, retrieval passages).

    A chunk starts at every multiple of ``stride`` below the document's
    token count, so the tail chunk may be short; empty documents yield
    no chunks.  Returns ``(id_col, chunk_id, n_tokens, chunk)``.

    Scale shape: 100% whole-stage-codegen Columns (split → sequence of
    starts → explode → slice/array_join) — a map-only operator with no
    shuffle at all; output size is input x (window / stride) overlap
    factor, which the caller chooses.
    """
    if stride is None:
        stride = window
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: F.length(t) > 0)
    return (df.select(F.col(id_col), toks.alias("t"))
            .filter(F.size("t") > 0)
            .select(id_col, "t", F.explode(
                F.expr(f"sequence(0, size(t) - 1, {int(stride)})"))
                .alias("start"))
            .select(
                F.col(id_col),
                (F.col("start") / F.lit(int(stride)))
                .cast("long").alias("chunk_id"),
                F.least(F.size("t") - F.col("start"), F.lit(int(window)))
                .cast("long").alias("n_tokens"),
                F.array_join(F.expr(f"slice(t, start + 1, {int(window)})"),
                             " ").alias("chunk")))
