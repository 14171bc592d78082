"""DSIR-style importance weighting for data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
scores every raw-corpus document by how much its hashed n-gram profile
looks like a small trusted TARGET corpus versus the raw corpus itself:

    w(doc) = mean over tokens of  log( p_target(b) / p_raw(b) )

where ``b`` is the token's hash bucket.  High-weight documents are
up-sampled into the training mix (compose with the deterministic
md5-bucket sampler in operators/sample.py).

Spark-first shape: hashing tokens into ``n_buckets`` FIXED buckets is
what makes this scale — both probability tables have at most
``n_buckets`` rows no matter how large the corpora, so the scoring joins
are ALWAYS broadcast; the only shuffles are the two bucket-count
aggregations (map-side combine) and the per-document average.  The
bucket hash is the repo's cross-engine idiom: integer value of the
md5 hex prefix (exact in both engines — no float, no platform hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dsir_weights"]

DEFAULT_ALPHA = 0.5


def _token_buckets(df: DataFrame, text_col: str, id_col: str,
                   n_buckets: int) -> DataFrame:
    """(id, bucket) stream: lowercase whitespace tokens hashed to
    ``md5-hex-prefix mod n_buckets`` (24 hash bits — plenty for any
    practical bucket count, exact integer parity with the SQL oracle)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: F.length(t) > 0)
    return (df.select(F.col(id_col), F.explode(toks).alias("tok"))
            .select(id_col,
                    (F.conv(F.substring(F.md5("tok"), 1, 6), 16, 10)
                     .cast("long") % n_buckets).alias("bucket")))


def dsir_weights(df: DataFrame, target_df: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 8192,
                 alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """Per-document DSIR log importance weight of ``df`` (the raw
    corpus) toward ``target_df`` (the trusted target sample).

    Both unigram-bucket distributions are add-``alpha`` smoothed:
    ``p(b) = (c(b) + alpha) / (N + alpha * n_buckets)``.  Returns
    ``(id_col, n_tokens, weight)`` for every input row — ``weight`` is
    the mean log-ratio rounded to 6 decimals, NULL for token-less docs.
    """
    # The raw bucket stream sits under THREE differently-keyed
    # consumers (bucket counts, the global count, the per-doc scored
    # join) — AQE's ReuseExchange cannot dedup them, so the
    # tokenize+explode ran three times.  Cache the PROXY, not the
    # text: two longs per token (~16 B), the compact-column shape the
    # lm-family string-bigram cache (measured a wash) is not.
    tgt = _token_buckets(target_df, text_col, id_col, n_buckets).cache()
    raw = _token_buckets(df, text_col, id_col, n_buckets).cache()
    ct = tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    cr = raw.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    nt = tgt.agg(F.count(F.lit(1)).alias("nt"))
    nr = raw.agg(F.count(F.lit(1)).alias("nr"))
    denom = F.lit(alpha) * F.lit(float(n_buckets))
    scored = (raw
              .join(F.broadcast(ct), "bucket", "left")
              .join(F.broadcast(cr), "bucket", "left")
              .crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nr))
              .select(F.col(id_col), (
                  F.log((F.coalesce("ct", F.lit(0)) + F.lit(alpha))
                        / (F.col("nt") + denom))
                  - F.log((F.coalesce("cr", F.lit(0)) + F.lit(alpha))
                          / (F.col("nr") + denom))).alias("lr")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_tokens"),
                    F.round(F.avg("lr"), 6).alias("weight")))
    return (df.select(id_col).join(per_doc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.col("weight")))
