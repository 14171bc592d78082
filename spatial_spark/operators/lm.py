"""Statistical language-model scoring for corpus quality filtering.

CCNet / RedPajama-style pipelines bucket documents by the perplexity of
a small language model trained on a trusted reference corpus (ccnet
paper: Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020) — low-perplexity docs read
like the reference, high-perplexity docs are noise/boilerplate/garble.
The reference engine (neo4j-contrib/spatial) has no LM axis; this is
part of the training-data-pipeline extension surface.

Spark-first shape
-----------------
The model is two count tables and a scalar:

  * ``c2(w1, w2)`` — bigram occurrences in the reference corpus
  * ``c1(w1)``     — bigram-prefix occurrences (sum of c2 over w2)
  * ``V``          — reference vocabulary size (distinct unigrams)

and the smoothed conditional is

  P(w2 | w1) = (c2 + alpha) / (c1 + alpha * V)

Training is two keyed aggregations with map-side combine; scoring is the
document bigram stream LEFT-joined against the count tables (keyed
equi-joins — AQE broadcasts them when the model is small, which is the
normal case: CCNet trains on a bounded trusted sample, not the crawl).
Nothing here collects to the driver; ``V`` rides a 1-row broadcast.

At 100 TB: pass a sampled/curated ``ref_df`` so the model stays
broadcast-size; the corpus-side token stream is map-only until the two
model joins, and the per-document aggregation combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_bigram_lm", "lm_score", "train_kn_lm", "kn_score",
           "perplexity_buckets"]

#: Additive smoothing mass for unseen bigrams.
DEFAULT_ALPHA = 0.5


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) stream: lowercase whitespace tokens, consecutive
    pairs.  slice/zip_with (never ``sequence``, whose descending-range
    behavior on 1-token docs would explode) keeps it whole-stage
    codegen; empty tokens from leading/trailing whitespace are dropped
    to match the oracle's ``list_filter``."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: F.length(t) > 0)
    return (df.select(F.col(id_col), toks.alias("t"))
            .select(id_col, F.explode(F.expr(
                "zip_with(slice(t, 1, greatest(size(t) - 1, 0)),"
                "         slice(t, 2, greatest(size(t) - 1, 0)),"
                "         (a, b) -> struct(a AS w1, b AS w2))")).alias("bg"))
            .select(id_col, "bg.w1", "bg.w2"))


def train_bigram_lm(ref_df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Count tables of a word-bigram LM over ``ref_df``.

    Returns ``(c2, c1, vocab)`` DataFrames: ``(w1, w2, c2)``,
    ``(w1, c1)`` and a 1-row ``(V)``.  Two shuffles on the gram keys
    (partial aggregation absorbs hot grams map-side) plus one global
    distinct-count for the vocabulary.
    """
    bi = _bigrams(ref_df, text_col, id_col)
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: F.length(t) > 0)
    vocab = (ref_df.select(F.explode(toks).alias("tok"))
             .agg(F.countDistinct("tok").alias("V")))
    return c2, c1, vocab


def lm_score(df: DataFrame, ref_df: DataFrame | None = None,
             text_col: str = "text", id_col: str = "doc_id",
             alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """Per-document average negative log-likelihood under a bigram LM
    trained on ``ref_df`` (default: the corpus itself — self-perplexity,
    the bootstrap mode when no trusted reference exists yet).

    Returns ``(id_col, n_bigrams, nll)`` for EVERY input row; documents
    with fewer than two tokens score ``n_bigrams = 0, nll = NULL``.
    ``nll`` is rounded to 6 decimals (cross-engine float discipline —
    ln()/avg() may differ by ulps between engines).  Low nll ≈ fluent
    under the reference model; a pipeline filters or buckets on it.
    """
    if ref_df is None:
        ref_df = df
    c2, c1, vocab = train_bigram_lm(ref_df, text_col, id_col)
    bi = _bigrams(df, text_col, id_col)
    scored = (bi
              .join(c2, ["w1", "w2"], "left")
              .join(c1, ["w1"], "left")
              .crossJoin(F.broadcast(vocab))
              .select(F.col(id_col), (
                  F.log((F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
                        / (F.coalesce(F.col("c1"), F.lit(0))
                           + F.lit(alpha) * F.col("V")))).alias("lp")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    F.round(-F.avg("lp"), 6).alias("nll")))
    return (df.select(id_col).join(per_doc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.col("nll")))


def train_kn_lm(ref_df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id"):
    """Count tables for an interpolated Kneser-Ney bigram LM — the
    smoothing that actually wins perplexity evaluations (Chen & Goodman
    1999): instead of adding uniform mass, unseen-bigram probability is
    carried by the CONTINUATION distribution (in how many distinct
    contexts does w2 appear), so "Francisco" (frequent but only after
    "San") stops stealing mass from genuinely versatile words.

    Returns ``(c2, ctx, cont, scalars)``:

      * ``c2``:      (w1, w2, c2) bigram counts
      * ``ctx``:     (w1, c1, n1p) — prefix count and distinct-successor
                     count N1+(w1, ·)
      * ``cont``:    (w2, n1p_r) — distinct-predecessor count N1+(·, w2)
      * ``scalars``: 1 row (B, V) — distinct bigram types and vocabulary

    Everything is two gram-keyed aggregations plus a 1-row global —
    the same broadcast-size model shape as train_bigram_lm."""
    bi = _bigrams(ref_df, text_col, id_col)
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx = c2.groupBy("w1").agg(F.sum("c2").alias("c1"),
                               F.count(F.lit(1)).alias("n1p"))
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_r"))
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: F.length(t) > 0)
    vocab = ref_df.select(F.explode(toks).alias("tok"))
    scalars = (c2.agg(F.count(F.lit(1)).alias("B"))
               .crossJoin(vocab.agg(F.countDistinct("tok").alias("V"))))
    return c2, ctx, cont, scalars


def kn_score(df: DataFrame, ref_df: DataFrame | None = None,
             text_col: str = "text", id_col: str = "doc_id",
             discount: float = 0.75) -> DataFrame:
    """Per-document perplexity under interpolated Kneser-Ney
    (bigram, fixed discount D):

        P(w2|w1) = max(c2 - D, 0)/c1 + D * N1+(w1,·)/c1 * P_cont(w2)
        P_cont(w2) = (N1+(·,w2) + 1) / (B + V + 1)

    P_cont is add-one smoothed over distinct-bigram types so an OOV
    ``w2`` keeps nonzero mass (deterministic, oracle-replayable floor —
    no tuning knob beyond D); an unseen ``w1`` backs off to P_cont
    alone.  Returns ``(id_col, n_bigrams, nll)``, nll = average
    negative log-likelihood rounded to 6 (exp(nll) = perplexity).

    Scale: model joins are keyed on w1 / w2 and broadcast-size in the
    CCNet regime; the corpus side is one map-only bigram explode and a
    map-side-combined per-doc aggregation."""
    if ref_df is None:
        ref_df = df
    c2, ctx, cont, scalars = train_kn_lm(ref_df, text_col, id_col)
    bi = _bigrams(df, text_col, id_col)
    d = F.lit(float(discount))
    p_cont = ((F.coalesce(F.col("n1p_r"), F.lit(0)) + F.lit(1))
              / (F.col("B") + F.col("V") + F.lit(1)))
    seen = F.col("c1").isNotNull()
    p = F.when(
        seen,
        F.greatest(F.coalesce(F.col("c2"), F.lit(0)) - d, F.lit(0.0))
        / F.col("c1")
        + d * F.col("n1p") / F.col("c1") * p_cont
    ).otherwise(p_cont)
    scored = (bi
              .join(c2, ["w1", "w2"], "left")
              .join(ctx, ["w1"], "left")
              .join(cont, ["w2"], "left")
              .crossJoin(F.broadcast(scalars))
              .select(F.col(id_col), F.log(p).alias("lp")))
    per_doc = (scored.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    F.round(-F.avg("lp"), 6).alias("nll")))
    return (df.select(id_col).join(per_doc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.col("nll")))


def perplexity_buckets(df: DataFrame, ref_df: DataFrame | None = None,
                       n_buckets: int = 3, by: str = "lang",
                       text_col: str = "text", id_col: str = "doc_id",
                       smoothing: str = "kn") -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by LM
    perplexity RANK within their language — bucket 1 = most fluent
    (head), ``n_buckets`` = tail.  CCNet keeps head+middle for
    pretraining and drops or down-weights the tail.

    Rank-based (ntile over (nll, id) per group), NOT threshold-based:
    equal-population buckets are what the paper does, and rank math is
    engine-exact where float percentile cuts are not.  Documents with
    no bigrams (n_bigrams = 0) carry a NULL bucket — callers decide.

    Scale: the scoring pass is the kn_score/lm_score shape; the ntile
    window partitions by language (per-key cardinality = one
    language's docs; shard further by hash prefix if one language is
    the whole corpus).  Returns (id, by, n_bigrams, nll, bucket)."""
    from pyspark.sql import Window

    scorer = kn_score if smoothing == "kn" else lm_score
    if smoothing not in ("kn", "additive"):
        raise ValueError(f"unknown smoothing {smoothing!r}")
    scored = scorer(df, ref_df, text_col=text_col, id_col=id_col)
    # cache the scored per-doc rows (narrow: id, by, n_bigrams, nll):
    # the ranked subframe and the final left join BOTH read this frame,
    # and its lineage is the whole bigram scoring pass, which otherwise
    # runs twice (r15, guide §5 — same fix as minhash's cached
    # signatures)
    joined = df.select(id_col, by).join(scored, id_col).cache()
    # rank ONLY scored rows: a NULL-nll row must not occupy an ntile
    # slot and shift every real document's bucket
    w = Window.partitionBy(by).orderBy(F.col("nll").asc(),
                                       F.col(id_col).asc())
    ranked = (joined.filter(F.col("nll").isNotNull())
              .withColumn("bucket", F.ntile(n_buckets).over(w))
              .select(id_col, "bucket"))
    return (joined.join(ranked, id_col, "left")
            .select(id_col, by, "n_bigrams", "nll", "bucket"))
