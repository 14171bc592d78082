"""Batch text retrieval: inverted-index build + multi-query BM25 top-k.

The single-query scorer (text.bm25_score) re-derives corpus statistics
per call; a retrieval workload runs MANY queries against ONE corpus, so
the index — posting lists + document lengths + corpus scalars — is built
once (three keyed aggregations over the corpus) and every query batch
after that touches only the postings of its own terms.

Scale shape (the part that matters at 100 TB):
  * postings are keyed by term — the query⋈postings join is a broadcast
    hash join when the query set is small (the common case: thousands of
    queries vs billions of postings) and a term-keyed shuffle join
    otherwise; either way the corpus is never re-tokenized.
  * per-(query, doc) score aggregation shuffles only MATCHING postings
    (sum over the query's terms), never the corpus.
  * the top-k window partitions by query — bounded per-key cardinality
    = docs sharing ≥1 term with that query; a stopword-free query keeps
    this far from the corpus size, and `min_idf` lets callers drop
    flood terms explicitly (logged contract, no silent cap).
  * persisting the index is just writing three DataFrames to parquet
    partitioned/bucketed by term — nothing here is driver-side.

No reference parity: neo4j-contrib/spatial has no text retrieval; this
belongs to the driver-mandated LLM-data-pipeline axis (mining a corpus
for topical subsets, eval-set retrieval, contamination triage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Lowercased whitespace tokens, one row per occurrence."""
    return (df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        .alias("term"))
        .filter(F.length("term") > 0))


def build_inverted_index(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id"):
    """Build the retrieval index over a corpus: returns
    ``(postings, doclen, stats)`` DataFrames —

    * ``postings``: (term, doc_id, tf) — the posting lists,
    * ``doclen``:   (doc_id, dl) — document token lengths,
    * ``stats``:    1 row (n_docs, avgdl) — corpus scalars.

    One explode + three keyed aggregations (map-side combined); the two
    corpus scalars ride a 1-row aggregate that joins in as a broadcast.
    All three persist naturally to parquet (partition postings by a
    term-hash bucket for co-located query joins)."""
    toks = _tokens(df, id_col, text_col)
    postings = (toks.groupBy("term", id_col)
                .agg(F.count(F.lit(1)).alias("tf")))
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(F.count(F.lit(1)).alias("n_docs"),
                       F.avg("dl").alias("avgdl"))
    return postings, doclen, stats


def bm25_retrieve(corpus_or_index, queries: DataFrame, k: int = 10,
                  text_col: str = "text", id_col: str = "doc_id",
                  query_id_col: str = "query_id",
                  query_text_col: str = "query_text",
                  k1: float = 1.2, b: float = 0.75,
                  min_idf: float = 0.0) -> DataFrame:
    """Top-``k`` BM25 documents for EVERY query in ``queries``.

    ``corpus_or_index`` is either the corpus DataFrame (index built
    inline) or the ``(postings, doclen, stats)`` triple from
    build_inverted_index (the reuse path).  Query text is tokenized with
    the same rule as the corpus; duplicate terms in one query weight the
    score once per occurrence (standard bag-of-words BM25).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); terms with idf < ``min_idf``
    are dropped before the join (stopword-flood control — the per-query
    candidate set is otherwise unbounded by construction).

    Returns (query_id, doc_id, bm25, rank), rank 1..k per query, ties
    broken by doc_id ascending — engine-deterministic."""
    from pyspark.sql import Window

    if isinstance(corpus_or_index, DataFrame):
        postings, doclen, stats = build_inverted_index(
            corpus_or_index, text_col, id_col)
    else:
        postings, doclen, stats = corpus_or_index

    # document frequency per term, derived from the postings themselves
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = (_tokens(queries, query_id_col, query_text_col)
              .groupBy(query_id_col, "term")
              .agg(F.count(F.lit(1)).alias("qtf")))

    idf = (dfreq.crossJoin(F.broadcast(stats))
           .withColumn("idf", F.log(
               F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
               / (F.col("df") + 0.5)))
           .filter(F.col("idf") >= F.lit(float(min_idf)))
           .select("term", "idf", "avgdl"))

    # query terms ⋈ postings on term: the queries side is the small one —
    # broadcast it so the posting lists never shuffle
    contrib = (F.broadcast(qterms).join(postings, "term")
               .join(idf, "term")
               .join(doclen, id_col)
               .withColumn("c", F.col("qtf") * F.col("idf") * F.col("tf")
                           * (k1 + 1)
                           / (F.col("tf") + k1 * (1 - b + b * F.col("dl")
                                                  / F.col("avgdl")))))
    scored = (contrib.groupBy(query_id_col, id_col)
              .agg(F.sum("c").alias("bm25")))
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("bm25").desc(), F.col(id_col).asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, id_col, "bm25", "rank"))


def boolean_retrieve(corpus_or_index, queries: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     query_id_col: str = "query_id",
                     query_text_col: str = "query_text") -> DataFrame:
    """Conjunctive (AND-semantics) boolean retrieval: documents
    containing EVERY distinct term of the query.

    Posting-list intersection as relational algebra: join query terms to
    postings, count distinct matched terms per (query, doc), keep rows
    where the count equals the query's distinct-term count.  Returns
    (query_id, doc_id)."""
    if isinstance(corpus_or_index, DataFrame):
        postings, _, _ = build_inverted_index(corpus_or_index,
                                              text_col, id_col)
    else:
        postings = corpus_or_index[0]
    qterms = (_tokens(queries, query_id_col, query_text_col)
              .select(query_id_col, "term").distinct())
    qsize = qterms.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("n_terms"))
    hits = (F.broadcast(qterms).join(postings, "term")
            .groupBy(query_id_col, F.col(id_col))
            .agg(F.count(F.lit(1)).alias("n_hit")))
    return (hits.join(F.broadcast(qsize), query_id_col)
            .filter(F.col("n_hit") == F.col("n_terms"))
            .select(query_id_col, id_col))
