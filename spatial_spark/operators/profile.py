"""Corpus profiling — the summary a data pipeline runs before and after
every transformation (per-source/per-shard document counts, size and
token distributions, language spread), i.e. the "did this filter eat my
corpus" dashboard feed.

Spark-first shape: one keyed aggregation.  Counts/sums/avg combine
map-side; the length percentiles use Spark's EXACT ``percentile``
aggregate by default — correct and oracle-checkable, but it buffers the
group's values, so it is the right choice exactly when the group key is
low-cardinality (sources, shards, languages — the profiling case).  For
a high-cardinality ``by`` or when estimates suffice at 100 TB, pass
``approx=True`` to switch to ``percentile_approx`` (t-digest sketch,
fixed memory, fully map-side combinable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count_ws

__all__ = ["corpus_stats"]


def corpus_stats(df: DataFrame, by: str = "source",
                 text_col: str = "text", lang_col: str | None = "lang",
                 approx: bool = False) -> DataFrame:
    """Per-``by`` corpus profile: doc count, char/token totals, mean and
    p50/p95 char length, distinct languages.

    Returns ``(by, n_docs, total_chars, total_tokens, avg_chars,
    p50_chars, p95_chars[, n_langs])`` — floats rounded to 4 decimals
    (cross-engine float discipline)."""
    length = F.length(F.col(text_col))
    pct = "percentile_approx" if approx else "percentile"
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(length).alias("total_chars"),
        F.sum(token_count_ws(text_col)).cast("long").alias("total_tokens"),
        F.round(F.avg(length), 4).alias("avg_chars"),
        F.round(F.expr(f"{pct}(length({text_col}), 0.5D)")
                .cast("double"), 4).alias("p50_chars"),
        F.round(F.expr(f"{pct}(length({text_col}), 0.95D)")
                .cast("double"), 4).alias("p95_chars"),
    ]
    if lang_col is not None:
        aggs.append(F.countDistinct(lang_col).alias("n_langs"))
    return df.groupBy(by).agg(*aggs)
