"""Deterministic sampling operators for training-data pipelines.

Random sampling with RNG state is irreproducible across retries, engines
and partitionings — a real problem when a 100 TB corpus is sampled in
stages and a stage re-runs.  These operators key every decision off a
content hash (md5 of a caller-chosen key column), so:

* the same row always gets the same verdict (idempotent re-runs,
  stable A/B splits);
* the sample composes with partitioning/ordering changes — no
  per-partition RNG seeds, no `rand()` in the plan;
* any engine that computes md5 reproduces the exact sample (the
  correctness oracle replicates it in DuckDB SQL verbatim).

The decision rule: keep a row iff the first 4 hex chars of
``md5(key)`` — a uniform 16-bit bucket — are lexicographically below
the stratum's threshold (``rate * 65536`` rendered as 4-digit hex).
String comparison on fixed-width lowercase hex is identical to integer
comparison and avoids engine-specific hex→int conversions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(rate: float) -> str:
    """rate ∈ [0,1] → 4-digit lowercase hex threshold over 16-bit buckets.
    rate 1.0 needs a value above every bucket: 'g' sorts after 'f' in any
    lexicographic compare, so it keeps all 65536 buckets (a 5-digit
    '10000' would compare char-by-char and break)."""
    n = max(0, min(65536, int(round(float(rate) * 65536))))
    return "g" if n >= 65536 else format(n, "04x")


def _bucket(key_col: Column) -> Column:
    return F.substring(F.md5(key_col.cast("string")), 1, 4)


def deterministic_sample(df: DataFrame, rate: float,
                         key_col: str = "doc_id") -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, decided per row by
    the content hash of ``key_col`` (no RNG, reproducible anywhere)."""
    return df.filter(_bucket(F.col(key_col)) < F.lit(_hex_threshold(rate)))


def stratified_sample(df: DataFrame, strata_col: str, rates: dict,
                      key_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its own
    keep-rate (e.g. ``{"en": 0.1, "und": 1.0}`` to downsample English and
    keep everything rare).  Strata not in ``rates`` use ``default_rate``.

    Scale shape: a single filter — no shuffle, no RNG, pushdown-friendly;
    the strata thresholds fold into one literal CASE."""
    thresh = F.lit(_hex_threshold(default_rate))
    for value, rate in rates.items():
        thresh = F.when(F.col(strata_col) == F.lit(value),
                        F.lit(_hex_threshold(rate))).otherwise(thresh)
    return df.filter(_bucket(F.col(key_col)) < thresh)


def split_assign(df: DataFrame, weights: dict, key_col: str = "doc_id",
                 out_col: str = "split") -> DataFrame:
    """Assign each row to a named split (train/valid/test…) by hash bucket
    — deterministic, disjoint, exhaustive.  ``weights`` maps split name →
    fraction; fractions are normalized and converted to contiguous hex
    bucket ranges in dict order."""
    total = float(sum(weights.values()))
    edges = []
    acc = 0.0
    for name, w in weights.items():
        acc += float(w) / total
        edges.append((name, _hex_threshold(min(acc, 1.0))))
    bucket = _bucket(F.col(key_col))
    expr = F.lit(edges[-1][0])  # numeric-edge rounding safety net
    for name, hi in reversed(edges):
        expr = F.when(bucket < F.lit(hi), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def deterministic_shuffle(df: DataFrame, key_col: str = "doc_id",
                          seed: int = 0, shards: int = 16) -> DataFrame:
    """Reproducible global training order: every row gets a ``shard``
    and a dense ``pos`` within its shard, both derived from
    ``md5(seed ":" key)`` — change the seed to get an independent
    permutation, re-run anywhere to get the identical one.

    This is the trainer-facing layout (each data-parallel rank reads its
    shard sequentially), and the shard is also the SCALE unit: the only
    non-map work is one row_number window per shard, so the sort
    parallelism equals ``shards`` and no global total-order sort ever
    runs.  No RNG in the plan — same idempotence story as
    deterministic_sample."""
    from pyspark.sql import Window
    skey = F.md5(F.concat(F.lit(f"{int(seed)}:"),
                          F.col(key_col).cast("string")))
    shard = (F.conv(F.substring(skey, 1, 6), 16, 10)
             .cast("long") % F.lit(int(shards)))
    w = (Window.partitionBy("shard")
         .orderBy(F.col("_sk"), F.col(key_col)))
    return (df.withColumn("_sk", skey)
            .withColumn("shard", shard)
            .withColumn("pos", F.row_number().over(w) - 1)
            .drop("_sk"))


def weighted_sample_wor(df: DataFrame, n: int, weight_col,
                        key_col: str = "doc_id",
                        score_col: str = "_ws_score") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-n):
    the Efraimidis–Spirakis A-Res rule with the RNG replaced by the
    content hash — priority u^(1/w) with u a uniform from md5(key),
    equivalently score = ln(u)/w, keep the n largest scores.

    One map pass + one distributed top-n (TakeOrderedAndProject) — no
    shuffle of the corpus, no RNG, and any engine that computes md5
    reproduces the exact sample (the oracle replays it in SQL).
    Weights must be strictly positive.

    The 48-bit hash prefix is exact in a double and (x+1)/(2^48+1)
    never hits 0 or 1, so ln is always finite.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    u = ((F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12),
                 16, 10).cast("double") + F.lit(1.0))
         / F.lit(281474976710657.0))                    # 2^48 + 1
    score = F.log(u) / w.cast("double")
    return (df.withColumn(score_col, score)
            .orderBy(F.col(score_col).desc())
            .limit(n))


def apply_mixture(df: DataFrame, weights: dict, by: str = "lang",
                  key_col: str = "doc_id",
                  out_col: str = "copy_no") -> DataFrame:
    """Materialize a mixture-reweighted epoch: each row appears
    ``floor(w)`` times plus one more with probability ``frac(w)`` —
    where ``w`` is its group's weight (text.mixture_weights' output,
    passed as a plain dict so the plan is literal-folded and the
    decision grid stays the engine-exact 16-bit md5 bucket).

    Deterministic: the fractional coin is the content hash of
    ``key_col || ':mix'`` on the same hex-threshold grid as
    deterministic_sample, so re-runs (and the DuckDB oracle) reproduce
    the epoch row-for-row.  Groups absent from ``weights`` get 1.0
    (pass-through).  Downsampling (w < 1) and upsampling (w > 1)
    fall out of the same formula.

    Scale shape: map-only — one CASE for the weight, one md5 compare,
    one explode(sequence(1, n_copies)); no shuffle, no RNG.  Output
    adds ``out_col`` (1..n_copies) so downstream shuffles can spread
    the copies."""
    w_expr = F.lit(1.0)
    base_expr = F.lit(1)
    frac_thresh = F.lit(_hex_threshold(0.0))
    for value, w in weights.items():
        wf = float(w)
        if wf < 0:
            raise ValueError(f"mixture weight must be >= 0, got {w!r}")
        base = int(wf)
        cond = F.col(by) == F.lit(value)
        w_expr = F.when(cond, F.lit(wf)).otherwise(w_expr)
        base_expr = F.when(cond, F.lit(base)).otherwise(base_expr)
        frac_thresh = F.when(cond, F.lit(_hex_threshold(wf - base))) \
            .otherwise(frac_thresh)
    coin = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":mix"))), 1, 4)
    n_copies = base_expr + (coin < frac_thresh).cast("int")
    return (df.withColumn("_nc", n_copies)
            .filter(F.col("_nc") >= 1)
            .withColumn(out_col,
                        F.explode(F.expr("sequence(1, _nc)")))
            .drop("_nc"))
