"""Probabilistic sketches as plain DataFrames: Bloom seen-sets and
count-min heavy hitters.

The 100 TB pipelines these serve:

* **Bloom seen-set** — incremental crawl/ingest dedup ACROSS runs.  A
  full exact dedup against yesterday's 100 TB corpus is a join against
  100 TB; a Bloom filter of yesterday's fingerprints is a few GB that
  BROADCASTS, and filtering today's batch is map-only.  No false
  negatives: everything actually seen is dropped; a tunable ~fpr of
  genuinely-new rows is wrongly dropped (the standard, documented
  trade).
* **Count-min** — heavy-hitter detection (hot grams, hot domains, hot
  users) without a full groupBy over an unbounded key space: the
  sketch is a fixed (d x w) counter grid built with ONE aggregation
  whose output is at most d*w rows regardless of corpus size;
  estimates are upward-biased minima over d counters.

Both sketches are ordinary DataFrames (word/bits rows; row/col/count
rows), so they persist as parquet, union across runs (bit_or / sum),
and broadcast-join for probing — no JVM sketch objects, no driver-side
state beyond the sketch itself.

Determinism contract: positions derive from md5 (exact in any engine —
the same nibble arithmetic the sampling oracles use), seeded per probe
index, so DuckDB can recompute membership and estimates EXACTLY; there
is no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom", "bloom_filter_new", "bloom_merge", "build_cms",
           "cms_estimate", "cms_heavy_hitters", "cms_merge", "build_hll",
           "hll_cardinality", "hll_merge"]


def _md5_pos(col, salt: int, mod: int):
    """Deterministic position in [0, mod): the top 15 hex chars of
    md5(key ':' salt) as a 60-bit integer, mod ``mod``.  Pure JVM
    (md5/conv/pmod), exactly reproducible in SQL."""
    h = F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(salt))))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
                  F.lit(mod))


# ------------------------------------------------------------------ Bloom
def build_bloom(df: DataFrame, key_col: str = "text",
                m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as a ``(word, bits)``
    bitmap frame (64 bits per word; at most m_bits/64 rows).

    One aggregation: k positions per row explode, fold with ``bit_or``
    (map-side combining — the shuffle carries at most one row per
    bitmap word per task).  Size for ~1% fpr: m ≈ 10 bits per distinct
    key with k=7; the default 2^20 bits (128 KiB) covers ~100k keys."""
    pos = df.select(F.explode(F.array(
        *[_md5_pos(F.col(key_col), i, m_bits) for i in range(k)]
    )).alias("pos"))
    return (pos
            .select((F.col("pos") / 64).cast("long").alias("word"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pos % 64 AS INT))").alias("b"))
            .groupBy("word").agg(F.expr("bit_or(b)").alias("bits")))


def bloom_filter_new(df: DataFrame, bloom: DataFrame,
                     key_col: str = "text", id_col: str = "doc_id",
                     m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Rows of ``df`` whose key is DEFINITELY NOT in the set the bloom
    was built from (at least one probe bit unset).

    Bloom semantics: no false negatives — every previously-seen row is
    dropped; ~fpr of genuinely-new rows are wrongly dropped too.  Shape:
    k probe positions per row explode to (id, word, bit), broadcast-join
    the bitmap (the bloom is small by construction), per-id ALL-bits-set
    test, anti-join back — the input's payload columns never ride the
    probe shuffle."""
    probes = (df.select(F.col(id_col),
                        F.explode(F.array(
                            *[_md5_pos(F.col(key_col), i, m_bits)
                              for i in range(k)])).alias("pos"))
              .select(id_col, (F.col("pos") / 64).cast("long").alias("word"),
                      (F.col("pos") % 64).cast("int").alias("bit")))
    hit = (probes.join(F.broadcast(bloom), "word", "left")
           .select(id_col,
                   F.when(F.col("bits").isNotNull()
                          & (F.expr("shiftrightunsigned(bits, bit) & 1")
                             == 1), 1)
                   .otherwise(0).alias("hit")))
    seen = (hit.groupBy(id_col).agg(F.min("hit").alias("all_set"))
            .filter(F.col("all_set") == 1).select(id_col))
    return df.join(seen, id_col, "left_anti")


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union Bloom filters built with the SAME (m_bits, k): the merged
    bitmap is bit-for-bit what building over the concatenated inputs
    would produce (``bit_or`` is the union of set bits) — the
    sketch-lifecycle primitive for accreting a seen-set across runs
    (VERDICT r7 ask #8): persist each run's filter as parquet, merge,
    broadcast into ``bloom_filter_new`` / ``dedup_against``."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))


# -------------------------------------------------------------- count-min
def build_cms(df: DataFrame, key_col: str = "text",
              width: int = 1 << 12, depth: int = 4,
              weight_col: str | None = None) -> DataFrame:
    """Count-min sketch over ``key_col`` as ``(row, col, n)`` counter
    rows (at most depth*width).  One aggregation, map-side combined;
    ``weight_col`` aggregates a weight instead of a count of 1."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1)
    probes = df.select(F.explode(F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _md5_pos(F.col(key_col), 1000 + r, width).alias("col"))
        for r in range(depth)])).alias("p"), w.alias("w"))
    return (probes.select("p.row", "p.col", "w")
            .groupBy("row", "col").agg(F.sum("w").alias("n")))


def cms_estimate(keys: DataFrame, cms: DataFrame, key_col: str,
                 width: int = 1 << 12, depth: int = 4) -> DataFrame:
    """Estimated count per input key: min over the depth counters —
    upward-biased, never an undercount.  The sketch broadcast-joins
    (<= depth*width rows by construction)."""
    probes = keys.select(F.col(key_col), F.explode(F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _md5_pos(F.col(key_col), 1000 + r, width).alias("col"))
        for r in range(depth)])).alias("p")).select(key_col, "p.row", "p.col")
    return (probes.join(F.broadcast(cms), ["row", "col"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_count")))


def cms_heavy_hitters(df: DataFrame, cms: DataFrame,
                      key_col: str = "text", min_count: int = 100,
                      width: int = 1 << 12, depth: int = 4) -> DataFrame:
    """Distinct keys of ``df`` whose estimated count >= min_count —
    upward-biased, so the TRUE heavy hitters are always included (the
    no-false-negatives mirror of the Bloom contract); some near-misses
    ride along at sketch-collision rate."""
    return (cms_estimate(df.select(key_col).distinct(), cms, key_col,
                         width, depth)
            .filter(F.col("est_count") >= min_count))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union count-min sketches built with the SAME (width, depth):
    counters ADD, so merge == rebuild over the concatenated inputs
    exactly (count-min is a linear sketch)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("n").alias("n"))


# ----------------------------------------------------------- HyperLogLog
def build_hll(df: DataFrame, key_col: str = "text",
              p: int = 12) -> DataFrame:
    """HyperLogLog register table over ``key_col`` as ``(bucket,
    max_rank)`` rows — at most 2^p of them, from ONE map-side-combined
    max aggregation; cardinality error ~1.04/sqrt(2^p) (~1.6% at the
    default p=12).

    Register tables union across runs with a further max — the same
    persist/union/broadcast story as the other sketches.  The hash is
    the md5-60-bit value: bucket = low p bits, rank = leading zeros of
    the remaining (60-p)-bit suffix + 1, computed EXACTLY via the
    binary-string length (no float log), so DuckDB reproduces the
    registers bit-for-bit.  (Completes the sketch family: Bloom =
    membership, count-min = frequency, HLL = cardinality.)"""
    rem_bits = 60 - p
    v = F.conv(F.substring(
        F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast("long")
    # integer DIV, not float division: v is up to 2^60 and double
    # division would corrupt the low bits past 2^53
    splits = (df.select(v.alias("v"))
              .select(F.pmod(F.col("v"), F.lit(1 << p)).alias("bucket"),
                      F.expr(f"v DIV {1 << p}").alias("suffix")))
    # rank = leading zeros of the suffix within rem_bits, + 1; the
    # binary-string length IS floor(log2)+1, exact integer string math
    rank = F.when(F.col("suffix") == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits) - F.length(F.expr("bin(suffix)")) + F.lit(1))
    return (splits.select("bucket", rank.alias("rank"))
            .groupBy("bucket").agg(F.max("rank").alias("max_rank")))


def hll_merge(*hlls: DataFrame) -> DataFrame:
    """Union HLL register tables built with the SAME p: registers take
    the max, so merge == rebuild over the concatenated inputs exactly
    (HLL's defining property)."""
    out = hlls[0]
    for h in hlls[1:]:
        out = out.unionByName(h)
    return out.groupBy("bucket").agg(F.max("max_rank").alias("max_rank"))


def hll_cardinality(hll: DataFrame, p: int = 12) -> float:
    """Driver-side estimate from a register frame (the frame is at most
    2^p rows — collecting it IS the sketch's point).  Standard HLL
    estimator with the small-range linear-counting correction."""
    import math
    m = 1 << p
    regs = {int(r["bucket"]): int(r["max_rank"]) for r in hll.collect()}
    zeros = m - len(regs)
    s = zeros * 1.0 + sum(2.0 ** -v for v in regs.values())
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def build_hll_by_group(df: DataFrame, group_col: str, key_col: str = "text",
                       p: int = 12) -> DataFrame:
    """Per-group HLL register tables: (group, bucket, max_rank) — the
    distinct-count-per-dimension primitive (unique users per region,
    unique documents per domain) at ≤2^p rows per group from ONE
    map-side-combined max aggregation, never a distinct shuffle of the
    keys themselves.  Same md5-60-bit register math as build_hll, so
    registers stay engine-exact and mergeable across runs."""
    rem_bits = 60 - p
    v = F.conv(F.substring(
        F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast("long")
    splits = (df.select(F.col(group_col).alias("grp"), v.alias("v"))
              .select("grp",
                      F.pmod(F.col("v"), F.lit(1 << p)).alias("bucket"),
                      F.expr(f"v DIV {1 << p}").alias("suffix")))
    rank = F.when(F.col("suffix") == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits) - F.length(F.expr("bin(suffix)")) + F.lit(1))
    return (splits.select("grp", "bucket", rank.alias("rank"))
            .groupBy("grp", "bucket").agg(F.max("rank").alias("max_rank")))


def hll_group_cardinalities(regs: DataFrame, p: int = 12) -> DataFrame:
    """(group, estimate) from per-group register tables — the standard
    HLL estimator with the small-range (linear counting) correction,
    computed as one JVM aggregation per group (no driver loop)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = (regs.groupBy("grp")
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("s"),
                F.count(F.lit(1)).alias("nz")))
    raw = F.lit(alpha * m * m) / (F.col("s") + (F.lit(m) - F.col("nz")))
    zeros = F.lit(m) - F.col("nz")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), small).otherwise(raw)
    return agg.select(F.col("grp"), est.alias("estimate"))


# ---------------------------------------------------------------------------
# KMV ("theta") sketch: bottom-k distinct hashes — the sketch that gives
# SET OPERATIONS (union / intersection / difference estimates), which
# HLL registers cannot (HLL unions but never intersects).
# ---------------------------------------------------------------------------
_KMV_DOMAIN = 1 << 60  # md5-u60 hash domain, shared with the HLL family


def build_kmv(df: DataFrame, key_col: str = "text", k: int = 256,
              group_col: str | None = None) -> DataFrame:
    """Bottom-``k`` KMV sketch per group: the k SMALLEST distinct
    md5-u60 hash values of ``key_col`` as ``(grp?, pos, h)`` rows
    (pos = 1..k ascending).

    Deterministic end to end — the sketch of a dataset is a pure
    function of its distinct keys, so merge == rebuild holds exactly
    and a DuckDB oracle replays it row for row.  Distributed shape:
    one distinct on (grp, h) — keyed shuffle with map-side partial —
    then a per-group bottom-k window (per-key cardinality is the
    group's distinct count; the window sorts hashes, not rows of the
    corpus).  At most k rows per group survive."""
    from pyspark.sql import Window

    v = F.conv(F.substring(
        F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast("long")
    if group_col is None:
        hashes = df.select(v.alias("h")).distinct()
        # Per-partition bottom-k FIRST (window keyed by the physical
        # partition id — P parallel groups), so the final global window
        # orders at most k·P survivor rows instead of funneling every
        # distinct hash of the corpus through one task.  The result is
        # identical by merge == rebuild: the global bottom-k of the
        # union of per-partition bottom-k's is the bottom-k of the set.
        pre_w = Window.partitionBy("_pid").orderBy("h")
        pre = (hashes.withColumn("_pid", F.spark_partition_id())
               .withColumn("_ppos", F.row_number().over(pre_w))
               .filter(F.col("_ppos") <= k).select("h"))
        w = Window.orderBy("h")
        out = (pre.withColumn("pos", F.row_number().over(w))
               .filter(F.col("pos") <= k).select("pos", "h"))
        return out
    hashes = (df.select(F.col(group_col).alias("grp"), v.alias("h"))
              .distinct())
    # same pre-cut per (group, physical partition): bounds the per-group
    # window input at k·P rows even for groups with huge key sets
    pre_w = Window.partitionBy("grp", "_pid").orderBy("h")
    pre = (hashes.withColumn("_pid", F.spark_partition_id())
           .withColumn("_ppos", F.row_number().over(pre_w))
           .filter(F.col("_ppos") <= k).select("grp", "h"))
    w = Window.partitionBy("grp").orderBy("h")
    return (pre.withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= k).select("grp", "pos", "h"))


def kmv_estimate(sketch: DataFrame, k: int = 256,
                 by_group: bool | None = None) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: exact count when the
    group holds fewer than k hashes (the sketch IS the distinct set),
    else the classic (k-1) * domain / h_k estimator.  Integer h_k keeps
    the arithmetic engine-exact; the estimate is rounded to 4."""
    if by_group is None:           # auto: grouped sketches carry 'grp'
        by_group = "grp" in sketch.columns
    keys = ["grp"] if by_group else []
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("h_max"))
    est = F.when(
        F.col("n") < k, F.col("n").cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(_KMV_DOMAIN)))
        / F.col("h_max").cast("double"))
    return agg.select(*keys, F.round(est, 4).alias("est_distinct"))


def kmv_union(a: DataFrame, b: DataFrame, k: int = 256,
              by_group: bool | None = None) -> DataFrame:
    """Union of two KMV sketches (same k): merged distinct hashes,
    re-cut to bottom-k — IDENTICAL to the sketch of the concatenated
    inputs (merge == rebuild, the property that makes sketches
    mergeable across partitions/days/sources)."""
    from pyspark.sql import Window

    if by_group is None:
        by_group = "grp" in a.columns
    keys = ["grp"] if by_group else []
    merged = (a.select(*keys, "h").unionByName(b.select(*keys, "h"))
              .distinct())
    w = (Window.partitionBy(*keys).orderBy("h") if keys
         else Window.orderBy("h"))
    return (merged.withColumn("pos", F.row_number().over(w))
            .filter(F.col("pos") <= k).select(*keys, "pos", "h"))


def kmv_intersect_estimate(a: DataFrame, b: DataFrame,
                           k: int = 256) -> DataFrame:
    """Intersection-cardinality estimate of two (ungrouped) KMV
    sketches: theta = min(theta_a, theta_b) (the stricter survival
    threshold), count hashes present in BOTH sketches below theta,
    scale by domain/theta.  1 row: (n_common, est_intersection).

    est = n_common * domain / theta; exact when both sides held
    their full distinct sets (n < k: theta capped at domain)."""
    a_stats = a.agg(F.count(F.lit(1)).alias("na"),
                    F.max("h").alias("ha"))
    b_stats = b.agg(F.count(F.lit(1)).alias("nb"),
                    F.max("h").alias("hb"))
    theta = (a_stats.crossJoin(b_stats)
             .select(F.least(
                 F.when(F.col("na") < k, F.lit(_KMV_DOMAIN))
                 .otherwise(F.col("ha")),
                 F.when(F.col("nb") < k, F.lit(_KMV_DOMAIN))
                 .otherwise(F.col("hb"))).alias("theta")))
    common = a.select("h").join(b.select("h"), "h")
    return (common.crossJoin(F.broadcast(theta))
            .filter(F.col("h") <= F.col("theta"))
            .agg(F.count(F.lit(1)).alias("n_common"),
                 F.max("theta").alias("theta"))
            .select("n_common",
                    F.round(F.when(F.col("n_common") == 0, F.lit(0.0))
                            .otherwise(F.col("n_common").cast("double")
                                       * F.lit(float(_KMV_DOMAIN))
                                       / F.col("theta").cast("double")),
                            4).alias("est_intersection")))
