"""Deduplication operators for large-scale document pipelines.

Extension axis beyond reference parity (SURVEY.md §7.2 M8): exact dedup,
MinHash+LSH, SimHash, n-gram Jaccard.  All deterministic (fixed hash
parameters), shuffle-lean (band-bucket equi-joins, no cross joins), and
designed so the candidate-pair stage scales linearly at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# deterministic 64-bit hash family: (a*x + b) mod p, fixed seed
_MERSENNE = (1 << 61) - 1
_RNG = np.random.RandomState(42)
_MAX_PERM = 256
_A = _RNG.randint(1, _MERSENNE, size=_MAX_PERM, dtype=np.int64)
_B = _RNG.randint(0, _MERSENNE, size=_MAX_PERM, dtype=np.int64)


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate removal: keep the min-id row per identical text.
    Hash-groupBy — one shuffle on a 128-bit digest, never on the full text
    (critical at 100 TB: shuffle keys are 16 bytes, not documents)."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def duplicate_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of exact duplicates: (canonical_id, member_id) pairs."""
    h = F.md5(F.col(text_col)).alias("_h")
    grouped = (df.select(h, F.col(id_col))
               .groupBy("_h")
               .agg(F.min(id_col).alias("canonical_id"),
                    F.collect_list(id_col).alias("members"),
                    F.count(F.lit(1)).alias("n_dups")))
    return grouped.select("canonical_id", "n_dups",
                          F.explode("members").alias("member_id"))


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """FNV-1a hashes of the k-byte shingles of normalized `text` —
    vectorized: the FNV loop runs k times over ALL shingles at once
    (numpy sliding windows), not once per shingle."""
    t = " ".join(text.lower().split())
    if len(t) < k:
        t = t.ljust(k)
    raw = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
    n = len(raw) - k + 1
    if n <= 0:
        raw = np.pad(raw, (0, k - len(raw)), constant_values=32)
        n = 1
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for j in range(k):
        h = (h ^ raw[j:j + n].astype(np.uint64)) * prime
    return np.unique(h.astype(np.int64))


def hash_bytes(s: str) -> int:
    """FNV-1a 64-bit — deterministic across workers/runs (unlike hash())."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 63) if h >= (1 << 63) else h


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 64,
                       shingle_k: int = 5) -> DataFrame:
    """(id, signature array<long>) MinHash signatures."""
    a = _A[:num_perm]
    b = _B[:num_perm]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        # per-doc loop is deliberate: each (shingles x 64) matrix stays
        # cache-resident, so the permutation math runs at ALU speed.  A
        # whole-batch concatenate + minimum.reduceat formulation was
        # measured 8-10x SLOWER (hundreds of MB of temporaries, memory-
        # bandwidth bound) — do not "vectorize" this again without a bench
        au, bu = a.astype(np.uint64), b.astype(np.uint64)
        p = np.uint64(_MERSENNE)
        out = []
        for t in texts:
            sh = _shingle_hashes(t or "", shingle_k).astype(np.uint64)
            vals = (au[None, :] * sh[:, None] + bu[None, :]) % p
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), sig(F.col(text_col)).alias("signature"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.8,
                      shingle_k: int = 5) -> DataFrame:
    """Near-duplicate pairs via MinHash banding.

    Plan shape: signature → explode to (band, band_hash) → self equi-join on
    the bucket (shuffle co-locates only same-bucket rows — the LSH property
    bounds bucket sizes) → estimated-Jaccard filter on the full signatures.
    Returns (a_id, b_id, jaccard_est) with a_id < b_id."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k).cache()
    # band on bare (id, band, hash) — the 64-long signature array never rides
    # the 16x explode or the distinct; it joins back once per unique pair
    banded = _band_signatures(sigs, id_col, num_perm, bands)

    a = banded.select(F.col(id_col).alias("a_id"), "band", "bh")
    b = banded.select(F.col(id_col).alias("b_id"), "band", "bh")
    cand = (a.join(b, ["band", "bh"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct())
    cand = (cand
            .join(sigs.select(F.col(id_col).alias("a_id"),
                              F.col("signature").alias("a_sig")), "a_id")
            .join(sigs.select(F.col(id_col).alias("b_id"),
                              F.col("signature").alias("b_sig")), "b_id"))

    matches = F.aggregate(
        F.zip_with("a_sig", "b_sig", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    return (cand.withColumn("jaccard_est", matches / F.lit(float(num_perm)))
            .filter(F.col("jaccard_est") >= threshold)
            .select("a_id", "b_id", "jaccard_est"))


def simhash_64(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens → (id, simhash long).

    Fully JVM-side: explode tokens, xxhash64 each (codegen'd), then one
    groupBy with 64 sign-sum aggregates and a bit-reassembly expression —
    no Python in the path, and the shuffle key is the doc id (map-side
    partial aggregation applies).

    The 64 separate aggregates are deliberate: packing bit-counts into
    8- or 16-bit lanes of a few longs (the obvious fan-out trim) silently
    overflows a lane once a document exceeds 255 / 65535 tokens — a
    wrong-answer class, not a perf trade — and the aggregation state here
    is only 64 ints (~256 B/doc) with map-side combine, so the fan-out is
    not a shuffle-width problem at scale."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"))
    toks = toks.filter(F.length("tok") > 0).withColumn("h", F.xxhash64("tok"))
    # single-string F.expr per aggregate (and one for the bit fold): the
    # Column-operator formulation cost ~900 py4j round trips = ~2s of
    # DRIVER time per call — plan construction, not execution (r3 profile)
    aggs = [F.expr(f"sum(cast(shiftrightunsigned(h, {i}) & 1 as int) * 2 - 1)")
            .alias(f"b{i}") for i in range(64)]
    sums = toks.groupBy(id_col).agg(*aggs)
    # shiftleft(1L, 63) wraps to the sign bit — same value as -(2^63)
    fold = " | ".join(f"IF(b{i} > 0, shiftleft(1L, {i}), 0L)" for i in range(64))
    out = sums.select(F.col(id_col), F.expr(fold).alias("simhash"))
    # docs with zero tokens hash to 0.  Complement computed MAP-ONLY from
    # the text itself (a doc is empty iff no split token survives the
    # length filter) — the previous left-anti join against `out`
    # re-evaluated the whole explode + 64-aggregate subtree a second
    # time (r15 opt, guide §2.4/§1.2); coalesce keeps null-text docs.
    has_tok = F.size(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                              lambda t: F.length(t) > 0)) > 0
    empty = (df.filter(~F.coalesce(has_tok, F.lit(False)))
             .select(F.col(id_col), F.lit(0).cast("long").alias("simhash")))
    return out.unionByName(empty)


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Banding: split 64 bits into (max_hamming+1) blocks — pigeonhole: any pair
    within the radius agrees on at least one full block, so candidates come
    from block-equality equi-joins (no cross join)."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    sigs = simhash_64(df, text_col, id_col)
    block_cols = [
        (F.shiftrightunsigned(F.col("simhash"), i * width)
         .bitwiseAND(F.lit((1 << width) - 1))).alias(f"blk{i}")
        for i in range(nblocks)
    ]
    banded = sigs.select(id_col, "simhash",
                         F.explode(F.array(*[
                             F.struct(F.lit(i).alias("b"), block_cols[i].alias("v"))
                             for i in range(nblocks)])).alias("bb"))
    banded = banded.select(id_col, "simhash", "bb.b", "bb.v")
    a = banded.select(F.col(id_col).alias("a_id"), F.col("simhash").alias("a_sh"), "b", "v")
    b = banded.select(F.col(id_col).alias("b_id"), F.col("simhash").alias("b_sh"), "b", "v")
    cand = (a.join(b, ["b", "v"]).filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", "a_sh", "b_sh").distinct())
    ham = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("a_id", "b_id", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        max_df: int | None = 1000) -> DataFrame:
    """Exact word-n-gram Jaccard over candidate pairs.

    Candidate generation equi-joins on RARE grams only: grams with document
    frequency > ``max_df`` are excluded from the join (standard LSH-style
    hot-key cap — a stop-phrase gram like "of the and" otherwise creates a
    quadratic bucket at corpus scale).  The Jaccard reported for surviving
    candidates is EXACT over the full gram sets (hot grams included): the
    intersection is re-counted per candidate pair, so the cap only bounds
    who becomes a candidate (pairs similar solely through ubiquitous grams
    are not reported — the standard, documented approximation).

    ``max_df=None`` disables the cap: every pair sharing ANY gram becomes
    a candidate — the fully exact operator, at the cost of quadratic
    hot-gram buckets (use only when the gram frequency distribution is
    known to be flat)."""
    # per-doc distinct gram count is a pure map (no explode/shuffle);
    # grams exist only as 64-bit hashes end to end (never as strings —
    # see _ngram_hashes_col), so the shuffle carries 8 bytes per row and
    # the per-doc distinct runs on longs.  Counts could differ only if
    # two DIFFERENT grams colliding at 64 bits met inside one candidate
    # pair or one document (~1e-19 per pair — documented approximation).
    # pre-project the token array: the gram expression references the
    # split from many slice/size sites, and under the generator that
    # defeats subexpression elimination (the regex re-runs per exploded
    # row — same fix as duplicate_spans, measured 2.4x on the explode)
    pre = df.select(F.col(id_col),
                    F.split(F.lower(F.col(text_col)), r"\s+").alias("_t"))
    tcol = F.col("_t")
    zipped = F.arrays_zip(*[F.slice(tcol, i + 1, F.size(tcol))
                            .alias(f"t{i}") for i in range(n)])
    garr = F.array_distinct(F.slice(
        F.transform(zipped,
                    lambda s: F.xxhash64(*[s[f"t{i}"] for i in range(n)])),
        1, F.greatest(F.size(tcol) - (n - 1), F.lit(1))))
    # r15 opt (guide §1.2/§5): materialize the per-doc distinct gram-hash
    # arrays ONCE.  grams (exploded), sizes, and — in capped mode — the
    # two recount sides all derive from this frame; previously each
    # consumer re-ran the regex split + gram hashing + array_distinct
    # over the corpus (2 full tokenize passes in exact mode, 4 in capped
    # mode).  The cached rows are (id, array<long>) ≈ 8 bytes per token —
    # the narrow proxy, not the text payload (guide §8).
    gsets = pre.select(F.col(id_col), garr.alias("_g")).cache()
    # Pair generation: ONE groupBy(gram) collects each gram's (tiny) doc
    # list, singleton grams — the vast majority of any corpus — drop
    # before expansion, and ordered pairs expand IN PLACE.  vs the naive
    # gram self-join this derives the grams once instead of twice and
    # replaces the join's two-sided shuffle with a single keyed shuffle.
    # A gram with document frequency D expands to D(D-1)/2 rows inside
    # one task — bounded by max_df² in capped mode; in exact mode an
    # unbounded hot gram is a task-level hotspot, the inherent cost of
    # exactness (use the cap at corpus scale).
    def _pair_buckets(g, hi):
        # collect_list over a PLAIN long: a struct payload here demotes
        # the aggregate off the fast object-hash path (measured 30x
        # slower), which is why |A|,|B| join back below instead of riding
        # along in the bucket.
        b = g.groupBy("gram").agg(F.collect_list(id_col).alias("ids"))
        b = b.filter(F.size("ids") >= 2)
        if hi is not None:
            b = b.filter(F.size("ids") <= hi)
        pair_arr = F.filter(
            F.flatten(F.transform(
                "ids",
                lambda x: F.transform(
                    "ids", lambda y: F.struct(x.alias("a_id"),
                                              y.alias("b_id"))))),
            lambda s: s["a_id"] < s["b_id"])
        return (b.select(F.explode(pair_arr).alias("p"))
                .select("p.a_id", "p.b_id"))

    grams = gsets.select(F.col(id_col), F.explode("_g").alias("gram"))
    if max_df is None:
        # fully exact mode: each shared distinct gram contributes EXACTLY
        # one pair row, so |A∩B| is a straight count — no recount joins.
        inter = (_pair_buckets(grams, None)
                 .groupBy("a_id", "b_id")
                 .agg(F.count(F.lit(1)).alias("n_common")))
    else:
        cand = _pair_buckets(grams, max_df).distinct()
        # exact |A∩B| for candidates over ALL grams (hot grams included)
        ga = grams.select(F.col(id_col).alias("a_id"), "gram")
        gb = grams.select(F.col(id_col).alias("b_id"), "gram")
        inter = (cand.join(ga, "a_id").join(gb, ["b_id", "gram"])
                 .groupBy("a_id", "b_id")
                 .agg(F.count(F.lit(1)).alias("n_common")))
    # |A∪B| = |A|+|B|-|A∩B|; per-doc distinct-gram counts are a pure map
    sizes = gsets.select(F.col(id_col), F.size("_g").alias("n_grams"))
    sa = sizes.select(F.col(id_col).alias("a_id"), F.col("n_grams").alias("a_n"))
    sb = sizes.select(F.col(id_col).alias("b_id"), F.col("n_grams").alias("b_n"))
    return (inter.join(sa, "a_id").join(sb, "b_id")
            .withColumn("jaccard",
                        F.col("n_common")
                        / (F.col("a_n") + F.col("b_n") - F.col("n_common")))
            .filter(F.col("jaccard") >= threshold)
            .select("a_id", "b_id", "jaccard"))


def _ngram_hashes_col(text_col: str, n: int):
    """64-bit hashes of the word n-grams, built WITHOUT materializing the
    gram strings: the shifted token arrays are zipped (same layout as
    ``_ngrams_col``) and each component tuple goes straight through the
    multi-argument ``xxhash64`` — one JVM hash call per gram instead of a
    concat_ws allocation plus a hash.  ``xxhash64`` skips null arguments,
    which reproduces concat_ws's skip-null tail behavior exactly (an
    ``L < n`` document yields the single hash of its available tokens).
    Tokens come from a whitespace split so no component can contain a
    space — component hashing therefore distinguishes exactly the same
    grams the string form does, modulo the 64-bit collision odds already
    documented on ``ngram_jaccard_pairs``."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, F.size(toks)).alias(f"t{i}")
                            for i in range(n)])
    grams = F.transform(
        zipped, lambda s: F.xxhash64(*[s[f"t{i}"] for i in range(n)]))
    return F.slice(grams, 1,
                   F.greatest(F.size(toks) - (n - 1), F.lit(1)))


def _ngrams_col(text_col: str, n: int):
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    # Word n-grams via zipped SHIFTED copies of the token array, not
    # per-index slicing: a lambda body like slice(split(text),i,n) inlines
    # the split into every element evaluation (O(L²·regex) per row — this
    # exact formulation was a measured 10x slowdown); arrays_zip arguments
    # evaluate once per ROW, so this is O(n·L).  arrays_zip null-pads the
    # shorter shifts and concat_ws skips nulls, so the tail would emit
    # short grams — the final slice keeps the max(L-n+1, 1) real ones
    # (for L < n that's the single all-tokens gram, as before).
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, F.size(toks)).alias(f"t{i}")
                            for i in range(n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]))
    return F.slice(grams, 1,
                   F.greatest(F.size(toks) - (n - 1), F.lit(1)))


def near_dup_clusters(df: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id",
                      max_rounds: int = 50) -> DataFrame:
    """Cluster documents by near-duplicate pairs: connected components of
    the pair graph (any detector's output: minhash/simhash/ngram/embedding
    ``(a_id, b_id, ...)`` frames all fit).

    This is the canonical-selection step of a production dedup pipeline:
    pair lists alone over-delete (A~B, B~C must keep ONE of {A,B,C}, not
    drop both B and C).  Components via pointer-doubled min-label
    propagation (O(log diameter) rounds, lineage-truncated — see
    operators/graph.py).

    Returns ``(id_col, cluster, is_canonical)``: cluster = min doc id of
    the component (singletons cluster to themselves), is_canonical = 1
    for the kept representative."""
    from .graph import min_label_components

    nodes = df.select(F.col(id_col).alias("node"))
    labels = min_label_components(nodes, pairs.select("a_id", "b_id"),
                                  max_rounds=max_rounds)
    return labels.select(
        F.col("node").alias(id_col), F.col("island").alias("cluster"),
        (F.col("node") == F.col("island")).cast("int").alias("is_canonical"))


def dedup_near(df: DataFrame, pairs: DataFrame,
               id_col: str = "doc_id") -> DataFrame:
    """Remove near-duplicates: keep the min-id representative per
    connected component of the pair graph (left-semi join back — the
    document payload never shuffles through the clustering)."""
    keep = (near_dup_clusters(df, pairs, id_col)
            .filter(F.col("is_canonical") == 1).select(id_col))
    return df.join(keep, id_col, "left_semi")


def _literal_pattern(sep: str) -> str:
    """Quote ``sep`` as a literal for Spark's Java-regex ``F.split``
    (ADVICE r5: a regex-special separator like ``'.'`` or ``'|'`` would
    silently split per-character; the DuckDB oracles and the docstrings
    treat the separator literally, so the engine must too)."""
    return "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def boilerplate_lines(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", min_df: int = 2,
                      sep: str = "\n") -> DataFrame:
    """Lines occurring in ≥ ``min_df`` distinct documents — the C4-style
    boilerplate detector (nav bars, footers, license blurbs repeat across
    pages; prose does not).

    Shape: explode lines → distinct per (doc, line) → count per line —
    two keyed shuffles with map-side combine, no all-pairs anything; the
    result is a small dimension a scrub pass broadcast-joins against."""
    lines = (df.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col),
                                         _literal_pattern(sep))).alias("line"))
             .withColumn("line", F.trim("line"))
             .filter(F.length("line") > 0)
             .distinct())
    return (lines.groupBy("line")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") >= min_df))


def contamination_check(corpus: DataFrame, benchmark: DataFrame,
                        n: int = 8, text_col: str = "text",
                        id_col: str = "doc_id",
                        bench_id_col: str = "bench_id",
                        min_hits: int = 1) -> DataFrame:
    """Corpus documents sharing ≥ ``min_hits`` distinct word n-grams with
    any benchmark document — the standard eval-decontamination test
    (long n-grams from a small benchmark set are near-unique, so a hit
    means the document quotes the benchmark).

    Shape: the benchmark side explodes to distinct (bench_id, gram) —
    a broadcast-sized dimension at any corpus scale — and the
    broadcast join runs BEFORE any corpus-side dedup, so the only
    shuffled corpus rows are gram MATCHES (near-none on a clean
    corpus); the corpus-wide distinct the r14 shape paid (every
    (id, 8-word-gram) string through one exchange) is gone.
    Join-then-dedup is set-identical to distinct-then-join: the
    per-(doc, bench) count is over distinct matched (id, gram,
    bench_id) triples either way."""
    c_grams = corpus.select(F.col(id_col),
                            F.explode(_ngrams_col(text_col, n)).alias("gram"))
    b_grams = (benchmark.select(F.col(bench_id_col),
                                F.explode(_ngrams_col(text_col, n)).alias("gram"))
               .distinct())
    hits = (c_grams.join(F.broadcast(b_grams), "gram")
            .dropDuplicates([id_col, "gram", bench_id_col])
            .groupBy(id_col, bench_id_col)
            .agg(F.count(F.lit(1)).alias("shared_ngrams"))
            .filter(F.col("shared_ngrams") >= min_hits))
    return hits


def embedding_near_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id", threshold: float = 0.95,
                             planes: int = 16) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold.

    Random-hyperplane LSH (fixed seed): sign-bit signature → ONE
    all-pairs GEMM per bucket (groupBy + applyInPandas) — the r6 shape.
    The previous bucket self-join shipped both vectors through Arrow for
    every candidate pair; grouping moves each vector exactly once and
    verifies the whole bucket with a single BLAS matmul, emitting only
    threshold survivors.  Bucket size (and so the per-task score block)
    is controlled by ``planes``; a pathological hot bucket — every
    vector identical — degrades to the same all-pairs volume the join
    already had, in one task instead of a shuffle's worth of rows.

    The hyperplanes are derived inside the UDF from (seed, dim) — same
    matrix for every batch and every run, but no plan-time job probing the
    embedding dimension on the driver (r3 verdict item).

    ``a_id``/``b_id`` take the INPUT id column's type (long ids stay
    long, string ids stay string) — the pair schema is derived from
    ``df.schema``, not hardcoded (r6 advice)."""
    id_dt = df.schema[id_col].dataType.simpleString()
    hp_cache: dict = {}

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.vstack(vecs.to_numpy())
        dim = m.shape[1]
        hp = hp_cache.get(dim)
        if hp is None:
            hp = np.random.RandomState(7).standard_normal((planes, dim))
            hp_cache[dim] = hp
        signs = (m @ hp.T) > 0
        return pd.Series(signs.dot(1 << np.arange(planes)).astype(np.int32))

    with_b = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                       bucket(F.col(vec_col)).alias("bkt"))

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"a_id": pdf["_id"].iloc[:0],
                                 "b_id": pdf["_id"].iloc[:0],
                                 "cosine": pd.Series([], dtype="float64")})
        m = np.vstack(pdf["_v"].to_numpy())
        ids = pdf["_id"].to_numpy()
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        scores = m @ m.T
        ii, jj = np.nonzero((scores >= threshold)
                            & (ids[:, None] < ids[None, :]))
        return pd.DataFrame({"a_id": ids[ii], "b_id": ids[jj],
                             "cosine": scores[ii, jj]})

    return with_b.groupBy("bkt").applyInPandas(
        bucket_pairs, f"a_id {id_dt}, b_id {id_dt}, cosine double")


def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", sep: str = "\n",
                    scope: str = "corpus") -> DataFrame:
    """C4-style paragraph-granularity exact dedup: each distinct
    (trimmed) paragraph is kept only at its FIRST occurrence — ordered
    by (doc id, position) — and every later copy is dropped; documents
    are rebuilt from their surviving paragraphs.

    ``scope="corpus"`` (default) dedups across the WHOLE corpus (the C4
    three-sentence-span rule's paragraph analogue); ``scope="document"``
    dedups only within each document (C4's repeated-line scrub — drops
    in-page boilerplate like repeated nav text without touching
    legitimate cross-document repetition).  Document scope adds the doc
    id to the winner key, so the aggregation remains the same map-side
    combining shape — just keyed finer.

    Shape: explode → groupBy(paragraph) min-position (partial aggregation
    absorbs hot boilerplate paragraphs map-side — deliberately NOT a
    row_number window, whose per-paragraph sort would hotspot on a
    paragraph shared by millions of docs) → equi-join back → groupBy(doc)
    rebuild.  Empty/whitespace paragraphs are dropped like boilerplate.

    Returns ``(id_col, text, n_kept, n_removed)`` for every input row
    (documents losing all paragraphs come back with empty text)."""
    if scope not in ("corpus", "document"):
        raise ValueError(f"scope must be corpus|document, got {scope!r}")
    if scope == "document":
        # Within-document dedup is ROW-LOCAL: the corpus-scope plan
        # (explode + two corpus-keyed aggs + join-back) shuffled the
        # whole paragraph corpus three ways for per-row work.  One
        # Arrow pass, zero shuffles (r15, guide §2.4); semantics are
        # pinned to the relational path — Spark `trim` strips ASCII
        # space only (so .strip(' ')), `F.split` keeps trailing
        # empties like str.split on a literal separator, and a test
        # compares both paths row-for-row.
        from ..partitioning import spread
        out_t = T.StructType([
            T.StructField("text", T.StringType()),
            T.StructField("n_kept", T.LongType()),
            T.StructField("n_removed", T.LongType()),
        ])

        @F.pandas_udf(out_t)
        def _scrub(texts: pd.Series) -> pd.DataFrame:
            rows = []
            for t in texts:
                if t is None:
                    rows.append(("", 0, 0))
                    continue
                seen = set()
                kept = []
                total = 0
                for p in t.split(sep):
                    norm = p.strip(" ")
                    if not norm:
                        continue
                    total += 1
                    if norm in seen:
                        continue
                    seen.add(norm)
                    kept.append(p)
                rows.append((sep.join(kept), len(kept),
                             total - len(kept)))
            return pd.DataFrame(rows,
                                columns=["text", "n_kept", "n_removed"])

        # coalesce mirrors the relational path's non-null output schema
        return (spread(df)
                .select(F.col(id_col), _scrub(F.col(text_col)).alias("_r"))
                .select(id_col,
                        F.coalesce(F.col("_r.text"),
                                   F.lit("")).alias("text"),
                        F.coalesce(F.col("_r.n_kept"),
                                   F.lit(0)).alias("n_kept"),
                        F.coalesce(F.col("_r.n_removed"),
                                   F.lit(0)).alias("n_removed")))
    paras = (df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col),
                             _literal_pattern(sep))).alias("idx", "para"))
        .withColumn("_norm", F.trim("para"))
        .filter(F.length("_norm") > 0))
    # min(struct) plans as a SortAggregate but KEEPS the partial/final
    # split (plan-verified), so hot paragraphs still combine map-side —
    # the property this formulation exists for
    win_keys = ["_norm"] if scope == "corpus" else [id_col, "_norm"]
    winners = (paras.groupBy(*win_keys)
               .agg(F.min(F.struct(id_col, "idx")).alias("w")))
    kept = (paras.join(winners, win_keys)
            .filter((F.col(f"w.{id_col}") == F.col(id_col))
                    & (F.col("w.idx") == F.col("idx"))))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("idx", "para"))),
                            lambda s: s["para"]),
                        sep).alias("_text"),
                    F.count(F.lit(1)).alias("n_kept")))
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("_total"))
    return (df.select(id_col).join(totals, id_col, "left")
            .join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("_text", F.lit("")).alias("text"),
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    (F.coalesce("_total", F.lit(0))
                     - F.coalesce("n_kept", F.lit(0))).alias("n_removed")))


def cosine_pairs_exact(df: DataFrame, vec_col: str = "embedding",
                       id_col: str = "vec_id", threshold: float = 0.95,
                       n_chunks: int = 32) -> DataFrame:
    """ALL id-ordered pairs with cosine >= threshold — brute force O(n²),
    the small-corpus / oracle baseline.  The scale path is
    embedding_near_dup_pairs (hyperplane LSH buckets); this exists so
    exactness-sensitive callers (and the correctness gate) have a
    variant with no bucketing approximation.

    Execution shape — CHUNKED GEMM, not a row-level cross join: vectors
    normalize once (JVM fold), hash into ``n_chunks`` chunk rows (each
    one Arrow cell holding the chunk's id vector + flattened unit
    matrix), and the O(n²) work runs as ``n_chunks·(n_chunks+1)/2``
    chunk-pair GEMMs inside mapInPandas.  The r5 shape (crossJoin of
    (id, vec) rows + per-pair batched row-dot) moved BOTH 64-double
    vectors through Arrow for every one of the n²/2 pairs — ~13 GB at
    n=5000 and the whole 12s of the old gate; the chunked form moves
    each vector ``n_chunks`` times (~80 MB, 150x less) and replaces the
    per-pair dot with BLAS matmuls.  Survivor rows (the only per-pair
    output) are threshold-filtered inside the UDF, so the operator's
    output — not its intermediate — is the widest thing shuffled.
    Per-task memory is 2·(n/n_chunks)·dim doubles plus the
    (n/n_chunks)² score block: size ``n_chunks`` ~ n/2048 for big n.

    Like ``embedding_near_dup_pairs``, the pair schema's id type is
    derived from the input id column (long or string both work — the
    id-ordered triangle uses elementwise numpy comparison, defined for
    both).
    """
    id_dt = df.schema[id_col].dataType.simpleString()
    inv = F.lit(1.0) / F.sqrt(F.aggregate(
        F.transform(vec_col, lambda x: x * x),
        F.lit(0.0), lambda acc, v: acc + v))
    unit = df.select(F.col(id_col).alias("_id"),
                     F.transform(vec_col, lambda x: x * inv).alias("_u"),
                     (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_chunks)))
                     .alias("_ck"))

    pack_schema = (f"ck int, ids array<{id_dt}>, vecs array<double>, "
                   "n int, d int")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack(pdf["_u"].to_numpy())
        return pd.DataFrame(
            [[int(pdf["_ck"].iloc[0]), pdf["_id"].tolist(),
              m.ravel().tolist(), m.shape[0], m.shape[1]]],
            columns=["ck", "ids", "vecs", "n", "d"])

    # r15 opt (guide §5): both cross-join sides read the packed chunks;
    # uncached, the normalize + groupBy + applyInPandas pack stage (a
    # full Python pass over every embedding) executed twice per call.
    # The cache holds n_chunks rows totalling one copy of the unit
    # vectors — the same bytes the GEMM stage ships anyway.
    chunks = unit.groupBy("_ck").applyInPandas(pack, pack_schema).cache()
    a = chunks.select(F.col("ck").alias("a_ck"), F.col("ids").alias("a_ids"),
                      F.col("vecs").alias("a_vecs"), F.col("n").alias("a_n"),
                      F.col("d").alias("a_d"))
    b = chunks.select(F.col("ck").alias("b_ck"), F.col("ids").alias("b_ids"),
                      F.col("vecs").alias("b_vecs"), F.col("n").alias("b_n"),
                      F.col("d").alias("b_d"))
    # the chunk-pair frame is tiny in ROWS but each row is a real GEMM;
    # spread the pairs across the cluster (without this, the crossJoin of
    # two single-partition frames runs every GEMM in one task)
    pair_rows = (a.crossJoin(b).filter(F.col("a_ck") <= F.col("b_ck"))
                 .repartition(max(n_chunks, 1) * 2, "a_ck", "b_ck"))

    def gemm(batches):
        for pdf in batches:
            outs = {"a_id": [], "b_id": [], "cosine": []}
            for row in pdf.itertuples(index=False):
                am = np.asarray(row.a_vecs).reshape(row.a_n, row.a_d)
                bm = np.asarray(row.b_vecs).reshape(row.b_n, row.b_d)
                aids = np.asarray(row.a_ids)
                bids = np.asarray(row.b_ids)
                scores = am @ bm.T
                mask = scores >= threshold
                if row.a_ck == row.b_ck:
                    # same chunk: the matrix holds both orientations —
                    # take the id-ordered triangle once
                    mask &= aids[:, None] < bids[None, :]
                # distinct chunks hold disjoint ids, so every unordered
                # pair appears exactly once — emit it id-ordered
                ii, jj = np.nonzero(mask)
                lo = np.minimum(aids[ii], bids[jj])
                hi = np.maximum(aids[ii], bids[jj])
                outs["a_id"].extend(lo.tolist())
                outs["b_id"].extend(hi.tolist())
                outs["cosine"].extend(scores[ii, jj].tolist())
            yield pd.DataFrame(outs)

    return pair_rows.mapInPandas(
        gemm, f"a_id {id_dt}, b_id {id_dt}, cosine double")


def semantic_dedup(df: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id", threshold: float = 0.95,
                   exact: bool = False,
                   planes: int = 16) -> DataFrame:
    """SemDeDup-style semantic near-duplicate clustering: cosine-similar
    embedding pairs → connected components → one canonical representative
    (min id) per semantic cluster.

    ``exact=False`` (default, the scale path) generates candidates with
    hyperplane-LSH buckets; ``exact=True`` brute-forces all pairs —
    only for small corpora / verification.  Returns
    ``(id_col, cluster, is_canonical)`` like near_dup_clusters."""
    pairs = (cosine_pairs_exact(df, vec_col, id_col, threshold) if exact
             else embedding_near_dup_pairs(df, vec_col, id_col,
                                           threshold, planes))
    return near_dup_clusters(df, pairs, id_col=id_col)


def _band_signatures(sigs: DataFrame, id_col: str, num_perm: int,
                     bands: int) -> DataFrame:
    """(id, band, bh) bucket rows from a signature frame — one selectExpr
    string (the Column formulation costs measurable py4j driver latency,
    r3 profile); the signature array never rides the explode."""
    rows_per_band = num_perm // bands
    structs = ", ".join(
        "struct({i} as band, hash({cols}) as bh)".format(
            i=i, cols=", ".join(f"signature[{i * rows_per_band + j}]"
                                for j in range(rows_per_band)))
        for i in range(bands))
    return (sigs.selectExpr(id_col, f"explode(array({structs})) as bb")
            .select(id_col, "bb.band", "bb.bh"))


def dedup_against(df: DataFrame, reference: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  ref_text_col: str | None = None,
                  ref_id_col: str | None = None,
                  num_perm: int = 64, bands: int = 16,
                  threshold: float = 0.8,
                  shingle_k: int = 5,
                  ref_bloom: DataFrame | None = None,
                  bloom_m_bits: int = 1 << 20,
                  bloom_k: int = 5) -> DataFrame:
    """Cross-corpus near-dedup: drop from ``df`` every document that
    near-duplicates ANY reference document (scrub a new crawl against the
    existing corpus or held-out eval sets — the asymmetric sibling of
    minhash_lsh_pairs' within-corpus pairing).

    Shape: both sides sign once, band into (band, hash) buckets, and
    candidates exist only on bucket collisions — the corpus never joins
    the reference wider than the LSH collision rate.  Survivors return
    via left-anti join, so the document payload never rides the
    signature shuffles.

    **Incremental path (VERDICT r7 ask #8):** pass ``ref_bloom`` — a
    Bloom filter built over the reference's EXACT ``text`` keys
    (``build_bloom(reference, key_col=...)``, persisted across runs and
    accreted with ``bloom_merge``) — and exact duplicates are dropped
    MAP-ONLY against the broadcast bitmap before any signature work:
    the daily-crawl case where most repeats are verbatim never signs or
    shuffles them.  Bloom contract applies: every exact repeat is
    dropped (an exact duplicate is a near-duplicate at any threshold),
    plus ~fpr of genuinely-new rows (sized by ``bloom_m_bits``/
    ``bloom_k``; at 10 bits/key the overkill is ~1%)."""
    rtext = ref_text_col or text_col
    rid = ref_id_col or id_col
    if ref_bloom is not None:
        from .sketch import bloom_filter_new
        df = bloom_filter_new(df, ref_bloom, key_col=text_col,
                              id_col=id_col, m_bits=bloom_m_bits,
                              k=bloom_k)
    sigs_c = minhash_signatures(df, text_col, id_col,
                                num_perm, shingle_k).cache()
    # r15 opt (guide §5): the reference signatures are consumed twice
    # (banding + the r_sig join-back); uncached, the shingle+permute
    # Arrow pass over the reference ran twice per call.  The cached rows
    # are (id, 64 ints) — same narrow shape sigs_c already caches.
    sigs_r = minhash_signatures(reference, rtext, rid,
                                num_perm, shingle_k).cache()
    bc = _band_signatures(sigs_c, id_col, num_perm, bands)
    br = (_band_signatures(sigs_r, rid, num_perm, bands)
          .withColumnRenamed(rid, "_ref_id"))
    cand = (bc.join(br, ["band", "bh"])
            .select(id_col, "_ref_id").distinct())
    cand = (cand
            .join(sigs_c.select(F.col(id_col),
                                F.col("signature").alias("c_sig")), id_col)
            .join(sigs_r.select(F.col(rid).alias("_ref_id"),
                                F.col("signature").alias("r_sig")),
                  "_ref_id"))
    matches = F.aggregate(
        F.zip_with("c_sig", "r_sig", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    hits = (cand.withColumn("jaccard_est",
                            matches / F.lit(float(num_perm)))
            .filter(F.col("jaccard_est") >= threshold)
            .select(id_col).distinct())
    return df.join(hits, id_col, "left_anti")


def duplicate_spans(df: DataFrame, n: int = 8, text_col: str = "text",
                    id_col: str = "doc_id", min_docs: int = 2) -> DataFrame:
    """Maximal duplicated token spans — the position-level half of exact
    substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): every maximal run of n-gram positions
    whose grams occur in >= ``min_docs`` distinct documents.  A scrub
    pass drops or trims these spans; emitting positions (not rebuilt
    text) keeps the operator composable and the output narrow.

    Returns ``(id_col, span_start, span_end, n_tokens)`` — token index
    bounds, inclusive, clamped to the document length.

    Shape: gram hashes ride the ngram machinery (never strings); the
    doc-frequency filter is two keyed aggs with map-side combine; island
    merging is one lag/cumsum window per document (parallel unit = doc).
    Grams exist only as 8-byte hashes in every shuffle; the same 64-bit
    collision odds documented on ngram_jaccard_pairs apply.
    """
    from pyspark.sql import Window

    # PRE-PROJECT the token array: referencing the split expression from
    # several slice/size sites in one select defeats subexpression
    # elimination under the generator, re-running the regex per exploded
    # row (measured 4.2s -> 0.6s on the gram stage at sf0.1)
    pre = df.select(F.col(id_col),
                    F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                             lambda t: F.length(t) > 0).alias("_t"))
    tcol = F.col("_t")
    zipped = F.arrays_zip(*[F.slice(tcol, i + 1, F.size(tcol))
                            .alias(f"t{i}") for i in range(n)])
    gram_arr = F.slice(
        F.transform(zipped,
                    lambda s: F.xxhash64(*[s[f"t{i}"] for i in range(n)])),
        1, F.greatest(F.size(tcol) - (n - 1), F.lit(1)))
    # r15 opt (guide §1.2/§5): the exploded gram stream feeds BOTH the
    # doc-frequency agg and the position join — uncached, the regex
    # tokenize + gram hashing of the whole corpus ran once per consumer.
    # Cache the per-doc gram-hash ARRAYS (8 bytes/token — the narrow
    # proxy, not the text or the exploded rows) and explode from there.
    garrs = pre.select(F.col(id_col), F.size(tcol).alias("_L"),
                       gram_arr.alias("_ga")).cache()
    grams = garrs.select(
        F.col(id_col), "_L", F.posexplode("_ga").alias("idx", "g"))
    dfreq = (grams.groupBy("g")
             .agg(F.countDistinct(id_col).alias("_d"))
             .filter(F.col("_d") >= min_docs).select("g"))
    pos = grams.join(dfreq, "g")
    w = Window.partitionBy(id_col).orderBy("idx")
    flagged = (pos
               .withColumn("_prev", F.lag("idx").over(w))
               .withColumn("_new", (F.col("_prev").isNull()
                                    | (F.col("idx") - F.col("_prev") > n))
                           .cast("int"))
               .withColumn("_isl", F.sum("_new").over(
                   w.rowsBetween(Window.unboundedPreceding, 0))))
    return (flagged.groupBy(id_col, "_isl")
            .agg(F.min("idx").alias("span_start"),
                 F.least(F.max("idx") + F.lit(n - 1),
                         F.min("_L") - F.lit(1)).alias("span_end"))
            .select(F.col(id_col),
                    F.col("span_start").cast("long"),
                    F.col("span_end").cast("long"),
                    (F.col("span_end") - F.col("span_start") + 1)
                    .cast("long").alias("n_tokens")))


def remove_duplicate_spans(df: DataFrame, n: int = 8,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           min_docs: int = 2) -> DataFrame:
    """Exact substring dedup, scrub half: rebuild each document with its
    ``duplicate_spans`` removed (Lee et al. 2022 drop the repeated
    substring from all-but-one occurrence; this removes ALL occurrences
    — the conservative form that needs no global occurrence ordering,
    and what decontamination-style scrubbing wants anyway).

    Shape (r15, guide §2.3/§2.4 — aggregate before the shuffle, then go
    map-only): spans fold to ONE per-doc drop-index array (bounded by
    the corpus's duplicated-token volume, never exploded), join back to
    the input per DOC row, and the rebuild is a pure array expression —
    ``array_except(sequence(0, T-1), drop)`` keeps surviving positions
    in order, ``element_at`` rebuilds the text.  The old shape
    posexploded every token twice and shuffled the whole corpus through
    a (doc, idx) anti-join plus a collect_list/sort agg; now the only
    token-granular shuffle left is inside ``duplicate_spans`` itself.
    Span MATCHING is case-insensitive (it reuses ``duplicate_spans``'
    lowercased grams) but the rebuild keeps each surviving token's
    ORIGINAL case — lowercasing never moves a whitespace boundary, so
    the original-case split has the same token positions as the lowered
    one and the drop indices line up.  Whitespace runs do collapse to
    single spaces (tokens rejoin with ``" "``), same as
    ``paragraph_dedup``'s separator rejoin.  Returns
    ``(id_col, text, n_kept, n_removed)`` for every input row."""
    spans = duplicate_spans(df, n, text_col, id_col, min_docs)
    drop = (spans.groupBy(id_col)
            .agg(F.flatten(F.collect_list(
                F.expr("sequence(span_start, span_end)"))).alias("_drop")))
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda t: F.length(t) > 0)
    keep_idx = F.array_except(
        F.when(F.size("_toks") > 0,
               F.sequence(F.lit(0), F.size("_toks") - 1))
        .otherwise(F.array().cast("array<int>")),
        F.coalesce(F.col("_drop"), F.array().cast("array<int>")))
    return (df.select(id_col, toks.alias("_toks"))
            .join(drop, id_col, "left")
            .select(F.col(id_col), F.col("_toks"),
                    F.size("_toks").alias("_total"),
                    keep_idx.alias("_keep"))
            .select(id_col,
                    F.array_join(
                        F.transform("_keep",
                                    lambda i: F.element_at(
                                        "_toks", (i + 1).cast("int"))),
                        " ").alias("text"),
                    F.size("_keep").cast("long").alias("n_kept"),
                    (F.col("_total") - F.size("_keep")).cast("long")
                    .alias("n_removed")))
