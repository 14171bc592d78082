"""Perceptual image hashing + Hamming near-duplicate joins.

The image-side twin of the text near-dup family (minhash/simhash in
operators/dedup.py, operators/text.py): aHash / dHash / pHash over the
decoded-pixel path (operators/codecs.py), then a banded Hamming
self-join with the same pigeonhole shape as simhash — so image near-dup
at corpus scale is one equi-join, never all-pairs.

Scale notes (100 TB story):
* Hashing is mapInPandas over the payload column — embarrassingly
  parallel, one pass, no shuffle.
* The near-dup join explodes each 64-bit hash into (max_distance + 1)
  blocks and equi-joins on (block_id, block_bits); by pigeonhole any
  pair within Hamming distance t shares at least one of t+1 blocks, so
  candidates are exact (no recall loss) and the join is a plain hash
  shuffle on short keys.  Verification (`bit_count(a ^ b) <= t`) is
  pure JVM column math.
* The area-resize used by aHash/dHash is EXACT INTEGER arithmetic
  (cell numerators over a common denominator, never floats), so hashes
  are bit-identical across engines, partitionings and platforms —
  a requirement for using them as dedup keys in a distributed pipeline
  (a float-rounding flip on one executor would split a dup group).

Reference parity: the reference has no image operators (it is a vector
geometry engine); this family belongs to the training-data-pipeline
extension axis alongside minhash/simhash dedup (SURVEY.md LLM-ops
section).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "ahash64", "dhash64", "phash64", "image_hashes",
    "hamming_near_dup_pairs",
]


# ---------------------------------------------------------------------------
# numpy kernels (exact-integer area resize + the three hashes)
# ---------------------------------------------------------------------------
def _gray_i64(img: np.ndarray) -> np.ndarray:
    """uint8 (h,w[,C]) -> int64 (h,w) luma.

    Integer BT.601 (77 R + 150 G + 29 B) >> 8 — the weights sum to 256,
    so a gray input (R=G=B=v) maps to exactly v: no float luma constants
    whose sum might not be exactly 1.0.
    """
    a = np.asarray(img)
    if a.ndim == 2:
        return a.astype(np.int64)
    rgb = a[..., :3].astype(np.int64)
    return (77 * rgb[..., 0] + 150 * rgb[..., 1] + 29 * rgb[..., 2]) >> 8


def _resize_weights(n_src: int, n_out: int) -> np.ndarray:
    """Exact area-average weights as an integer matrix W (n_out, n_src).

    W[c, x] = n_out * |[x, x+1) ∩ [c·n_src/n_out, (c+1)·n_src/n_out)| —
    cell boundaries are multiples of n_src/n_out, so every overlap is a
    multiple of 1/n_out and the scaled weight is an exact integer.
    Each row sums to n_src.
    """
    x = np.arange(n_src + 1, dtype=np.int64)          # pixel edges * n_out
    px_lo = x[:-1] * n_out
    px_hi = x[1:] * n_out
    c = np.arange(n_out + 1, dtype=np.int64)          # cell edges * n_out
    cell_lo = c[:-1] * n_src
    cell_hi = c[1:] * n_src
    lo = np.maximum(px_lo[None, :], cell_lo[:, None])
    hi = np.minimum(px_hi[None, :], cell_hi[:, None])
    return np.maximum(hi - lo, 0)


def _cell_numerators(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Integer cell numerators N (out_h, out_w): true cell mean = N/(h·w).

    All cells share the denominator h·w, so cell-vs-cell and
    cell-vs-global-mean comparisons are exact int64 comparisons.
    """
    h, w = gray.shape
    wy = _resize_weights(h, out_h)
    wx = _resize_weights(w, out_w)
    return wy @ gray @ wx.T


def _pack_bits(bits: np.ndarray) -> int:
    """64 bools (MSB first) -> signed two's-complement int64."""
    u = 0
    for b in bits.reshape(-1).astype(bool):
        u = (u << 1) | int(b)
    if u >= 1 << 63:
        u -= 1 << 64
    return u


def ahash64(img: np.ndarray) -> int:
    """Average hash: 8×8 exact area resize, bit = cell > global mean.

    Integer form: bit[r,c] = 64·N[r,c] > ΣN (common denominator h·w·64).
    """
    n = _cell_numerators(_gray_i64(img), 8, 8)
    return _pack_bits(64 * n > n.sum())


def dhash64(img: np.ndarray) -> int:
    """Difference hash: 8×9 exact area resize, bit = cell > right neighbour."""
    n = _cell_numerators(_gray_i64(img), 8, 9)
    return _pack_bits(n[:, :8] > n[:, 1:])


# orthonormal DCT-II basis for pHash, built once
_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash64(img: np.ndarray) -> int:
    """Perceptual hash: 32×32 area resize → 2-D DCT-II → top-left 8×8
    block, bit = coefficient > median of the 63 AC coefficients.

    Bit 0 (the DC term) is forced to 0, so the hash is invariant to a
    uniform brightness shift (only the DC coefficient moves).
    """
    n = _cell_numerators(_gray_i64(img), 32, 32)
    h, w = _gray_i64(img).shape if img.ndim == 2 else img.shape[:2]
    m = n.astype(np.float64) / (h * w)
    d = _dct_matrix(32)
    coeffs = (d @ m @ d.T)[:8, :8].reshape(-1)
    med = np.median(coeffs[1:])
    bits = coeffs > med
    bits[0] = False
    return _pack_bits(bits)


# ---------------------------------------------------------------------------
# distributed operators
# ---------------------------------------------------------------------------
_HASHERS = {"ahash": ahash64, "dhash": dhash64, "phash": phash64}


def image_hashes(df: DataFrame, methods=("ahash", "dhash", "phash"),
                 decoder: str = "real",
                 payload_col: str = "payload") -> DataFrame:
    """Add one signed-int64 perceptual-hash column per method.

    decoder="real" routes through codecs.decode_any (PNG/JPEG/GIF/BMP/
    PPM); decoder="fake" parses the deterministic FAKE header + w·h
    grayscale body (multimodal.make_fake_media_df payloads).
    mapInPandas: one decode+hash pass per payload, no shuffle.
    """
    methods = tuple(methods)
    unknown = set(methods) - set(_HASHERS)
    if unknown:
        raise ValueError(f"unknown hash methods: {sorted(unknown)}")
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(m, T.LongType()) for m in methods])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_any
        for pdf in batches:
            cols = {m: [] for m in methods}
            for buf in pdf[payload_col]:
                if buf is None:
                    for m in methods:
                        cols[m].append(None)
                    continue
                raw = bytes(buf)
                if decoder == "real":
                    kind, val = decode_any(raw)
                    if kind != "image":
                        for m in methods:
                            cols[m].append(None)
                        continue
                    img = val
                else:
                    magic, w, h, _seed = struct.unpack_from("<4sIII", raw, 0)
                    if magic != b"FAKE":
                        raise ValueError("unknown payload format")
                    img = np.frombuffer(raw, dtype=np.uint8,
                                        offset=16)[:w * h].reshape(h, w)
                for m in methods:
                    cols[m].append(_HASHERS[m](img))
            yield pdf.assign(**cols)

    return df.mapInPandas(run, out_schema)


def hamming_near_dup_pairs(df: DataFrame, hash_col: str = "dhash",
                           max_distance: int = 6,
                           id_col: str = "media_id") -> DataFrame:
    """All id pairs (id_a < id_b) whose 64-bit hashes differ in at most
    `max_distance` bits, as (id_a, id_b, hamming).

    Pigeonhole banding (exact recall): the hash splits into
    B = max_distance + 1 contiguous blocks; distance ≤ t flips at most
    t blocks, so at least one block matches verbatim.  Candidates come
    from one equi-join on (block_id, block_bits); verification is
    bit_count(a ^ b) in the JVM.

    The banded join runs over DISTINCT hashes: exact duplicates (the
    bulk of a real dup corpus) collapse to one representative before
    the join and their id pairs expand afterwards with no join at all
    (distance-0 within-group pairs) — so repeated hashes never multiply
    the candidate volume.

    Scale contract (the probe's honest class is pair-bound): block
    width is 64/(t+1), so for UNIFORM hashes candidates ≈
    Σ_blocks n_distinct²/2^width — the knob is t.  t ≤ 3 gives ≥16-bit
    blocks (the Manku-et-al operating point, fine to ~10^8 distinct
    hashes per band key-space); large t on a large corpus is
    candidate-bound by construction, not by this implementation.
    """
    t = int(max_distance)
    if not 0 <= t <= 63:
        raise ValueError("max_distance must be in [0, 63]")
    nb = t + 1
    base, extra = divmod(64, nb)
    # cache the (id, hash) projection: it is referenced four times below
    # (distinct hashes, both cross sides, within-groups) and its lineage
    # usually contains the decode+hash mapInPandas — without the cache
    # the whole image decode re-runs per reference (r15; the minhash
    # twin has cached its signatures the same way since r7).  One row
    # per image, two longs — bounded at any corpus size.
    ids = (df.select(F.col(id_col).alias("_id"),
                     F.col(hash_col).alias("_h"))
           .where(F.col(hash_col).isNotNull())
           .cache())
    hashes = ids.select("_h").distinct()
    # block b covers `base` bits (+1 for the first `extra` blocks)
    blocks = []
    shift = 0
    for b in range(nb):
        width = base + (1 if b < extra else 0)
        mask = (1 << width) - 1
        blocks.append(
            F.struct(F.lit(b).alias("block_id"),
                     F.shiftrightunsigned(F.col("_h"), shift)
                     .bitwiseAND(F.lit(mask)).alias("block_bits")))
        shift += width
    keyed = (hashes
             .select("_h", F.explode(F.array(*blocks)).alias("blk"))
             .select("_h", "blk.block_id", "blk.block_bits"))
    a = keyed.select(F.col("block_id").alias("bid"),
                     F.col("block_bits").alias("bbits"),
                     F.col("_h").alias("h_a"))
    b = keyed.select(F.col("block_id").alias("bid"),
                     F.col("block_bits").alias("bbits"),
                     F.col("_h").alias("h_b"))
    hash_pairs = (a.join(b, ["bid", "bbits"])
                  .where(F.col("h_a") < F.col("h_b"))
                  .select("h_a", "h_b",
                          F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
                          .alias("hamming"))
                  .where(F.col("hamming") <= t)
                  .distinct())
    # expand distinct-hash pairs back to id pairs (cross of the two
    # hash groups; group sizes are dup multiplicities)
    ia = ids.select(F.col("_h").alias("h_a"), F.col("_id").alias("id_a"))
    ib = ids.select(F.col("_h").alias("h_b"), F.col("_id").alias("id_b"))
    cross = (hash_pairs.join(ia, "h_a").join(ib, "h_b")
             .select(F.least("id_a", "id_b").alias("id_a"),
                     F.greatest("id_a", "id_b").alias("id_b"), "hamming"))
    # distance-0 pairs inside each identical-hash group — no join
    within = (ids.groupBy("_h")
              .agg(F.collect_list("_id").alias("_ids"))
              .where(F.size("_ids") > 1)
              .select(F.explode(F.expr(
                  "filter(transform(flatten(transform(_ids, a -> "
                  "transform(_ids, b -> struct(a, b)))), p -> "
                  "struct(least(p.a, p.b) AS id_a, "
                  "greatest(p.a, p.b) AS id_b)), p -> p.id_a < p.id_b)"))
                  .alias("p"))
              .select("p.id_a", "p.id_b", F.lit(0).alias("hamming"))
              .distinct())
    return cross.union(within.select(
        "id_a", "id_b", F.col("hamming").cast(cross.schema["hamming"]
                                              .dataType)))
