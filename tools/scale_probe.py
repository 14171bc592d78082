"""Scale-linearity probe (VERDICT r6 ask #3).

The per-round bench only measures sf0.1, so a hidden superlinearity
(the r4 O(L^2) tokenizer class of bug) stays invisible until it is a
100x claim.  This tool synthesizes statistically-similar corpora at
1x / 2x / 4x the sf0.1 row counts, times the expensive queries at each
scale (min-of-2), fits the time-vs-rows exponent on a log-log least
squares, and asserts the map/agg-shaped queries stay <= MAX_EXP.

Synthesis, not replication, for text: replicating documents k-times
creates k-cliques of exact/near duplicates, which blows up every pair
generator quadratically in a way natural growth does not.  Instead
documents are re-drawn from the original corpus's word-frequency and
length distributions (with the original's ~1% exact-dup / ~1% near-dup
rates injected proportionally), embeddings are re-drawn with the same
near-dup rate, customers get fresh keys (their lon/lat derive from the
key, so new keys spread naturally), and events replicate with fresh
user ids (new users, the natural growth axis).  All other tables
symlink to sf0.1.

Usage:
    python tools/scale_probe.py [--scales 1,2,4] [--out /tmp/scale_probe]

Prints a markdown table (paste into SCALE.md) and exits 1 if any
linear-class query's exponent exceeds MAX_EXP.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
MAX_EXP = 1.5

# query -> (expected class, rationale recorded in the table)
PROBES = {
    "dsir_weights": ("linear", "map-only scoring vs broadcast model"),
    "lm_perplexity": ("linear", "broadcast count tables, map-side aggs"),
    "scrub_spans": ("linear", "shared-gram islands; dup volume scales 1x"),
    "line_dedup_doc": ("linear", "per-doc keyed aggs"),
    "corpus_stats": ("linear", "keyed aggs + exact percentiles"),
    "tf_idf": ("linear", "two keyed aggs + top-n window per doc"),
    "minhash_pairs": ("linear", "sig gen linear; banded pairs ~ dup rate"),
    "dedup_clusters": ("linear", "gram pairs + CC over dup candidates"),
    "simhash_pairs": ("pair-bound", "pigeonhole block join; near-collision"
                      " volume grows with corpus density"),
    "ngram_jaccard": ("pair-bound", "exact mode (max_df=None): candidates"
                      " = docs sharing any gram"),
    "knn_join": ("pair-bound", "radius-bounded pairs grow with point"
                 " density (fixed world, more points)"),
    "semantic_dedup": ("pair-bound", "exact chunked-GEMM mode is O(n^2)"
                       " by contract; LSH mode is the scale path"),
    "funnel": ("linear", "one keyed agg + per-user fold"),
    "contamination": ("linear", "corpus grams vs broadcast benchmark"),
    # --- spatial heavies (VERDICT r7 ask #5) ---
    "within_distance": ("linear", "pure-column bbox prefilter + exact"
                        " spherical refine, map-only"),
    "spatial_join": ("linear", "points x 25 fixed nation cells;"
                     " matches per point bounded"),
    "polygon_join": ("linear", "parcel diamonds x 25 fixed zone rects;"
                     " vectorized refine per distinct zone"),
    "density_islands_full": ("pair-bound", "fixed world, kx points -> kx"
                             " density: threshold-graph edges grow ~k^2;"
                             " CC itself is near-linear in edges"),
    "pipeline_e2e": ("linear", "chained gates; dup rates injected"
                     " proportionally by synthesis"),
    "dedup_against_inc": ("linear", "map-only bloom pre-pass + banded"
                          " minhash on survivors; dup rate proportional"),
    # --- ANN paths (VERDICT r8 ask #8) ---
    "knn_cosine_q8": ("linear", "int8 quantized scan + exact rescore of"
                      " the top candidates; fixed probe count"),
    "ivf_knn": ("linear", "IVF write + cell-pruned search; probes read"
                " a fixed cell fraction of a kx corpus"),
    # --- iterative operators (r9 fourth wave) ---
    "kmeans_embed": ("linear", "map-only GEMM assignment under broadcast"
                     " centroids; update shuffles kxdim partial sums"),
    "pagerank_scaled": ("linear", "per-step: one edges(join)ranks shuffle"
                        " + one groupBy(dst); graph synthesized kx"),
    # --- r9 sixth/eighth waves ---
    "quantile_sketch": ("linear", "map-only partition sketches (k rows"
                        " out per partition) + one tiny merge task"),
    "weighted_sample": ("linear", "map pass + distributed top-n"
                        " (TakeOrderedAndProject)"),
    "triangle_counts": ("linear", "degree-oriented wedge join caps"
                        " out-degree at O(sqrt(m)); the gate graph has"
                        " constant degree ~6 so candidates ~ m"),
    "pq_knn": ("linear", "ADC scan reads m code bytes per row; fixed"
               " candidate cut + rescore"),
    "pca_project": ("linear", "one Gram-partial pass + map-only"
                    " projection; shuffle carries dim^2 per partition"),
    "st_transform_tm": ("linear", "pure per-point map through the"
                        " Krueger series kernel"),
    "subdivide_scaled": ("linear", "per-polygon recursion depth fixed by"
                         " the vertex cap; convex fast path is O(n) per"
                         " cut"),
    "hamming_join_scaled": ("pair-bound", "t=8 -> 7-bit blocks: for"
                            " uniform hashes candidates ~ 9*n_d^2/128"
                            " by construction (n_d = distinct hashes;"
                            " exact dups collapse before the join)."
                            " The knob is t: t<=3 gives >=16-bit"
                            " blocks, the Manku operating point"),
    # --- r9 twentieth-twenty-third waves ---
    "bm25_retrieval": ("linear", "postings = one keyed agg; fixed query"
                       " set broadcast against them; per-query top-k"),
    "cdc_chunks_full": ("linear", "map-only position explode + per-doc"
                        " boundary window"),
    "kn_perplexity": ("linear", "broadcast KN count tables; map-side"
                      " per-doc aggs"),
    "kmv_distinct": ("linear", "one (src, hash) distinct + bottom-k"
                     " window over <=k survivors per group"),
    "dbscan_scaled": ("pair-bound", "fixed world, kx points: eps-graph"
                      " edges grow ~k^2 (same class as"
                      " density_islands_full); CC + degree agg are"
                      " near-linear in edges"),
    # --- r9 twenty-sixth..thirty-first waves ---
    "card_scrub": ("linear", "map-only regex candidates + integer Luhn"
                   " fold per candidate"),
    "ppl_buckets": ("linear", "KN scoring pass + per-lang ntile over"
                    " the scored rows"),
    "decontam_retrieval": ("linear", "BM25 probe (postings keyed agg)"
                           " + top-10 join + token-set intersect"),
    "scc_scaled": ("linear", "2-hash digraph over ALL scaled customers"
                   " (~2 edges/node); at probe sizes the edge list is"
                   " under the driver-Tarjan short-circuit — one"
                   " collect of E + linear Tarjan (the distributed"
                   " FW-BW path is pinned separately by test)"),
    # --- r10 ---
    "geodesic_full": ("linear", "per-segment vectorized 8-step Vincenty"
                      " kernel over ALL scaled order paths (the gate"
                      " caps at 1000 orders); pure map work"),
    # --- r11 (VERDICT r10 ask #9: probe the media/CRS additions) ---
    "st_transform_osgb": ("linear", "per-point map through the"
                          " ECEF→Helmert→Bowring→Krüger chain"
                          " (uniform-batch numpy fast path); the gate"
                          " itself reads ALL customers, so it probes"
                          " directly"),
    "geodesic_pairs_full": ("linear", "guarded Vincenty inverse over"
                            " ALL scaled consecutive-customer pairs"
                            " (the gate caps at 1501 keys); one"
                            " broadcast-able self-join + map work"),
    "media_mc_scaled": ("linear", "avc1 MC decode over a container"
                        " count scaled with the corpus (24 per 15k"
                        " customers); per-file decode, mapInPandas"
                        " parallel"),
    "aac_huff_scaled": ("linear", "AAC Huffman decode + IMDCT over a"
                        " container count scaled with the corpus;"
                        " per-file decode, mapInPandas parallel"),
    # --- r11 third wave ---
    "mvt_export": ("linear", "tile assignment + in-tile integers are"
                   " codegen Columns; per-tile protobuf pack over a"
                   " FIXED 64-tile world at z=3 (collect bounded)"),
    "st_transform_registry": ("linear", "per-point map through 4 kernel"
                              " families; 7 unioned pure-Column blocks"),
    "st_transform_lccd": ("linear", "per-point Helmert + conic map"
                          " (the tmd-class chain with an LCC tail)"),
    "mm_pipeline_scaled": ("pair-bound", "decode/resize/hash map-only;"
                           " banded pairs ~ twin rate (one twin per"
                           " base image, so pairs scale ~linearly)"),
    "tile_stream_scaled": ("linear", "windowed tile counts = one"
                           " partial-agg window group-by over events"),
    "st_transform_rd": ("linear", "per-point map through the"
                        " ECEF→Helmert→Bowring→conformal-sphere"
                        " stereographic chain (uniform-batch numpy"
                        " fast path); the gate reads ALL customers,"
                        " so it probes directly"),
    "media_pres_scaled": ("linear", "avc1 MC+residual decode (CAVLC"
                          " cbp=15 parse + dequant/inverse-transform"
                          " per MB) over a container count scaled"
                          " with the corpus; per-file mapInPandas"),
    "dedup_stream_scaled": ("linear", "streaming exact dedup with BOTH"
                            " the replayed row count and the distinct-"
                            "key domain (= state-store size) riding"
                            " the scale; 4 micro-batches, state ="
                            " one 16-byte fingerprint per distinct"
                            " key inside the horizon"),
    # --- r14 ---
    "within_cql": ("linear", "layer write + composed window/property"
                   " manifest prune + spherical refine over ALL"
                   " scaled customers (the gate reads the full"
                   " table through Layer.add, so it probes"
                   " directly; candidate set ~ fixed window"
                   " fraction of the corpus)"),
}


def _probe_density_islands_full(spark, sf_dir):
    """density_islands over the FULL scaled customer point set (the
    registered gate caps input at 300 rows for its oracle, which would
    hide any growth)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from spatial_spark.operators.agg import density_islands
    pts = (entry._cust_point_geoms(spark)
           .withColumnRenamed("c_custkey", "id"))
    labels = density_islands(pts, density=2.0)
    return (labels.groupBy("island")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .groupBy("n_members").agg(F.count(F.lit(1)).alias("n_islands")))


def _probe_pagerank_scaled(spark, sf_dir):
    """PageRank over a graph that actually SCALES with the dir (the
    registered gate's orders/lineitem tables are symlinked, i.e.
    constant): nodes = the scaled customer keys plus an equal-size dst
    space, edges = 3 deterministic hash links per customer, both
    directions — |V| and |E| grow kx while degrees stay ~6."""
    from pyspark.sql import functions as F

    from spatial_spark.operators.graph import pagerank
    cust = spark.table("customer").select("c_custkey")
    n = cust.count()
    e1 = cust.select(
        F.col("c_custkey").alias("src"),
        (F.lit(10_000_000)
         + (F.col("c_custkey") * 2654435761) % n).alias("dst"))
    for mult in (40503, 2654435769):
        e1 = e1.union(cust.select(
            F.col("c_custkey").alias("src"),
            (F.lit(10_000_000)
             + (F.col("c_custkey") * mult) % n).alias("dst")))
    edges = e1.union(e1.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
    return pagerank(edges, iters=3)


def _probe_hamming_join_scaled(spark, sf_dir):
    """hamming_near_dup_pairs over a hash table that scales with the
    corpus (the registered image gates run a fixed 96-image fixture):
    one xxhash64 per document stands in for its perceptual hash —
    random 64-bit values collide within t=8 bits only for the injected
    exact-dup pairs, so the banded join's candidate volume tracks the
    dup rate, the shape under probe."""
    from pyspark.sql import functions as F

    from spatial_spark.operators.imagehash import hamming_near_dup_pairs
    hashes = spark.table("documents").select(
        F.col("doc_id").alias("media_id"),
        F.xxhash64("text").alias("dhash"))
    return hamming_near_dup_pairs(hashes, max_distance=8)


def _probe_subdivide_scaled(spark, sf_dir):
    """st_subdivide over the FULL scaled customer point set turned into
    densified squares (the registered gate caps at 300 part rects, a
    constant)."""
    from pyspark.sql import functions as F

    sub = spark.sql("""
        SELECT c_custkey,
               explode(st_subdivide(st_densify(st_geomfromtext(
                 concat('POLYGON ((', x0, ' ', y0, ', ', x0 + 4, ' ', y0,
                        ', ', x0 + 4, ' ', y0 + 4, ', ', x0, ' ', y0 + 4,
                        ', ', x0, ' ', y0, '))')), 0.4), 16)) AS piece
        FROM (SELECT c_custkey,
                     CAST((c_custkey * 7919) % 3000 AS DOUBLE) / 10.0 AS x0,
                     CAST((c_custkey * 104729) % 1500 AS DOUBLE) / 10.0 AS y0
              FROM customer)
    """)
    return sub.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("n_pieces"))


def _probe_dbscan_scaled(spark, sf_dir):
    """DBSCAN over the FULL scaled customer point set (the registered
    gate caps at 300 rows for its recursive-CTE oracle)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from spatial_spark.operators.agg import dbscan
    pts = (entry._cust_point_geoms(spark)
           .withColumnRenamed("c_custkey", "id"))
    out = dbscan(pts, eps=2.0, min_pts=4)
    return (out.groupBy("role")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("cluster").alias("n_clusters")))


def _probe_cdc_chunks_full(spark, sf_dir):
    """cdc_chunks over the WHOLE scaled corpus (the gate caps doc_id
    <= 200 for oracle tractability)."""
    import __spark_entry__ as entry
    from spatial_spark.operators.cdc import cdc_chunks
    return cdc_chunks(entry._norm_documents(spark), k=8, divisor=64)


def _probe_geodesic_full(spark, sf_dir):
    """st_length_geodesic over EVERY scaled order path (the gate caps
    at l_orderkey <= 1000; the probe rides the full corpus)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    return entry._order_paths(spark).select(
        "l_orderkey",
        F.expr("CAST(round(st_length_geodesic(geom) * 100) AS BIGINT)")
        .alias("len_cm"))


def _probe_scc_scaled(spark, sf_dir):
    """SCC over a digraph that scales with the dir: 2 deterministic
    hash edges per scaled customer key (same construction as the
    scc_components gate without its 200-node oracle cap)."""
    from pyspark.sql import functions as F

    from spatial_spark.operators.graph import strongly_connected_components
    cust = spark.table("customer").select("c_custkey")
    n = cust.count()
    e = cust.select(F.col("c_custkey").alias("src"),
                    ((F.col("c_custkey") * 31 + 7) % n).alias("dst"))
    e = e.union(cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("src"),
        ((F.col("c_custkey") * 17 + 3) % n).alias("dst")))
    labels = strongly_connected_components(e)
    return (labels.groupBy("scc").agg(F.count(F.lit(1)).alias("sz"))
            .groupBy("sz").agg(F.count(F.lit(1)).alias("n_sccs")))


def _probe_geodesic_pairs_full(spark, sf_dir):
    """st_distance_geodesic over ALL scaled consecutive-customer pairs
    (the gate caps at c_custkey <= 1501)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    n = spark.table("customer").count()
    return spark.sql(entry._pair_points_sql(limit=n)).select(
        "k",
        F.expr("CAST(round(st_distance_geodesic("
               "st_point(lon1, lat1), st_point(lon2, lat2)) * 100) "
               "AS BIGINT)").alias("dist_cm"))


def _scaled_media_count(spark) -> int:
    # 24 containers per 15k customers (the sf0.1 gate density)
    return max(24, int(24 * spark.table("customer").count() / 15000))


def _probe_media_mc_scaled(spark, sf_dir):
    """media_avc_mc's decode with the CONTAINER COUNT riding the scale
    factor (the gate builds a fixed 24)."""
    import struct as _struct

    import numpy as np
    from pyspark.sql import functions as F

    from spatial_spark.operators.codecs import (build_avcc, build_h264_sps,
                                                build_mp4,
                                                encode_h264_ipcm,
                                                encode_h264_pmv)
    from spatial_spark.operators.multimodal import MEDIA_SCHEMA, mp4_frames
    rows = []
    for i in range(_scaled_media_count(spark)):
        w, h = 48 + 16 * (i % 3), 32 + 16 * (i % 2)
        dx, dy = 2 * ((i % 5) - 2), 2 * ((i % 3) - 1)
        v = (np.arange(w)[None, :] + 2 * np.arange(h)[:, None])
        img = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
        idr = encode_h264_ipcm(img)
        p1 = encode_h264_pmv(w, h, 1, mv=(4 * dx, 4 * dy))
        p2 = encode_h264_pmv(w, h, 2, mv=(0, 0))
        nals = [_struct.pack(">I", len(n)) + n for n in (idr, p1, p2)]
        rows.append((i, bytearray(build_mp4(
            w, h, 0, 1000, 40, codec="avc1", samples=nals,
            codec_config=build_avcc(build_h264_sps(w, h)))),
            "video", "mp4", w, h, None))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32)
    return mp4_frames(df).select(
        "media_id", "frame_no",
        F.round("mean_intensity", 6).alias("mean_intensity"))


def _probe_aac_huff_scaled(spark, sf_dir):
    """media_aac_huff's decode with the container count riding the
    scale factor."""
    import numpy as np
    from pyspark.sql import functions as F

    from spatial_spark.operators.codecs import (build_aac_asc, build_esds,
                                                build_mp4,
                                                encode_aac_lc_spectral,
                                                engine_codebooks)
    from spatial_spark.operators.multimodal import MEDIA_SCHEMA, mp4_audio
    cbs = engine_codebooks()
    rows = []
    for i in range(_scaled_media_count(spark)):
        frames = []
        for f in range(2 + i % 3):
            gg = 90 + (i * 11 + 5 * f) % 21
            band_cbs = [3, 5, 7, 11]
            band_sfs = [gg + ((i + f + b) % 9 - 4) for b in range(4)]
            q = np.zeros(1024, dtype=np.int64)
            for s in range(32):
                q[s] = ((i + f + s) % 3) * (1 if (s + f) % 2 == 0 else -1)
                q[32 + s] = (i + 2 * f + 3 * s) % 9 - 4
                q[64 + s] = ((2 * i + f + s) % 8) * (1 if (s + i) % 2
                                                     else -1)
                mag = (17 + (i + f + s) % 20) if s % 8 == 0 \
                    else (i + 2 * s) % 16
                q[96 + s] = mag * (1 if (s + i + f) % 2 == 0 else -1)
            frames.append(encode_aac_lc_spectral(
                q, band_cbs, band_sfs, gg, cbs, window_shape=f % 2))
        rows.append((i, bytearray(build_mp4(
            1, 44100, len(frames), 44100, 1024, codec="mp4a",
            handler="soun", samples=frames,
            codec_config=build_esds(build_aac_asc(2, 44100, 1)))),
            "audio", "mp4", None, None, None))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32)
    return (mp4_audio(df, codebooks=cbs, spectral_stats=True)
            .select("media_id", "frame_no", "n_nonzero",
                    F.round("deq_l1", 3).alias("deq_l1_q3")))


def _probe_media_pres_scaled(spark, sf_dir):
    """media_avc_pres's decode with the CONTAINER COUNT riding the
    scale factor (the gate builds a fixed 24): every P macroblock
    carries a motion vector AND CAVLC luma residuals."""
    import struct as _struct

    import numpy as np
    from pyspark.sql import functions as F

    from spatial_spark.operators.codecs import (build_avcc, build_h264_sps,
                                                build_mp4,
                                                encode_h264_ipcm,
                                                encode_h264_pres)
    from spatial_spark.operators.multimodal import MEDIA_SCHEMA, mp4_frames
    rows = []
    for i in range(_scaled_media_count(spark)):
        w, h = 48 + 16 * (i % 3), 32 + 16 * (i % 2)
        mbw, mbh = w // 16, h // 16
        dx, dy = 2 * ((i % 5) - 2), 2 * ((i % 3) - 1)
        v = 16 + (np.arange(w)[None, :] + 2 * np.arange(h)[:, None])
        img = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
        resid = 4 * (((np.arange(mbw)[None, :] + np.arange(mbh)[:, None]
                       + i) % 5) - 2)
        idr = encode_h264_ipcm(img)
        p1 = encode_h264_pres(w, h, 1, mv=(4 * dx, 4 * dy),
                              residuals=resid)
        p2 = encode_h264_pres(w, h, 2, mv=(0, 0),
                              residuals=np.full((mbh, mbw), 4))
        nals = [_struct.pack(">I", len(n)) + n for n in (idr, p1, p2)]
        rows.append((i, bytearray(build_mp4(
            w, h, 0, 1000, 40, codec="avc1", samples=nals,
            codec_config=build_avcc(build_h264_sps(w, h)))),
            "video", "mp4", w, h, None))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32)
    return mp4_frames(df).select(
        "media_id", "frame_no",
        F.round("mean_intensity", 6).alias("mean_intensity"))


def _probe_dedup_stream_scaled(spark, sf_dir):
    """dedup_stream with the replayed ROW COUNT and the distinct-KEY
    domain both riding the scale (the gate caps at 2000 docs / 97
    keys): state-store growth is the scaling axis that matters for
    streaming dedup, so the key domain is n_docs/20."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spatial_spark.streaming.dedup import dedup_stream
    work = tempfile.mkdtemp(prefix="dedup_stream_probe_")
    try:
        src = os.path.join(work, "src")
        docs = spark.table("documents")
        n_keys = max(97, docs.count() // 20)
        docs = (docs.select(
                    "doc_id",
                    F.concat(F.lit("content-"),
                             (F.col("doc_id") % n_keys).cast("string"))
                    .alias("text"),
                    F.timestamp_millis(F.col("doc_id") * 60000)
                    .alias("ts"))
                .withColumn("_slice", F.ntile(4).over(
                    Window.orderBy("ts", "doc_id"))))
        for b in range(1, 5):
            (docs.filter(F.col("_slice") == b).drop("_slice")
             .coalesce(1)
             .write.mode("overwrite").parquet(os.path.join(src, f"b{b}")))
        stream = (spark.readStream
                  .schema("doc_id bigint, text string, ts timestamp")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src + "/b*"))
        out_dir = os.path.join(work, "out")
        q = (dedup_stream(stream, text_col="text", ts_col="ts",
                          delay="365 days")
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", os.path.join(work, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(1200)
        return spark.createDataFrame(
            [(spark.read.parquet(out_dir).count(),)], "n bigint")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _probe_mm_pipeline_scaled(spark, sf_dir):
    """image_dedup_pipeline with the IMAGE COUNT riding the scale
    factor (the gate builds a fixed 64): base+twin two-tone GIFs, the
    full decode -> resize -> dHash -> banded pairs -> CC -> keep
    chain."""
    import numpy as np

    from spatial_spark.operators.codecs import encode_gif
    from spatial_spark.operators.multimodal import MEDIA_SCHEMA
    from spatial_spark.pipelines import image_dedup_pipeline
    rows = []
    for i in range(_scaled_media_count(spark)):
        m = (3, 5, 7)[i % 3]
        w = 8 * m
        h = 5 + i % 4
        wa = 1 + (i * 5) % (w - 1)
        wa2 = wa + 1 if wa + 1 <= w - 1 else wa - 1
        u = (i * 23) % 96
        v = u + 16 * (1 + (i * 7) % 9)
        for mid, wax in ((i, wa), (100000 + i, wa2)):
            img = np.zeros((h, w, 3), dtype=np.uint8)
            img[:, :wax] = v
            img[:, wax:] = u
            rows.append((mid, bytearray(encode_gif(img)), "image",
                         "gif", w, h, None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32)
    return image_dedup_pipeline(media, 8, 4, "dhash", 16)["result"]


def _probe_tile_stream_scaled(spark, sf_dir):
    """windowed_tile_counts over the FULL scaled events table (batch
    formulation — the streaming twin adds fixed micro-batch machinery,
    not data-volume cost, per the r11 streaming-gate analysis)."""
    from pyspark.sql import functions as F

    from spatial_spark.operators.tiles import windowed_tile_counts
    ev = spark.table("events").select(
        "ts",
        F.expr("(CAST((event_id * 7919) % 3600 AS DOUBLE) / 10.0"
               " - 180.0)").alias("lon"),
        F.expr("(CAST((event_id * 104729) % 1700 AS DOUBLE) / 10.0"
               " - 85.0)").alias("lat"))
    return windowed_tile_counts(ev, 6)


CUSTOM_PROBES = {
    "mm_pipeline_scaled": _probe_mm_pipeline_scaled,
    "tile_stream_scaled": _probe_tile_stream_scaled,
    "density_islands_full": _probe_density_islands_full,
    "media_pres_scaled": _probe_media_pres_scaled,
    "dedup_stream_scaled": _probe_dedup_stream_scaled,
    "geodesic_pairs_full": _probe_geodesic_pairs_full,
    "media_mc_scaled": _probe_media_mc_scaled,
    "aac_huff_scaled": _probe_aac_huff_scaled,
    "dbscan_scaled": _probe_dbscan_scaled,
    "scc_scaled": _probe_scc_scaled,
    "cdc_chunks_full": _probe_cdc_chunks_full,
    "pagerank_scaled": _probe_pagerank_scaled,
    "hamming_join_scaled": _probe_hamming_join_scaled,
    "subdivide_scaled": _probe_subdivide_scaled,
    "geodesic_full": _probe_geodesic_full,
}


def _load_base():
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{BASE}/documents.parquet")
    return docs.to_pydict()


def synth_documents(out, k, rng):
    import pyarrow as pa
    import pyarrow.parquet as pq
    base = _load_base()
    texts = base["text"]
    langs = base["lang"]
    sources = sorted(set(base["source"]))
    # empirical word distribution + doc length distribution
    from collections import Counter
    cnt = Counter()
    lengths = []
    for t in texts:
        toks = t.split()
        lengths.append(len(toks))
        cnt.update(toks)
    vocab = np.array(list(cnt.keys()))
    probs = np.array(list(cnt.values()), dtype=np.float64)
    probs /= probs.sum()
    lengths = np.array(lengths)
    n = len(texts) * k
    ls = rng.choice(lengths, size=n)
    flat = rng.choice(vocab, size=int(ls.sum()), p=probs)
    docs, pos = [], 0
    for L in ls:
        docs.append(" ".join(flat[pos:pos + L]))
        pos += L
    # inject proportional exact (1%) and near (1%) duplicates
    n_dup = max(n // 100, 1)
    src_idx = rng.integers(0, n, size=2 * n_dup)
    dst_idx = rng.integers(0, n, size=2 * n_dup)
    for i in range(n_dup):          # exact copies
        docs[dst_idx[i]] = docs[src_idx[i]]
    for i in range(n_dup, 2 * n_dup):   # near copies: perturb ~5% of tokens
        toks = docs[src_idx[i]].split()
        if not toks:
            continue
        m = max(len(toks) // 20, 1)
        for j in rng.integers(0, len(toks), size=m):
            toks[j] = str(vocab[rng.integers(0, len(vocab))])
        docs[dst_idx[i]] = " ".join(toks)
    lang_pool = np.array(langs)
    tbl = pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(rng.choice(lang_pool, size=n), pa.string()),
        "source": pa.array(rng.choice(sources, size=n), pa.string()),
        "n_chars": pa.array([len(d) for d in docs], pa.int64()),
    })
    pq.write_table(tbl, out)


def synth_embeddings(out, k, rng):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.parquet as _pq
    base = _pq.read_table(f"{BASE}/embeddings.parquet")
    n0 = base.num_rows
    dim = len(base.column("embedding")[0])
    n = n0 * k
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    n_dup = max(n // 50, 1)     # ~2% near-dups
    src = rng.integers(0, n, size=n_dup)
    dst = rng.integers(0, n, size=n_dup)
    vecs[dst] = vecs[src] + rng.standard_normal(
        (n_dup, dim)).astype(np.float32) * 0.01
    tbl = pa.table({
        "vec_id": pa.array(range(1, n + 1), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 8).astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, out)


def synth_customer(out, k, rng):
    import pyarrow as pa
    import pyarrow.parquet as pq
    base = pq.read_table(f"{BASE}/customer.parquet")
    n = base.num_rows * k
    seg_pool = np.array(base.column("c_mktsegment").to_pylist())
    keys = np.arange(1, n + 1, dtype=np.int64)
    tbl = pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in keys], pa.string()),
        "c_nationkey": pa.array((keys % 25).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-999.99, 9999.99, size=n), 2), pa.float64()),
        "c_mktsegment": pa.array(rng.choice(seg_pool, size=n), pa.string()),
    })
    pq.write_table(tbl, out)


def synth_events(out, k, rng):
    import pyarrow as pa
    import pyarrow.parquet as pq
    base = pq.read_table(f"{BASE}/events.parquet")
    n0 = base.num_rows
    uid = np.asarray(base.column("user_id"))
    max_uid = int(uid.max())
    max_eid = int(np.asarray(base.column("event_id")).max())
    ts = base.column("ts").cast(pa.int64()).to_numpy()  # ns
    cols = {c: base.column(c).to_pylist()
            for c in ("event_type", "value", "props")}
    parts = []
    for rep in range(k):
        parts.append(pa.table({
            "event_id": pa.array(
                np.asarray(base.column("event_id")) + rep * max_eid,
                pa.int64()),
            "ts": pa.array(ts + rep * 1_000_000, pa.timestamp("ns")),
            "user_id": pa.array(uid + rep * max_uid, pa.int64()),
            "event_type": pa.array(cols["event_type"], pa.string()),
            "value": pa.array(cols["value"], pa.float64()),
            "props": pa.array(cols["props"], pa.string()),
        }))
    pq.write_table(pa.concat_tables(parts), out)


def synth_lineitem(out, k):
    """k× lineitem: replicas shift l_orderkey past the base max (k× more
    ORDER PATHS for the geodesic/path probes) while keeping
    l_partkey/l_suppkey/l_linenumber — path shapes stay representative,
    path COUNT scales."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    base = pq.read_table(f"{BASE}/lineitem.parquet")
    ok = np.asarray(base.column("l_orderkey"))
    max_ok = int(ok.max()) + 1
    parts = []
    for rep in range(k):
        cols = {n: base.column(n) for n in base.column_names}
        cols["l_orderkey"] = pa.array(ok + rep * max_ok, pa.int64())
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), out)


def build_scale_dir(root, k, seed=42):
    d = os.path.join(root, f"x{k}")
    if os.path.exists(os.path.join(d, ".done")):
        return d
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f.split(".")[0] not in (
                "documents", "embeddings", "customer", "events",
                "lineitem"):
            dst = os.path.join(d, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(BASE, f), dst)
    rng = np.random.default_rng(seed + k)
    synth_documents(os.path.join(d, "documents.parquet"), k, rng)
    synth_embeddings(os.path.join(d, "embeddings.parquet"), k, rng)
    synth_customer(os.path.join(d, "customer.parquet"), k, rng)
    synth_events(os.path.join(d, "events.parquet"), k, rng)
    synth_lineitem(os.path.join(d, "lineitem.parquet"), k)
    open(os.path.join(d, ".done"), "w").write("ok")
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,4")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    import __spark_entry__ as entry
    from spatial_spark.session import get_spark
    spark = get_spark("scale_probe")
    qs = entry.queries()
    names = args.queries or list(PROBES)

    dirs = {k: build_scale_dir(args.out, k) for k in scales}
    times: dict = {}
    def heap_pools(reset=False):
        """Per-probe PEAK JVM heap via MemoryPoolMXBean (VERDICT r8 ask
        #8): resetPeakUsage() before a probe, sum of heap pools'
        getPeakUsage() after — in local mode this JVM IS the executor,
        so it is the true per-probe executor peak."""
        mf = spark._jvm.java.lang.management.ManagementFactory
        it = mf.getMemoryPoolMXBeans().iterator()
        total = 0
        while it.hasNext():
            b = it.next()
            if b.getType().toString() != "Heap memory":
                continue
            if reset:
                b.resetPeakUsage()
            else:
                u = b.getPeakUsage()
                if u is not None:
                    total += u.getUsed()
        return total

    peaks: dict = {}
    for k in scales:
        entry._setup(spark, dirs[k])
        spark.sql("SELECT count(*) FROM documents").collect()  # warm
        for name in names:
            fn = CUSTOM_PROBES.get(name) or qs[name]
            best = None
            heap_pools(reset=True)
            for _ in range(2):
                t0 = time.time()
                (fn(spark, dirs[k])
                 .write.format("noop").mode("overwrite").save())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            peak_mb = heap_pools() / (1 << 20)
            times.setdefault(name, {})[k] = best
            peaks.setdefault(name, {})[k] = peak_mb
            print(f"# x{k} {name}: {best:.2f}s peak={peak_mb:.0f}MB",
                  file=sys.stderr)

    print("| query | class | " + " | ".join(f"x{k}" for k in scales)
          + " | exponent | " + " | ".join(f"peak x{k}" for k in scales)
          + " | note |")
    print("|---|---|" + "---|" * (2 * len(scales) + 2))
    failed = []
    for name in names:
        cls, note = PROBES.get(name, ("linear", ""))
        xs = np.log([float(k) for k in scales])
        ys = np.log([times[name][k] for k in scales])
        exp = (float(np.polyfit(xs, ys, 1)[0]) if len(scales) > 1
               else float("nan"))
        cells = " | ".join(f"{times[name][k]:.2f}s" for k in scales)
        pcells = " | ".join(f"{peaks[name][k]:.0f}M" for k in scales)
        flag = ""
        if cls == "linear" and exp > MAX_EXP:
            failed.append((name, exp))
            flag = " **EXCEEDS**"
        print(f"| {name} | {cls} | {cells} | {exp:.2f}{flag} | {pcells} "
              f"| {note} |")
    if failed:
        print(f"# FAILED: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
