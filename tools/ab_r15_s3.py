"""Interleaved A/B for the r15 session-3 package-level changes
(dedup.py caches, layer.add persist) — OLD modules side-loaded from git
HEAD under alternate names in the SAME session, variants alternated
per rep so ambient throttling hits both equally (guide §1).

    python tools/ab_r15_s3.py <sf_dir> <reps> [query ...]
"""
import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _load_old(rel_path, mod_name):
    # written INTO the package dir (uncommitted) so executor Python
    # workers can import it by dotted name when a UDF pickles by ref
    src = subprocess.check_output(
        ["git", "-C", ROOT, "show", f"HEAD:{rel_path}"]).decode()
    path = os.path.join(ROOT, *mod_name.split(".")[:-1],
                        mod_name.split(".")[-1] + ".py")
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(mod_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from spatial_spark.session import get_spark
    spark = get_spark("ab_r15_s3")
    entry._setup(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    spark.sql("SELECT st_area(st_geomfromtext('POINT (0 0)'))").collect()

    old_dedup = _load_old("spatial_spark/operators/dedup.py",
                          "spatial_spark.operators._old_dedup")
    old_layer = _load_old("spatial_spark/layer.py",
                          "spatial_spark._old_layer")
    old_graph = _load_old("spatial_spark/operators/graph.py",
                          "spatial_spark.operators._old_graph")
    old_lm = _load_old("spatial_spark/operators/lm.py",
                       "spatial_spark.operators._old_lm")
    import spatial_spark.layer as new_layer
    import spatial_spark.operators.dedup as new_dedup
    import spatial_spark.operators.graph as new_graph
    import spatial_spark.operators.lm as new_lm

    def norm_docs():
        return spark.table("documents").withColumn(
            "text", F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))

    def q_simhash(d):
        return d.simhash_near_pairs(spark.table("documents"), max_hamming=3)

    def q_ngram(d):
        return d.ngram_jaccard_pairs(norm_docs(), n=3, threshold=0.5,
                                     max_df=None)

    def q_dedup_clusters(d):
        docs = norm_docs()
        pairs = d.ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=None)
        return d.near_dup_clusters(docs, pairs)

    def q_dedup_against(d):
        docs = spark.table("documents")
        ref = (docs.filter(F.col("doc_id") % 97 == 0)
               .selectExpr("doc_id AS bench_id", "text"))
        return d.dedup_against(docs, ref,
                               ref_id_col="bench_id").select("doc_id")

    def q_dedup_against_inc(d):
        from spatial_spark.operators.sketch import build_bloom
        docs = spark.table("documents")
        ref = (docs.filter(F.col("doc_id") % 97 == 0)
               .selectExpr("doc_id AS bench_id", "text"))
        bloom = build_bloom(ref, key_col="text", m_bits=4096, k=3)
        return d.dedup_against(docs, ref, ref_id_col="bench_id",
                               ref_bloom=bloom, bloom_m_bits=4096,
                               bloom_k=3).select("doc_id")

    def q_semantic_dedup(d):
        e = spark.table("embeddings").withColumn(
            "embedding",
            F.transform("embedding", lambda x: x.cast("double")))
        return d.semantic_dedup(e, threshold=0.44, exact=True)

    def q_results_layer(lm):
        from __spark_entry__ import PART_H, PART_W, PART_X0, PART_Y0
        ctx = lm.SpatialContext(spark, tempfile.mkdtemp(prefix="ab_wh_"))
        src = ctx.create_wkt_layer("rl_src")
        src.add(spark.sql(f"""
            SELECT p_partkey AS id,
                   concat('POLYGON ((', {PART_X0}, ' ', {PART_Y0}, ', ',
                          {PART_X0} + {PART_W}, ' ', {PART_Y0}, ', ',
                          {PART_X0} + {PART_W}, ' ', {PART_Y0} + {PART_H},
                          ', ', {PART_X0}, ' ', {PART_Y0} + {PART_H}, ', ',
                          {PART_X0}, ' ', {PART_Y0}, '))') AS wkt
            FROM part WHERE p_partkey <= 500
        """), wkt="wkt")
        hits = src.bbox_search(50.0, 20.0, 200.0, 100.0)
        res = ctx.create_results_layer("rl_res", hits.select("id", "geom"))
        return (res.df()
                .select(F.col("id").alias("p_partkey"),
                        F.round(F.expr("st_area(geom)"), 6).alias("area"))
                .orderBy("p_partkey"))

    def q_pagerank(g):
        e1 = spark.sql("""
            SELECT DISTINCT o.o_custkey AS src,
                   l.l_suppkey + 10000000 AS dst
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        """)
        if g is new_graph:           # new variant persists the prep too
            e1 = e1.persist()
        edges = e1.union(e1.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
        pr = g.pagerank(edges, iters=3, damping=0.85)
        n = pr.count()
        return pr.select("node",
                         F.round(F.col("rank") * n, 6).alias("rank_scaled"))

    def q_duplicate_spans(d):
        return d.duplicate_spans(spark.table("documents"), n=8)

    def q_scrub_spans(d):
        return d.remove_duplicate_spans(spark.table("documents"), n=8)

    dedup_qs = {"simhash_pairs": q_simhash, "ngram_jaccard": q_ngram,
                "dedup_clusters": q_dedup_clusters,
                "dedup_against": q_dedup_against,
                "dedup_against_inc": q_dedup_against_inc,
                "semantic_dedup": q_semantic_dedup,
                "duplicate_spans": q_duplicate_spans,
                "scrub_spans": q_scrub_spans}
    layer_qs = {"results_layer": q_results_layer}
    graph_qs = {"pagerank": q_pagerank}
    lm_qs = {
        "lm_perplexity": lambda m: m.lm_score(spark.table("documents")),
        "kn_perplexity": lambda m: m.kn_score(spark.table("documents")),
        "ppl_buckets": lambda m: m.perplexity_buckets(
            spark.table("documents"), n_buckets=3),
    }

    summary = {}
    for name in names:
        if name in dedup_qs:
            fn, old_mod, new_mod = dedup_qs[name], old_dedup, new_dedup
        elif name in graph_qs:
            fn, old_mod, new_mod = graph_qs[name], old_graph, new_graph
        elif name in lm_qs:
            fn, old_mod, new_mod = lm_qs[name], old_lm, new_lm
        else:
            fn, old_mod, new_mod = layer_qs[name], old_layer, new_layer
        t_old, t_new = [], []
        for rep in range(reps):
            for tag, mod, acc in (("old", old_mod, t_old),
                                  ("new", new_mod, t_new)):
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}#{rep}")
                t0 = time.time()
                df = fn(mod)
                df.write.format("noop").mode("overwrite").save()
                acc.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        summary[name] = {"old": min(t_old), "new": min(t_new)}
        print(f"{name:22s} old {' '.join(f'{t:6.2f}' for t in t_old)} "
              f"min={min(t_old):6.2f} | new "
              f"{' '.join(f'{t:6.2f}' for t in t_new)} "
              f"min={min(t_new):6.2f}", flush=True)
    print("JSON:" + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
