"""Interleaved A/B for the bm25 inline-index cache (r15 entry 12):
OLD = bm25_retrieve fed the uncached (postings, doclen, stats) triple —
bit-identical to the pre-change inline path; NEW = the working tree's
inline path (cached postings/doclen).  One session, alternated reps.

    python tools/ab_bm25_cache.py <sf_dir> <reps>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from spatial_spark.operators.retrieval import (bm25_retrieve,
                                                   build_inverted_index)
    from spatial_spark.session import get_spark
    spark = get_spark("ab_bm25")
    entry._setup(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()

    def new_bm25(spark, sf_dir):
        return entry.queries()["bm25_retrieval"](spark, sf_dir)

    def old_bm25(spark, sf_dir):
        queries_df = spark.sql(
            f"SELECT * FROM VALUES {entry.RETRIEVAL_QUERIES_VALUES} "
            f"AS q(query_id, query_text)")
        idx = build_inverted_index(entry._norm_documents(spark))
        out = bm25_retrieve(idx, queries_df, k=10)
        return out.select("query_id", "doc_id",
                          F.round("bm25", 6).alias("bm25"), "rank")

    def new_dec(spark, sf_dir):
        return entry.queries()["decontam_retrieval"](spark, sf_dir)

    def old_dec(spark, sf_dir):
        queries_df = spark.sql(
            f"SELECT * FROM VALUES {entry.RETRIEVAL_QUERIES_VALUES} "
            f"AS q(query_id, query_text)")
        docs = entry._norm_documents(spark)
        idx = build_inverted_index(docs)
        top = bm25_retrieve(idx, queries_df, k=10)
        toks = lambda c: F.array_distinct(F.filter(  # noqa: E731
            F.split(F.trim(F.lower(F.col(c))), r"\s+"),
            lambda t: F.length(t) > 0))
        qt = queries_df.select("query_id", toks("query_text").alias("qtok"))
        dt = docs.select("doc_id", toks("text").alias("dtok"))
        return (top.join(F.broadcast(qt), "query_id").join(dt, "doc_id")
                .select("query_id", "doc_id", "rank",
                        F.round(F.size(F.array_intersect("qtok", "dtok"))
                                / F.size("qtok"), 6).alias("containment")))

    summary = {}
    for name, old_fn, new_fn in (("bm25_retrieval", old_bm25, new_bm25),
                                 ("decontam_retrieval", old_dec, new_dec)):
        t_old, t_new = [], []
        for rep in range(reps):
            for tag, fn, acc in (("old", old_fn, t_old),
                                 ("new", new_fn, t_new)):
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}#{rep}")
                t0 = time.time()
                df = fn(spark, sf_dir)
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
