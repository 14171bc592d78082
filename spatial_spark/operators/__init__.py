from .search import bbox_search, closest, intersects_search, within_distance  # noqa: F401
from .join import spatial_join, within_distance_join  # noqa: F401
from .agg import (  # noqa: F401
    density_islands, intersect_all, keep_max, keep_min, union_all,
)
from .cql import cql_filter, cql_to_sql  # noqa: F401
from .dedup import (  # noqa: F401
    boilerplate_lines, contamination_check, dedup_against, dedup_near,
    duplicate_spans, exact_dedup, minhash_lsh_pairs, near_dup_clusters,
    ngram_jaccard_pairs, paragraph_dedup, remove_duplicate_spans,
    semantic_dedup, simhash_near_pairs,
)
from .bpe import apply_bpe, train_bpe, word_frequencies  # noqa: F401
from .dsir import dsir_weights  # noqa: F401
from .funnel import funnel, retention  # noqa: F401
from .lm import lm_score, train_bigram_lm  # noqa: F401
from .profile import corpus_stats  # noqa: F401
from .tiles import (  # noqa: F401
    quadkey, tile_counts, tile_rollup, windowed_tile_counts, with_tiles,
)
from .pack import chunk_documents, pack_sequences, pack_stats  # noqa: F401
from .sample import (  # noqa: F401
    deterministic_sample, deterministic_shuffle, split_assign,
    stratified_sample,
)
from .text import (  # noqa: F401
    gopher_rules, language_id, mixture_weights, pii_scrub, quality_score,
    repetition_scores, tf_idf_top_terms, vocab_top_k,
)
from .temporal import asof_join, range_join  # noqa: F401
