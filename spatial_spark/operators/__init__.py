from .search import bbox_search, closest, intersects_search, within_distance  # noqa: F401
from .join import spatial_join, within_distance_join  # noqa: F401
from .agg import (  # noqa: F401
    density_islands, intersect_all, keep_max, keep_min, union_all,
)
from .cql import cql_filter, cql_to_sql  # noqa: F401
from .dedup import (  # noqa: F401
    boilerplate_lines, contamination_check, dedup_near, exact_dedup,
    minhash_lsh_pairs, near_dup_clusters, ngram_jaccard_pairs,
    paragraph_dedup, semantic_dedup, simhash_near_pairs,
)
from .pack import pack_sequences, pack_stats  # noqa: F401
from .sample import (  # noqa: F401
    deterministic_sample, split_assign, stratified_sample,
)
from .text import (  # noqa: F401
    gopher_rules, language_id, mixture_weights, pii_scrub, quality_score,
    repetition_scores, tf_idf_top_terms,
)
from .temporal import asof_join, range_join  # noqa: F401
