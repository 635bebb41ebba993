from lakehouse_architecture_spark.operators.analytics import (
    event_transitions,
    last_touch_attribution,
    out_of_order_stats,
)
from lakehouse_architecture_spark.operators.dedup import (
    dedup_keep_first,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from lakehouse_architecture_spark.operators.relational import (
    asof_join,
    range_join_bucketed,
    top_k_per_group,
)
from lakehouse_architecture_spark.operators.similarity import (
    brute_force_knn,
    ivf_knn,
    lsh_bucket_pairs,
)
from lakehouse_architecture_spark.operators.skew import key_histogram, salted_join
from lakehouse_architecture_spark.operators.upsert import merge_upsert

__all__ = [
    "top_k_per_group",
    "asof_join",
    "range_join_bucketed",
    "exact_duplicates",
    "dedup_keep_first",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash",
    "brute_force_knn",
    "ivf_knn",
    "lsh_bucket_pairs",
    "salted_join",
    "key_histogram",
    "merge_upsert",
    "event_transitions",
    "last_touch_attribution",
    "out_of_order_stats",
]
