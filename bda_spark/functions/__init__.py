from .cleaning import repair_sentinel_price, drop_sentinels, validate_ticks
from .timeutils import event_time_from_millis, time_bucket
from .stats import null_count_vector, profile_stats, pearson, spearman, rmse
from .vectors import cosine_similarity_col, dot_col, l2_norm_col

__all__ = [
    "repair_sentinel_price",
    "drop_sentinels",
    "validate_ticks",
    "event_time_from_millis",
    "time_bucket",
    "null_count_vector",
    "profile_stats",
    "pearson",
    "spearman",
    "rmse",
    "cosine_similarity_col",
    "dot_col",
    "l2_norm_col",
]
