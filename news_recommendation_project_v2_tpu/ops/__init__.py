from .scoring import (
    cosine_scores_flat,
    score_all_impressions,
    user_vectors_bucketed,
    user_vectors_flat,
)

__all__ = [
    "cosine_scores_flat",
    "score_all_impressions",
    "user_vectors_bucketed",
    "user_vectors_flat",
]
