from .scoring import cosine_scores_flat, score_all_impressions, user_vectors_bucketed

__all__ = [
    "cosine_scores_flat",
    "score_all_impressions",
    "user_vectors_bucketed",
]
