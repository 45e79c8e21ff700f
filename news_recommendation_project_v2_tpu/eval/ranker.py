"""Score composition + ranking + metric aggregation for a compiled behaviors set.

Capability parity with the reference score-assembly functions
(``data_model_helper.py:242-371,416-443``): start from a content-only baseline for
every candidate slot, overwrite slots belonging to with-history rows with
tower-cosine scores (optionally alpha-blended with the baseline), then dense-rank
per impression and run the MIND metric suite.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..data.compiler import CompiledBehaviors
from ..data.grouping import dense_rank_by_segment, group_items
from .metrics import score


@dataclasses.dataclass
class ScoreResult:
    scores: np.ndarray  # [total_imp_slots] flat final scores
    grouped_ranks: np.ndarray  # object array of per-impression dense ranks
    metrics: Optional[dict] = None


def history_candidate_slots(c: CompiledBehaviors) -> tuple[np.ndarray, np.ndarray]:
    """Flat candidate slots belonging to with-history rows, plus the mapping of
    those slots to history-subset row ids (reference pattern
    ``components.py:444-447``: ``rev_ind[history_bool.repeat(imp_len)]``)."""
    has_hist = c.has_history
    slot_mask = np.repeat(has_hist, c.imp_lens)
    # Map original row id -> index within the with-history subset.
    subset_pos = np.cumsum(has_hist) - 1
    cand_rows = subset_pos[c.imp_row[slot_mask]].astype(np.int32)
    return np.flatnonzero(slot_mask), cand_rows


def compose_final_scores(
    c: CompiledBehaviors,
    history_scores: Optional[np.ndarray] = None,
    baseline_scores: Optional[np.ndarray] = None,
    alpha: Optional[float] = None,
    compute_metrics: bool = True,
) -> ScoreResult:
    """Assemble final per-slot scores.

    - ``baseline_scores``: per-unique-news content scores, expanded to slots via
      ``imp_rev`` (reference ``get_classification_baseline_scores``,
      ``data_model_helper.py:101-109``). Defaults to zeros (pure-attention runs,
      reference ``get_final_second_attention_score``).
    - ``history_scores``: cosine scores for the with-history candidate slots, in
      ``history_candidate_slots`` order.
    - ``alpha``: if given, blend ``alpha*cos + (1-alpha)*baseline`` on history
      slots (reference ``WeightedSumModel`` + ``get_cos_sim_final_score``).
    """
    scores = (
        baseline_scores[c.imp_rev].astype(np.float64)
        if baseline_scores is not None
        else np.zeros(len(c.imp_rev), dtype=np.float64)
    )
    if history_scores is not None:
        slots, _ = history_candidate_slots(c)
        assert len(slots) == len(history_scores)
        if alpha is not None:
            scores[slots] = alpha * history_scores + (1 - alpha) * scores[slots]
        else:
            scores[slots] = history_scores
    ranks_flat = dense_rank_by_segment(scores, c.imp_lens)
    grouped_ranks = group_items(ranks_flat, c.imp_lens)
    m = None
    if compute_metrics:
        assert c.labels_flat is not None, "Metrics need labels"
        labels = group_items(c.labels_flat, c.imp_lens)
        m = score(
            [g.tolist() for g in grouped_ranks], [g.tolist() for g in labels]
        )
    return ScoreResult(scores=scores, grouped_ranks=grouped_ranks, metrics=m)
