"""Training losses.

- ``margin_ranking_loss``: torch ``MarginRankingLoss(margin)`` semantics with
  target +1 (reference ``trainer.py:479,619-622``): ``max(0, -(pos - neg) + m)``,
  masked mean. The reference's margin 2 with cosine scores in [-1, 1] means the
  hinge never saturates — the loss acts as a pure score-gap maximizer; kept as-is
  (quirks ledger, SURVEY.md §7.4).
- ``infonce_loss``: cross-entropy of the positive against ``k`` sampled negatives
  with ``-1`` padding masked out (reference wired-but-disabled InfoNCE path,
  ``trainer.py:497-506``, ``data_utils.py:275-334``).
"""

from __future__ import annotations

import jax.numpy as jnp


def margin_ranking_loss(
    pos_scores: jnp.ndarray,  # [B]
    neg_scores: jnp.ndarray,  # [B]
    margin: float = 2.0,
    pair_mask: jnp.ndarray | None = None,  # [B] 1 for real pairs
) -> jnp.ndarray:
    losses = jnp.maximum(0.0, -(pos_scores - neg_scores) + margin)
    if pair_mask is None:
        return losses.mean()
    pair_mask = pair_mask.astype(losses.dtype)
    return (losses * pair_mask).sum() / jnp.maximum(pair_mask.sum(), 1.0)


def infonce_loss(
    pos_scores: jnp.ndarray,  # [B]
    neg_scores: jnp.ndarray,  # [B, K]
    neg_valid: jnp.ndarray,  # [B, K] 1 where the negative is real (not -1 pad)
    temperature: float = 1.0,
    pair_mask: jnp.ndarray | None = None,  # [B]
) -> jnp.ndarray:
    import jax

    logits = jnp.concatenate([pos_scores[:, None], neg_scores], axis=1) / temperature
    bias = jnp.concatenate(
        [jnp.zeros_like(pos_scores[:, None]), (1.0 - neg_valid) * jnp.finfo(logits.dtype).min],
        axis=1,
    )
    losses = -jax.nn.log_softmax(logits + bias, axis=1)[:, 0]
    if pair_mask is None:
        return losses.mean()
    pair_mask = pair_mask.astype(losses.dtype)
    return (losses * pair_mask).sum() / jnp.maximum(pair_mask.sum(), 1.0)
