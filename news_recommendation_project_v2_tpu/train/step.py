"""Pure train-step factories shared by the single-chip trainer and the sharded
(pjit) multi-chip path. Everything is a pure function of (params, opt_state,
arrays) so the same step jits on one device or over a mesh with sharded inputs
(SPMD: replicated params + data-sharded batch means XLA inserts the gradient
all-reduce automatically)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from .losses import margin_ranking_loss


def safe_cosine(u: jnp.ndarray, v: jnp.ndarray, eps2: float = 1e-16) -> jnp.ndarray:
    """Row-wise cosine with NaN-safe gradients (sqrt(|x|^2+eps), not norm())."""
    un = jnp.sqrt((u * u).sum(-1) + eps2)
    vn = jnp.sqrt((v * v).sum(-1) + eps2)
    return (u * v).sum(-1) / (un * vn)


def make_tower_train_step(
    tower_apply: Callable,
    optimizer: optax.GradientTransformation,
    margin: float,
) -> Callable:
    """Margin-ranking step for a user-history tower (reference hot loop,
    ``trainer.py:569-636``): gather histories from the on-device table, tower
    forward on unique histories, cosine vs pos/neg candidates, hinge loss."""

    def step(
        params,
        opt_state,
        news_emb,  # [N, D] candidate table
        query_emb,  # [N, D] table fed to the tower (may be the same array)
        hist_idx,  # [U, L]
        hist_mask,  # [U, L]
        hist_rev,  # [B] pair row -> unique-history index
        pos_idx,  # [B]
        neg_idx,  # [B]
        pair_mask,  # [B]
        dropout_key,
    ):
        def loss_fn(p):
            gathered = query_emb[hist_idx] * hist_mask[..., None].astype(
                query_emb.dtype
            )
            user = tower_apply(
                p,
                gathered,
                hist_mask,
                deterministic=False,
                rngs={"dropout": dropout_key},
            )
            u = user[hist_rev]
            cos_p = safe_cosine(u, news_emb[pos_idx])
            cos_n = safe_cosine(u, news_emb[neg_idx])
            return margin_ranking_loss(cos_p, cos_n, margin, pair_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step


def make_classification_train_step(
    head_apply: Callable,
    optimizer: optax.GradientTransformation,
    margin: float,
) -> Callable:
    """Margin-ranking step for the content-only MLP scorer (reference
    ``trainer.py:117-143``)."""

    def step(params, opt_state, news_emb, pos_idx, neg_idx, pair_mask):
        def loss_fn(p):
            pos_scores = head_apply(p, news_emb[pos_idx])[:, 0]
            neg_scores = head_apply(p, news_emb[neg_idx])[:, 0]
            return margin_ranking_loss(pos_scores, neg_scores, margin, pair_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step
