"""Pure train-step factories shared by the single-chip trainer and the sharded
(pjit) multi-chip path. Everything is a pure function of (params, opt_state,
arrays) so the same step jits on one device or over a mesh with sharded inputs
(SPMD: replicated params + data-sharded batch means XLA inserts the gradient
all-reduce automatically)."""

from __future__ import annotations

from typing import Callable, Optional

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


def make_tower_train_step_flat(
    tower_apply: Callable,
    optimizer: optax.GradientTransformation,
    margin: float,
    normalize: bool = True,
) -> Callable:
    """Margin-ranking step over the FLAT token stream — the zero-padding trick
    of ``ops.scoring.user_vectors_flat`` applied to training. Token-local
    towers only (``models.supports_flat_scoring``): the per-token tower runs on
    the deduped batch's flat history tokens (no [U, bucket] padding — the
    padded path wastes ~40% of its FLOPs at MIND history statistics), user
    vectors come from a sorted segment-add + the tower's pooling epilogue, and
    gradients flow through the scatter. ``normalize`` must mirror the tower's
    ``output_normalize``.
    """

    def step(
        params,
        opt_state,
        news_emb,  # [N, D] candidate table
        query_emb,  # [N, D] table fed to the tower
        tok_idx,  # [T] flat history token news-ids (deduped rows, row-major)
        tok_rows,  # [T] owning unique-history row (out-of-range = pad/drop)
        lens,  # [U] f32 per-unique-row history lengths (0 for pad rows)
        hist_rev,  # [B] pair row -> unique-history index
        pos_idx,  # [B]
        neg_idx,  # [B]
        pair_mask,  # [B]
        dropout_key,
    ):
        def loss_fn(p):
            user = _flat_user_vectors(
                tower_apply, p, query_emb, tok_idx, tok_rows, lens,
                normalize, dropout_key,
            )
            u = user[hist_rev]
            cos_p = safe_cosine(u, news_emb[pos_idx])
            cos_n = safe_cosine(u, news_emb[neg_idx])
            return margin_ranking_loss(cos_p, cos_n, margin, pair_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step


def _flat_user_vectors(
    tower_apply, params, query_emb, tok_idx, tok_rows, lens, normalize, key
):
    """Shared flat-token user-vector computation: per-token tower on the flat
    stream, sorted segment-add pooling, optional unit-norm epilogue (must
    mirror the tower's ``output_normalize``)."""
    tokens = query_emb[tok_idx]
    h = tower_apply(
        params,
        tokens[None],
        None,
        deterministic=False,
        rngs={"dropout": key},
    )[0]
    num_rows = lens.shape[0]
    acc = jnp.zeros((num_rows, h.shape[-1]), jnp.float32).at[tok_rows].add(
        h.astype(jnp.float32), mode="drop", indices_are_sorted=True
    )
    user = acc / jnp.maximum(lens, 1.0)[:, None]
    if normalize:
        user = user / jnp.sqrt((user * user).sum(-1, keepdims=True) + 1e-12)
    return user


def make_tower_infonce_step_flat(
    tower_apply: Callable,
    optimizer: optax.GradientTransformation,
    num_neg: int,
    temperature: float = 1.0,
    normalize: bool = True,
) -> Callable:
    """InfoNCE over the FLAT token stream: the zero-padding trick of
    ``make_tower_train_step_flat`` with the one-positive-vs-K-negatives loss —
    the BASELINE.json config[1] ("in-batch negatives") preset runs on the
    fastest step. Token-local towers only."""
    from .losses import infonce_loss

    def step(
        params,
        opt_state,
        news_emb,
        query_emb,
        tok_idx,  # [T]
        tok_rows,  # [T]
        lens,  # [U]
        hist_rev,  # [B]
        pos_idx,  # [B]
        neg_idx,  # [B, K] (-1 = pad)
        pair_mask,  # [B]
        dropout_key,
    ):
        def loss_fn(p):
            user = _flat_user_vectors(
                tower_apply, p, query_emb, tok_idx, tok_rows, lens,
                normalize, dropout_key,
            )
            u = user[hist_rev]
            pos_scores = safe_cosine(u, news_emb[pos_idx])
            neg_valid = (neg_idx >= 0).astype(jnp.float32)
            neg_e = news_emb[jnp.maximum(neg_idx, 0)]  # [B, K, D]
            un = jnp.sqrt((u * u).sum(-1, keepdims=True) + 1e-16)
            nn_ = jnp.sqrt((neg_e * neg_e).sum(-1) + 1e-16)
            neg_scores = (u[:, None, :] * neg_e).sum(-1) / (un * nn_)
            return infonce_loss(
                pos_scores, neg_scores, neg_valid, temperature, pair_mask
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step


def make_tower_infonce_step(
    tower_apply: Callable,
    optimizer: optax.GradientTransformation,
    num_neg: int,
    temperature: float = 1.0,
) -> Callable:
    """InfoNCE step: one positive vs ``num_neg`` sampled negatives per pair,
    ``-1`` negative padding masked out (the reference wires this path but leaves
    it disabled — ``trainer.py:497-506``, ``data_utils.py:275-334``)."""
    from .losses import infonce_loss

    def step(
        params,
        opt_state,
        news_emb,
        query_emb,
        hist_idx,  # [U, L]
        hist_mask,  # [U, L]
        hist_rev,  # [B]
        pos_idx,  # [B]
        neg_idx,  # [B, K] (-1 = pad)
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
            pos_scores = safe_cosine(u, news_emb[pos_idx])
            neg_valid = (neg_idx >= 0).astype(jnp.float32)
            safe_neg = jnp.maximum(neg_idx, 0)
            neg_e = news_emb[safe_neg]  # [B, K, D]
            un = jnp.sqrt((u * u).sum(-1, keepdims=True) + 1e-16)
            nn_ = jnp.sqrt((neg_e * neg_e).sum(-1) + 1e-16)
            neg_scores = (u[:, None, :] * neg_e).sum(-1) / (un * nn_)
            return infonce_loss(
                pos_scores, neg_scores, neg_valid, temperature, pair_mask
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step


def make_joint_train_step(
    tower_apply: Callable,
    optimizer: optax.GradientTransformation,
    margin: float,
    reduce_apply: Optional[Callable] = None,
    blend_apply: Optional[Callable] = None,
) -> Callable:
    """Joint training variants over a params dict {"tower", ["reduce"], ["blend"]}:

    - ``reduce_apply`` (reference ``AttentionReduceTrainer``, ``trainer.py:716-949``):
      a learned projector applied to BOTH the gathered history embeddings and the
      pos/neg candidates before the tower/cosine (``trainer.py:839-853``).
    - ``blend_apply`` (reference ``AttentionWeightTrainer``, ``trainer.py:217-436``):
      cosine scores blended with per-candidate classification baselines through
      the sigmoid-alpha WeightedSum model before the hinge (``trainer.py:338-345``).
    """

    def step(
        params,
        opt_state,
        news_emb,
        query_emb,
        hist_idx,
        hist_mask,
        hist_rev,
        pos_idx,
        neg_idx,
        pair_mask,
        baseline_pos,  # [B] classification baseline for pos (zeros if unused)
        baseline_neg,  # [B]
        dropout_key,
    ):
        def loss_fn(p):
            hist_gathered = query_emb[hist_idx]
            if reduce_apply is not None:
                hist_gathered = reduce_apply(p["reduce"], hist_gathered)
            gathered = hist_gathered * hist_mask[..., None].astype(
                hist_gathered.dtype
            )
            user = tower_apply(
                p["tower"],
                gathered,
                hist_mask,
                deterministic=False,
                rngs={"dropout": dropout_key},
            )
            u = user[hist_rev]
            cand_p = news_emb[pos_idx]
            cand_n = news_emb[neg_idx]
            if reduce_apply is not None:
                cand_p = reduce_apply(p["reduce"], cand_p)
                cand_n = reduce_apply(p["reduce"], cand_n)
            cos_p = safe_cosine(u, cand_p)
            cos_n = safe_cosine(u, cand_n)
            if blend_apply is not None:
                cos_p = blend_apply(p["blend"], cos_p, baseline_pos)
                cos_n = blend_apply(p["blend"], cos_n, baseline_neg)
            return margin_ranking_loss(cos_p, cos_n, margin, pair_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step


def make_end2end_train_step(
    token_encoder_apply: Callable,  # (params, [M,T,Dt], [M,T]) -> [M,D]
    tower_apply: Callable,
    optimizer: optax.GradientTransformation,
    margin: float,
) -> Callable:
    """End-to-end two-level step (reference ``AttentionAttentionTrainer``,
    ``trainer.py:1030-1117``): frozen per-token states -> learned token-attention
    news encoder -> history tower -> cosine -> hinge. ``params`` is
    {"token_encoder", "tower"}; history/candidate indices address the batch's
    unique-news axis M."""

    def step(
        params,
        opt_state,
        token_states,  # [M, T, Dt]
        token_mask,  # [M, T]
        hist_idx,  # [U, L] indices into M
        hist_mask,  # [U, L]
        hist_rev,  # [B]
        pos_idx,  # [B] indices into M
        neg_idx,  # [B]
        pair_mask,  # [B]
        dropout_key,
    ):
        def loss_fn(p):
            k1, k2 = jax.random.split(dropout_key)
            news_vecs = token_encoder_apply(
                p["token_encoder"],
                token_states,
                token_mask,
                deterministic=False,
                rngs={"dropout": k1},
            )
            gathered = news_vecs[hist_idx] * hist_mask[..., None].astype(
                news_vecs.dtype
            )
            user = tower_apply(
                p["tower"],
                gathered,
                hist_mask,
                deterministic=False,
                rngs={"dropout": k2},
            )
            u = user[hist_rev]
            cos_p = safe_cosine(u, news_vecs[pos_idx])
            cos_n = safe_cosine(u, news_vecs[neg_idx])
            return margin_ranking_loss(cos_p, cos_n, margin, pair_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step


def make_end2end_train_step_gathered(
    token_encoder_apply: Callable,  # (params, [M,T,Dt], [M,T]) -> [M,D]
    tower_apply: Callable,
    optimizer: optax.GradientTransformation,
    margin: float,
) -> Callable:
    """``make_end2end_train_step`` with a DEVICE-resident token store: the
    frozen per-token states live in HBM as one flat [total_tokens, Dt] array
    and the batch's [M, T, Dt] block is gathered INSIDE the program
    (``tok_idx`` indexes the flat row axis; ``TokenStore.padded_index_batch``
    builds the grids), so each step uploads index grids (KBs) instead of the
    token block itself (hundreds of MBs at MIND scale — the dominant step
    cost on PCIe/tunneled hosts; see benchmarks/e2e_bench.py). Masked slots
    point at row 0 and are multiplied away, reproducing the host path's
    zero-padding exactly."""

    def step(
        params,
        opt_state,
        flat_states,  # [total_tokens, Dt] — HBM-resident, NOT donated
        tok_idx,  # [M, T] indices into total_tokens
        tok_mask,  # [M, T]
        hist_idx,  # [U, L] indices into M
        hist_mask,  # [U, L]
        hist_rev,  # [B]
        pos_idx,  # [B] indices into M
        neg_idx,  # [B]
        pair_mask,  # [B]
        dropout_key,
    ):
        def loss_fn(p):
            k1, k2 = jax.random.split(dropout_key)
            token_states = flat_states[tok_idx].astype(jnp.float32) * tok_mask[
                ..., None
            ]
            news_vecs = token_encoder_apply(
                p["token_encoder"],
                token_states,
                tok_mask,
                deterministic=False,
                rngs={"dropout": k1},
            )
            gathered = news_vecs[hist_idx] * hist_mask[..., None].astype(
                news_vecs.dtype
            )
            user = tower_apply(
                p["tower"],
                gathered,
                hist_mask,
                deterministic=False,
                rngs={"dropout": k2},
            )
            u = user[hist_rev]
            cos_p = safe_cosine(u, news_vecs[pos_idx])
            cos_n = safe_cosine(u, news_vecs[neg_idx])
            return margin_ranking_loss(cos_p, cos_n, margin, pair_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step


def _e2e_news_and_user(
    token_encoder_apply, tower_apply, p, token_states, token_mask,
    hist_idx, hist_mask, hist_rev, dropout_key,
):
    """Shared end-to-end forward: token encoder over the batch's unique news,
    tower over gathered histories; returns (news_vecs, per-pair user rows)."""
    k1, k2 = jax.random.split(dropout_key)
    news_vecs = token_encoder_apply(
        p["token_encoder"],
        token_states,
        token_mask,
        deterministic=False,
        rngs={"dropout": k1},
    )
    gathered = news_vecs[hist_idx] * hist_mask[..., None].astype(news_vecs.dtype)
    user = tower_apply(
        p["tower"],
        gathered,
        hist_mask,
        deterministic=False,
        rngs={"dropout": k2},
    )
    return news_vecs, user[hist_rev]


def _infonce_from_vecs(u, news_vecs, pos_idx, neg_idx, pair_mask, temperature):
    """One-positive-vs-K-negatives loss over cosine scores against a shared
    news-vector table ([B, K] ``neg_idx`` with -1 padding)."""
    from .losses import infonce_loss

    pos_scores = safe_cosine(u, news_vecs[pos_idx])
    neg_valid = (neg_idx >= 0).astype(jnp.float32)
    neg_e = news_vecs[jnp.maximum(neg_idx, 0)]  # [B, K, D]
    un = jnp.sqrt((u * u).sum(-1, keepdims=True) + 1e-16)
    nn_ = jnp.sqrt((neg_e * neg_e).sum(-1) + 1e-16)
    neg_scores = (u[:, None, :] * neg_e).sum(-1) / (un * nn_)
    return infonce_loss(pos_scores, neg_scores, neg_valid, temperature, pair_mask)


def make_end2end_infonce_step(
    token_encoder_apply: Callable,
    tower_apply: Callable,
    optimizer: optax.GradientTransformation,
    num_neg: int,
    temperature: float = 1.0,
) -> Callable:
    """InfoNCE variant of ``make_end2end_train_step`` — the reference's e2e
    trainer is margin-only (``trainer.py:985``), but this repo measured
    InfoNCE better on the tower families (BASELINE.md config[1]) and extends
    the option here: one positive vs K sampled negatives per pair, ``-1``
    padding masked, all indices addressing the batch's unique-news axis M."""

    def step(
        params,
        opt_state,
        token_states,  # [M, T, Dt]
        token_mask,  # [M, T]
        hist_idx,  # [U, L]
        hist_mask,  # [U, L]
        hist_rev,  # [B]
        pos_idx,  # [B]
        neg_idx,  # [B, K] (-1 = pad)
        pair_mask,  # [B]
        dropout_key,
    ):
        def loss_fn(p):
            news_vecs, u = _e2e_news_and_user(
                token_encoder_apply, tower_apply, p, token_states, token_mask,
                hist_idx, hist_mask, hist_rev, dropout_key,
            )
            return _infonce_from_vecs(
                u, news_vecs, pos_idx, neg_idx, pair_mask, temperature
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step


def make_end2end_infonce_step_gathered(
    token_encoder_apply: Callable,
    tower_apply: Callable,
    optimizer: optax.GradientTransformation,
    num_neg: int,
    temperature: float = 1.0,
) -> Callable:
    """InfoNCE variant of ``make_end2end_train_step_gathered`` (device-resident
    flat token store, in-program gather; see that factory for the layout)."""

    def step(
        params,
        opt_state,
        flat_states,  # [total_tokens, Dt] — HBM-resident, NOT donated
        tok_idx,  # [M, T]
        tok_mask,  # [M, T]
        hist_idx,  # [U, L]
        hist_mask,  # [U, L]
        hist_rev,  # [B]
        pos_idx,  # [B]
        neg_idx,  # [B, K] (-1 = pad)
        pair_mask,  # [B]
        dropout_key,
    ):
        def loss_fn(p):
            token_states = flat_states[tok_idx].astype(jnp.float32) * tok_mask[
                ..., None
            ]
            news_vecs, u = _e2e_news_and_user(
                token_encoder_apply, tower_apply, p, token_states, tok_mask,
                hist_idx, hist_mask, hist_rev, dropout_key,
            )
            return _infonce_from_vecs(
                u, news_vecs, pos_idx, neg_idx, pair_mask, temperature
            )

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


def make_classification_infonce_step(
    head_apply: Callable,
    optimizer: optax.GradientTransformation,
    temperature: float = 1.0,
) -> Callable:
    """InfoNCE step for the content scorer: pos vs K negatives' head scores
    (reference ``ClassificationTrainInfoNCEDataset``, ``data_utils.py:648-685``,
    wired-but-disabled)."""
    from .losses import infonce_loss

    def step(params, opt_state, news_emb, pos_idx, neg_idx, pair_mask):
        # neg_idx: [B, K] with -1 padding.
        def loss_fn(p):
            pos_scores = head_apply(p, news_emb[pos_idx])[:, 0]
            neg_valid = (neg_idx >= 0).astype(jnp.float32)
            safe_neg = jnp.maximum(neg_idx, 0)
            b, k = neg_idx.shape
            neg_scores = head_apply(
                p, news_emb[safe_neg.reshape(-1)]
            )[:, 0].reshape(b, k)
            return infonce_loss(
                pos_scores, neg_scores, neg_valid, temperature, pair_mask
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss

    return step
