"""Latent-attention user tower (NV-Embed style), the flagship history pooler.

Capability parity with reference ``latent_attention.py:1-171``: 64 learned
latents (1024-dim, 8 heads, head dim 512); a PreNorm cross-attention where
**history items are the queries and the latents are the context** (the
reference's deliberate inversion of Perceiver, ``latent_attention.py:161-162`` —
kept, SURVEY.md §7.4), a GEGLU feed-forward, both with residuals; masked
mean-pool over history + L2 normalization.

Cost is O(L * num_latents) — this is the algorithmic long-history compression
mechanism (SURVEY.md §5 long-context). The attention is plain einsum/softmax;
XLA maps the matmuls onto the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import REDUCED_DIM


class CrossAttention(nn.Module):
    """Reference ``Attention`` (``latent_attention.py:51-74``): q from x, kv from
    context, no bias, no mask.

    ``use_fused=True`` routes the attention through the Pallas fused kernel
    (``ops.pallas_attention``). It requires the context to be identical across
    the batch (true here: the context is the broadcast shared latents), so K/V
    are computed once from ``context[0]``.

    ``dtype`` is the matmul compute dtype (flax semantics: None promotes inputs
    and params — pure f32 with the default f32 params); the softmax always
    accumulates in f32.
    """

    query_dim: int
    context_dim: int
    heads: int = 8
    dim_head: int = 512
    use_fused: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        dense = lambda *a, **kw: nn.Dense(  # noqa: E731
            *a, dtype=self.dtype, param_dtype=self.param_dtype, **kw
        )
        inner = self.heads * self.dim_head
        b, l, _ = x.shape
        n = context.shape[1]
        q = dense(inner, use_bias=False, name="to_q")(x)
        q = q.reshape(b, l, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        if self.use_fused:
            from ..ops.pallas_attention import fused_latent_attention

            kv1 = dense(inner * 2, use_bias=False, name="to_kv")(context[0])
            k1, v1 = jnp.split(kv1, 2, axis=-1)
            k1 = k1.reshape(n, self.heads, self.dim_head).transpose(1, 0, 2)
            v1 = v1.reshape(n, self.heads, self.dim_head).transpose(1, 0, 2)
            ctx = fused_latent_attention(q, k1, v1)
        else:
            kv = dense(inner * 2, use_bias=False, name="to_kv")(context)
            k, v = jnp.split(kv, 2, axis=-1)
            k = k.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
            v = v.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (self.dim_head**-0.5)
            probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
                logits.dtype
            )
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return dense(self.query_dim, use_bias=False, name="to_out")(ctx)


class GEGLUFeedForward(nn.Module):
    """Reference ``FeedForward`` + ``GEGLU`` (``latent_attention.py:24-40``)."""

    dim: int
    mult: int = 4
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(
            self.dim * self.mult * 2,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj_in",
        )(x)
        h, gates = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gates)
        return nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out"
        )(h)


class LatentAttentionTower(nn.Module):
    """Reference ``LatentAttentionModel`` (``latent_attention.py:77-171``)."""

    dim: int = REDUCED_DIM
    num_latents: int = 64
    heads: int = 8
    dim_head: int = 512
    output_normalize: bool = True
    use_fused: bool = False  # Pallas fused cross-attention kernel
    # Mixed precision: ``dtype`` = matmul compute dtype (None = promote, i.e.
    # f32 with f32 params); LayerNorms and the pooling epilogue stay f32.
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        embeddings: jnp.ndarray,  # [B, L, D]
        attention_mask: jnp.ndarray | None = None,  # [B, L]
        deterministic: bool = True,  # no dropout in this tower; kept for API parity
    ) -> jnp.ndarray:
        del deterministic
        latents = self.param(
            "latents",
            nn.initializers.normal(stddev=1.0),
            (self.num_latents, self.dim),
        )
        b = embeddings.shape[0]
        ctx = jnp.broadcast_to(latents, (b, self.num_latents, self.dim))

        # PreNorm cross-attention: norm both history (queries) and latents
        # (context), residual to history (latent_attention.py:156-162).
        h = embeddings
        normed_x = nn.LayerNorm(name="cross_prenorm")(h)
        normed_ctx = nn.LayerNorm(name="cross_prenorm_context")(ctx)
        h = (
            CrossAttention(
                self.dim,
                self.dim,
                self.heads,
                self.dim_head,
                use_fused=self.use_fused,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="cross_attn",
            )(normed_x, normed_ctx)
            + h
        )
        # PreNorm GEGLU feed-forward, residual (latent_attention.py:163).
        h = GEGLUFeedForward(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="cross_ff"
        )(nn.LayerNorm(name="ff_prenorm")(h)) + h

        if attention_mask is not None:
            # Pool in f32: summing up to 600 low-precision items per row loses
            # mantissa bits; the flat path's finalize accumulates f32 too.
            h32 = h.astype(jnp.float32)
            m = attention_mask[..., None].astype(jnp.float32)
            # Denominators guarded: fully-padded rows (batch padding) would give
            # 0/0 whose *gradient* NaN-poisons the whole batch under jax.grad
            # even when the row is never read downstream.
            denom = jnp.maximum(
                attention_mask.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0
            )
            pooled = (h32 * m).sum(axis=1) / denom
            if self.output_normalize:
                norm = jnp.sqrt((pooled * pooled).sum(-1, keepdims=True) + 1e-12)
                pooled = pooled / norm
            return pooled.astype(h.dtype)
        return h
