"""Transformer history tower: packed-QKV self-attention + gated-GLU FFN blocks
with an additive-attention readout.

Capability parity with reference ``attention.py``:
- ``SelfAttention`` ~ ``MyAttention`` (``attention.py:28-113``): 8-head packed
  QKV, additive ``-inf`` padding mask, output projection.
- ``GatedMLP`` (``attention.py:116-148``): GLU variant, gelu gate.
- ``TransformerLayer`` ~ ``MyLayer`` (``attention.py:151-194``). ⚠️ The reference
  block is dead code: its line 193 reassigns the output to
  ``LayerNorm(input)``, so attention and MLP never affect the result (SURVEY.md
  §7.4). ``as_built=True`` reproduces that behavior bit-for-bit for parity runs;
  the default implements the intended post-norm block.
- ``TransformerTower`` ~ ``NewAttention`` (``attention.py:210-272``): encoder over
  history + per-dimension exp-weight readout.

All attention math runs as plain jnp einsum/softmax — XLA fuses this into MXU
matmuls; no torch SDPA equivalent is needed.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import NUM_HIDDEN_LAYERS, REDUCED_DIM


class SelfAttention(nn.Module):
    """Reference ``MyAttention`` (``attention.py:28-113``)."""

    hidden_size: int = REDUCED_DIM
    num_heads: int = 8
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        assert self.hidden_size % self.num_heads == 0
        head_dim = self.hidden_size // self.num_heads
        b, l, _ = hidden.shape
        qkv = nn.Dense(
            self.hidden_size * 3,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="qkv_proj",
        )(hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        scale = head_dim**-0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        # Additive mask: (1 - mask) * finfo.min (reference attention.py:98-104).
        logits32 = logits.astype(jnp.float32)
        bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * jnp.finfo(
            jnp.float32
        ).min
        probs = nn.softmax(logits32 + bias, axis=-1).astype(logits.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, self.hidden_size)
        return nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="o_proj",
        )(ctx)


class GatedMLP(nn.Module):
    """GLU-variant FFN (reference ``attention.py:116-148``)."""

    hidden_size: int = REDUCED_DIM
    intermediate_size: int = 3072
    dropout_rate: float = 0.1
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        up_gate = nn.Dense(
            self.intermediate_size * 2,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="up_gate_proj",
        )(x)
        up, gate = jnp.split(up_gate, 2, axis=-1)
        gated = nn.gelu(gate) * up
        gated = nn.Dropout(self.dropout_rate)(gated, deterministic=deterministic)
        return nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="down_proj",
        )(gated)


class TransformerLayer(nn.Module):
    """Reference ``MyLayer`` (``attention.py:151-194``).

    ``as_built=False`` (default): intended post-norm block —
    ``h -> attn -> dropout (+res) -> LN -> glu-mlp -> dropout (+res) -> LN``.
    ``as_built=True``: reference dead-code parity — returns
    ``g_mlp_layernorm(input)`` while still materializing the attention/MLP
    parameters (they exist-but-are-inert in the reference too).
    """

    hidden_size: int = REDUCED_DIM
    residual_connection: bool = True
    dropout_rate: float = 0.1
    as_built: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, hidden: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        attn = SelfAttention(
            self.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attention",
        )(hidden, mask)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        if self.residual_connection:
            attn = attn + hidden
        attn = nn.LayerNorm(epsilon=1e-12, name="attn_layernorm")(attn)

        mlp = GatedMLP(
            self.hidden_size,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="g_mlp",
        )(attn, deterministic=deterministic)
        mlp = nn.Dropout(self.dropout_rate)(mlp, deterministic=deterministic)
        if self.residual_connection:
            mlp = mlp + attn
        out_norm = nn.LayerNorm(epsilon=1e-12, name="g_mlp_layernorm")
        out = out_norm(mlp)
        if self.as_built:
            # Reference attention.py:193: the layer's result is discarded and
            # replaced by LayerNorm(input).
            return out_norm(hidden)
        return out


class TransformerEncoder(nn.Module):
    """Reference ``MyEncoder`` (``attention.py:197-207``)."""

    hidden_size: int = REDUCED_DIM
    num_layers: int = NUM_HIDDEN_LAYERS
    dropout_rate: float = 0.1
    as_built: bool = False
    residual_connection: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, hidden: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        for i in range(self.num_layers):
            hidden = TransformerLayer(
                self.hidden_size,
                residual_connection=self.residual_connection,
                dropout_rate=self.dropout_rate,
                as_built=self.as_built,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(hidden, mask, deterministic)
        return hidden


class TransformerTower(nn.Module):
    """Reference ``NewAttention`` (``attention.py:210-272``): encoder over history
    embeddings + per-dimension exp-weight additive readout."""

    hidden_size: int = REDUCED_DIM
    num_layers: int = NUM_HIDDEN_LAYERS
    dropout_rate: float = 0.1
    as_built: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        embeddings: jnp.ndarray,  # [B, L, D]
        attention_mask: jnp.ndarray,  # [B, L]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        res = TransformerEncoder(
            self.hidden_size,
            self.num_layers,
            self.dropout_rate,
            self.as_built,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="encoder",
        )(embeddings, attention_mask, deterministic)
        w = nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear1",
        )(res)
        # exp-weight readout in f32: exp + per-dimension normalization over up
        # to 600 history items is precision-sensitive in low dtypes.
        w = jnp.exp(w.astype(jnp.float32)) * attention_mask[..., None].astype(
            jnp.float32
        )
        w = w / (w.sum(axis=1, keepdims=True) + 1e-10)
        return (res.astype(jnp.float32) * w).sum(axis=1).astype(res.dtype)


class TokenAttentionPool(nn.Module):
    """Learned news encoder over frozen per-token states: 1-layer encoder +
    last-token pool (reference ``FirstAttentionPoolFunc``,
    ``modeling_utils.py:498-513``)."""

    hidden_size: int = REDUCED_DIM
    num_layers: int = NUM_HIDDEN_LAYERS
    as_built: bool = False

    @nn.compact
    def __call__(
        self,
        token_states: jnp.ndarray,  # [B, T, D]
        attention_mask: jnp.ndarray,  # [B, T]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        from .pooling import last_token_pool

        x = TransformerEncoder(
            self.hidden_size, self.num_layers, as_built=self.as_built, name="encoder"
        )(token_states, attention_mask, deterministic)
        return last_token_pool(x, attention_mask)
