"""Small learned towers: content-MLP scorer, additive-attention history pooler,
score blender, and dimension reducer.

Capability parity with reference ``modeling_utils.py``:
- ``ClassificationHead`` (``:106-116``): 3-layer ReLU MLP 1024->1024->1024->1,
  content-only cold-start scorer.
- ``FinalAttention`` (``:175-228``): additive attention with **per-dimension**
  exp weights over history (weights shape [B, L, D] — a deliberate reference
  semantic, quirks ledger SURVEY.md §7.4).
- ``WeightedSumModel`` (``:158-165``): sigmoid(alpha) blend of cosine and
  baseline scores.
- ``ReducingModel`` (``:438-446``): 2-layer MLP projector.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import EMBEDDING_DIM, REDUCED_DIM


class ClassificationHead(nn.Module):
    """Reference ``modeling_utils.py:106-116``."""

    in_dim: int = EMBEDDING_DIM
    hidden_dim: int = EMBEDDING_DIM
    out_dim: int = 1

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden_dim, name="linear_1")(embeddings))
        x = nn.relu(nn.Dense(self.hidden_dim, name="linear_2")(x))
        return nn.Dense(self.out_dim, name="linear_3")(x)


class FinalAttention(nn.Module):
    """Additive-attention history pooler (reference ``modeling_utils.py:175-228``).

    transform: 1024 -> hidden -> hidden -> 1024 (ReLU + dropout);
    weight head: 1024 -> hidden -> 1024 (no bias on the last layer);
    readout: exp weights masked over history, normalized per dimension, then a
    weighted sum — the user vector.
    """

    reduced_dim: int = REDUCED_DIM
    hidden_dim: int = 4096
    dropout_rate: float = 0.1
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        embeddings: jnp.ndarray,  # [B, L, D] (pre-masked gather or raw)
        attention_mask: jnp.ndarray,  # [B, L]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = lambda x: nn.Dropout(self.dropout_rate)(  # noqa: E731
            x, deterministic=deterministic
        )
        dense = lambda *a, **kw: nn.Dense(  # noqa: E731
            *a, dtype=self.dtype, param_dtype=self.param_dtype, **kw
        )
        x = drop(nn.relu(dense(self.hidden_dim, name="linear1")(embeddings)))
        x = drop(nn.relu(dense(self.hidden_dim, name="linear2")(x)))
        x = dense(self.reduced_dim, name="linear3")(x)
        w = drop(nn.relu(dense(self.hidden_dim, name="linear4")(x)))
        w = dense(self.reduced_dim, use_bias=False, name="linear5")(w)
        # exp-weight readout in f32 (precision-sensitive over long histories).
        w = jnp.exp(w.astype(jnp.float32)) * attention_mask[..., None].astype(
            jnp.float32
        )
        w = w / (w.sum(axis=1, keepdims=True) + 1e-10)
        return (x.astype(jnp.float32) * w).sum(axis=1).astype(x.dtype)


class WeightedSumModel(nn.Module):
    """Learned alpha-blend of cosine score and classification baseline
    (reference ``modeling_utils.py:158-165``)."""

    @nn.compact
    def __call__(self, cos_sim: jnp.ndarray, baseline: jnp.ndarray) -> jnp.ndarray:
        alpha_param = self.param("alpha", nn.initializers.zeros, ())
        alpha = nn.sigmoid(alpha_param)
        return cos_sim * alpha + baseline * (1 - alpha)


class ReducingModel(nn.Module):
    """2-layer MLP dimension reducer (reference ``modeling_utils.py:438-446``)."""

    input_dim: int = EMBEDDING_DIM
    output_dim: int = REDUCED_DIM

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.output_dim, name="linear")(x))
        return nn.Dense(self.output_dim, name="linear2")(x)


class ClassificationHeadCatEmbed(nn.Module):
    """Content scorer whose last input feature is a category id replaced by a
    learned embedding (reference ``ClassificationHeadCatEmbed``,
    ``modeling_utils.py:119-136``; unused in the reference's active path but
    part of its surface)."""

    in_dim: int = EMBEDDING_DIM
    hidden_dim: int = EMBEDDING_DIM
    out_dim: int = 1
    num_categories: int = 15
    cat_dim: int = 128

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        cat = nn.Embed(self.num_categories, self.cat_dim, name="cat_embed")(
            embeddings[..., -1].astype(jnp.int32)
        )
        x = jnp.concatenate([embeddings[..., :-1], cat], axis=-1)
        x = nn.relu(nn.Dense(self.hidden_dim, name="linear_1")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name="linear_2")(x))
        return nn.Dense(self.out_dim, name="linear_3")(x)


class EmbeddingWrapper(nn.Module):
    """Prepend learned category/subcategory embeddings (read from the last two
    input features) before a wrapped tower (reference ``EmbeddingWrapper``,
    ``modeling_utils.py:326-340``)."""

    wrapped: nn.Module
    num_categories: int = 15
    num_subcategories: int = 134
    cat_dim: int = 128

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
        cat = nn.Embed(self.num_categories, self.cat_dim, name="cat_embed")(
            embeddings[..., -2].astype(jnp.int32)
        )
        subcat = nn.Embed(
            self.num_subcategories, self.cat_dim, name="subcat_embed"
        )(embeddings[..., -1].astype(jnp.int32))
        combined = jnp.concatenate([embeddings[..., :-2], cat, subcat], axis=-1)
        return self.wrapped(combined.astype(jnp.float32), *args, **kwargs)


class ResizeWrapperModel(nn.Module):
    """Linear bottleneck in/out around a wrapped tower (reference
    ``ResizeWrapperModel``, ``modeling_utils.py:349-364``)."""

    wrapped: nn.Module
    embed_dim: int = EMBEDDING_DIM
    reduced_dim: int = REDUCED_DIM

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
        x = nn.Dense(self.reduced_dim, name="bottleneck_in")(embeddings)
        x = self.wrapped(x, *args, **kwargs)
        return nn.Dense(self.embed_dim, name="bottleneck_out")(x)
