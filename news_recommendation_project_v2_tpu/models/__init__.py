"""Model zoo: user-history towers, content scorer, blending, and pooling.

Factory functions mirror the reference's ``get_*_model`` surface
(``modeling_utils.py:139,151,168,274,430,449,516``), keyed by ``TowerConfig``.
"""

from __future__ import annotations

import flax.linen as nn

from ..config import TowerConfig
from .attention import (
    GatedMLP,
    SelfAttention,
    TokenAttentionPool,
    TransformerEncoder,
    TransformerLayer,
    TransformerTower,
)
from .latent_attention import CrossAttention, GEGLUFeedForward, LatentAttentionTower
from .pooling import (
    POOLING,
    average_pool,
    first_token_pool,
    last_token_pool,
    pooling_for_architecture,
)
from .towers import (
    ClassificationHead,
    ClassificationHeadCatEmbed,
    EmbeddingWrapper,
    FinalAttention,
    ReducingModel,
    ResizeWrapperModel,
    WeightedSumModel,
)


def _dtypes(config: TowerConfig):
    """(compute dtype, param dtype) from the config strings. compute
    ``float32`` maps to None (flax promotion semantics — with f32 params that
    IS f32 compute, and it keeps pre-dtype checkpoints bit-identical)."""
    import jax.numpy as jnp

    table = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}
    compute = None if config.compute_dtype == "float32" else table[config.compute_dtype]
    return compute, table[config.param_dtype]


def build_tower(config: TowerConfig) -> nn.Module:
    """User-tower factory (reference ``get_final_attention_model`` /
    ``get_new_attention_model`` / ``get_latent_attention_model``).

    ``config.compute_dtype``/``param_dtype`` select mixed precision: params
    kept in ``param_dtype`` (f32 masters for the optimizer), matmuls run in
    ``compute_dtype``; LayerNorms, softmaxes, and pooling epilogues stay f32.
    """
    dtype, param_dtype = _dtypes(config)
    if config.kind == "final_attention":
        return FinalAttention(
            reduced_dim=config.reduced_dim,
            hidden_dim=config.hidden_dim,
            dropout_rate=config.dropout_rate,
            dtype=dtype,
            param_dtype=param_dtype,
        )
    if config.kind == "transformer":
        return TransformerTower(
            hidden_size=config.reduced_dim,
            num_layers=config.num_layers,
            dropout_rate=config.dropout_rate,
            as_built=config.as_built,
            dtype=dtype,
            param_dtype=param_dtype,
        )
    if config.kind == "latent":
        return LatentAttentionTower(
            dim=config.reduced_dim,
            num_latents=config.num_latents,
            heads=config.num_heads,
            dim_head=config.latent_dim_head,
            use_fused=config.fused_attention,
            dtype=dtype,
            param_dtype=param_dtype,
        )
    raise ValueError(f"Unknown tower kind: {config.kind!r}")


def check_tower_input_dim(
    config: TowerConfig, dim: int, flag_hint: str = "--dim"
) -> None:
    """Loud boundary shared by training, eval, and serving: the latent and
    transformer towers are residual in their input, so the news-embedding
    width MUST equal ``reduced_dim`` — a mismatch otherwise surfaces as an
    opaque broadcast error deep in flax init. ``final_attention``'s first
    Dense adapts to any INPUT width, but its user vector comes out
    ``reduced_dim``-wide and is cosine-scored against the D-wide news
    embeddings downstream, so the same equality must hold there too (the
    failure is just deferred to an opaque scoring-shape error otherwise)."""
    if dim != config.reduced_dim:
        raise ValueError(
            f"news embeddings are {dim}-dim but the {config.kind} tower is "
            f"configured with reduced_dim={config.reduced_dim}; these must "
            f"match. Pass {flag_hint} {dim} on the CLI (or "
            f"TowerConfig(reduced_dim={dim})) so training, eval, and serving "
            "all restore the same geometry."
        )


def supports_flat_scoring(config: TowerConfig) -> bool:
    """True when the tower is token-local up to its final pool, i.e. every
    history token's hidden state depends only on that token (the latent tower:
    each token cross-attends to the 64 SHARED latents; softmax is over latents,
    per token). Such towers can run over the flat token stream with zero
    padding (``ops.scoring.user_vectors_flat``). ``final_attention`` softmaxes
    over the history axis and ``transformer`` self-attends across it — both
    need the padded [batch, bucket] path."""
    return config.kind == "latent"


__all__ = [
    "ClassificationHead",
    "ClassificationHeadCatEmbed",
    "CrossAttention",
    "EmbeddingWrapper",
    "ResizeWrapperModel",
    "FinalAttention",
    "GEGLUFeedForward",
    "GatedMLP",
    "LatentAttentionTower",
    "POOLING",
    "ReducingModel",
    "SelfAttention",
    "TokenAttentionPool",
    "TransformerEncoder",
    "TransformerLayer",
    "TransformerTower",
    "WeightedSumModel",
    "average_pool",
    "build_tower",
    "first_token_pool",
    "last_token_pool",
    "pooling_for_architecture",
    "supports_flat_scoring",
]
