"""Torch->flax converters for the trained towers.

The reference warm-starts every tower factory from a ``torch.save``'d state
dict (``modeling_utils.py:139-148,274-279,430-435,449-453,516-524``,
``get_latent_attention_model`` ``:151-155``). These converters map those state
dicts (as numpy arrays) onto the corresponding flax modules' param trees so
reference-trained checkpoints migrate losslessly, and so parity tests can run
both frameworks from literally identical weights.

Conventions (same as ``news_encoder.convert_hf_state_dict``):
- torch ``Linear.weight`` is [out, in]; flax ``Dense.kernel`` is [in, out] — transpose.
- torch ``LayerNorm.weight`` -> flax ``LayerNorm.scale``.
- packed projections (qkv, up_gate, kv) keep their packing order on the output
  axis in both frameworks, so a plain transpose is exact.

Every converter returns a ``{"params": ...}`` variables dict ready for
``module.apply``.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..config import NUM_HIDDEN_LAYERS

Array = np.ndarray
StateDict = Mapping[str, Any]


def _np(state: StateDict, key: str) -> Array:
    try:
        arr = state[key]
    except KeyError:
        raise KeyError(
            f"torch state dict is missing {key!r}; have {sorted(state)[:20]}..."
        ) from None
    if hasattr(arr, "detach"):  # torch tensor
        arr = arr.detach().cpu().float().numpy()
    return np.asarray(arr)


def _lin(state: StateDict, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _np(state, prefix + ".weight").T}
    if bias:
        out["bias"] = _np(state, prefix + ".bias")
    return out


def _ln(state: StateDict, prefix: str) -> dict:
    return {"scale": _np(state, prefix + ".weight"), "bias": _np(state, prefix + ".bias")}


def convert_classification_head(state: StateDict) -> dict:
    """Reference ``ClassificationHead`` (``modeling_utils.py:106-116``)."""
    return {
        "params": {
            "linear_1": _lin(state, "linear_1"),
            "linear_2": _lin(state, "linear_2"),
            "linear_3": _lin(state, "linear_3"),
        }
    }


def convert_classification_head_cat_embed(state: StateDict) -> dict:
    """Reference ``ClassificationHeadCatEmbed`` (``modeling_utils.py:119-136``)."""
    return {
        "params": {
            "cat_embed": {"embedding": _np(state, "cat_embed.weight")},
            "linear_1": _lin(state, "linear_1"),
            "linear_2": _lin(state, "linear_2"),
            "linear_3": _lin(state, "linear_3"),
        }
    }


def convert_final_attention(state: StateDict) -> dict:
    """Reference ``FinalAttention`` (``modeling_utils.py:175-228``): linear1-4
    with bias, linear5 bias-free."""
    return {
        "params": {
            "linear1": _lin(state, "linear1"),
            "linear2": _lin(state, "linear2"),
            "linear3": _lin(state, "linear3"),
            "linear4": _lin(state, "linear4"),
            "linear5": _lin(state, "linear5", bias=False),
        }
    }


def convert_weighted_sum(state: StateDict) -> dict:
    """Reference ``WeightedSumModel`` (``modeling_utils.py:158-165``)."""
    return {"params": {"alpha": _np(state, "alpha")}}


def convert_reducing_model(state: StateDict) -> dict:
    """Reference ``ReducingModel`` (``modeling_utils.py:438-446``)."""
    return {
        "params": {
            "linear": _lin(state, "linear"),
            "linear2": _lin(state, "linear2"),
        }
    }


def _convert_encoder_layers(state: StateDict, num_layers: int, prefix: str) -> dict:
    """Reference ``MyEncoder`` (``attention.py:197-207``): per-layer packed-QKV
    attention + gated MLP + two LayerNorms."""
    layers = {}
    for i in range(num_layers):
        p = f"{prefix}layer.{i}"
        layers[f"layer_{i}"] = {
            "attention": {
                "qkv_proj": _lin(state, f"{p}.attention.qkv_proj"),
                "o_proj": _lin(state, f"{p}.attention.o_proj"),
            },
            "g_mlp": {
                "up_gate_proj": _lin(state, f"{p}.g_mlp.up_gate_proj", bias=False),
                "down_proj": _lin(state, f"{p}.g_mlp.down_proj"),
            },
            "attn_layernorm": _ln(state, f"{p}.attn_layernorm"),
            "g_mlp_layernorm": _ln(state, f"{p}.g_mlp_layernorm"),
        }
    return layers


def convert_transformer_tower(
    state: StateDict, num_layers: int = NUM_HIDDEN_LAYERS
) -> dict:
    """Reference ``NewAttention`` (``attention.py:210-272``): ``MyEncoder`` +
    the exp-weight readout ``linear1``."""
    return {
        "params": {
            "encoder": _convert_encoder_layers(state, num_layers, "encoder."),
            "linear1": _lin(state, "linear1"),
        }
    }


def convert_token_attention_pool(
    state: StateDict, num_layers: int = NUM_HIDDEN_LAYERS
) -> dict:
    """Reference ``FirstAttentionPoolFunc`` (``modeling_utils.py:498-513``):
    bare ``MyEncoder`` (the pool has no params)."""
    return {
        "params": {"encoder": _convert_encoder_layers(state, num_layers, "encoder.")}
    }


def convert_latent_attention(state: StateDict) -> dict:
    """Reference ``LatentAttentionModel`` (``latent_attention.py:77-171``):
    learned latents + PreNorm cross-attention + PreNorm GEGLU FF."""
    attn = "cross_attend_blocks.0"
    ff = "cross_attend_blocks.1"
    return {
        "params": {
            "latents": _np(state, "latents"),
            "cross_prenorm": _ln(state, f"{attn}.norm"),
            "cross_prenorm_context": _ln(state, f"{attn}.norm_context"),
            "cross_attn": {
                "to_q": _lin(state, f"{attn}.fn.to_q", bias=False),
                "to_kv": _lin(state, f"{attn}.fn.to_kv", bias=False),
                "to_out": _lin(state, f"{attn}.fn.to_out", bias=False),
            },
            "ff_prenorm": _ln(state, f"{ff}.norm"),
            "cross_ff": {
                "proj_in": _lin(state, f"{ff}.fn.net.0"),
                "proj_out": _lin(state, f"{ff}.fn.net.2"),
            },
        }
    }


def convert_embedding_wrapper(state: StateDict, convert_wrapped) -> dict:
    """Reference ``EmbeddingWrapper`` (``modeling_utils.py:326-340``).
    ``convert_wrapped`` converts the inner module's sub-state-dict."""
    inner = {
        k[len("wrapped_model."):]: v
        for k, v in state.items()
        if k.startswith("wrapped_model.")
    }
    return {
        "params": {
            "cat_embed": {"embedding": _np(state, "cat_embed.weight")},
            "subcat_embed": {"embedding": _np(state, "subcat_embed.weight")},
            "wrapped": convert_wrapped(inner)["params"],
        }
    }


def convert_resize_wrapper(state: StateDict, convert_wrapped) -> dict:
    """Reference ``ResizeWrapperModel`` (``modeling_utils.py:349-364``)."""
    inner = {
        k[len("wrapped_model."):]: v
        for k, v in state.items()
        if k.startswith("wrapped_model.")
    }
    return {
        "params": {
            "bottleneck_in": _lin(state, "bottleneck_in"),
            "bottleneck_out": _lin(state, "bottleneck_out"),
            "wrapped": convert_wrapped(inner)["params"],
        }
    }


# Tower-kind dispatch matching ``TowerConfig.kind`` / the reference factories.
CONVERTERS = {
    "final_attention": convert_final_attention,
    "transformer": convert_transformer_tower,
    "latent": convert_latent_attention,
    "classification": convert_classification_head,
    "weighted_sum": convert_weighted_sum,
    "reducing": convert_reducing_model,
    "token_attention": convert_token_attention_pool,
}


def load_reference_tower_checkpoint(path, kind: str) -> dict:
    """Load a reference ``torch.save``'d tower state dict from ``path`` and
    return the flax variables for the matching tower kind (the reference's
    ``model_path`` warm-start surface, ``modeling_utils.py:139-148``)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    try:
        converter = CONVERTERS[kind]
    except KeyError:
        raise ValueError(
            f"Unknown tower kind {kind!r}; supported: {sorted(CONVERTERS)}"
        ) from None
    return converter(state)
