"""Sequence pooling strategies for encoder hidden states.

Capability parity with reference ``modeling_utils.py:37-75`` (last-token /
first-token / masked-mean pooling plus architecture-name dispatch)."""

from __future__ import annotations

import jax.numpy as jnp


def last_token_pool(hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Last *real* token per sequence; handles both left- and right-padding
    (reference ``modeling_utils.py:37-48``). [B, L, D], [B, L] -> [B, D]."""
    left_padded = mask[:, -1].sum() == mask.shape[0]
    seq_lengths = mask.sum(axis=1) - 1
    right_pool = jnp.take_along_axis(
        hidden, seq_lengths[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    return jnp.where(left_padded, hidden[:, -1], right_pool)


def first_token_pool(hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """CLS pooling (reference ``modeling_utils.py:51-52``)."""
    del mask
    return hidden[:, 0]


def average_pool(hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean pooling — the e5/XLMRoberta path (reference
    ``modeling_utils.py:55-59``)."""
    m = mask[..., None].astype(hidden.dtype)
    return (hidden * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


POOLING = {
    "last": last_token_pool,
    "first": first_token_pool,
    "mean": average_pool,
}


def pooling_for_architecture(architecture: str):
    """Architecture-name dispatch (reference ``modeling_utils.py:62-75``)."""
    return {
        "Qwen2ForCausalLM": last_token_pool,
        "NewModel": first_token_pool,
        "XLMRobertaModel": average_pool,
    }.get(architecture, first_token_pool)
