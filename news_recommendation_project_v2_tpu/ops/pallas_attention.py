"""Pallas TPU kernel: fused latent cross-attention (the user tower's hot op).

The latent-attention tower computes, per history row, ``softmax(Q K^T) V`` where
Q comes from the (up to 600-item) clicked history and K/V from 64 shared learned
latents (reference semantics: ``latent_attention.py:51-74``, no mask inside the
attention). XLA's unfused path materializes the [B, H, L, N] probability tensor
in HBM; this kernel keeps Q-block, K, V, logits, and the output block in VMEM —
one grid step per (batch row, head) — so HBM sees only Q in and O out.

Forward runs in Pallas; the backward pass is plain jnp (via ``jax.custom_vjp``):
with N=64 latents the backward is tiny and XLA-fuses well.

Written per /opt/skills/guides/pallas_guide.md (grid/BlockSpec/MXU rules).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q_ref: [1, 1, L, dh]; k_ref/v_ref: [1, N, dh]; o_ref: [1, 1, L, dh]
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [L, N]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _fused_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    b, h, l, dh = q.shape
    n = k.shape[1]
    scale = dh**-0.5
    # Interpret mode off-TPU so the same code path runs in CPU tests.
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, l, dh), q.dtype),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(
                (1, 1, l, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, n, dh), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dh), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, l, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(q, k, v)


def _reference_attention(q, k, v):
    """Plain jnp semantics-equivalent (also the interpret-mode oracle)."""
    dh = q.shape[-1]
    logits = jnp.einsum("bhld,hnd->bhln", q, k) * (dh**-0.5)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhln,hnd->bhld", probs, v)


@jax.custom_vjp
def fused_latent_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """``softmax(q @ k^T / sqrt(dh)) @ v``.

    q: [B, H, L, dh] history queries; k, v: [H, N, dh] shared latent keys/values.
    Returns [B, H, L, dh].
    """
    return _fused_forward(q, k, v)


def _fwd(q, k, v):
    return _fused_forward(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    dh = q.shape[-1]
    scale = dh**-0.5
    logits = jnp.einsum("bhld,hnd->bhln", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dprobs = jnp.einsum("bhld,hnd->bhln", g32, v32)
    dlogits = probs * (dprobs - (probs * dprobs).sum(-1, keepdims=True))
    dq = jnp.einsum("bhln,hnd->bhld", dlogits, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhln,bhld->hnd", dlogits, q.astype(jnp.float32)) * scale
    dv = jnp.einsum("bhln,bhld->hnd", probs, g32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_latent_attention.defvjp(_fwd, _bwd)
