"""Pallas TPU kernel: fused GEGLU feed-forward (proj_in -> gate -> proj_out).

The latent tower's FFN computes ``proj_out(h * gelu(g))`` with
``[h, g] = x @ W_in + b_in`` — XLA materializes the [tokens, 8*dim] GEGLU
intermediate in HBM twice (write after proj_in, read for the gate/proj_out),
which is the dominant non-MXU traffic of the flat scoring path
(BASELINE.md roofline: ~21% MXU gap). This kernel streams W_in/W_out tiles
through VMEM and keeps the intermediate entirely on-chip: HBM sees only x in
and the output block out.

Grid: (tokens/BLOCK_C, dim_ff/BLOCK_K); the k axis is innermost so the f32
output block stays resident in VMEM across the reduction (revisited output
blocks are not re-fetched between consecutive grid steps).

Written per /opt/skills/guides/pallas_guide.md (grid/BlockSpec/MXU rules).
Forward-only: the eval path needs no VJP; training uses the XLA FFN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _geglu_kernel(x_ref, wh_ref, wg_ref, bh_ref, bg_ref, wo_ref, bo_ref, o_ref):
    j = pl.program_id(1)
    x = x_ref[...]
    h = (
        jnp.dot(x, wh_ref[...], preferred_element_type=jnp.float32)
        + bh_ref[...].astype(jnp.float32)
    )
    g = (
        jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
        + bg_ref[...].astype(jnp.float32)
    )
    # Match the XLA path's dtype chain: Dense outputs cast to the param dtype
    # before the elementwise gate (flax promotes to the widest input dtype).
    fused = (h * jax.nn.gelu(g, approximate=True)).astype(x.dtype)
    part = jnp.dot(fused, wo_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        o_ref[...] = part + bo_ref[...].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        o_ref[...] = o_ref[...] + part


def fused_geglu(
    x: jnp.ndarray,  # [C, D]
    w_in: jnp.ndarray,  # [D, 2*F] (h columns first, gate columns second)
    b_in: jnp.ndarray,  # [2*F]
    w_out: jnp.ndarray,  # [F, D]
    b_out: jnp.ndarray,  # [D]
    block_c: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """``(x @ w_in + b_in)`` -> split -> ``h * gelu(g)`` -> ``@ w_out + b_out``
    without materializing the [C, 2F] intermediate in HBM. Returns f32
    (the reduction accumulator); callers cast as needed."""
    c, d = x.shape
    f = w_out.shape[0]
    assert w_in.shape == (d, 2 * f) and b_in.shape == (2 * f,)
    assert c % block_c == 0 and f % block_k == 0
    nk = f // block_k
    b_in2 = b_in.reshape(1, 2 * f)
    b_out2 = b_out.reshape(1, d)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _geglu_kernel,
        out_shape=jax.ShapeDtypeStruct((c, d), jnp.float32),
        grid=(c // block_c, nk),
        in_specs=[
            pl.BlockSpec((block_c, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            # W_in twice: h columns (block j) and gate columns (block j + nk).
            pl.BlockSpec(
                (d, block_k), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, block_k), lambda i, j, nk=nk: (0, j + nk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, block_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, block_k), lambda i, j, nk=nk: (0, j + nk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_k, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_c, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, w_in, w_in, b_in2, b_in2, w_out, b_out2)


def reference_geglu(x, w_in, b_in, w_out, b_out):
    """Plain jnp semantics-equivalent (the interpret-mode oracle; mirrors
    ``models.latent_attention.GEGLUFeedForward``)."""
    hg = x @ w_in + b_in.astype(x.dtype)
    h, g = jnp.split(hg, 2, axis=-1)
    fused = h * jax.nn.gelu(g, approximate=True)
    return (fused @ w_out + b_out).astype(jnp.float32)
