"""Analytic batch sizing: the TPU-native replacement for the reference's
OOM-bisection batch autotuner (``batch_size_finder.py:103-276``).

On GPU+torch the reference probes capacity by catching OOM errors in a
doubling/bisection loop with synthetic max-shape inputs (``dummy.py``). Under
XLA that is both unnecessary and unreliable (compile-time allocation): peak
activation memory is a simple function of (batch, length, widths), so batch
sizes come from arithmetic — this is also what drives the ``tokens_per_batch``
budget in ``ops.scoring``.
"""

from __future__ import annotations

import jax

from ..config import TowerConfig


def tower_activation_bytes(
    config: TowerConfig, batch: int, length: int, bytes_per_el: int = 4
) -> int:
    """Upper-bound activation footprint of one tower forward.

    Dominant terms per history token: the widest FFN intermediate
    (latent tower: GEGLU in = dim*mult*2 = 8*dim; final_attention: hidden_dim;
    transformer: 2*intermediate), plus QKV projections, plus the input block.
    """
    d = config.reduced_dim
    tokens = batch * length
    if config.kind == "latent":
        inner = config.num_heads * config.latent_dim_head
        widest = max(8 * d, 2 * inner)  # GEGLU in vs packed-KV/Q blocks
        probs = batch * config.num_heads * length * config.num_latents
    elif config.kind == "final_attention":
        widest = 2 * config.hidden_dim
        probs = 0
    else:  # transformer
        widest = 2 * 3072 + 3 * d
        probs = batch * 8 * length * length
    return (tokens * (widest + 4 * d) + probs) * bytes_per_el


def estimate_tower_batch(
    config: TowerConfig,
    length: int,
    hbm_budget_bytes: int | None = None,
    fraction: float = 0.25,
) -> int:
    """Largest multiple-of-8 batch whose activations fit in ``fraction`` of the
    device's memory (defaults to the current device's HBM)."""
    if hbm_budget_bytes is None:
        stats = jax.devices()[0].memory_stats() or {}
        hbm_budget_bytes = stats.get("bytes_limit", 16 * 1024**3)
    budget = int(hbm_budget_bytes * fraction)
    per_row = tower_activation_bytes(config, 1, length)
    batch = max(8, (budget // max(per_row, 1)) // 8 * 8)
    return batch
