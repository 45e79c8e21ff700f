"""Analytic batch sizing: the TPU-native replacement for the reference's
OOM-bisection batch autotuner (``batch_size_finder.py:103-276``).

On GPU+torch the reference probes capacity by catching OOM errors in a
doubling/bisection loop with synthetic max-shape inputs (``dummy.py``). Under
XLA that is both unnecessary and unreliable (compile-time allocation): peak
activation memory is a simple function of (batch, length, widths), so batch
sizes come from arithmetic.

Task coverage mirrors the reference's seven probes
(``batch_size_finder.py:152-276``):

| reference probe                        | analytic equivalent here          |
|----------------------------------------|-----------------------------------|
| get_text_inference_batch_size          | ``estimate_encoder_batch``        |
| get_nv_embed_batch_size                | ``estimate_encoder_batch`` (last-token geometry is the same transformer) |
| get_attention_inference_batch_size     | ``estimate_tower_batch`` + ``estimate_flat_chunk`` (flat path) |
| get_attention_train_batch_size         | ``estimate_tower_train_batch``    |
| get_token_attention_inference_batch_size | ``estimate_token_attention_batch`` |
| get_attention_attention_train_batch_size | ``estimate_e2e_unique_news``    |
| get_classification_{train,inference}_batch_size | ``estimate_head_batch``  |
"""

from __future__ import annotations

from typing import Optional

import jax

from ..config import EncoderConfig, TowerConfig

# Training holds the forward residuals for the backward pass plus gradient
# buffers: a ~3x multiplier over inference activations is the standard
# envelope for non-rematerialized transformer blocks.
TRAIN_MULTIPLIER = 3

_DTYPE_BYTES = {"float32": 4, "bfloat16": 2, "float16": 2}


def _bytes_per_el(config, bytes_per_el: Optional[int]) -> int:
    if bytes_per_el is not None:
        return bytes_per_el
    return _DTYPE_BYTES.get(getattr(config, "compute_dtype", "float32"), 4)


def _budget(hbm_budget_bytes: Optional[int], fraction: float) -> int:
    if hbm_budget_bytes is None:
        # local_devices: jax.devices()[0] may belong to ANOTHER process on
        # multi-host runtimes, where memory_stats() raises (non-addressable);
        # fleets are homogeneous so the local device's limit is the fleet's.
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            stats = {}
        hbm_budget_bytes = stats.get("bytes_limit", 16 * 1024**3)
    return int(hbm_budget_bytes * fraction)


def _floor_multiple(x: int, m: int) -> int:
    return max(m, (x // m) * m)


def _floor_pow2(x: int, lo: int = 1024) -> int:
    p = lo
    while p * 2 <= x:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# Activation models
# ---------------------------------------------------------------------------


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


def transformer_activation_bytes(
    hidden_dim: int,
    num_heads: int,
    intermediate_dim: int,
    batch: int,
    length: int,
    bytes_per_el: int = 4,
) -> int:
    """Generic encoder-block activation envelope: XLA reuses buffers across
    sequential layers, so peak live is ~one layer's intermediates (QKV +
    attention probs + FFN in/out) plus the residual stream in and out."""
    tokens = batch * length
    per_token = 3 * hidden_dim + 2 * intermediate_dim + 3 * hidden_dim
    probs = batch * num_heads * length * length
    return (tokens * per_token + probs) * bytes_per_el


def encoder_activation_bytes(
    config: EncoderConfig, batch: int, length: Optional[int] = None,
    bytes_per_el: Optional[int] = None,
) -> int:
    """Reference ``dummy_text_inputs_outputs`` capacity model
    (``dummy.py`` + ``batch_size_finder.py:152-169``), analytically."""
    length = length or config.max_length
    return transformer_activation_bytes(
        config.hidden_dim,
        config.num_heads,
        config.intermediate_dim,
        batch,
        length,
        _bytes_per_el(config, bytes_per_el),
    )


def flat_token_bytes(config: TowerConfig, bytes_per_el: Optional[int] = None) -> int:
    """Per-token activation footprint of the flat (zero-padding) scoring path
    (``ops.scoring.user_vectors_flat``): the same per-token terms as
    ``tower_activation_bytes`` with the probs term amortized per token."""
    b = _bytes_per_el(config, bytes_per_el)
    d = config.reduced_dim
    if config.kind != "latent":
        raise ValueError("flat scoring applies to token-local towers only")
    inner = config.num_heads * config.latent_dim_head
    widest = max(8 * d, 2 * inner)
    per_token = widest + 4 * d + config.num_heads * config.num_latents
    return per_token * b


# ---------------------------------------------------------------------------
# Batch estimators (one per reference probe)
# ---------------------------------------------------------------------------


def estimate_tower_batch(
    config: TowerConfig,
    length: int,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.25,
) -> int:
    """Largest multiple-of-8 batch whose activations fit in ``fraction`` of the
    device's memory (tower INFERENCE; reference
    ``get_attention_inference_batch_size``)."""
    budget = _budget(hbm_budget_bytes, fraction)
    per_row = tower_activation_bytes(config, 1, length)
    return _floor_multiple(budget // max(per_row, 1), 8)


def estimate_tower_train_batch(
    config: TowerConfig,
    length: int,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.25,
) -> int:
    """Tower TRAIN batch (reference ``get_attention_train_batch_size``):
    inference envelope divided by the fwd+bwd residual multiplier."""
    budget = _budget(hbm_budget_bytes, fraction)
    per_row = tower_activation_bytes(config, 1, length) * TRAIN_MULTIPLIER
    return _floor_multiple(budget // max(per_row, 1), 8)


def estimate_flat_chunk(
    config: TowerConfig,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.25,
    bytes_per_el: Optional[int] = None,
) -> int:
    """Token-chunk size for the flat scoring path, floored to a power of two
    so chunk shapes (and their compiled programs) are stable across datasets.
    Replaces hand-tuned ``tokens_per_batch`` constants."""
    budget = _budget(hbm_budget_bytes, fraction)
    per_token = flat_token_bytes(config, bytes_per_el)
    return _floor_pow2(budget // max(per_token, 1))


def estimate_encoder_batch(
    config: EncoderConfig,
    length: Optional[int] = None,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.25,
) -> int:
    """Text-inference batch for the news encoder (reference
    ``get_text_inference_batch_size`` / ``get_nv_embed_batch_size`` — the
    NV-Embed last-token path is the same transformer geometry)."""
    budget = _budget(hbm_budget_bytes, fraction)
    per_row = encoder_activation_bytes(config, 1, length)
    return _floor_multiple(budget // max(per_row, 1), 8)


def estimate_token_attention_batch(
    dim: int,
    token_len: int,
    num_heads: int = 8,
    intermediate_dim: int = 3072,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.25,
) -> int:
    """Token-attention (learned pooling) inference batch over stored token
    states (reference ``get_token_attention_inference_batch_size``)."""
    budget = _budget(hbm_budget_bytes, fraction)
    per_row = transformer_activation_bytes(
        dim, num_heads, intermediate_dim, 1, token_len
    ) + token_len * dim * 4  # the gathered f32 token-state input itself
    return _floor_multiple(budget // max(per_row, 1), 8)


def estimate_e2e_unique_news(
    dim: int,
    token_len: int,
    num_heads: int = 8,
    intermediate_dim: int = 3072,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.25,
) -> int:
    """End-to-end (token encoder + tower) TRAIN capacity, expressed as the
    unique-news count M per batch — the axis that actually drives memory in
    ``EndToEndTrainer`` ([M, T, D] token states + token-encoder fwd+bwd;
    reference ``get_attention_attention_train_batch_size``)."""
    budget = _budget(hbm_budget_bytes, fraction)
    per_news = (
        transformer_activation_bytes(dim, num_heads, intermediate_dim, 1, token_len)
        * TRAIN_MULTIPLIER
        + token_len * dim * 4
    )
    return _floor_multiple(budget // max(per_news, 1), 8)


def estimate_metric_rows(
    max_len: int,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.125,
) -> int:
    """Row-chunk size for the on-device metric pass
    (``eval.device_metrics``): the per-row live set is ~a dozen [L]-wide f32
    temporaries (3-operand sort, tie-group cumulatives, gain vectors), floored
    to a power of two so chunk shapes are stable across datasets."""
    budget = _budget(hbm_budget_bytes, fraction)
    per_row = 16 * 4 * max(max_len, 1)
    return _floor_pow2(budget // max(per_row, 1), lo=64)


def estimate_head_batch(
    in_dim: int,
    hidden_dim: int = 4096,
    train: bool = False,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.25,
) -> int:
    """Classification-head batch (reference
    ``get_classification_{train,inference}_batch_size``): per-row cost is just
    the MLP widths."""
    budget = _budget(hbm_budget_bytes, fraction)
    per_row = (in_dim + 2 * hidden_dim) * 4 * (TRAIN_MULTIPLIER if train else 1)
    return _floor_multiple(budget // max(per_row, 1), 8)


def estimate_serve_batch_cap(
    dim: int,
    history_len: int,
    num_candidates: int,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.0625,
    tower_multiplier: int = 12,
) -> int:
    """Power-of-two request-batch cap for one ``serve.Ranker`` shape group
    ([B, L] histories x [B, C] candidates).

    ``Ranker`` takes a bare ``tower_apply`` with no ``TowerConfig``, so the
    tower's internal widths are covered by a generic ``tower_multiplier`` on
    the gathered [L, D] input block — an upper bound over the shipped towers
    (the latent tower's widest activation is the 8x-dim GEGLU input plus QKV
    blocks ~ 12x the input row; ``tower_activation_bytes``). The pow2 result
    keeps the batch-axis compile surface log-bounded (group sizes pad up to
    it, larger groups chunk at it), and chunking at the cap also bounds pad
    waste: one huge group would otherwise pad up to 2x its own size.
    """
    budget = _budget(hbm_budget_bytes, fraction)
    per_row = (history_len * dim * tower_multiplier + num_candidates * dim) * 4
    return _floor_pow2(max(budget // max(per_row, 1), 8), lo=8)


def fits_device_token_store(
    total_tokens: int,
    dim: int,
    bytes_per_el: int = 4,
    hbm_budget_bytes: Optional[int] = None,
    fraction: float = 0.35,
    num_shards: int = 1,
) -> bool:
    """True when the WHOLE flat token store fits in HBM next to params,
    optimizer state, and step activations (``EndToEndTrainer``'s
    device-resident store: states gathered inside the jitted step, so the
    per-step host->device transfer is index grids instead of the [M, T, D]
    token block). MIND-small title-only stores (~1.6M tokens x 1024 f32 ~
    6.5GB) fit a 16GB chip; 512-token full-text stores (~137GB) do not and
    keep the streaming host path.

    ``num_shards`` budgets a ROW-SHARDED store over a device mesh
    (``parallel.sharding.shard_token_store_states``: each device holds
    total/num_shards rows, so the fleet's AGGREGATE HBM is the budget —
    MIND-large title-only ~10.2GB exceeds one 16GB chip but is ~1.3GB/chip
    on 8 devices). ``hbm_budget_bytes`` stays PER-DEVICE either way."""
    per_device = -(-total_tokens // max(num_shards, 1)) * dim * bytes_per_el
    return per_device <= _budget(hbm_budget_bytes, fraction)
