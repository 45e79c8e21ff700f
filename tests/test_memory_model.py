"""Analytic batch-size estimators — one per reference autotuner probe
(``batch_size_finder.py:152-276``): sanity, budget-respect, and monotonicity
per task, plus the call-site auto-wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_project_v2_tpu.config import EncoderConfig, TowerConfig
from news_recommendation_project_v2_tpu.utils.memory import (
    TRAIN_MULTIPLIER,
    encoder_activation_bytes,
    estimate_e2e_unique_news,
    estimate_encoder_batch,
    estimate_flat_chunk,
    estimate_head_batch,
    estimate_token_attention_batch,
    estimate_tower_batch,
    estimate_tower_train_batch,
    flat_token_bytes,
    tower_activation_bytes,
)

GiB = 1024**3


def test_tower_batch_respects_budget():
    cfg = TowerConfig(kind="latent")
    for L in (16, 64, 600):
        b = estimate_tower_batch(cfg, L, hbm_budget_bytes=16 * GiB)
        assert b >= 8 and b % 8 == 0
        assert tower_activation_bytes(cfg, b, L) <= 0.25 * 16 * GiB
        # One more row bucket would overflow the budget.
        assert tower_activation_bytes(cfg, b + 8, L) > 0.25 * 16 * GiB


def test_tower_train_batch_is_smaller():
    cfg = TowerConfig(kind="latent")
    inf = estimate_tower_batch(cfg, 64, hbm_budget_bytes=16 * GiB)
    tr = estimate_tower_train_batch(cfg, 64, hbm_budget_bytes=16 * GiB)
    assert tr < inf
    assert tr >= inf // (TRAIN_MULTIPLIER + 1)


def test_flat_chunk_power_of_two_and_budget():
    cfg = TowerConfig(kind="latent", compute_dtype="bfloat16")
    chunk = estimate_flat_chunk(cfg, hbm_budget_bytes=16 * GiB)
    assert chunk & (chunk - 1) == 0  # power of two
    assert chunk * flat_token_bytes(cfg) <= 0.25 * 16 * GiB
    assert 2 * chunk * flat_token_bytes(cfg) > 0.25 * 16 * GiB
    # The v5e-1 hand-tuned value is recovered by the model.
    assert chunk == 131072


def test_flat_chunk_rejects_non_token_local():
    with pytest.raises(ValueError):
        estimate_flat_chunk(TowerConfig(kind="transformer"))


def test_encoder_batch_monotone_in_length():
    cfg = EncoderConfig()  # e5-large geometry, bf16 compute
    batches = [
        estimate_encoder_batch(cfg, length=L, hbm_budget_bytes=16 * GiB)
        for L in (32, 128, 512)
    ]
    assert batches[0] >= batches[1] >= batches[2] >= 8
    assert (
        encoder_activation_bytes(cfg, batches[2], 512) <= 0.25 * 16 * GiB
    )


def test_token_attention_and_e2e_estimates():
    b_inf = estimate_token_attention_batch(
        dim=1024, token_len=512, hbm_budget_bytes=16 * GiB
    )
    m_train = estimate_e2e_unique_news(
        dim=1024, token_len=512, hbm_budget_bytes=16 * GiB
    )
    assert b_inf >= 8 and m_train >= 8
    # Training (fwd+bwd residuals) fits fewer news than inference.
    assert m_train < b_inf


def test_head_batch_train_vs_inference():
    inf = estimate_head_batch(1024, hbm_budget_bytes=16 * GiB)
    tr = estimate_head_batch(1024, train=True, hbm_budget_bytes=16 * GiB)
    assert tr < inf
    assert inf % 8 == 0 and tr % 8 == 0


def test_encode_corpus_auto_batch():
    """batch_size=None + encoder_config auto-sizes (and still encodes right)."""
    from news_recommendation_project_v2_tpu.models.news_encoder import (
        HashTokenizer,
        NewsEncoder,
    )
    from news_recommendation_project_v2_tpu.ops.encode import encode_corpus

    cfg = EncoderConfig(
        vocab_size=96, hidden_dim=16, num_layers=1, num_heads=2,
        intermediate_dim=32, max_position=16, compute_dtype="float32",
    )
    enc = NewsEncoder(cfg)
    tok = HashTokenizer(vocab_size=96, max_length=8)
    ids, mask = tok([f"text {i}" for i in range(5)])
    params = jax.jit(
        lambda: enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))
    )()
    auto = encode_corpus(
        lambda p, i, m: enc.apply(p, i, m), params, ids, mask,
        batch_size=None, encoder_config=cfg,
    )
    fixed = encode_corpus(
        lambda p, i, m: enc.apply(p, i, m), params, ids, mask, batch_size=8
    )
    np.testing.assert_allclose(np.asarray(auto), np.asarray(fixed), atol=1e-5)


def test_materialize_auto_batch():
    from news_recommendation_project_v2_tpu.models import TokenAttentionPool
    from news_recommendation_project_v2_tpu.ops.encode import (
        TokenStore,
        materialize_from_token_store,
    )

    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal((3, 16)).astype(np.float32) for _ in range(7)]
    store = TokenStore.from_ragged(arrays)
    model = TokenAttentionPool(hidden_size=16, num_layers=1)
    params = jax.jit(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 4, 16)), jnp.ones((1, 4)))
    )()
    auto = materialize_from_token_store(
        model.apply, params, store, batch_size=None, max_token_len=4,
        token_buckets=(4,),
    )
    fixed = materialize_from_token_store(
        model.apply, params, store, batch_size=8, max_token_len=4,
        token_buckets=(4,),
    )
    np.testing.assert_allclose(auto, fixed, atol=1e-5)


def test_serve_batch_cap():
    """The serving request-batch cap (serve.Ranker shape groups) is a pow2,
    shrinks with the shape-group footprint, and scales with the budget."""
    from news_recommendation_project_v2_tpu.utils.memory import (
        estimate_serve_batch_cap,
    )

    GB = 1024**3
    big = estimate_serve_batch_cap(1024, 600, 300, hbm_budget_bytes=16 * GB)
    small = estimate_serve_batch_cap(1024, 64, 50, hbm_budget_bytes=16 * GB)
    assert big & (big - 1) == 0 and small & (small - 1) == 0  # pow2
    assert small >= big >= 8  # bigger shapes -> smaller cap; floor holds
    # Linear in budget (up to pow2 flooring), never below the floor of 8.
    assert estimate_serve_batch_cap(1024, 600, 300, hbm_budget_bytes=64 * GB) >= big
    assert estimate_serve_batch_cap(4096, 600, 600, hbm_budget_bytes=1 * GB) == 8


def test_fits_device_token_store_sharded_aggregate():
    """num_shards budgets the ROW-SHARDED store against aggregate mesh HBM
    (per-device budget stays fixed): MIND-large title-only (~10.2GB f32)
    exceeds one 16GB chip's 0.35 budget but fits 8 shards at ~1.3GB/chip —
    the regime VERDICT r4 #1 targets."""
    from news_recommendation_project_v2_tpu.utils.memory import (
        fits_device_token_store,
    )

    GB = 1024**3
    total, dim = 104_151 * 24, 1024  # MIND-large title-only geometry
    assert not fits_device_token_store(total, dim, hbm_budget_bytes=16 * GB)
    assert fits_device_token_store(
        total, dim, hbm_budget_bytes=16 * GB, num_shards=8
    )
    # full-text stores exceed even the 8-chip aggregate
    assert not fits_device_token_store(
        104_151 * 512, dim, hbm_budget_bytes=16 * GB, num_shards=8
    )
    # num_shards=1 is the old single-chip semantics exactly
    assert fits_device_token_store(
        1_000_000, dim, hbm_budget_bytes=16 * GB
    ) == fits_device_token_store(
        1_000_000, dim, hbm_budget_bytes=16 * GB, num_shards=1
    )
