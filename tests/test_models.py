"""Seeded forward tests for every tower (shapes, masking invariants, dropout
determinism, reference-parity behaviors). SURVEY.md §4(c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_project_v2_tpu.config import TowerConfig
from news_recommendation_project_v2_tpu.models import (
    ClassificationHead,
    FinalAttention,
    LatentAttentionTower,
    ReducingModel,
    TokenAttentionPool,
    TransformerLayer,
    TransformerTower,
    WeightedSumModel,
    average_pool,
    build_tower,
    first_token_pool,
    last_token_pool,
)

D = 64  # small embedding dim for fast tests

# Eager op-by-op dispatch is very slow in this environment; always jit.
def jinit(module, *args, **kwargs):
    return jax.jit(lambda: module.init(jax.random.key(0), *args, **kwargs))()


def japply(module, params, *args, **kwargs):
    return jax.jit(lambda p: module.apply(p, *args, **kwargs))(params)


def seeded(module, *args, **kwargs):
    params = jinit(module, *args, **kwargs)
    return params, japply(module, params, *args, **kwargs)


def history_batch(rng, b=4, l=8, d=D):
    emb = jnp.asarray(rng.standard_normal((b, l, d)), dtype=jnp.float32)
    lens = rng.integers(1, l + 1, size=b)
    mask = jnp.asarray(
        (np.arange(l)[None, :] < lens[:, None]).astype(np.float32)
    )
    emb = emb * mask[..., None]  # pre-masked gather, as the eval collate does
    return emb, mask


def test_classification_head_shape(rng):
    x = jnp.asarray(rng.standard_normal((5, D)), dtype=jnp.float32)
    m = ClassificationHead(in_dim=D, hidden_dim=D)
    _, out = seeded(m, x)
    assert out.shape == (5, 1)
    assert jnp.isfinite(out).all()


@pytest.mark.parametrize(
    "tower",
    [
        FinalAttention(reduced_dim=D, hidden_dim=2 * D),
        TransformerTower(hidden_size=D, num_layers=1),
        LatentAttentionTower(dim=D, num_latents=8, heads=2, dim_head=16),
    ],
    ids=["final_attention", "transformer", "latent"],
)
def test_tower_shapes_and_padding_invariance(tower, rng):
    emb, mask = history_batch(rng)
    params, out = seeded(tower, emb, mask)
    assert out.shape == (4, D)
    assert jnp.isfinite(out).all()
    # Changing embedding values in PADDED slots must not change outputs.
    noise = jnp.asarray(rng.standard_normal(emb.shape), dtype=jnp.float32)
    emb2 = emb + noise * (1.0 - mask[..., None])
    out2 = japply(tower, params, emb2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_latent_tower_unit_norm(rng):
    emb, mask = history_batch(rng)
    tower = LatentAttentionTower(dim=D, num_latents=8, heads=2, dim_head=16)
    _, out = seeded(tower, emb, mask)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), np.ones(4), atol=1e-5
    )


def test_dropout_train_vs_eval(rng):
    emb, mask = history_batch(rng)
    tower = FinalAttention(reduced_dim=D, hidden_dim=2 * D, dropout_rate=0.5)
    params = jinit(tower, emb, mask)
    out_eval1 = japply(tower, params, emb, mask, deterministic=True)
    out_eval2 = japply(tower, params, emb, mask, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_eval1), np.asarray(out_eval2))
    out_train = jax.jit(
        lambda p: tower.apply(
            p, emb, mask, deterministic=False, rngs={"dropout": jax.random.key(1)}
        )
    )(params)
    assert not np.allclose(np.asarray(out_eval1), np.asarray(out_train))


def test_as_built_parity_layer_is_layernorm_of_input(rng):
    """Reference attention.py:193: the as-built layer returns LayerNorm(input)."""
    emb, mask = history_batch(rng)
    layer = TransformerLayer(hidden_size=D, as_built=True)
    params = jinit(layer, emb, mask)
    out = japply(layer, params, emb, mask)
    # LayerNorm with learned (freshly-initialized scale=1, bias=0) params.
    mean = emb.mean(-1, keepdims=True)
    var = emb.var(-1, keepdims=True)
    expected = (emb - mean) / jnp.sqrt(var + 1e-12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-4)


def test_intended_layer_differs_from_as_built(rng):
    emb, mask = history_batch(rng)
    layer = TransformerLayer(hidden_size=D, as_built=False)
    params = jinit(layer, emb, mask)
    out = japply(layer, params, emb, mask)
    mean = emb.mean(-1, keepdims=True)
    norm_in = (emb - mean) / jnp.sqrt(emb.var(-1, keepdims=True) + 1e-12)
    assert not np.allclose(np.asarray(out), np.asarray(norm_in), atol=1e-3)


def test_weighted_sum_blend():
    m = WeightedSumModel()
    cos = jnp.array([1.0, 0.0])
    base = jnp.array([0.0, 1.0])
    params = jinit(m, cos, base)
    out = japply(m, params, cos, base)
    # alpha starts at sigmoid(0) = 0.5 -> exact midpoint.
    np.testing.assert_allclose(np.asarray(out), [0.5, 0.5], atol=1e-6)


def test_reducing_model(rng):
    x = jnp.asarray(rng.standard_normal((3, D)), dtype=jnp.float32)
    m = ReducingModel(input_dim=D, output_dim=D // 2)
    _, out = seeded(m, x)
    assert out.shape == (3, D // 2)


def test_token_attention_pool(rng):
    emb, mask = history_batch(rng)
    m = TokenAttentionPool(hidden_size=D, num_layers=1)
    _, out = seeded(m, emb, mask)
    assert out.shape == (4, D)


def test_pooling_functions(rng):
    h = jnp.asarray(rng.standard_normal((3, 5, D)), dtype=jnp.float32)
    mask = jnp.asarray(
        [[1, 1, 1, 0, 0], [1, 1, 1, 1, 1], [1, 0, 0, 0, 0]], dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(last_token_pool(h, mask)),
        np.asarray(h)[np.arange(3), [2, 4, 0]],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(first_token_pool(h, mask)), np.asarray(h)[:, 0], atol=1e-6
    )
    manual = [
        np.asarray(h)[i, : int(mask[i].sum())].mean(0) for i in range(3)
    ]
    np.testing.assert_allclose(
        np.asarray(average_pool(h, mask)), np.stack(manual), atol=1e-5
    )


def test_build_tower_factory():
    for kind in ("final_attention", "transformer", "latent"):
        cfg = TowerConfig(kind=kind, reduced_dim=D, hidden_dim=2 * D, num_latents=4, latent_dim_head=8)
        tower = build_tower(cfg)
        assert tower is not None
    with pytest.raises(ValueError):
        build_tower(TowerConfig(kind="nope"))
