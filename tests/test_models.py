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


def test_mixed_precision_towers_close_to_f32(rng):
    """compute_dtype=bfloat16 keeps f32 params (optimizer masters) and matches
    the f32 forward within bf16 tolerance for every tower kind."""
    from news_recommendation_project_v2_tpu.config import TowerConfig
    from news_recommendation_project_v2_tpu.models import build_tower

    D = 32
    emb = jnp.asarray(rng.standard_normal((4, 12, D)), dtype=jnp.float32)
    mask = jnp.asarray((rng.random((4, 12)) < 0.8).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    for kind in ("latent", "final_attention", "transformer"):
        kwargs = dict(
            kind=kind, reduced_dim=D, embedding_dim=D, hidden_dim=2 * D,
            num_latents=4, latent_dim_head=8,
        )
        t32 = build_tower(TowerConfig(**kwargs))
        tb16 = build_tower(TowerConfig(**kwargs, compute_dtype="bfloat16"))
        params = jax.jit(lambda t=t32: t.init(jax.random.key(0), emb, mask))()
        # Same param pytree: the bf16 tower reuses the f32 params verbatim.
        for a, b in zip(
            jax.tree.leaves(params),
            jax.tree.leaves(jax.jit(lambda t=tb16: t.init(jax.random.key(0), emb, mask))()),
        ):
            assert a.dtype == b.dtype == jnp.float32
        out32 = jax.jit(t32.apply)(params, emb, mask)
        out16 = jax.jit(tb16.apply)(params, emb, mask)
        # bf16 matmuls actually engaged (results differ from pure f32) but the
        # f32 residual stream / epilogues keep the output close.
        assert not np.array_equal(np.asarray(out16, np.float32), np.asarray(out32))
        np.testing.assert_allclose(
            np.asarray(out16, np.float32), np.asarray(out32), atol=0.05, rtol=0.05,
        )


def test_mixed_precision_training_learns(rng):
    """bf16-compute latent tower trains (f32 param masters updated by AdamW)."""
    from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
    from news_recommendation_project_v2_tpu.data import compile_behaviors
    from news_recommendation_project_v2_tpu.data.synthetic import (
        align_embeddings,
        synthetic_learnable_behaviors,
    )
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.train.trainer import TowerTrainer

    D = 32
    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=100, num_rows=120, dim=D, noise=0.05
    )
    c = compile_behaviors(imps, hist).with_history_view()
    emb_j = jnp.asarray(align_embeddings(c.news_ids, emb))
    tower = build_tower(
        TowerConfig(
            kind="latent", reduced_dim=D, num_latents=4, latent_dim_head=8,
            compute_dtype="bfloat16",
        )
    )
    params = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, 8, D)), jnp.ones((1, 8)))
    )()
    trainer = TowerTrainer(
        tower.apply, params, c, emb_j, compiled_val=c, news_emb_val=emb_j,
        cfg=TrainConfig(learning_rate=3e-4, num_epochs=2, batch_size=64, seed=0),
    )
    history = trainer.train()
    assert history[-1]["loss"] < history[0]["loss"]
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(trainer.params)
    )
    assert np.isfinite(history[-1]["val"]["auc"])
