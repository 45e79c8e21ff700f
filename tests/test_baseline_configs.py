"""BASELINE configs[0..1] runnable presets on the synthetic fixture."""

import pytest
import numpy as np

from news_recommendation_project_v2_tpu.config import TrainConfig
from news_recommendation_project_v2_tpu.configs import (
    BASELINE_CONFIGS,
    run_config0,
    run_config1,
)
from news_recommendation_project_v2_tpu.data import compile_behaviors
from news_recommendation_project_v2_tpu.data.synthetic import (
    align_embeddings,
    synthetic_learnable_behaviors,
)


def test_presets_enumerate():
    assert [s.index for s in BASELINE_CONFIGS] == [0, 1, 2, 3, 4]
    assert BASELINE_CONFIGS[0].tower is None
    assert BASELINE_CONFIGS[3].mesh is not None


def test_config0_mean_pool_beats_chance_on_learnable():
    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=150, num_rows=150, dim=32, noise=0.05
    )
    c = compile_behaviors(imps, hist)
    aligned = align_embeddings(c.news_ids, emb)
    metrics = run_config0(c, aligned)
    # Labels were generated from mean-history cosine -> config0 is near-oracle.
    assert metrics["auc"] > 0.9, metrics


def test_config1_latent_tower_learns():
    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=120, num_rows=140, dim=32, noise=0.05
    )
    c = compile_behaviors(imps, hist)
    aligned = align_embeddings(c.news_ids, emb)
    from news_recommendation_project_v2_tpu.config import TowerConfig

    metrics = run_config1(
        c,
        aligned,
        compiled_val=c,
        news_embeddings_val=aligned,
        train_cfg=TrainConfig(learning_rate=3e-4, num_epochs=3, batch_size=64, seed=0),
        tower_cfg=TowerConfig(
            kind="latent", reduced_dim=32, num_latents=4, latent_dim_head=8
        ),
    )
    assert metrics["auc"] > 0.6, metrics


@pytest.mark.slow
def test_config2_end_to_end_runs(rng):
    from news_recommendation_project_v2_tpu.configs import run_config2
    from news_recommendation_project_v2_tpu.ops.encode import TokenStore

    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=60, num_rows=60, dim=16, noise=0.05
    )
    c = compile_behaviors(imps, hist)
    emb_a = align_embeddings(c.news_ids, emb)
    arrays = [
        (emb_a[i][None] + rng.standard_normal((3, 16)).astype(np.float32) * 0.05)
        for i in range(c.num_news)
    ]
    store = TokenStore.from_ragged(arrays)
    m = run_config2(
        c,
        store,
        dim=16,
        train_cfg=TrainConfig(learning_rate=1e-4, num_epochs=1, batch_size=16),
        max_token_len=4,
    )
    assert 0 <= m["auc"] <= 1


@pytest.mark.slow
def test_config3_sharded_training_full_run():
    """Config[3] is the FULL scenario on the mesh: epochs of sharded steps +
    sharded eval with MIND metrics, not a smoke-depth step count."""
    from news_recommendation_project_v2_tpu.config import MeshConfig, TowerConfig
    from news_recommendation_project_v2_tpu.configs import run_config3

    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=120, num_rows=140, dim=32, noise=0.05
    )
    c = compile_behaviors(imps, hist)
    emb_a = align_embeddings(c.news_ids, emb)
    metrics = run_config3(
        c,
        emb_a,
        compiled_val=c,
        news_embeddings_val=emb_a,
        mesh_cfg=MeshConfig(data_size=4, model_size=2),
        train_cfg=TrainConfig(learning_rate=3e-4, num_epochs=2, batch_size=64, seed=0),
        tower_cfg=TowerConfig(
            kind="latent", reduced_dim=32, num_latents=4, latent_dim_head=8
        ),
    )
    assert metrics["auc"] > 0.55, metrics


@pytest.mark.slow
def test_config4_multihost_pipeline_runs():
    import jax
    import jax.numpy as jnp

    from news_recommendation_project_v2_tpu.config import EncoderConfig, MeshConfig
    from news_recommendation_project_v2_tpu.configs import run_config4
    from news_recommendation_project_v2_tpu.models.news_encoder import (
        HashTokenizer,
        NewsEncoder,
    )

    imps, hist, _ = synthetic_learnable_behaviors(num_news=40, num_rows=40, dim=16)
    c = compile_behaviors(imps, hist)
    cfg = EncoderConfig(
        vocab_size=96,
        hidden_dim=16,
        num_layers=1,
        num_heads=2,
        intermediate_dim=32,
        max_position=16,
        compute_dtype="float32",
    )
    enc = NewsEncoder(cfg)
    tok = HashTokenizer(vocab_size=96, max_length=8)
    ids, mask = tok([f"news article {n}" for n in c.news_ids])
    params = jax.jit(
        lambda: enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))
    )()
    m = run_config4(
        c,
        ids,
        mask,
        lambda p, i, mk: enc.apply(p, i, mk),
        params,
        mesh_cfg=MeshConfig(data_size=4, model_size=2),
    )
    assert 0 <= m["auc"] <= 1
    # With a train_cfg, the dumped table feeds the full sharded tower
    # training + eval stage (config[3]).
    from news_recommendation_project_v2_tpu.config import TowerConfig

    m2 = run_config4(
        c,
        ids,
        mask,
        lambda p, i, mk: enc.apply(p, i, mk),
        params,
        mesh_cfg=MeshConfig(data_size=4, model_size=2),
        train_cfg=TrainConfig(learning_rate=3e-4, num_epochs=1, batch_size=32, seed=0),
        tower_cfg=TowerConfig(
            kind="latent", reduced_dim=16, num_latents=4, latent_dim_head=8
        ),
    )
    assert 0 <= m2["auc"] <= 1
