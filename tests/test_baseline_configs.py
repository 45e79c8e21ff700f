"""BASELINE configs[0..1] runnable presets on the synthetic fixture."""

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
