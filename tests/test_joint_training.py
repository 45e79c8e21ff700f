"""Joint (blend/reduce) and end-to-end trainer tests on the learnable fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
from news_recommendation_project_v2_tpu.data import compile_behaviors
from news_recommendation_project_v2_tpu.data.synthetic import (
    align_embeddings,
    synthetic_learnable_behaviors,
)
from news_recommendation_project_v2_tpu.models import (
    ReducingModel,
    TokenAttentionPool,
    WeightedSumModel,
    build_tower,
)
from news_recommendation_project_v2_tpu.ops.encode import TokenStore
from news_recommendation_project_v2_tpu.train import (
    EndToEndTrainer,
    JointTowerTrainer,
)

D = 32


@pytest.fixture(scope="module")
def learnable():
    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=100, num_rows=120, dim=D, noise=0.05
    )
    c = compile_behaviors(imps, hist).with_history_view()
    emb_aligned = jnp.asarray(align_embeddings(c.news_ids, emb))
    return c, emb_aligned


def make_tower():
    tower = build_tower(
        TowerConfig(kind="latent", reduced_dim=D, num_latents=4, latent_dim_head=8)
    )
    params = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, 8, D)), jnp.ones((1, 8)))
    )()
    return tower, params


def test_blend_trainer(learnable, tmp_path):
    c, emb = learnable
    tower, tower_params = make_tower()
    blend = WeightedSumModel()
    blend_params = jax.jit(
        lambda: blend.init(jax.random.key(1), jnp.zeros(2), jnp.zeros(2))
    )()
    baseline = np.random.default_rng(0).random(c.num_news).astype(np.float32)
    trainer = JointTowerTrainer(
        tower.apply,
        tower_params,
        c,
        emb,
        blend_apply=blend.apply,
        blend_params=blend_params,
        baseline_train=baseline,
        baseline_val=baseline,
        compiled_val=c,
        news_emb_val=emb,
        cfg=TrainConfig(learning_rate=3e-4, num_epochs=2, batch_size=64, seed=0),
        ckpt_dir=tmp_path / "ckpt",
        exp_name="blend",
    )
    hist = trainer.train()
    assert len(hist) == 2
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert set(trainer.params.keys()) == {"tower", "blend"}
    # Alpha stays a valid sigmoid value.
    assert 0.0 < trainer._alpha() < 1.0
    assert np.isfinite(hist[-1]["val"]["auc"])


def test_reduce_trainer(learnable):
    c, emb = learnable
    tower, tower_params = make_tower()
    reducer = ReducingModel(input_dim=D, output_dim=D)
    reduce_params = jax.jit(
        lambda: reducer.init(jax.random.key(2), jnp.zeros((1, D)))
    )()
    # Snapshot before training: the train step donates its params buffers.
    before = np.asarray(jax.tree.leaves(reduce_params)[0]).copy()
    trainer = JointTowerTrainer(
        tower.apply,
        tower_params,
        c,
        emb,
        reduce_apply=reducer.apply,
        reduce_params=reduce_params,
        compiled_val=c,
        news_emb_val=emb,
        cfg=TrainConfig(learning_rate=3e-4, num_epochs=2, batch_size=64, seed=0),
    )
    hist = trainer.train()
    assert hist[-1]["loss"] < hist[0]["loss"]
    # Reducer params actually move.
    after = jax.tree.leaves(trainer.params["reduce"])[0]
    assert not np.allclose(before, np.asarray(after))


def test_end_to_end_trainer(learnable, rng):
    c, emb = learnable
    emb_np = np.asarray(emb)
    # Fake frozen token states: each news has 2-6 tokens whose mean is its
    # embedding (so the pipeline has signal to recover).
    arrays = []
    for i in range(c.num_news):
        t = int(rng.integers(2, 7))
        noise = rng.standard_normal((t, D)).astype(np.float32) * 0.05
        arrays.append(emb_np[i][None, :] + noise)
    store = TokenStore.from_ragged(arrays)

    tower, tower_params = make_tower()
    tok_model = TokenAttentionPool(hidden_size=D, num_layers=1)
    tok_params = jax.jit(
        lambda: tok_model.init(
            jax.random.key(3), jnp.zeros((1, 8, D)), jnp.ones((1, 8))
        )
    )()
    trainer = EndToEndTrainer(
        tok_model.apply,
        tok_params,
        tower.apply,
        tower_params,
        c,
        store,
        cfg=TrainConfig(learning_rate=1e-4, num_epochs=2, batch_size=32, seed=0),
        max_token_len=8,
    )
    hist = trainer.train()
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]
    news_emb = trainer.materialize_news_embeddings(batch_size=16)
    assert news_emb.shape == (c.num_news, D)
    assert np.isfinite(news_emb).all()
