"""Tests for the completeness tier: InfoNCE training mode, wrapper model
variants, token-level pipeline components + e2e CLI, memory estimator,
profiling utils."""

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
    ClassificationHeadCatEmbed,
    EmbeddingWrapper,
    FinalAttention,
    ResizeWrapperModel,
    build_tower,
)
from news_recommendation_project_v2_tpu.train import TowerTrainer
from news_recommendation_project_v2_tpu.utils import (
    estimate_tower_batch,
    timed,
    tower_activation_bytes,
)

D = 32


def test_infonce_trainer_learns(rng):
    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=120, num_rows=150, dim=D, noise=0.05
    )
    c = compile_behaviors(imps, hist).with_history_view()
    emb_j = jnp.asarray(align_embeddings(c.news_ids, emb))
    tower = build_tower(
        TowerConfig(kind="latent", reduced_dim=D, num_latents=4, latent_dim_head=8)
    )
    params = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, 8, D)), jnp.ones((1, 8)))
    )()
    trainer = TowerTrainer(
        tower.apply,
        params,
        c,
        emb_j,
        compiled_val=c,
        news_emb_val=emb_j,
        cfg=TrainConfig(
            learning_rate=3e-4,
            num_epochs=3,
            batch_size=64,
            seed=0,
            loss="infonce",
            num_neg_per_pos=4,
        ),
    )
    history = trainer.train()
    assert history[-1]["loss"] < history[0]["loss"]
    assert history[-1]["val"]["auc"] > 0.55


def test_cat_embed_head(rng):
    x = jnp.asarray(
        np.concatenate(
            [rng.standard_normal((5, D)), rng.integers(0, 15, size=(5, 1))], axis=1
        ),
        dtype=jnp.float32,
    )
    m = ClassificationHeadCatEmbed(in_dim=D + 128, hidden_dim=D)
    params = jax.jit(lambda: m.init(jax.random.key(0), x))()
    out = jax.jit(m.apply)(params, x)
    assert out.shape == (5, 1)


def test_wrapper_models(rng):
    emb = jnp.asarray(
        np.concatenate(
            [
                rng.standard_normal((2, 6, D)),
                rng.integers(0, 15, size=(2, 6, 1)),
                rng.integers(0, 134, size=(2, 6, 1)),
            ],
            axis=-1,
        ),
        dtype=jnp.float32,
    )
    mask = jnp.ones((2, 6))
    inner = FinalAttention(reduced_dim=D + 256, hidden_dim=D)
    wrapped = EmbeddingWrapper(wrapped=inner)
    params = jax.jit(lambda: wrapped.init(jax.random.key(0), emb, mask))()
    out = jax.jit(wrapped.apply)(params, emb, mask)
    assert out.shape == (2, D + 256)

    emb2 = jnp.asarray(rng.standard_normal((2, 6, D)), dtype=jnp.float32)
    resize = ResizeWrapperModel(
        wrapped=FinalAttention(reduced_dim=D // 2, hidden_dim=D),
        embed_dim=D,
        reduced_dim=D // 2,
    )
    params2 = jax.jit(lambda: resize.init(jax.random.key(0), emb2, mask))()
    out2 = jax.jit(resize.apply)(params2, emb2, mask)
    assert out2.shape == (2, D)


def test_encoder_hidden_states_method(rng):
    from news_recommendation_project_v2_tpu.config import EncoderConfig
    from news_recommendation_project_v2_tpu.models.news_encoder import (
        HashTokenizer,
        NewsEncoder,
    )

    cfg = EncoderConfig(
        vocab_size=100,
        hidden_dim=D,
        num_layers=1,
        num_heads=4,
        intermediate_dim=D * 2,
        max_position=20,
        compute_dtype="float32",
    )
    enc = NewsEncoder(cfg)
    tok = HashTokenizer(vocab_size=100, max_length=10)
    ids, mask = tok(["alpha beta gamma", "delta"])
    params = jax.jit(
        lambda: enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))
    )()
    hidden = jax.jit(
        lambda p, i, m: enc.apply(p, i, m, method="hidden_states")
    )(params, jnp.asarray(ids), jnp.asarray(mask))
    assert hidden.shape == (2, 10, D)
    # Pooled output is the masked mean of those states, L2-normalized.
    pooled = jax.jit(enc.apply)(params, jnp.asarray(ids), jnp.asarray(mask))
    m = np.asarray(mask)[..., None]
    manual = (np.asarray(hidden) * m).sum(1) / m.sum(1)
    manual /= np.linalg.norm(manual, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(pooled), manual, atol=1e-5)


def test_train_e2e_cli(tmp_path, capsys):
    from news_recommendation_project_v2_tpu.cli import ingest as ingest_cli
    from news_recommendation_project_v2_tpu.cli import train_e2e

    ingest_cli.main([str(tmp_path), "MINDsmall_train", "--synthetic"])
    train_e2e.main(
        [
            str(tmp_path),
            "--dataset",
            "MINDsmall_train",
            "--epochs",
            "1",
            "--batch-size",
            "16",
            "--dim",
            "32",
            "--max-length",
            "12",
            "--lr",
            "1e-4",
            "--log-dir",
            str(tmp_path / "logs"),
            "--ckpt-dir",
            str(tmp_path / "models"),
        ]
    )
    out = capsys.readouterr().out
    assert "metrics" in out
    assert (tmp_path / "logs" / "final_scores.jsonl").exists()


def test_memory_estimator():
    cfg = TowerConfig(kind="latent")
    per_row = tower_activation_bytes(cfg, 1, 64)
    assert per_row > 0
    # Linear-ish in batch.
    assert tower_activation_bytes(cfg, 10, 64) == pytest.approx(
        10 * per_row, rel=0.2
    )
    batch = estimate_tower_batch(cfg, 64, hbm_budget_bytes=16 * 1024**3)
    assert batch >= 8 and batch % 8 == 0
    # Longer histories -> smaller batches.
    assert estimate_tower_batch(cfg, 600, hbm_budget_bytes=16 * 1024**3) < batch


def test_timed_sink():
    sink = []
    with timed("x", sink):
        _ = jnp.zeros(8) + 1
    assert sink and sink[0][0] == "x" and sink[0][1] >= 0


def test_profile_trace_writes_artifacts(tmp_path):
    import jax.numpy as jnp

    from news_recommendation_project_v2_tpu.utils import profile_trace

    with profile_trace(tmp_path):
        jax.jit(lambda x: x * 2)(jnp.arange(8.0)).block_until_ready()
    # jax.profiler writes a plugins/profile tree.
    assert any(tmp_path.rglob("*"))
