"""Regression tests for the second review round: scheduler-state resume,
full-content cache fingerprints, stable cache tokens, prefetch abandonment,
and multi-chunk cosine parity."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from news_recommendation_project_v2_tpu.data.prefetch import prefetch
from news_recommendation_project_v2_tpu.ops.scoring import (
    cosine_scores_chunked,
    cosine_scores_flat,
)
from news_recommendation_project_v2_tpu.pipeline.pipeline import (
    PipelineComponent,
    fingerprint_context,
)


def test_fingerprint_sees_mid_structure_changes():
    # Array element deep inside.
    a = np.arange(1000, dtype=np.float32)
    b = a.copy()
    b[5] += 1
    assert fingerprint_context({"x": a}) != fingerprint_context({"x": b})
    # DataFrame middle row.
    df1 = pd.DataFrame({"v": np.arange(100)})
    df2 = df1.copy()
    df2.loc[50, "v"] = -1
    assert fingerprint_context({"x": df1}) != fingerprint_context({"x": df2})
    # Dict entry beyond the first few keys.
    d1 = {f"n{i}": i for i in range(100)}
    d2 = dict(d1)
    d2["n50"] = -1
    assert fingerprint_context({"x": d1}) != fingerprint_context({"x": d2})
    # Identical content -> identical fingerprint.
    assert fingerprint_context({"x": a.copy()}) == fingerprint_context({"x": a})


def test_cache_token_stable_across_instances():
    class C(PipelineComponent):
        def __init__(self):
            self.fn = lambda x: x  # noqa: E731
            self.params = {"w": np.zeros(3)}
            self.name = "c"

        def transform(self, context):
            return context

    assert C().cache_token() == C().cache_token()
    # And it does not embed object addresses.
    assert "0x" not in C().cache_token()


def test_prefetch_abandonment_stops_producer():
    started = threading.active_count()

    def gen():
        for i in range(1000):
            yield np.zeros(1000)

    it = prefetch(gen(), depth=2)
    next(it)
    it.close()  # abandon mid-stream
    deadline = time.time() + 3.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= started


def test_cosine_chunked_matches_flat(rng):
    R, N, D, C = 7, 11, 8, 23
    user = jnp.asarray(rng.standard_normal((R, D)), dtype=jnp.float32)
    emb = jnp.asarray(rng.standard_normal((N, D)), dtype=jnp.float32)
    rev = rng.integers(0, N, C).astype(np.int32)
    row = rng.integers(0, R, C).astype(np.int32)
    flat = np.asarray(
        cosine_scores_flat(user, emb, jnp.asarray(rev), jnp.asarray(row))
    )
    for chunk in (5, 8, 23, 100):
        got = cosine_scores_chunked(user, emb, rev, row, chunk=chunk)
        np.testing.assert_allclose(got, flat, atol=1e-6, err_msg=f"chunk={chunk}")
    # Device-array inputs take the on-device slicing path.
    got_dev = cosine_scores_chunked(
        user, emb, jnp.asarray(rev), jnp.asarray(row), chunk=5
    )
    np.testing.assert_allclose(got_dev, flat, atol=1e-6)


def test_plateau_state_survives_resume(tmp_path):
    import jax

    from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
    from news_recommendation_project_v2_tpu.data import compile_behaviors
    from news_recommendation_project_v2_tpu.data.synthetic import (
        align_embeddings,
        synthetic_learnable_behaviors,
    )
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.train import TowerTrainer

    imps, hist, emb = synthetic_learnable_behaviors(num_news=40, num_rows=30, dim=8)
    c = compile_behaviors(imps, hist).with_history_view()
    emb_j = jnp.asarray(align_embeddings(c.news_ids, emb))
    tower = build_tower(
        TowerConfig(kind="latent", reduced_dim=8, num_latents=2, latent_dim_head=4)
    )
    params = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, 4, 8)), jnp.ones((1, 4)))
    )()
    cfg = TrainConfig(
        learning_rate=1e-3, num_epochs=1, batch_size=16, plateau_patience=1
    )
    t1 = TowerTrainer(tower.apply, params, c, emb_j, cfg=cfg)
    # Simulate two plateau reductions.
    t1.opt_state = t1.plateau.update(t1.opt_state, 0.9)
    for _ in range(4):
        t1.opt_state = t1.plateau.update(t1.opt_state, 0.1)
    assert t1.plateau.lr == pytest.approx(1e-5)
    t1.save_training_state(tmp_path / "st")

    t2 = TowerTrainer(tower.apply, params, c, emb_j, cfg=cfg)
    t2.restore_training_state(tmp_path / "st")
    assert t2.plateau.lr == pytest.approx(1e-5)
    assert t2.plateau.best == pytest.approx(0.9)
    # A further plateau reduces BELOW the restored lr, never above.
    for _ in range(2):
        t2.opt_state = t2.plateau.update(t2.opt_state, 0.1)
    assert t2.plateau.lr == pytest.approx(1e-6)
