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


# ---- round-2 code-review findings ------------------------------------------


def test_flat_eval_caps_histories_like_bucketed(rng):
    """flat_eval must see the SAME truncated histories as the bucketed eval
    (cap at buckets[-1], most recent), not the full untruncated stream."""
    import jax
    import jax.numpy as jnp

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
        num_news=100, num_rows=100, dim=D, noise=0.05
    )
    c = compile_behaviors(imps, hist).with_history_view()
    assert c.hist_lens.max() > 8  # the cap below actually truncates
    emb_j = jnp.asarray(align_embeddings(c.news_ids, emb))

    def make(flat_eval):
        tower = build_tower(
            TowerConfig(kind="latent", reduced_dim=D, num_latents=4, latent_dim_head=8)
        )
        params = jax.jit(
            lambda: tower.init(jax.random.key(0), jnp.zeros((1, 8, D)), jnp.ones((1, 8)))
        )()
        return TowerTrainer(
            tower.apply, params, c, emb_j, compiled_val=c, news_emb_val=emb_j,
            cfg=TrainConfig(batch_size=32, seed=0),
            buckets=(8,),  # aggressive cap so truncation matters
            flat_eval=flat_eval,
        )

    bucketed_train, _ = make(False).evaluate()
    flat_train, _ = make(True).evaluate()
    for k, v in bucketed_train.items():
        assert flat_train[k] == pytest.approx(v, abs=1e-6), k


def test_partition_rows_by_tokens_balances_skewed():
    from news_recommendation_project_v2_tpu.parallel.flat_eval import (
        partition_rows_by_tokens,
    )

    bounds = partition_rows_by_tokens(np.array([1, 100]), 2)
    np.testing.assert_array_equal(bounds, [0, 1, 2])
    # Uniform case still splits evenly.
    bounds = partition_rows_by_tokens(np.full(8, 10), 4)
    np.testing.assert_array_equal(bounds, [0, 2, 4, 6, 8])


def test_build_token_store_empty_corpus_out_dir(tmp_path):
    from news_recommendation_project_v2_tpu.ops.encode import build_token_store

    store = build_token_store(
        lambda p, i, m: None,  # never called: zero batches
        None,
        np.zeros((0, 4), np.int32),
        np.zeros((0, 4), np.float32),
        out_dir=tmp_path / "store",
    )
    assert store.num_items == 0


def test_build_encoder_rejects_checkpoint_plus_config(tmp_path):
    from news_recommendation_project_v2_tpu.cli.common import build_encoder
    from news_recommendation_project_v2_tpu.config import EncoderConfig

    # A checkpoint path WITHOUT config.json + an explicit config must raise
    # (silent layer-dropping), not quietly build a truncated encoder.
    (tmp_path / "ckpt").mkdir()
    with pytest.raises(ValueError, match="not both"):
        build_encoder(
            tmp_path / "ckpt",
            EncoderConfig(num_layers=2),
            allow_hash_tokenizer=True,
        )


def test_sharded_flat_plan_caches_programs(rng):
    import jax
    import jax.numpy as jnp

    from news_recommendation_project_v2_tpu.config import MeshConfig, TowerConfig
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.parallel import build_mesh
    from news_recommendation_project_v2_tpu.parallel.flat_eval import (
        ShardedFlatEvalPlan,
    )

    mesh = build_mesh(MeshConfig(data_size=8, model_size=1))
    D = 16
    hist_lens = rng.integers(1, 6, size=24)
    hist_rev = rng.integers(0, 30, size=int(hist_lens.sum())).astype(np.int32)
    cand_rev = rng.integers(0, 30, size=50).astype(np.int32)
    cand_row = np.sort(rng.integers(0, 24, size=50)).astype(np.int32)
    table = jnp.asarray(rng.standard_normal((30, D)), dtype=jnp.float32)
    tower = build_tower(
        TowerConfig(kind="latent", reduced_dim=D, num_latents=2, latent_dim_head=8)
    )
    params = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, 4, D)), jnp.ones((1, 4)))
    )()
    plan = ShardedFlatEvalPlan(
        mesh, hist_rev, hist_lens, cand_rev, cand_row, chunk_tokens=16, cand_chunk=8
    )
    s1 = plan.score(tower.apply, params, table)
    assert len(plan._fns) == 1
    s2 = plan.score(tower.apply, params, table)
    assert len(plan._fns) == 1  # same compiled program reused
    np.testing.assert_allclose(s1, s2)


def test_tower_component_rejects_embedding_dim_mismatch():
    """A --dim that disagrees with the embedding dump's width must raise the
    loud boundary error, not an opaque broadcast failure deep in flax init
    (the latent/transformer towers are residual in their input)."""
    from news_recommendation_project_v2_tpu.config import TowerConfig
    from news_recommendation_project_v2_tpu.pipeline.components import (
        AttentionComponent,
    )

    comp = AttentionComponent(
        tower_config=TowerConfig(
            kind="latent", reduced_dim=32, num_latents=2, latent_dim_head=8
        )
    )
    with pytest.raises(ValueError, match="reduced_dim"):
        comp._init_params(64)
    comp._init_params(32)  # matching dim initializes fine
    assert comp.params is not None
    # final_attention adapts its first Dense to any INPUT width, but its user
    # vector comes out reduced_dim-wide and is cosine-scored against the
    # D-wide news embeddings — a mismatch must fail at this boundary too
    # (ADVICE r4), not as an opaque scoring-shape error downstream.
    fa = AttentionComponent(tower_config=TowerConfig(kind="final_attention"))
    with pytest.raises(ValueError, match="reduced_dim"):
        fa._init_params(48)
    fa_ok = AttentionComponent(
        tower_config=TowerConfig(kind="final_attention", reduced_dim=48)
    )
    fa_ok._init_params(48)
    assert fa_ok.params is not None
