"""On-device MIND metrics (eval/device_metrics.py): equality with the host
metric pipeline (itself oracle-tested against the reference and sklearn), the
monotonic-rank-transform theorem that justifies eliding the dense-rank step,
and the fully-fused FlatEvalPlan.metrics path."""

import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_project_v2_tpu.data import compile_behaviors
from news_recommendation_project_v2_tpu.data.grouping import (
    dense_rank_by_segment,
    group_items,
)
from news_recommendation_project_v2_tpu.data.synthetic import (
    synthetic_news_embeddings,
)
from news_recommendation_project_v2_tpu.eval.device_metrics import (
    DeviceMetricsPlan,
    metrics_from_flat_scores,
    row_metrics,
)
from news_recommendation_project_v2_tpu.eval.metrics import score, score_batch
from news_recommendation_project_v2_tpu.eval.ranker import (
    compose_final_scores,
    history_candidate_slots,
)

D = 32


def _padded_rows(rng, n=64, max_len=37, quantize=None):
    """Random padded (scores, labels, lens) with every row two-class."""
    lens = rng.integers(2, max_len + 1, size=n)
    L = int(lens.max())
    scores = np.full((n, L), -np.inf)
    labels = np.zeros((n, L))
    for i, ln in enumerate(lens):
        s = rng.standard_normal(ln)
        if quantize:
            s = np.round(s, quantize)  # force score ties
        scores[i, :ln] = s
        y = rng.integers(0, 2, size=ln)
        y[0], y[-1] = 1, 0
        labels[i, :ln] = y
    return scores, labels, lens.astype(np.int64)


@pytest.mark.parametrize("quantize", [None, 1])
def test_row_metrics_matches_host(rng, quantize):
    """Device per-row metrics == host score_batch, including under heavy score
    ties (quantize=1 makes ~1/20 of scores collide) and -inf padding."""
    scores, labels, lens = _padded_rows(rng, quantize=quantize)
    h_auc, h_mrr, h_n5, h_n10 = score_batch(scores, labels, lens)
    d_auc, d_mrr, d_n5, d_n10, bad = (
        np.asarray(x)
        for x in row_metrics(
            jnp.asarray(scores, jnp.float32),
            jnp.asarray(labels, jnp.float32),
            jnp.asarray(lens, jnp.float32),
        )
    )
    assert not bad.any()
    np.testing.assert_allclose(d_auc, h_auc, atol=1e-5)
    np.testing.assert_allclose(d_mrr, h_mrr, atol=1e-5)
    np.testing.assert_allclose(d_n5, h_n5, atol=1e-5)
    np.testing.assert_allclose(d_n10, h_n10, atol=1e-5)


def test_rank_transform_theorem(rng):
    """The claim that lets the device path skip dense-ranking: metrics from raw
    scores equal metrics from the reference's 1/dense_rank(-score) transform
    (it is strictly monotonic and tie-preserving within each impression)."""
    scores, labels, lens = _padded_rows(rng, n=40, quantize=1)
    transformed = np.full_like(scores, -np.inf)
    for i, ln in enumerate(lens):
        ranks = dense_rank_by_segment(scores[i, :ln], np.array([ln]))
        transformed[i, :ln] = 1.0 / ranks
    raw = score_batch(scores, labels, lens)
    via_rank = score_batch(transformed, labels, lens)
    for a, b in zip(raw, via_rank):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def _make_compiled(rng, rows=40, n_news=30):
    impressions, history = [], []
    for i in range(rows):
        k = int(rng.integers(2, 9))
        ids = rng.choice(n_news, size=k, replace=False)
        labs = rng.integers(0, 2, size=k)
        labs[0] = 1
        if labs.sum() == k:
            labs[-1] = 0
        impressions.append(" ".join(f"N{j}-{l}" for j, l in zip(ids, labs)))
        if i % 4 != 3:
            hk = int(rng.integers(1, 15))
            history.append(
                " ".join(
                    f"N{j}"
                    for j in rng.choice(n_news, size=min(hk, n_news), replace=False)
                )
            )
        else:
            history.append(None)
    return compile_behaviors(impressions, history)


def test_plan_matches_compose_final_scores(rng):
    """Composition + metrics on device == compose_final_scores(...).metrics for
    (a) history overwrite, (b) alpha blend over a baseline, (c) baseline only."""
    c = _make_compiled(rng)
    slots, _ = history_candidate_slots(c)
    hist = rng.random(len(slots)).astype(np.float32)
    base = rng.random(c.num_news).astype(np.float32)

    cases = [
        (dict(history_scores=hist), dict(hist_slots=slots)),
        (
            dict(history_scores=hist, baseline_scores=base, alpha=0.3),
            dict(hist_slots=slots, baseline_slots=base[c.imp_rev], alpha=0.3),
        ),
        (
            dict(baseline_scores=base),
            dict(baseline_slots=base[c.imp_rev]),
        ),
    ]
    for host_kwargs, plan_kwargs in cases:
        expected = compose_final_scores(c, **host_kwargs).metrics
        plan = DeviceMetricsPlan(
            c.imp_lens, c.labels_flat, row_chunk=8, **plan_kwargs
        )
        full = plan.compose(
            jnp.asarray(hist) if "hist_slots" in plan_kwargs else None
        )
        got = plan.compute(full)
        assert got["num_samples"] == expected["num_samples"]
        for k in ("auc", "mrr", "ndcg5", "ndcg10"):
            np.testing.assert_allclose(got[k], expected[k], atol=2e-5), k


def test_metrics_from_flat_scores_matches_host_score(rng):
    c = _make_compiled(rng)
    flat = rng.random(int(c.imp_lens.sum()))
    ranks = group_items(dense_rank_by_segment(flat, c.imp_lens), c.imp_lens)
    labels = group_items(c.labels_flat, c.imp_lens)
    expected = score(
        [g.tolist() for g in ranks], [g.tolist() for g in labels]
    )
    got = metrics_from_flat_scores(
        flat.astype(np.float32), c.imp_lens, c.labels_flat
    )
    for k in ("auc", "mrr", "ndcg5", "ndcg10", "num_samples"):
        np.testing.assert_allclose(got[k], expected[k], atol=2e-5)


def test_fused_flat_eval_metrics(rng):
    """FlatEvalPlan.metrics (ONE program: tower + cosine + composition +
    metrics, five scalars fetched) == score() + compose_final_scores()."""
    import jax

    from news_recommendation_project_v2_tpu.config import TowerConfig
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.ops.scoring import FlatEvalPlan

    c = _make_compiled(rng)
    emb = jnp.asarray(synthetic_news_embeddings(c.num_news, D))
    config = TowerConfig(
        kind="latent", reduced_dim=D, embedding_dim=D, num_latents=4,
        num_heads=2, latent_dim_head=8,
    )
    tower = build_tower(config)
    params = tower.init(
        jax.random.key(0), jnp.zeros((1, 5, D)), jnp.ones((1, 5))
    )
    slots, cand_rows = history_candidate_slots(c)
    plan = FlatEvalPlan(
        c.hist_rev, c.hist_lens, c.imp_rev[slots], cand_rows,
        chunk_tokens=32, cand_chunk=16,
    )
    scores = plan.score(tower.apply, params, emb)
    expected = compose_final_scores(c, history_scores=scores).metrics
    mplan = DeviceMetricsPlan(
        c.imp_lens, c.labels_flat, hist_slots=slots, row_chunk=8
    )
    got = plan.metrics(tower.apply, params, emb, mplan)
    assert got["num_samples"] == expected["num_samples"]
    for k in ("auc", "mrr", "ndcg5", "ndcg10"):
        np.testing.assert_allclose(got[k], expected[k], atol=2e-5)


def _learnable():
    from news_recommendation_project_v2_tpu.data.synthetic import (
        align_embeddings,
        synthetic_learnable_behaviors,
    )

    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=100, num_rows=120, dim=D, noise=0.05
    )
    c = compile_behaviors(imps, hist).with_history_view()
    return c, jnp.asarray(align_embeddings(c.news_ids, emb))


def _small_tower():
    import jax

    from news_recommendation_project_v2_tpu.config import TowerConfig
    from news_recommendation_project_v2_tpu.models import build_tower

    tower = build_tower(
        TowerConfig(kind="latent", reduced_dim=D, num_latents=4, latent_dim_head=8)
    )
    params = jax.jit(
        lambda: tower.init(
            jax.random.key(0), jnp.zeros((1, 8, D)), jnp.ones((1, 8))
        )
    )()
    return tower, params


def test_tower_trainer_device_metrics_equals_host():
    """TowerTrainer epoch eval: fused device path == host compose+score."""
    from news_recommendation_project_v2_tpu.config import TrainConfig
    from news_recommendation_project_v2_tpu.train import TowerTrainer

    c, emb = _learnable()
    tower, params = _small_tower()
    trainer = TowerTrainer(
        tower.apply, params, c, emb,
        cfg=TrainConfig(num_epochs=1, batch_size=64, seed=0),
        flat_eval=True, device_metrics=True,
    )
    fused = trainer._eval_split(c, emb, emb)
    trainer.device_metrics = False
    host = trainer._eval_split(c, emb, emb)
    assert fused["num_samples"] == host["num_samples"]
    for k in ("auc", "mrr", "ndcg5", "ndcg10"):
        np.testing.assert_allclose(fused[k], host[k], atol=2e-5)


def test_joint_trainer_device_metrics_blend_equals_host(rng):
    """JointTowerTrainer eval with a TRAINED alpha + classification baseline:
    the traced-alpha fused path == the host blend composition."""
    import jax

    from news_recommendation_project_v2_tpu.config import TrainConfig
    from news_recommendation_project_v2_tpu.models import WeightedSumModel
    from news_recommendation_project_v2_tpu.train import JointTowerTrainer

    c, emb = _learnable()
    tower, tower_params = _small_tower()
    blend = WeightedSumModel()
    blend_params = jax.jit(
        lambda: blend.init(jax.random.key(1), jnp.zeros(2), jnp.zeros(2))
    )()
    baseline = rng.random(c.num_news).astype(np.float32)
    trainer = JointTowerTrainer(
        tower.apply, tower_params, c, emb,
        blend_apply=blend.apply, blend_params=blend_params,
        baseline_train=baseline,
        cfg=TrainConfig(num_epochs=1, batch_size=64, seed=0),
        flat_eval=True, device_metrics=True,
    )
    fused = trainer._eval_split(c, emb, emb, baseline)
    trainer.device_metrics = False
    host = trainer._eval_split(c, emb, emb, baseline)
    for k in ("auc", "mrr", "ndcg5", "ndcg10"):
        np.testing.assert_allclose(fused[k], host[k], atol=2e-5)


def test_single_class_row_raises(rng):
    imp_lens = np.array([3, 2])
    labels = np.array([1, 0, 0, 1, 1], np.float32)  # second row all-positive
    flat = rng.random(5).astype(np.float32)
    with pytest.raises(ValueError, match="single label class"):
        metrics_from_flat_scores(flat, imp_lens, labels)


# ---------------------------------------------------------------------------
# Sharded zero-fetch metrics (virtual 8-device mesh)
# ---------------------------------------------------------------------------


def _mesh():
    import jax

    from news_recommendation_project_v2_tpu.config import MeshConfig
    from news_recommendation_project_v2_tpu.parallel import build_mesh

    assert jax.device_count() == 8
    return build_mesh(MeshConfig(data_size=4, model_size=2))


def test_sharded_metrics_with_history_view(rng):
    """ShardedFlatEvalPlan.metrics (per-device composition + metric partial
    sums + one 5-scalar psum) == host compose+score on a with-history view."""
    from news_recommendation_project_v2_tpu.parallel.flat_eval import (
        ShardedFlatEvalPlan,
        ShardedMetricsPlan,
    )

    c, emb = _learnable()
    tower, params = _small_tower()
    slots, cand_rows = history_candidate_slots(c)
    plan = ShardedFlatEvalPlan(
        _mesh(), c.hist_rev, c.hist_lens, c.imp_rev[slots], cand_rows,
        chunk_tokens=32, cand_chunk=16,
    )
    scores = plan.score(tower.apply, params, emb)
    expected = compose_final_scores(c, history_scores=scores).metrics
    mplan = ShardedMetricsPlan(
        plan, c.imp_lens, c.labels_flat, hist_slots=slots, row_chunk=4
    )
    got = plan.metrics(tower.apply, params, emb, mplan)
    assert got["num_samples"] == expected["num_samples"]
    for k in ("auc", "mrr", "ndcg5", "ndcg10"):
        np.testing.assert_allclose(got[k], expected[k], atol=2e-5)


def test_mesh_trainer_device_metrics_equals_host():
    """TowerTrainer(mesh=..., device_metrics=True): the zero-fetch sharded
    epoch eval == the host pipeline."""
    import jax

    from news_recommendation_project_v2_tpu.config import TrainConfig
    from news_recommendation_project_v2_tpu.train import TowerTrainer

    c, emb = _learnable()
    tower, params = _small_tower()
    trainer = TowerTrainer(
        tower.apply, params, c, emb,
        cfg=TrainConfig(num_epochs=1, batch_size=64, seed=0),
        mesh=_mesh(), flat_eval=True, device_metrics=True,
    )
    fused = trainer._eval_split(c, trainer.news_emb_train, trainer.query_train)
    trainer.device_metrics = False
    host = trainer._eval_split(c, trainer.news_emb_train, trainer.query_train)
    assert fused["num_samples"] == host["num_samples"]
    for k in ("auc", "mrr", "ndcg5", "ndcg10"):
        np.testing.assert_allclose(fused[k], host[k], atol=2e-5)


def test_sharded_metrics_general_baseline_alpha(rng):
    """General case: no-history impressions (baseline-only, round-robin
    assigned), a classification baseline, and a traced alpha blend."""
    from news_recommendation_project_v2_tpu.parallel.flat_eval import (
        ShardedFlatEvalPlan,
        ShardedMetricsPlan,
    )

    c = _make_compiled(rng, rows=60)
    emb = jnp.asarray(synthetic_news_embeddings(c.num_news, D))
    tower, params = _small_tower()
    slots, cand_rows = history_candidate_slots(c)
    base = rng.random(c.num_news).astype(np.float32)
    alpha = 0.35

    plan = ShardedFlatEvalPlan(
        _mesh(), c.hist_rev, c.hist_lens, c.imp_rev[slots], cand_rows,
        chunk_tokens=32, cand_chunk=16,
    )
    scores = plan.score(tower.apply, params, emb)
    expected = compose_final_scores(
        c, history_scores=scores, baseline_scores=base, alpha=alpha
    ).metrics

    subset_pos = np.cumsum(c.has_history) - 1
    imp_rows = np.where(c.has_history, subset_pos, -1)
    mplan = ShardedMetricsPlan(
        plan, c.imp_lens, c.labels_flat, hist_slots=slots,
        imp_rows=imp_rows, baseline_slots=base[c.imp_rev], row_chunk=4,
    )
    got = plan.metrics(tower.apply, params, emb, mplan, alpha=alpha)
    assert got["num_samples"] == expected["num_samples"]
    for k in ("auc", "mrr", "ndcg5", "ndcg10"):
        np.testing.assert_allclose(got[k], expected[k], atol=2e-5)
