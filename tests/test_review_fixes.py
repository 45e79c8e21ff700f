"""Regression tests for the code-review findings: native-compiler stability at
high unique-news counts, id-aligned embedding dumps across row subsets,
data-sensitive pipeline caching, open-ended unique-news bucketing, and
keep-most-recent history truncation."""

import numpy as np
import pytest

from news_recommendation_project_v2_tpu import native
from news_recommendation_project_v2_tpu.config import bucket_for, bucket_for_open
from news_recommendation_project_v2_tpu.data import compile_behaviors
from news_recommendation_project_v2_tpu.ops.encode import (
    load_embeddings,
    save_embeddings,
)
from news_recommendation_project_v2_tpu.pipeline import Pipeline, PipelineComponent


@pytest.mark.skipif(native.load() is None, reason="native unavailable")
def test_native_many_unique_news_no_crash():
    """Reviewer's reproducer: tens of thousands of unique SSO-sized ids used to
    dangle the intern table's keys (segfault)."""
    row = " ".join(f"N{i}" for i in range(50000))
    a = compile_behaviors([row, row], [None, None], use_native=True)
    b = compile_behaviors([row, row], [None, None], use_native=False)
    assert a.news_ids.tolist() == b.news_ids.tolist()
    np.testing.assert_array_equal(a.imp_rev, b.imp_rev)


def test_id_aligned_embedding_load(tmp_path, rng):
    # Dump aligned to one row ordering; load realigned to a different subset's
    # first-appearance order (the eval-CLI WITH_HISTORY scenario).
    imps_all = ["N1-1 N2-0", "N3-1 N4-0", "N5-1 N1-0"]
    hist_all = ["N9 N8", None, "N7"]
    c_all = compile_behaviors(imps_all, hist_all)
    emb = rng.standard_normal((c_all.num_news, 8)).astype(np.float32)
    save_embeddings(tmp_path, "ds", emb, news_ids=c_all.news_ids)

    c_subset = compile_behaviors(
        [imps_all[0], imps_all[2]], [hist_all[0], hist_all[2]]
    )
    aligned = load_embeddings(tmp_path, "ds", align_to_news_ids=c_subset.news_ids)
    lut = {n: emb[i] for i, n in enumerate(c_all.news_ids)}
    for j, n in enumerate(c_subset.news_ids):
        np.testing.assert_array_equal(aligned[j], lut[n])

    # Missing id -> named error, not silent garbage.
    with pytest.raises(KeyError, match="N999"):
        load_embeddings(tmp_path, "ds", align_to_news_ids=np.array(["N999"]))
    # Positional-only dump refuses realignment.
    save_embeddings(tmp_path, "old", emb)
    with pytest.raises(FileNotFoundError, match="positional-only"):
        load_embeddings(tmp_path, "old", align_to_news_ids=c_subset.news_ids)


def test_pipeline_cache_sensitive_to_input_data(tmp_path):
    calls = {"n": 0}

    class Counting(PipelineComponent):
        def transform(self, context):
            calls["n"] += 1
            return context

    p = Pipeline("t", [("s", Counting())], cache_dir=tmp_path)
    p.transform({"x": np.arange(10)})
    assert calls["n"] == 1
    # Same data -> cache hit.
    Pipeline("t", [("s", Counting())], cache_dir=tmp_path).transform(
        {"x": np.arange(10)}
    )
    assert calls["n"] == 1
    # Different data, same pipeline/step/config -> cache MISS.
    Pipeline("t", [("s", Counting())], cache_dir=tmp_path).transform(
        {"x": np.arange(10) + 1}
    )
    assert calls["n"] == 2


def test_bucket_for_open():
    assert bucket_for_open(100, (128, 4096)) == 128
    assert bucket_for_open(4096, (128, 4096)) == 4096
    assert bucket_for_open(4097, (128, 4096)) == 8192
    assert bucket_for_open(9000, (128, 4096)) == 12288
    # Closed variant still truncates.
    assert bucket_for(9000, (128, 4096)) == 4096


def test_truncation_keeps_most_recent_clicks():
    from news_recommendation_project_v2_tpu.models.pooling import average_pool
    from news_recommendation_project_v2_tpu.ops.scoring import (
        user_vectors_bucketed,
    )
    import jax.numpy as jnp

    # One row with 12 history items, bucket cap 8: the user vector must be the
    # mean of the LAST 8 embeddings (most recent clicks).
    n, d = 20, 4
    emb = jnp.asarray(np.eye(n, d, dtype=np.float32) + np.arange(n)[:, None])
    hist_rev = np.arange(12, dtype=np.int32)
    vecs = user_vectors_bucketed(
        lambda p, e, m: average_pool(e, m),
        None,
        emb,
        hist_rev,
        np.array([12], dtype=np.int32),
        buckets=(8,),
        batch_size=8,
    )
    expected = np.asarray(emb)[4:12].mean(0)
    np.testing.assert_allclose(vecs[0], expected, atol=1e-5)


def test_joint_trainer_rejects_infonce(rng):
    import jax
    import jax.numpy as jnp

    from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
    from news_recommendation_project_v2_tpu.data.synthetic import (
        align_embeddings,
        synthetic_learnable_behaviors,
    )
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.train import JointTowerTrainer

    imps, hist, emb = synthetic_learnable_behaviors(num_news=40, num_rows=20, dim=8)
    c = compile_behaviors(imps, hist).with_history_view()
    tower = build_tower(
        TowerConfig(kind="latent", reduced_dim=8, num_latents=2, latent_dim_head=4)
    )
    params = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, 4, 8)), jnp.ones((1, 4)))
    )()
    with pytest.raises(AssertionError, match="margin-ranking only"):
        JointTowerTrainer(
            tower.apply,
            params,
            c,
            jnp.asarray(align_embeddings(c.news_ids, emb)),
            cfg=TrainConfig(loss="infonce"),
        )
