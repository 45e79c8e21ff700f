"""End-to-end scoring tests: bucketed tower inference + flat cosine scoring +
score composition, cross-checked against a direct per-impression loop (the
reference algorithm, ``data_model_helper.py:174-239``)."""

import jax
import jax.numpy as jnp
import numpy as np

from news_recommendation_project_v2_tpu.data import compile_behaviors
from news_recommendation_project_v2_tpu.data.synthetic import (
    synthetic_news_embeddings,
)
from news_recommendation_project_v2_tpu.eval.ranker import (
    compose_final_scores,
    history_candidate_slots,
)
from news_recommendation_project_v2_tpu.models.pooling import average_pool
from news_recommendation_project_v2_tpu.ops import (
    cosine_scores_flat,
    score_all_impressions,
    user_vectors_bucketed,
)

D = 32


def mean_tower(params, emb, mask):
    """Parameterless mean-pool tower (BASELINE config[0])."""
    del params
    return average_pool(emb, mask)


def make_data(rng, rows=30, n_news=25):
    impressions, history = [], []
    for i in range(rows):
        k = int(rng.integers(2, 8))
        ids = rng.choice(n_news, size=k, replace=False)
        labs = rng.integers(0, 2, size=k)
        labs[0] = 1
        if labs.sum() == k:
            labs[-1] = 0
        impressions.append(" ".join(f"N{j}-{l}" for j, l in zip(ids, labs)))
        if i % 4 != 3:
            hk = int(rng.integers(1, 20))
            history.append(
                " ".join(f"N{j}" for j in rng.choice(n_news, size=min(hk, n_news), replace=False))
            )
        else:
            history.append(None)
    c = compile_behaviors(impressions, history)
    emb = jnp.asarray(synthetic_news_embeddings(c.num_news, D))
    return c, emb


def reference_scores(c, emb_np, user_vecs):
    """Direct per-impression cosine loop (reference semantics)."""
    slots, cand_rows = history_candidate_slots(c)
    out = np.empty(len(slots))
    for k, (slot, row) in enumerate(zip(slots, cand_rows)):
        u = user_vecs[row]
        v = emb_np[c.imp_rev[slot]]
        out[k] = (u @ v) / (
            max(np.linalg.norm(u), 1e-8) * max(np.linalg.norm(v), 1e-8)
        )
    return out


def test_cosine_scores_match_loop(rng):
    c, emb = make_data(rng)
    user_vecs = user_vectors_bucketed(
        mean_tower, None, emb, c.hist_rev, c.hist_lens, batch_size=8
    )
    slots, cand_rows = history_candidate_slots(c)
    got = np.asarray(
        cosine_scores_flat(
            jnp.asarray(user_vecs), emb, jnp.asarray(c.imp_rev[slots]), jnp.asarray(cand_rows)
        )
    )
    exp = reference_scores(c, np.asarray(emb), user_vecs)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_user_vectors_bucketed_match_direct(rng):
    c, emb = make_data(rng)
    vecs = user_vectors_bucketed(
        mean_tower, None, emb, c.hist_rev, c.hist_lens, batch_size=4
    )
    # Direct mean of history embeddings per row.
    offsets = np.concatenate([[0], np.cumsum(c.hist_lens)])
    emb_np = np.asarray(emb)
    for i in range(len(c.hist_lens)):
        expected = emb_np[c.hist_rev[offsets[i] : offsets[i + 1]]].mean(0)
        np.testing.assert_allclose(vecs[i], expected, atol=1e-5)


def test_score_all_impressions_e2e(rng):
    c, emb = make_data(rng)
    slots, cand_rows = history_candidate_slots(c)
    hist_scores = score_all_impressions(
        mean_tower,
        None,
        emb,
        c.hist_rev,
        c.hist_lens,
        c.imp_rev[slots],
        cand_rows,
        batch_size=8,
    )
    res = compose_final_scores(c, history_scores=hist_scores)
    assert res.metrics is not None
    assert 0 <= res.metrics["auc"] <= 1
    assert res.metrics["num_samples"] == c.num_rows
    # Rows without history keep the zero baseline -> all candidates tie at rank 1.
    no_hist_rows = np.flatnonzero(~c.has_history)
    for r in no_hist_rows:
        assert set(res.grouped_ranks[r].tolist()) == {1}


def test_oracle_scores_hit_auc_1(rng):
    c, emb = make_data(rng)
    slots, _ = history_candidate_slots(c)
    res = compose_final_scores(
        c,
        history_scores=c.labels_flat[slots].astype(np.float64),
        baseline_scores=None,
    )
    # With-history rows ranked by label -> their per-row AUC is 1; no-history rows
    # all tie -> AUC 0.5 each.
    n_hist = int(c.has_history.sum())
    expected_auc = (n_hist * 1.0 + (c.num_rows - n_hist) * 0.5) / c.num_rows
    assert res.metrics["auc"] == expected_auc


def test_alpha_blend(rng):
    c, emb = make_data(rng)
    slots, _ = history_candidate_slots(c)
    hist = rng.random(len(slots))
    base = rng.random(c.num_news)
    full = compose_final_scores(c, hist, base, alpha=1.0, compute_metrics=False)
    np.testing.assert_allclose(full.scores[slots], hist)
    none = compose_final_scores(c, hist, base, alpha=0.0, compute_metrics=False)
    np.testing.assert_allclose(none.scores[slots], base[c.imp_rev[slots]])


def _small_latent_tower():
    from news_recommendation_project_v2_tpu.config import TowerConfig
    from news_recommendation_project_v2_tpu.models import (
        build_tower,
        supports_flat_scoring,
    )

    config = TowerConfig(
        kind="latent", reduced_dim=D, embedding_dim=D, num_latents=4,
        num_heads=2, latent_dim_head=8,
    )
    assert supports_flat_scoring(config)
    tower = build_tower(config)
    params = tower.init(jax.random.key(0), jnp.zeros((1, 5, D)), jnp.ones((1, 5)))
    return tower.apply, params


def test_user_vectors_flat_match_bucketed(rng):
    """The flat zero-padding path must reproduce the padded bucketed path
    exactly (same per-token math, different batching)."""
    from news_recommendation_project_v2_tpu.ops import user_vectors_flat

    c, emb = make_data(rng)
    apply_fn, params = _small_latent_tower()
    bucketed = user_vectors_bucketed(
        apply_fn, params, emb, c.hist_rev, c.hist_lens, batch_size=4
    )
    # chunk_tokens=16 forces rows to straddle chunk boundaries.
    flat = np.asarray(
        user_vectors_flat(
            apply_fn, params, emb, c.hist_rev, c.hist_lens,
            out_dim=D, chunk_tokens=16,
        )
    )
    np.testing.assert_allclose(flat, bucketed, atol=2e-5)


def test_user_vectors_flat_max_len_end_aligned(rng):
    """max_len keeps the most RECENT clicks, matching the bucketed cap."""
    from news_recommendation_project_v2_tpu.ops import user_vectors_flat

    c, emb = make_data(rng)
    apply_fn, params = _small_latent_tower()
    cap = 8
    bucketed = user_vectors_bucketed(
        apply_fn, params, emb, c.hist_rev, c.hist_lens,
        batch_size=4, buckets=(cap,),
    )
    flat = np.asarray(
        user_vectors_flat(
            apply_fn, params, emb, c.hist_rev, c.hist_lens,
            out_dim=D, chunk_tokens=32, max_len=cap,
        )
    )
    np.testing.assert_allclose(flat, bucketed, atol=2e-5)


def test_score_all_impressions_flat_matches_bucketed(rng):
    c, emb = make_data(rng)
    apply_fn, params = _small_latent_tower()
    slots, cand_rows = history_candidate_slots(c)
    args = (apply_fn, params, emb, c.hist_rev, c.hist_lens, c.imp_rev[slots], cand_rows)
    bucketed = score_all_impressions(*args, batch_size=8)
    flat = score_all_impressions(*args, flat_tokens=True, tokens_per_batch=64)
    np.testing.assert_allclose(flat, bucketed, atol=2e-5)


def test_score_all_impressions_flat_single_program(rng):
    from news_recommendation_project_v2_tpu.ops.scoring import (
        score_all_impressions_flat,
    )

    c, emb = make_data(rng)
    apply_fn, params = _small_latent_tower()
    slots, cand_rows = history_candidate_slots(c)
    args = (apply_fn, params, emb, c.hist_rev, c.hist_lens, c.imp_rev[slots], cand_rows)
    bucketed = score_all_impressions(*args, batch_size=8)
    fused = score_all_impressions_flat(*args, chunk_tokens=32, cand_chunk=16)
    np.testing.assert_allclose(fused, bucketed, atol=2e-5)


def test_query_passage_asymmetry(rng):
    c, emb = make_data(rng)
    query_emb = jnp.asarray(synthetic_news_embeddings(c.num_news, D, seed=7))
    slots, cand_rows = history_candidate_slots(c)
    s_sym = score_all_impressions(
        mean_tower, None, emb, c.hist_rev, c.hist_lens, c.imp_rev[slots], cand_rows
    )
    s_asym = score_all_impressions(
        mean_tower,
        None,
        emb,
        c.hist_rev,
        c.hist_lens,
        c.imp_rev[slots],
        cand_rows,
        query_news_emb=query_emb,
    )
    assert not np.allclose(s_sym, s_asym)
