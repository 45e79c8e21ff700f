"""Property tests for the negative samplers (pair-count and distribution invariants
of reference ``data_utils.py:275-388``; SURVEY.md §7.3)."""

import numpy as np

from news_recommendation_project_v2_tpu.data import (
    compile_behaviors,
    sample_pos_neg_infonce,
    sample_pos_neg_pairs,
)
from news_recommendation_project_v2_tpu.data.sampling import batch_aligned_permutation


def make_compiled(rng, rows=100, n_news=40):
    impressions = []
    for _ in range(rows):
        k = int(rng.integers(2, 12))
        ids = rng.choice(n_news, size=k, replace=False)
        labs = rng.integers(0, 2, size=k)
        labs[0] = 1
        if labs.sum() == k:
            labs[-1] = 0
        impressions.append(" ".join(f"N{j}-{l}" for j, l in zip(ids, labs)))
    return compile_behaviors(impressions, [None] * rows)


def test_pair_sampler_invariants(rng):
    c = make_compiled(rng)
    out = sample_pos_neg_pairs(rng, c.imp_rev, c.imp_lens, c.labels_flat)
    assert out.shape[0] == 3
    pos, neg, row = out
    offsets = np.concatenate([[0], np.cumsum(c.imp_lens)])
    for i in range(c.num_rows):
        seg = slice(offsets[i], offsets[i + 1])
        rev, lab = c.imp_rev[seg], c.labels_flat[seg]
        p_set = set(rev[lab == 1].tolist())
        n_set = set(rev[lab == 0].tolist())
        max_len = max(len(rev[lab == 1]), len(rev[lab == 0]))
        sel = row == i
        # Equalized count per impression.
        assert sel.sum() == max_len
        # All sampled ids come from the right label side.
        assert set(pos[sel].tolist()) <= p_set
        assert set(neg[sel].tolist()) <= n_set
        # The larger side is sampled without replacement -> all distinct.
        if len(n_set) >= max_len:
            assert len(set(neg[sel].tolist())) == max_len
        else:
            assert len(set(pos[sel].tolist())) == max_len
        # Every original positive appears when positives are oversampled.
        if len(p_set) <= max_len:
            assert set(pos[sel].tolist()) == p_set


def test_pair_sampler_ratio_cap(rng):
    c = make_compiled(rng)
    out = sample_pos_neg_pairs(
        rng, c.imp_rev, c.imp_lens, c.labels_flat, max_neg_ratio=0.5
    )
    pos, neg, row = out
    offsets = np.concatenate([[0], np.cumsum(c.imp_lens)])
    for i in range(c.num_rows):
        seg = slice(offsets[i], offsets[i + 1])
        lab = c.labels_flat[seg]
        num_pos = int((lab == 1).sum())
        num_neg = int((lab == 0).sum())
        max_len = max(num_pos, num_neg)
        if num_neg * 0.5 > num_pos:
            max_len = int(num_pos / 0.5)
        assert (row == i).sum() == max_len


def test_infonce_sampler_invariants(rng):
    c = make_compiled(rng)
    k = 5
    out = sample_pos_neg_infonce(rng, c.imp_rev, c.imp_lens, c.labels_flat, k)
    assert out.shape[0] == 2 + k
    pos, negs, row = out[0], out[1:-1], out[-1]
    offsets = np.concatenate([[0], np.cumsum(c.imp_lens)])
    for i in range(c.num_rows):
        seg = slice(offsets[i], offsets[i + 1])
        rev, lab = c.imp_rev[seg], c.labels_flat[seg]
        p_list = rev[lab == 1].tolist()
        n_set = set(rev[lab == 0].tolist())
        sel = row == i
        # One sampled row per positive; every positive appears exactly as often
        # as it occurs.
        assert sorted(pos[sel].tolist()) == sorted(p_list)
        sub = negs[:, sel]
        if len(n_set) >= k:
            # k distinct negatives per positive.
            for col in sub.T:
                assert len(set(col.tolist())) == k
                assert set(col.tolist()) <= n_set
        else:
            # All negatives plus -1 padding.
            for col in sub.T:
                real = [x for x in col.tolist() if x >= 0]
                assert set(real) == n_set
                assert col.tolist().count(-1) == k - len(n_set)


def test_batch_aligned_permutation(rng):
    idx = batch_aligned_permutation(rng, total=23, batch_size=5)
    assert sorted(idx.tolist()) == list(range(23))
    # Tail block (indices 20..22) stays last.
    assert idx[-3:].tolist() == [20, 21, 22]
    # Every full block is contiguous.
    for b in range(4):
        pos = np.flatnonzero(np.isin(idx, np.arange(b * 5, (b + 1) * 5)))
        assert pos.max() - pos.min() == 4
    # Single-batch case is identity.
    np.testing.assert_array_equal(
        batch_aligned_permutation(rng, 4, 8), np.arange(4)
    )


def test_gather_end_aligned_matches_loop(rng):
    from news_recommendation_project_v2_tpu.data.grouping import (
        gather_end_aligned,
        lengths_to_offsets,
    )

    lens = rng.integers(1, 12, size=20)
    flat = rng.integers(0, 100, size=int(lens.sum())).astype(np.int64)
    offsets = lengths_to_offsets(lens)
    W = 6
    idx, mask = gather_end_aligned(flat, offsets[1:], lens, W, out_rows=24)
    assert idx.shape == (24, W) and mask.shape == (24, W)
    for j in range(20):
        ln = min(int(lens[j]), W)
        b = offsets[j + 1]
        np.testing.assert_array_equal(idx[j, :ln], flat[b - ln : b])
        assert (idx[j, ln:] == 0).all()
        np.testing.assert_array_equal(
            mask[j], (np.arange(W) < ln).astype(np.float32)
        )
    assert (idx[20:] == 0).all() and (mask[20:] == 0).all()


def test_gather_end_aligned_empty():
    from news_recommendation_project_v2_tpu.data.grouping import gather_end_aligned

    idx, mask = gather_end_aligned(
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64), 4,
        out_rows=3,
    )
    assert idx.shape == (3, 4) and mask.sum() == 0


def test_vectorized_pair_sampler_matches_loop_distribution(rng):
    """The vectorized sampler (random-key segment sorts) must reproduce the
    loop oracle's per-impression marginals: identical pair counts, and on a
    single impression the without-replacement side selects each item equally
    often across resamples."""
    from news_recommendation_project_v2_tpu.data.sampling import (
        sample_pos_neg_pairs_loop,
    )

    c = make_compiled(rng)
    vec = sample_pos_neg_pairs(np.random.default_rng(0), c.imp_rev, c.imp_lens, c.labels_flat)
    loop = sample_pos_neg_pairs_loop(np.random.default_rng(0), c.imp_rev, c.imp_lens, c.labels_flat)
    np.testing.assert_array_equal(vec[2], loop[2])  # same per-impression counts

    # One impression: 2 pos, 6 neg -> 6 pairs; each pos must appear 3x per
    # draw on average, each neg exactly once per draw.
    imp_rev = np.array([0, 1, 2, 3, 4, 5, 6, 7], dtype=np.int32)
    lens = np.array([8], dtype=np.int64)
    labels = np.array([1, 1, 0, 0, 0, 0, 0, 0], dtype=np.int64)
    draws = 400
    r = np.random.default_rng(7)
    pos_counts = np.zeros(2)
    for _ in range(draws):
        out = sample_pos_neg_pairs(r, imp_rev, lens, labels)
        assert out.shape[1] == 6
        assert sorted(out[1].tolist()) == [2, 3, 4, 5, 6, 7]  # negs exactly once
        for v in out[0]:
            pos_counts[v] += 1
        assert set(out[0].tolist()) == {0, 1}  # keep-all when oversampling
    freq = pos_counts / pos_counts.sum()
    np.testing.assert_allclose(freq, [0.5, 0.5], atol=0.05)


def test_vectorized_infonce_sampler_matches_loop_distribution(rng):
    """Vectorized InfoNCE: same layout/padding as the loop oracle; negatives
    uniform without replacement per positive."""
    from news_recommendation_project_v2_tpu.data.sampling import (
        sample_pos_neg_infonce_loop,
    )

    c = make_compiled(rng)
    vec = sample_pos_neg_infonce(np.random.default_rng(0), c.imp_rev, c.imp_lens, c.labels_flat, 5)
    loop = sample_pos_neg_infonce_loop(np.random.default_rng(0), c.imp_rev, c.imp_lens, c.labels_flat, 5)
    assert vec.shape == loop.shape
    np.testing.assert_array_equal(vec[0], loop[0])   # positives in original order
    np.testing.assert_array_equal(vec[-1], loop[-1])  # row ids
    # Padding rows (-1) appear at identical places (few-negative impressions
    # reuse the same padded list; reference quirk).
    np.testing.assert_array_equal(vec[1:-1] == -1, loop[1:-1] == -1)

    # Uniformity: one impression with 1 pos, 8 negs, k=4 -> each neg chosen
    # with probability 1/2 per draw.
    imp_rev = np.arange(9, dtype=np.int32)
    lens = np.array([9], dtype=np.int64)
    labels = np.array([1] + [0] * 8, dtype=np.int64)
    r = np.random.default_rng(3)
    counts = np.zeros(9)
    draws = 500
    for _ in range(draws):
        out = sample_pos_neg_infonce(r, imp_rev, lens, labels, 4)
        chosen = out[1:-1, 0]
        assert len(set(chosen.tolist())) == 4  # without replacement
        for v in chosen:
            counts[v] += 1
    np.testing.assert_allclose(counts[1:] / draws, [0.5] * 8, atol=0.08)


def test_infonce_sampler_large_k_terminates():
    """Regression: with num_neg_per_pos == num_neg the rejection sampler's
    acceptance is k!/k^k (hopeless for k ~ 20); the bounded-round fallback to
    order-mapping must keep sampling instant and exact."""
    k = 20
    imp_rev = np.arange(21, dtype=np.int32)
    lens = np.array([21], dtype=np.int64)
    labels = np.array([1] + [0] * 20, dtype=np.int64)
    r = np.random.default_rng(0)
    out = sample_pos_neg_infonce(r, imp_rev, lens, labels, k)
    chosen = out[1:-1, 0]
    assert len(set(chosen.tolist())) == k  # all distinct (exact w/o replacement)
    assert set(chosen.tolist()) <= set(range(1, 21))


def test_epoch_prologue_reshuffles_impressions(rng):
    """sample_epoch_pairs properties: the emitted stream is a bijection of the
    sampled pairs, each impression's pairs stay contiguous BEFORE block
    shuffling (the batch history-dedup win — blocks may cut a run), and the
    impression order differs between epochs (the reference reset() reshuffle,
    data_utils.py:624-631)."""
    from news_recommendation_project_v2_tpu.data.sampling import sample_epoch_pairs

    c = make_compiled(rng, rows=200)
    r = np.random.default_rng(5)
    pairs1, _ = sample_epoch_pairs(
        r, c.imp_rev, c.imp_lens, c.labels_flat, batch_size=64
    )
    pairs2, _ = sample_epoch_pairs(
        r, c.imp_rev, c.imp_lens, c.labels_flat, batch_size=64
    )
    # Bijection: per-impression pair counts equal the sampler's invariant.
    offsets = np.concatenate([[0], np.cumsum(c.imp_lens)])
    for pairs in (pairs1, pairs2):
        counts = np.bincount(pairs[-1], minlength=c.num_rows)
        for i in range(c.num_rows):
            seg = slice(offsets[i], offsets[i + 1])
            lab = c.labels_flat[seg]
            assert counts[i] == max(int(lab.sum()), int((1 - lab).sum()))
    # Impression order differs across epochs.
    assert pairs1[-1][:40].tolist() != pairs2[-1][:40].tolist()
    # Runs of equal row id == unique rows + at most one extra cut per block
    # boundary (63 interior boundaries at batch_size 64).
    rows = pairs1[-1]
    runs = int((np.diff(rows) != 0).sum()) + 1
    n_blocks = -(-len(rows) // 64)
    assert runs <= len(np.unique(rows)) + n_blocks, (runs, len(np.unique(rows)))
