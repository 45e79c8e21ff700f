"""Golden-metric tests: our vectorized MIND metrics vs hand-computed values, the
reference per-row formulas, and sklearn's ROC-AUC (reference ``evaluation.py:13-54``)."""

import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from news_recommendation_project_v2_tpu.data.grouping import (
    dense_rank_by_segment,
    rank_group_preds,
)
from news_recommendation_project_v2_tpu.eval import metrics


def reference_row(labels, ranks):
    """Reference evaluation.py:34-54 reimplemented verbatim (with sklearn AUC)."""
    y_true = np.array(labels, dtype="float32")
    y_score = [1.0 / r for r in ranks]
    auc = roc_auc_score(y_true, y_score)
    mrr = metrics.mrr_score(y_true, np.array(y_score))
    ndcg5 = metrics.ndcg_score(y_true, np.array(y_score), 5)
    ndcg10 = metrics.ndcg_score(y_true, np.array(y_score), 10)
    return auc, mrr, ndcg5, ndcg10


def test_hand_computed_simple():
    # 3 candidates, ranks [1,2,3], positive at rank 1.
    labels = [1, 0, 0]
    ranks = [1, 2, 3]
    res = metrics.score([ranks], [labels])
    assert res["auc"] == pytest.approx(1.0)
    assert res["mrr"] == pytest.approx(1.0)
    assert res["ndcg5"] == pytest.approx(1.0)
    assert res["ndcg10"] == pytest.approx(1.0)


def test_hand_computed_worst():
    labels = [0, 0, 1]
    ranks = [1, 2, 3]
    res = metrics.score([ranks], [labels])
    assert res["auc"] == pytest.approx(0.0)
    assert res["mrr"] == pytest.approx(1.0 / 3.0)
    # DCG@5 = 1/log2(3+1) = 0.5; IDCG = 1 -> ndcg 0.5
    assert res["ndcg5"] == pytest.approx(0.5)


def test_against_sklearn_and_reference_random(rng):
    rows_ranks, rows_labels = [], []
    for _ in range(300):
        k = int(rng.integers(2, 40))
        labels = rng.integers(0, 2, size=k)
        if labels.sum() == 0:
            labels[0] = 1
        if labels.sum() == k:
            labels[-1] = 0
        scores = rng.random(k)
        # Dense ranks with deliberate ties.
        scores = np.round(scores, 1)
        ranks = dense_rank_by_segment(scores, np.array([k]))
        rows_ranks.append(ranks.tolist())
        rows_labels.append(labels.tolist())
    got = metrics.score(rows_ranks, rows_labels)
    exp = np.array([reference_row(l, r) for l, r in zip(rows_labels, rows_ranks)])
    assert got["auc"] == pytest.approx(exp[:, 0].mean(), abs=1e-12)
    assert got["mrr"] == pytest.approx(exp[:, 1].mean(), abs=1e-12)
    assert got["ndcg5"] == pytest.approx(exp[:, 2].mean(), abs=1e-12)
    assert got["ndcg10"] == pytest.approx(exp[:, 3].mean(), abs=1e-12)
    assert got["num_samples"] == 300


def test_tie_order_matches_argsort_reversal():
    # Two candidates share rank 1; reference argsort-reversal puts the LATER one
    # first. labels [1, 1, 0] with ranks [1, 1, 2]: mrr = (1/1)*y[order0] ...
    labels = [0, 1, 0]
    ranks = [1, 1, 2]
    got = metrics.score([ranks], [labels])
    exp = reference_row(labels, ranks)
    assert got["auc"] == pytest.approx(exp[0])
    assert got["mrr"] == pytest.approx(exp[1])
    assert got["ndcg5"] == pytest.approx(exp[2])
    assert got["ndcg10"] == pytest.approx(exp[3])


def test_auc_with_ties_matches_sklearn(rng):
    for _ in range(50):
        k = int(rng.integers(4, 30))
        y = rng.integers(0, 2, size=k)
        if y.sum() == 0:
            y[0] = 1
        if y.sum() == k:
            y[-1] = 0
        s = rng.integers(0, 4, size=k).astype(float)  # heavy ties
        assert metrics.auc_score(y, s) == pytest.approx(roc_auc_score(y, s))


def test_dense_rank_matches_scipy(rng):
    from scipy.stats import rankdata

    counts = rng.integers(1, 20, size=40).astype(np.int64)
    scores = np.round(rng.random(int(counts.sum())), 1)
    flat = dense_rank_by_segment(scores, counts)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    for i in range(len(counts)):
        seg = scores[offsets[i] : offsets[i + 1]]
        expected = rankdata(-seg, method="dense")
        np.testing.assert_array_equal(flat[offsets[i] : offsets[i + 1]], expected)


def test_rank_group_preds_object_array(rng):
    counts = np.array([3, 2])
    scores = np.array([0.1, 0.9, 0.5, 0.2, 0.8])
    grouped = rank_group_preds(scores, counts)
    assert grouped[0].tolist() == [3, 1, 2]
    assert grouped[1].tolist() == [2, 1]


def test_debug_dump(tmp_path):
    metrics.score([[1, 2]], [[1, 0]], imp_ids=["i1"], debug_dir=tmp_path)
    assert (tmp_path / "debug_json.json").exists()


def test_score_batch_threaded_matches_serial(rng):
    # NUM_WORKERS wiring: chunk fan-out to threads must be bit-identical to the
    # serial pass.
    from news_recommendation_project_v2_tpu.eval.metrics import score_batch

    n, L = 300, 40
    lens = rng.integers(5, L + 1, size=n)
    scores = np.full((n, L), -np.inf)
    labels = np.zeros((n, L))
    for i, ln in enumerate(lens):
        ranks = rng.permutation(ln) + 1
        scores[i, :ln] = 1.0 / ranks
        labs = np.zeros(ln)
        labs[rng.choice(ln, size=max(1, ln // 4), replace=False)] = 1
        if labs.sum() == ln:
            labs[0] = 0
        labels[i, :ln] = labs
    serial = score_batch(scores, labels, lens, chunk=64, num_workers=1)
    threaded = score_batch(scores, labels, lens, chunk=64, num_workers=4)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)
