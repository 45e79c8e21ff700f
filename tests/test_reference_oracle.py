"""Oracle tests against the ACTUAL reference implementation (imported read-only
from /root/reference): our behaviors compiler and metric suite must reproduce
its outputs exactly on shared inputs. Skipped when the reference checkout is
not present (e.g. downstream users)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)

if REF.exists():
    sys.path.insert(0, str(REF))


def make_behaviors(rng, rows=120, n_news=60):
    impressions, history = [], []
    for i in range(rows):
        k = int(rng.integers(2, 10))
        ids = rng.choice(n_news, size=k, replace=False)
        labs = rng.integers(0, 2, size=k)
        labs[0] = 1
        if labs.sum() == k:
            labs[-1] = 0
        impressions.append(" ".join(f"N{j}-{l}" for j, l in zip(ids, labs)))
        history.append(
            " ".join(f"N{j}" for j in rng.choice(n_news, size=int(rng.integers(1, 12)), replace=False))
            if i % 4 != 3
            else None
        )
    return impressions, history


def test_compiler_matches_reference_exactly(rng):
    from news_rec_utils.data_utils import split_impressions_and_history

    from news_recommendation_project_v2_tpu.data import compile_behaviors

    impressions, history = make_behaviors(rng)
    ref = split_impressions_and_history(impressions, history)
    ours = compile_behaviors(impressions, history)

    assert ours.news_ids.tolist() == list(ref["news_list"])
    np.testing.assert_array_equal(ours.imp_rev, ref["impression_rev_ind_array"][0])
    np.testing.assert_array_equal(ours.imp_row, ref["impression_rev_ind_array"][1])
    np.testing.assert_array_equal(ours.imp_lens, ref["impression_len_list"])
    np.testing.assert_array_equal(ours.hist_rev, ref["history_rev_ind_array"][0])
    np.testing.assert_array_equal(ours.hist_row, ref["history_rev_ind_array"][1])
    np.testing.assert_array_equal(ours.hist_lens, ref["history_len_list"])
    ref_labels = [l for row in ref["labels"] for l in row]
    assert ours.labels_flat.tolist() == ref_labels


def test_ranking_matches_reference(rng):
    from news_rec_utils.data_utils import rank_group_preds as ref_rank

    from news_recommendation_project_v2_tpu.data.grouping import rank_group_preds

    counts = rng.integers(2, 20, size=50).astype(np.int64)
    scores = np.round(rng.random(int(counts.sum())), 2)  # deliberate ties
    ref = ref_rank(scores, counts)
    ours = rank_group_preds(scores, counts)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


def test_metrics_match_reference_on_tie_free_ranks(rng):
    """The reference sorts ties with unstable quicksort (arbitrary order), so
    equality is asserted on tie-free rank vectors — there every per-impression
    metric must match to float precision."""
    from news_rec_utils.evaluation import score as ref_score

    from news_recommendation_project_v2_tpu.eval import score as our_score

    preds, labels = [], []
    for _ in range(60):
        k = int(rng.integers(3, 25))
        ranks = rng.permutation(k) + 1  # tie-free dense ranks
        labs = rng.integers(0, 2, size=k)
        if labs.sum() == 0:
            labs[0] = 1
        if labs.sum() == k:
            labs[-1] = 0
        preds.append(ranks.tolist())
        labels.append(labs.tolist())
    ref = ref_score(preds, labels)
    got = our_score(preds, labels)
    for key in ("auc", "mrr", "ndcg5", "ndcg10"):
        assert got[key] == pytest.approx(ref[key], abs=1e-10), key
    assert got["num_samples"] == ref["num_samples"]
