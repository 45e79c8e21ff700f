"""Unit tests for the behaviors compiler (string->index round trips, label parsing,
first-appearance id order) against hand-computed expectations and a pure-Python
re-derivation of the reference algorithm (``data_utils.py:168-232``)."""

import numpy as np

from news_recommendation_project_v2_tpu.data import compile_behaviors


def reference_split(impressions, history):
    """Direct re-derivation of the reference loop semantics for cross-checking."""
    cur = 0
    position = {}
    news_list = []
    imp_rev, hist_rev, labels = [], [], []
    hist_lens, imp_lens = [], []
    label_present = "-" in impressions[0]
    for i in range(len(impressions)):
        h = history[i]
        if h:
            toks = h.split()
            hist_lens.append(len(toks))
            for t in toks:
                if t not in position:
                    position[t] = cur
                    cur += 1
                    news_list.append(t)
                hist_rev.append(position[t])
        if label_present:
            subs, lab = zip(*[(k.rsplit("-", 1)[0], int(k.rsplit("-", 1)[1])) for k in impressions[i].split()])
            labels.append(lab)
        else:
            subs = impressions[i].split()
        imp_lens.append(len(subs))
        for t in subs:
            if t not in position:
                position[t] = cur
                cur += 1
                news_list.append(t)
            imp_rev.append(position[t])
    return news_list, imp_rev, hist_rev, imp_lens, hist_lens, labels


def test_tiny_hand_computed():
    impressions = ["N1-1 N2-0", "N2-0 N3-1 N1-0"]
    history = ["N5 N1", None]
    c = compile_behaviors(impressions, history)
    # First-appearance order: N5, N1 (history row 0), N2 (impression row 0), N3.
    assert c.news_ids.tolist() == ["N5", "N1", "N2", "N3"]
    assert c.hist_rev.tolist() == [0, 1]
    assert c.hist_lens.tolist() == [2]
    assert c.hist_row_index.tolist() == [0]
    assert c.imp_rev.tolist() == [1, 2, 2, 3, 1]
    assert c.imp_row.tolist() == [0, 0, 1, 1, 1]
    assert c.imp_lens.tolist() == [2, 3]
    assert c.labels_flat.tolist() == [1, 0, 0, 1, 0]
    assert c.label_present
    assert c.has_history.tolist() == [True, False]
    gl = c.grouped_labels()
    assert gl[0] == (1, 0) and gl[1] == (0, 1, 0)


def test_no_labels():
    c = compile_behaviors(["N1 N2", "N3"], ["N1", None])
    assert c.labels_flat is None
    assert not c.label_present
    assert c.news_ids.tolist() == ["N1", "N2", "N3"]


def test_matches_reference_semantics_random(rng):
    n_news = 50
    rows = 200
    impressions, history = [], []
    for i in range(rows):
        k = rng.integers(2, 10)
        ids = rng.choice(n_news, size=k, replace=False)
        labs = rng.integers(0, 2, size=k)
        labs[0] = 1  # ensure at least one positive
        impressions.append(" ".join(f"N{j}-{l}" for j, l in zip(ids, labs)))
        if rng.random() < 0.8:
            hk = rng.integers(1, 15)
            hids = rng.choice(n_news, size=hk, replace=False)
            history.append(" ".join(f"N{j}" for j in hids))
        else:
            history.append(None)
    c = compile_behaviors(impressions, history)
    news_list, imp_rev, hist_rev, imp_lens, hist_lens, labels = reference_split(
        impressions, history
    )
    assert c.news_ids.tolist() == news_list
    assert c.imp_rev.tolist() == imp_rev
    assert c.hist_rev.tolist() == hist_rev
    assert c.imp_lens.tolist() == imp_lens
    assert c.hist_lens.tolist() == hist_lens
    flat_labels = [l for row in labels for l in row]
    assert c.labels_flat.tolist() == flat_labels
    # Round trip: expanding news_ids by rev index reproduces the token stream.
    imp_tokens = [t.rsplit("-", 1)[0] for row in impressions for t in row.split()]
    assert c.news_ids[c.imp_rev].tolist() == imp_tokens


def test_ids_with_hyphens():
    c = compile_behaviors(["N-1-0 N-2-1"], ["N-3"])
    assert c.news_ids.tolist() == ["N-3", "N-1", "N-2"]
    assert c.labels_flat.tolist() == [0, 1]


def test_nan_history_treated_missing():
    c = compile_behaviors(["N1-1 N2-0"], [float("nan")])
    assert len(c.hist_lens) == 0
    assert c.has_history.tolist() == [False]
