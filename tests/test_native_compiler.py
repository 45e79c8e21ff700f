"""Native (C++) behaviors compiler: exact parity with the Python path, and
robustness probes."""

import numpy as np
import pytest

from news_recommendation_project_v2_tpu import native
from news_recommendation_project_v2_tpu.data import compile_behaviors

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native extension unavailable"
)


def random_behaviors(rng, rows=500, n_news=300):
    impressions, history = [], []
    for i in range(rows):
        k = int(rng.integers(2, 15))
        ids = rng.choice(n_news, size=k, replace=False)
        labs = rng.integers(0, 2, size=k)
        impressions.append(" ".join(f"N{j}-{l}" for j, l in zip(ids, labs)))
        r = rng.random()
        if r < 0.7:
            hk = int(rng.integers(1, 30))
            history.append(
                " ".join(f"N{j}" for j in rng.choice(n_news, size=min(hk, n_news), replace=False))
            )
        elif r < 0.8:
            history.append(None)
        elif r < 0.9:
            history.append(float("nan"))
        else:
            history.append("")
    return impressions, history


def test_native_matches_python_exactly(rng):
    impressions, history = random_behaviors(rng)
    a = compile_behaviors(impressions, history, use_native=True)
    b = compile_behaviors(impressions, history, use_native=False)
    assert a.news_ids.tolist() == b.news_ids.tolist()
    for field in (
        "imp_rev",
        "imp_row",
        "imp_lens",
        "hist_rev",
        "hist_row",
        "hist_lens",
        "hist_row_index",
        "labels_flat",
    ):
        np.testing.assert_array_equal(
            getattr(a, field), getattr(b, field), err_msg=field
        )
    assert a.label_present == b.label_present


def test_native_unlabeled(rng):
    a = compile_behaviors(["N1 N2", "N3 N1"], ["N9", None], use_native=True)
    assert a.labels_flat is None
    assert not a.label_present
    assert a.news_ids.tolist() == ["N9", "N1", "N2", "N3"]


def test_native_hyphenated_ids():
    a = compile_behaviors(["X-1-0 X-2-1"], [None], use_native=True)
    b = compile_behaviors(["X-1-0 X-2-1"], [None], use_native=False)
    assert a.news_ids.tolist() == b.news_ids.tolist() == ["X-1", "X-2"]
    np.testing.assert_array_equal(a.labels_flat, b.labels_flat)


def test_native_empty_raises():
    mod = native.load()
    with pytest.raises(AssertionError):
        mod.compile_behaviors([], [])


def test_native_multi_space_and_extra_whitespace():
    a = compile_behaviors(["N1-1  N2-0"], ["  N3   N4 "], use_native=True)
    b = compile_behaviors(["N1-1  N2-0"], ["  N3   N4 "], use_native=False)
    assert a.news_ids.tolist() == b.news_ids.tolist()
    np.testing.assert_array_equal(a.imp_rev, b.imp_rev)
    np.testing.assert_array_equal(a.hist_rev, b.hist_rev)


def test_native_is_faster(rng):
    import time

    impressions, history = random_behaviors(rng, rows=3000)
    t0 = time.perf_counter()
    compile_behaviors(impressions, history, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    compile_behaviors(impressions, history, use_native=False)
    t_python = time.perf_counter() - t0
    # Not a strict benchmark, but the native path should never be slower by 2x.
    assert t_native < max(t_python * 2, 1.0), (t_native, t_python)


def test_native_tab_newline_whitespace_parity():
    # Python str.split() splits on any whitespace; the native tokenizer must
    # match (ADVICE r1: it used to split on ' ' only).
    imps = ["N1-1\tN2-0 N3-1", "N4-0\nN5-1"]
    hist = ["N6\tN7\nN8", "  \t  "]  # second row: whitespace-only -> missing
    a = compile_behaviors(imps, hist, use_native=True)
    b = compile_behaviors(imps, hist, use_native=False)
    assert a.news_ids.tolist() == b.news_ids.tolist()
    np.testing.assert_array_equal(a.hist_rev, b.hist_rev)
    np.testing.assert_array_equal(a.hist_lens, b.hist_lens)
    np.testing.assert_array_equal(a.hist_row_index, b.hist_row_index)
    np.testing.assert_array_equal(a.labels_flat, b.labels_flat)
    assert a.hist_lens.tolist() == [3]


def test_non_nan_float_history_rejected_both_paths():
    # Only NaN floats mean "missing"; any other float is a type error on both
    # paths (the native used to silently treat 3.5 as missing).
    for use_native in (True, False):
        with pytest.raises((TypeError, AttributeError)):
            compile_behaviors(["N1-1 N2-0"], [3.5], use_native=use_native)


def test_malformed_label_raises_both_paths():
    # A labeled token must end in -0/-1; both paths must reject instead of the
    # old behavior where the native ValueError was swallowed and the Python
    # fallback silently parsed any digit.
    for use_native in (True, False):
        with pytest.raises(ValueError, match="malformed labeled token in row 1"):
            compile_behaviors(
                ["N1-1 N2-0", "N3-7 N4-1"], [None, None], use_native=use_native
            )
