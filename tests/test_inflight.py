"""The shared bounded in-flight dispatch window (utils/inflight.py)."""

import pytest

from news_recommendation_project_v2_tpu.utils.inflight import InflightWindow


def test_fifo_order_and_bound():
    consumed = []
    w = InflightWindow(3, consumed.append)
    for i in range(10):
        w.push(i)
        assert len(w._pending) <= 3  # never more than depth pending
    # With depth 3, pushes 0..9 consume the oldest once the window fills.
    assert consumed == list(range(7))
    w.flush()
    assert consumed == list(range(10))  # dispatch order == fetch order


def test_depth_one_keeps_single_pending():
    consumed = []
    w = InflightWindow(1, consumed.append)
    w.push("a")
    assert consumed == []  # one block may stay in flight
    w.push("b")
    assert consumed == ["a"]
    w.flush()
    assert consumed == ["a", "b"]


def test_flush_idempotent_and_empty():
    consumed = []
    w = InflightWindow(4, consumed.append)
    w.flush()
    w.flush()
    assert consumed == []


def test_depth_must_be_positive():
    with pytest.raises(AssertionError):
        InflightWindow(0, lambda x: None)
