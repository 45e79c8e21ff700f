"""Bounded in-flight dispatch window, shared by every pipelined device loop.

JAX dispatch is asynchronous: enqueueing the next program while the previous
one still computes (or its result still downloads) overlaps round-trip latency
with device compute — on tunneled hosts the per-call RTT, not the compute, is
the whole cost of a chunked loop (measured: token-store materialization went
653 -> 4,740-7,870 news/s from exactly this change, BASELINE.md training
roofline). The window must be BOUNDED: unboundedly deep async queues stall on
tunneled links (CLAUDE.md), and each pending item pins its input/output
buffers, so the depth is also a memory budget — callers with [B, T, D]-scale
pending blocks run depth 1-2, callers whose inputs are KB index grids run 4.

Used by ``ops.encode.materialize_from_token_store`` / ``build_token_store``
and ``serve.Ranker.rank_batch``.
"""

from __future__ import annotations

from typing import Any, Callable


class InflightWindow:
    """FIFO of at most ``depth`` pending items. ``push`` enqueues and, once
    the window is full, consumes the OLDEST item (fetch order == dispatch
    order, so downstream concatenation stays positional); ``flush`` consumes
    everything left. ``consume`` is where the blocking ``np.asarray`` fetch
    belongs."""

    def __init__(self, depth: int, consume: Callable[[Any], None]):
        assert depth >= 1, depth
        self.depth = depth
        self._consume = consume
        self._pending: list[Any] = []

    def push(self, item: Any) -> None:
        self._pending.append(item)
        self._drain(self.depth)

    def flush(self) -> None:
        self._drain(0)

    def _drain(self, limit: int) -> None:
        while len(self._pending) > limit:
            self._consume(self._pending.pop(0))
