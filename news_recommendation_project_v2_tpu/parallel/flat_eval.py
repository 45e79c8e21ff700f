"""Zero-collective sharded flat eval: shard_map over the data axis with
row-partitioned accumulators.

The generic mesh path in ``ops.scoring`` shards token chunks over ``data`` and
keeps the user-vector accumulator replicated, so every chunk ends in a
cross-device combine of the full [rows, D] buffer — correct, but the combine
traffic grows with the dataset. This module removes ALL communication from the
eval instead: impression rows are partitioned into contiguous per-device
groups (balanced by token count), each device runs the per-token tower +
segment-add + pooling + cosine over ONLY its own rows and candidate slots
(tables and params replicated), and the flat scores come back sharded. The
whole eval is embarrassingly parallel because the latent tower is token-local
and candidate slots are row-major — scaling is linear in devices by
construction (SURVEY.md §2.6 scaling-efficiency row).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.grouping import lengths_to_offsets, truncate_flat_end_aligned
from ..ops.scoring import _flat_eval_body, _probe_out


def partition_rows_by_tokens(hist_lens: np.ndarray, parts: int) -> np.ndarray:
    """[parts+1] contiguous row boundaries with ~equal token counts per part:
    each split point is the row boundary whose token cumsum is NEAREST the
    ideal target (at-or-after alone degenerates on skewed lengths — a single
    long row at a boundary would hand one device everything)."""
    offsets = lengths_to_offsets(hist_lens)
    total = int(offsets[-1])
    targets = (np.arange(1, parts) * total) // parts
    hi = np.searchsorted(offsets, targets, side="left")  # first offset >= target
    lo = np.maximum(hi - 1, 0)
    cuts = np.where(
        np.abs(offsets[np.minimum(hi, len(offsets) - 1)] - targets)
        < np.abs(targets - offsets[lo]),
        np.minimum(hi, len(offsets) - 1),
        lo,
    )
    bounds = np.concatenate([[0], cuts, [len(hist_lens)]])
    return np.maximum.accumulate(bounds)  # monotone even for degenerate splits


class ShardedFlatEvalPlan:
    """Device-sharded ``FlatEvalPlan``: build once per (dataset, mesh), score
    many times with zero cross-device communication per eval."""

    def __init__(
        self,
        mesh: Mesh,
        hist_rev: np.ndarray,
        hist_lens: np.ndarray,
        cand_rev: np.ndarray,
        cand_row: np.ndarray,
        chunk_tokens: int = 64 * 1024,
        cand_chunk: int = 1 << 15,
        max_len: Optional[int] = None,
    ):
        self.mesh = mesh
        ndata = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        # The eval is sharded over EVERY mesh axis (it is communication-free,
        # so there is no reason to leave the model axis idle).
        self._axes = tuple(mesh.axis_names)
        hist_lens = np.asarray(hist_lens)
        hist_rev = np.asarray(hist_rev, dtype=np.int32)
        cand_rev = np.asarray(cand_rev, dtype=np.int32)
        cand_row = np.asarray(cand_row, dtype=np.int32)
        num_rows = len(hist_lens)
        if max_len is not None:
            hist_rev, hist_lens = truncate_flat_end_aligned(
                hist_rev, hist_lens, max_len
            )
        # Candidate slots grouped by owning row (stable, so original order is
        # recoverable per row group); history_candidate_slots already emits
        # row-major slots, in which case this sort is the identity.
        order = np.argsort(cand_row, kind="stable")
        self._order = order
        self._unsort = np.empty_like(order)
        self._unsort[order] = np.arange(len(order))
        cand_rev = cand_rev[order]
        cand_row_sorted = cand_row[order]

        bounds = partition_rows_by_tokens(hist_lens, ndata)
        offsets = lengths_to_offsets(hist_lens)
        cand_bounds = np.searchsorted(cand_row_sorted, bounds, side="left")
        self.num_slots = len(cand_rev)
        self._bounds = bounds
        self._cand_bounds = cand_bounds
        self._cand_counts = np.diff(cand_bounds)

        # Per-device flat token streams / local rows / local candidate slots,
        # padded to common grid shapes.
        tok_counts = offsets[bounds[1:]] - offsets[bounds[:-1]]
        row_counts = np.diff(bounds)
        r_max = max(int(row_counts.max()), 1) if ndata else 1
        n_chunks = max(1, -(-int(tok_counts.max()) // chunk_tokens))
        n_cchunks = max(1, -(-int(self._cand_counts.max()) // cand_chunk))
        idx2d = np.zeros((ndata, n_chunks, chunk_tokens), np.int32)
        rows2d = np.full((ndata, n_chunks, chunk_tokens), r_max, np.int32)
        lens2d = np.zeros((ndata, r_max), np.float32)
        crev2d = np.zeros((ndata, n_cchunks, cand_chunk), np.int32)
        crow2d = np.zeros((ndata, n_cchunks, cand_chunk), np.int32)
        for d in range(ndata):
            r0, r1 = bounds[d], bounds[d + 1]
            t0, t1 = offsets[r0], offsets[r1]
            local_rows = np.repeat(
                np.arange(r1 - r0, dtype=np.int32), hist_lens[r0:r1]
            )
            idx2d[d].reshape(-1)[: t1 - t0] = hist_rev[t0:t1]
            rows2d[d].reshape(-1)[: t1 - t0] = local_rows
            lens2d[d, : r1 - r0] = hist_lens[r0:r1]
            c0, c1 = cand_bounds[d], cand_bounds[d + 1]
            crev2d[d].reshape(-1)[: c1 - c0] = cand_rev[c0:c1]
            crow2d[d].reshape(-1)[: c1 - c0] = cand_row_sorted[c0:c1] - r0
        self._r_max = r_max
        # Shard the leading device axis across the whole mesh.
        spec = P(self._axes)
        sh = NamedSharding(mesh, spec)
        self.idx2d = jax.device_put(idx2d, sh)
        self.rows2d = jax.device_put(rows2d, sh)
        self.lens2d = jax.device_put(np.maximum(lens2d, 0.0), sh)
        self.crev2d = jax.device_put(crev2d, sh)
        self.crow2d = jax.device_put(crow2d, sh)
        # Jitted shard_map programs cached per (tower_apply, normalize,
        # out_dim): rebuilding the closure per score() would retrace and
        # recompile every eval (30-500s/program on remote-compile TPUs).
        self._fns: dict = {}

    def score(
        self,
        tower_apply: Callable,
        params,
        news_emb: jnp.ndarray,
        query_news_emb: Optional[jnp.ndarray] = None,
        normalize: bool = True,
    ) -> np.ndarray:
        table_for_history = (
            query_news_emb if query_news_emb is not None else news_emb
        )
        probe = _probe_out(tower_apply, params, table_for_history)
        out_dim = int(probe.shape[-1])
        mesh, axes = self.mesh, self._axes
        rep = NamedSharding(mesh, P())
        params, news_emb, table_for_history = jax.tree.map(
            lambda x: jax.device_put(x, rep)
            if not (
                isinstance(x, jax.Array)
                and frozenset(x.devices()) == frozenset(mesh.devices.flat)
            )
            else x,
            (params, news_emb, table_for_history),
        )

        key = (tower_apply, normalize, out_dim)
        fn = self._fns.get(key)
        if fn is None:

            def device_body(
                params, news, query, idx2d, rows2d, lens, crev2d, crow2d
            ):
                scores = _flat_eval_body(
                    params,
                    news,
                    query,
                    idx2d[0],
                    rows2d[0],
                    lens[0],
                    crev2d[0],
                    crow2d[0],
                    tower_apply=tower_apply,
                    normalize=normalize,
                    out_dim=out_dim,
                )
                return scores[None]

            fn = jax.jit(
                shard_map(
                    device_body,
                    mesh=mesh,
                    in_specs=(
                        P(), P(), P(), P(axes), P(axes), P(axes), P(axes), P(axes),
                    ),
                    out_specs=P(axes),
                    check_vma=False,
                )
            )
            self._fns[key] = fn
        out = np.asarray(
            fn(
                params,
                news_emb,
                table_for_history,
                self.idx2d,
                self.rows2d,
                self.lens2d,
                self.crev2d,
                self.crow2d,
            )
        )
        # Reassemble: per-device valid slot counts, then undo the stable sort.
        parts = [out[d].reshape(-1)[: self._cand_counts[d]] for d in range(len(out))]
        return np.concatenate(parts)[self._unsort] if parts else np.zeros(0)
