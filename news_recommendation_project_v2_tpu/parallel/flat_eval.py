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


from .sharding import put_global as _put_global  # multi-process-safe placement


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
        self.idx2d = _put_global(idx2d, sh)
        self.rows2d = _put_global(rows2d, sh)
        self.lens2d = _put_global(np.maximum(lens2d, 0.0), sh)
        self.crev2d = _put_global(crev2d, sh)
        self.crow2d = _put_global(crow2d, sh)
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
            lambda x: _put_global(x, rep)
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

    def metrics(
        self,
        tower_apply: Callable,
        params,
        news_emb: jnp.ndarray,
        metrics_plan: "ShardedMetricsPlan",
        query_news_emb: Optional[jnp.ndarray] = None,
        normalize: bool = True,
        alpha=None,
    ) -> dict:
        """ZERO-FETCH sharded evaluation: each device runs the flat eval over
        its own rows, composes its impressions' final scores locally, computes
        its metric partial sums, and the only cross-device traffic of the
        entire eval is one 5-scalar psum. Semantics == the single-device
        ``FlatEvalPlan.metrics`` == host ``compose_final_scores(...).metrics``
        (tested on the virtual mesh)."""
        from ..eval.device_metrics import metric_sums

        table_for_history = (
            query_news_emb if query_news_emb is not None else news_emb
        )
        probe = _probe_out(tower_apply, params, table_for_history)
        out_dim = int(probe.shape[-1])
        mesh, axes = self.mesh, self._axes
        rep = NamedSharding(mesh, P())
        params, news_emb, table_for_history = jax.tree.map(
            lambda x: _put_global(x, rep)
            if not (
                isinstance(x, jax.Array)
                and frozenset(x.devices()) == frozenset(mesh.devices.flat)
            )
            else x,
            (params, news_emb, table_for_history),
        )
        if alpha is None:
            alpha = metrics_plan.alpha
        use_alpha = alpha is not None
        # Always pass a concrete scalar through shard_map (a None arg under an
        # explicit in_spec is fragile); the static use_alpha gates its use.
        alpha_arr = jnp.asarray(alpha if use_alpha else 0.0, jnp.float32)
        mp = metrics_plan
        h_max = mp.h_max

        key = (tower_apply, normalize, out_dim, "metrics", use_alpha)
        fn = self._fns.get(key)
        if fn is None:

            def device_body(
                params, news, query, idx2d, rows2d, lens, crev2d, crow2d,
                baseline, hdst, grids, alpha_a,
            ):
                scores = _flat_eval_body(
                    params, news, query,
                    idx2d[0], rows2d[0], lens[0], crev2d[0], crow2d[0],
                    tower_apply=tower_apply,
                    normalize=normalize,
                    out_dim=out_dim,
                )[:h_max]
                base = baseline[0]
                dst = hdst[0]
                if use_alpha:
                    # Gather clamps out-of-range dst; the matching scatter
                    # drops them, so clamped values never land.
                    scores = alpha_a * scores + (1.0 - alpha_a) * base[
                        jnp.minimum(dst, base.shape[0] - 1)
                    ]
                composed = base.at[dst].set(scores, mode="drop")
                local = tuple(
                    jax.tree.map(lambda x: x[0], g) for g in grids
                )
                sums = metric_sums(composed, local)
                return tuple(
                    jax.lax.psum(s, axis_name=axes) for s in sums
                )

            fn = jax.jit(
                shard_map(
                    device_body,
                    mesh=mesh,
                    in_specs=(
                        P(), P(), P(), P(axes), P(axes), P(axes), P(axes),
                        P(axes), P(axes), P(axes), P(axes), P(),
                    ),
                    out_specs=P(),
                    check_vma=False,
                )
            )
            self._fns[key] = fn
        sums = fn(
            params,
            news_emb,
            table_for_history,
            self.idx2d,
            self.rows2d,
            self.lens2d,
            self.crev2d,
            self.crow2d,
            mp.baseline,
            mp.hdst,
            mp.grids,
            alpha_arr,
        )
        from ..eval.device_metrics import DeviceMetricsPlan

        return DeviceMetricsPlan.finalize(jax.device_get(sums))


class ShardedMetricsPlan:
    """Per-(dataset, mesh) companion of ``ShardedFlatEvalPlan``: every
    impression is assigned to the device that owns its history row (the row
    partition of the eval plan), so each device can compose and score its own
    impressions with no communication. Impressions WITHOUT history (their
    composed scores are baseline-only) are distributed round-robin.

    ``imp_rows`` maps each impression to its with-history subset row (-1 =
    no history) — ``eval.ranker.history_candidate_slots``'s row space; for a
    ``with_history_view`` it is simply ``arange(num_rows)``.
    """

    def __init__(
        self,
        eval_plan: ShardedFlatEvalPlan,
        imp_lens: np.ndarray,
        labels_flat: np.ndarray,
        hist_slots: Optional[np.ndarray] = None,
        imp_rows: Optional[np.ndarray] = None,
        baseline_slots: Optional[np.ndarray] = None,
        alpha: Optional[float] = None,
        row_chunk: Optional[int] = None,
    ):
        from ..eval.device_metrics import (
            MetricGrid,
            _metric_buckets,
        )

        imp_lens = np.asarray(imp_lens, dtype=np.int64)
        assert imp_lens.min() >= 1
        labels_flat = np.asarray(labels_flat, dtype=np.float32)
        total_slots = int(imp_lens.sum())
        assert len(labels_flat) == total_slots
        num_imps = len(imp_lens)
        offsets_full = lengths_to_offsets(imp_lens)
        self.alpha = None if alpha is None else float(alpha)

        pos_per_imp = np.add.reduceat(labels_flat, offsets_full[:-1]).astype(
            np.float32
        )
        single = (pos_per_imp == 0) | (pos_per_imp == imp_lens)
        if single.any():
            raise ValueError(
                f"{int(single.sum())} impression(s) have a single label "
                "class; AUC is undefined (the reference fails identically "
                "inside sklearn.roc_auc_score)"
            )
        base = (
            np.zeros(total_slots, np.float32)
            if baseline_slots is None
            else np.asarray(baseline_slots, dtype=np.float32)
        )
        assert len(base) == total_slots

        if imp_rows is None:
            # Default: every impression has history, row i == impression i
            # (the trainers' with_history_view layout).
            imp_rows = np.arange(num_imps, dtype=np.int64)
        imp_rows = np.asarray(imp_rows, dtype=np.int64)
        bounds = eval_plan._bounds
        n_dev = len(bounds) - 1
        dev_of_imp = np.empty(num_imps, dtype=np.int64)
        owned = imp_rows >= 0
        dev_of_imp[owned] = (
            np.searchsorted(bounds, imp_rows[owned], side="right") - 1
        )
        dev_of_imp[owned] = np.minimum(dev_of_imp[owned], n_dev - 1)
        dev_of_imp[~owned] = np.arange(int((~owned).sum())) % n_dev

        if row_chunk is None:
            from ..utils.memory import estimate_metric_rows

            row_chunk = estimate_metric_rows(int(imp_lens.max()))
        buckets = np.asarray(_metric_buckets(int(imp_lens.max())))
        bucket_ids_all = np.searchsorted(buckets, imp_lens)

        # Per-device local slot spaces, padded to the max across devices.
        per_dev = []
        s_max = 1
        for d in range(n_dev):
            imps_d = np.flatnonzero(dev_of_imp == d)
            lens_d = imp_lens[imps_d]
            local_off = lengths_to_offsets(lens_d)
            s_d = int(local_off[-1])
            s_max = max(s_max, s_d)
            # local slot -> global slot (row-major within each impression)
            g = (
                np.repeat(offsets_full[imps_d] - local_off[:-1], lens_d)
                + np.arange(s_d)
            )
            per_dev.append((imps_d, lens_d, local_off, g))
        self.s_max = s_max

        baseline = np.zeros((n_dev, s_max), np.float32)
        for d, (_, _, _, g) in enumerate(per_dev):
            baseline[d, : len(g)] = base[g]

        # History-slot destinations: device d's local cosine scores (sorted by
        # owning row) land at local composed positions.
        order = eval_plan._order
        cb = eval_plan._cand_bounds
        h_max = max(1, int(eval_plan._cand_counts.max()))
        # scores[:h_max] must be a valid slice of the per-device score grid.
        grid_slots = int(np.prod(eval_plan.crev2d.shape[1:]))
        assert h_max <= grid_slots
        self.h_max = h_max
        hdst = np.full((n_dev, h_max), s_max, np.int32)  # fill -> dropped
        if hist_slots is not None:
            hist_slots = np.asarray(hist_slots, dtype=np.int64)
            for d, (imps_d, _, local_off, _) in enumerate(per_dev):
                j0, j1 = cb[d], cb[d + 1]
                gpos = hist_slots[order[j0:j1]]
                imp = np.searchsorted(offsets_full, gpos, side="right") - 1
                k = np.searchsorted(imps_d, imp)
                assert (imps_d[k] == imp).all(), (
                    "history slot owned by a different device than its row"
                )
                hdst[d, : j1 - j0] = (
                    local_off[k] + (gpos - offsets_full[imp])
                ).astype(np.int32)

        # Metric grids: GLOBAL buckets, per-bucket rows padded to the max
        # device count so every device runs the same program.
        grids = []
        for bid in np.unique(bucket_ids_all):
            L = int(buckets[bid])
            rows_count = max(
                int((bucket_ids_all[dev_of_imp == d] == bid).sum())
                for d in range(n_dev)
            ) if n_dev else 0
            rows_count = max(rows_count, 1)
            chunk = min(
                row_chunk, 1 << int(np.ceil(np.log2(rows_count)))
            )
            chunk = max(chunk, 1)
            n_pad = -(-rows_count // chunk) * chunk
            idx = np.full((n_dev, n_pad, L), s_max, np.int32)
            ygrid = np.zeros((n_dev, n_pad, L), np.float32)
            lens_g = np.zeros((n_dev, n_pad), np.float32)
            npos_g = np.zeros((n_dev, n_pad), np.float32)
            idcg5_g = np.zeros((n_dev, n_pad), np.float32)
            idcg10_g = np.zeros((n_dev, n_pad), np.float32)
            disc = 1.0 / np.log2(np.arange(1, L + 1, dtype=np.float64) + 1.0)
            cumdisc = np.concatenate([[0.0], np.cumsum(disc)])
            span = np.arange(L)
            for d, (imps_d, lens_d, local_off, _) in enumerate(per_dev):
                sel = np.flatnonzero(bucket_ids_all[imps_d] == bid)
                if not len(sel):
                    continue
                lens_b = lens_d[sel]
                mask = span[None, :] < lens_b[:, None]
                li = local_off[sel][:, None] + span[None, :]
                idx[d, : len(sel)] = np.where(mask, np.minimum(li, s_max - 1), s_max)
                gsel = offsets_full[imps_d[sel]][:, None] + span[None, :]
                ygrid[d, : len(sel)] = np.where(
                    mask, labels_flat[np.minimum(gsel, total_slots - 1)], 0.0
                )
                lens_g[d, : len(sel)] = lens_b
                npos_b = pos_per_imp[imps_d[sel]]
                npos_g[d, : len(sel)] = npos_b
                idcg5_g[d, : len(sel)] = cumdisc[
                    np.minimum(npos_b, 5).astype(np.int64)
                ]
                idcg10_g[d, : len(sel)] = cumdisc[
                    np.minimum(npos_b, 10).astype(np.int64)
                ]
            nc = n_pad // chunk
            grids.append(
                MetricGrid(
                    idx=idx.reshape(n_dev, nc, chunk, L),
                    labels=ygrid.reshape(n_dev, nc, chunk, L),
                    lens=lens_g.reshape(n_dev, nc, chunk),
                    n_pos=npos_g.reshape(n_dev, nc, chunk),
                    idcg5=idcg5_g.reshape(n_dev, nc, chunk),
                    idcg10=idcg10_g.reshape(n_dev, nc, chunk),
                )
            )
        # Upload sharded over the mesh (leading device axis), like the eval
        # plan's index grids.
        sh = NamedSharding(eval_plan.mesh, P(eval_plan._axes))
        self.baseline = _put_global(baseline, sh)
        self.hdst = _put_global(hdst, sh)
        self.grids = tuple(
            MetricGrid(*(_put_global(np.asarray(x), sh) for x in g))
            for g in grids
        )
