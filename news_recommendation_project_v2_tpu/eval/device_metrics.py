"""On-device MIND metrics: AUC / MRR / nDCG@5 / nDCG@10 computed inside the
jitted eval program, so a full evaluation fetches FOUR SCALARS instead of the
per-slot score vector (30MB at MIND-large scale — the dominant non-compute cost
of the flat eval on high-latency host links, see BASELINE.md roofline).

Semantics are EXACTLY the host pipeline's (``eval.metrics.score_batch`` ==
reference ``evaluation.py:13-98``), by the following argument: the reference
scores each impression with ``1/dense_rank(-score)`` (``data_utils.py:414-415``,
``evaluation.py:41-47``), and dense-ranking is a strictly monotonic,
tie-preserving transform of the raw scores within an impression — two
candidates compare the same under ``1/dense_rank`` as under the raw score, and
are tied iff their raw scores are equal. AUC, MRR and nDCG depend only on that
ordering (plus tie structure), so computing them directly from the composed
scores is mathematically identical to the host's rank-then-score pipeline
(``tests/test_device_metrics.py`` verifies the theorem and the equality).

Tie order matches the host path: descending score, ties broken by LARGER
original index first (host ``np.lexsort((-idx, -s))``; here one ascending
``lax.sort`` by (score, index) read backwards). AUC is tie-aware (average
ranks), computed in O(L log L) per row via sorted tie-group position averaging
— no [L, L] comparison matrices.

``DeviceMetricsPlan`` is the per-dataset companion of
``ops.scoring.FlatEvalPlan``: impression-length-bucketed index grids built and
uploaded once, plus the score-composition constants (baseline scores, history
slot positions, alpha) of ``eval.ranker.compose_final_scores``. Everything that
depends only on LABELS (positive counts, ideal DCG, the single-class validity
check the host raises on) is precomputed on host at build — the compiled
program sorts only live scores. Grid arrays are passed as jit ARGUMENTS, never
closure constants: XLA constant-folds captured arrays at compile time (a
65k-row grid sort folds for ~40s per compile). ``metric_sums`` is traceable, so
``FlatEvalPlan.metrics`` fuses tower pass + cosine + composition + metrics into
ONE compiled program per dataset.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..data.grouping import lengths_to_offsets

__all__ = [
    "row_metrics",
    "DeviceMetricsPlan",
    "metrics_from_flat_scores",
]


class MetricGrid(NamedTuple):
    """One impression-length bucket, row-chunked for the in-program scan.
    All leaves are passed through jit as arguments (see module docstring)."""

    idx: jnp.ndarray  # [n_chunks, chunk, L] int32 into scores_ext (fill = C)
    labels: jnp.ndarray  # [n_chunks, chunk, L] f32 binary
    lens: jnp.ndarray  # [n_chunks, chunk] f32 (0 = padded row)
    n_pos: jnp.ndarray  # [n_chunks, chunk] f32 positives per row
    idcg5: jnp.ndarray  # [n_chunks, chunk] f32 ideal DCG@5 (>=1 positive)
    idcg10: jnp.ndarray  # [n_chunks, chunk] f32 ideal DCG@10


def _row_metrics_core(
    scores: jnp.ndarray,  # [m, L] f32, padding = -inf
    labels: jnp.ndarray,  # [m, L] f32 binary, padding = 0
    lens: jnp.ndarray,  # [m] f32 real candidate counts (0 = padded row)
    n_pos: jnp.ndarray,  # [m] f32
    idcg5: jnp.ndarray,  # [m] f32
    idcg10: jnp.ndarray,  # [m] f32
) -> tuple[jnp.ndarray, ...]:
    """Per-impression (auc, mrr, ndcg5, ndcg10) given label-derived aux values
    (host-precomputed in the plan path). One sort; O(L log L) per row."""
    m, L = scores.shape
    idx = lax.broadcasted_iota(jnp.int32, (m, L), 1)
    # Ascending lexicographic (score, index); read BACKWARDS this is descending
    # score with larger-index-first ties == np.lexsort((-idx, -s)) (host order).
    # -inf padding sorts to the front ascending == the back descending.
    s_asc, _, y_asc = lax.sort((scores, idx, labels), dimension=-1, num_keys=2)
    pos = jnp.arange(1, L + 1, dtype=jnp.float32)

    # --- AUC: tie-mid average ranks via tie-group position averaging.
    # A tie group occupying ascending positions [a, b] has average rank
    # (a + b) / 2 == host's ((#strictly-less + 1) + #less-or-equal) / 2.
    neq = s_asc[:, 1:] != s_asc[:, :-1]
    edge = jnp.ones((m, 1), dtype=bool)
    group_first = jnp.concatenate([edge, neq], axis=1)
    group_last = jnp.concatenate([neq, edge], axis=1)
    start = lax.cummax(jnp.where(group_first, pos, 0.0), axis=1)
    end = jnp.flip(
        lax.cummin(jnp.flip(jnp.where(group_last, pos, jnp.inf), 1), axis=1), 1
    )
    avg_rank = 0.5 * (start + end)
    n_neg = lens - n_pos
    npad = L - lens
    # Padding occupies the lowest npad ascending ranks; real ranks shift down.
    pos_rank_sum = (y_asc * avg_rank).sum(axis=1) - n_pos * npad
    auc = (pos_rank_sum - n_pos * (n_pos + 1) * 0.5) / jnp.maximum(
        n_pos * n_neg, 1e-12
    )

    # --- MRR / nDCG from the descending order (flip of the ascending sort).
    y_desc = jnp.flip(y_asc, axis=1)
    mrr = (y_desc / pos).sum(axis=1) / jnp.maximum(n_pos, 1e-12)
    # gains = (2**y - 1) / log2(pos + 1); binary labels make 2**y - 1 == y.
    disc = 1.0 / jnp.log2(pos + 1.0)
    gains = y_desc * disc
    ndcg5 = gains[:, :5].sum(axis=1) / jnp.maximum(idcg5, 1e-12)
    ndcg10 = gains[:, :10].sum(axis=1) / jnp.maximum(idcg10, 1e-12)
    return auc, mrr, ndcg5, ndcg10


def _ideal_dcg(labels, k: int):
    """Ideal DCG@k for binary labels: the top-k slots of the descending-label
    ordering are min(n_pos, k) ones (works for numpy and jnp arrays)."""
    xp = jnp if isinstance(labels, jnp.ndarray) else np
    pos = xp.arange(1, labels.shape[-1] + 1, dtype=xp.float32)
    disc = 1.0 / xp.log2(pos + 1.0)
    n_pos = labels.sum(axis=-1, keepdims=True)
    take = (pos <= xp.minimum(n_pos, float(k))) & (pos <= k)
    return (take * disc).sum(axis=-1)


def row_metrics(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    lens: jnp.ndarray,
) -> tuple[jnp.ndarray, ...]:
    """Per-impression (auc, mrr, ndcg5, ndcg10, bad) — traceable, general form
    (aux values derived in-program). ``bad`` flags real rows with a single
    label class (the host path raises there, matching the reference's sklearn
    failure); their metric values are guarded garbage and must not be consumed.
    """
    n_pos = labels.sum(axis=1)
    auc, mrr, n5, n10 = _row_metrics_core(
        scores, labels, lens, n_pos, _ideal_dcg(labels, 5), _ideal_dcg(labels, 10)
    )
    bad = (lens > 0) & ((n_pos == 0) | (n_pos == lens))
    return auc, mrr, n5, n10, bad


def compose_scores(
    baseline: jnp.ndarray,
    hist_slots: Optional[jnp.ndarray],
    hist_scores: Optional[jnp.ndarray],
    alpha=None,
) -> jnp.ndarray:
    """Full-slot composed scores from history-slot cosine scores (traceable;
    == ``compose_final_scores`` score assembly in f32). ``alpha`` may be a
    traced scalar — a TRAINED blend weight changes every eval, and baking it
    would recompile."""
    full = baseline
    if hist_scores is not None:
        assert hist_slots is not None
        hist_scores = hist_scores.astype(full.dtype)
        if alpha is not None:
            blended = alpha * hist_scores + (1.0 - alpha) * full[hist_slots]
            full = full.at[hist_slots].set(blended)
        else:
            full = full.at[hist_slots].set(hist_scores)
    return full


def metric_sums(
    full_scores: jnp.ndarray, grids: tuple[MetricGrid, ...]
) -> tuple[jnp.ndarray, ...]:
    """(auc, mrr, ndcg5, ndcg10, count) sums over every impression —
    traceable over the [total_slots] composed score vector; ``grids`` must be
    jit ARGUMENTS of the enclosing program (module docstring)."""
    scores_ext = jnp.concatenate(
        [full_scores, jnp.full((1,), -jnp.inf, full_scores.dtype)]
    )

    def body(acc, g: MetricGrid):
        s = scores_ext[g.idx]
        auc, mrr, n5, n10 = _row_metrics_core(
            s, g.labels, g.lens, g.n_pos, g.idcg5, g.idcg10
        )
        valid = (g.lens > 0).astype(jnp.float32)
        sums = tuple(
            a + (v * valid).sum()
            for a, v in zip(acc[:4], (auc, mrr, n5, n10))
        )
        return sums + (acc[4] + valid.sum(),), None

    total = tuple(jnp.zeros((), jnp.float32) for _ in range(5))
    for grid in grids:
        total, _ = lax.scan(body, total, grid)
    return total


def _metric_buckets(max_len: int) -> tuple[int, ...]:
    """Power-of-two length buckets, final bucket = the exact dataset max:
    grids pad each impression to its bucket (≤2x slots) instead of the global
    max (up to ~16x at MIND length skew)."""
    out = []
    b = 8
    while b < max_len:
        out.append(b)
        b *= 2
    out.append(max_len)
    return tuple(out)


class DeviceMetricsPlan:
    """Per-dataset device-resident metric grids + score-composition constants.

    Mirrors ``eval.ranker.compose_final_scores`` (reference
    ``data_model_helper.py:242-371``): final slot scores start from
    ``baseline_scores`` expanded to slots (zeros when absent), history-row
    candidate slots are overwritten with (or alpha-blended against) the tower
    cosine scores, then every impression is scored with the MIND metric suite.
    The dense-rank step is elided — see module docstring for why that is exact.

    Single-class impressions raise HERE at build time (label-only condition;
    the host path raises identically when scoring, reference via sklearn).
    """

    def __init__(
        self,
        imp_lens: np.ndarray,
        labels_flat: np.ndarray,
        hist_slots: Optional[np.ndarray] = None,
        baseline_slots: Optional[np.ndarray] = None,
        alpha: Optional[float] = None,
        row_chunk: Optional[int] = None,
    ):
        imp_lens = np.asarray(imp_lens, dtype=np.int64)
        assert imp_lens.min() >= 1, "every impression needs >=1 candidate"
        labels_flat = np.asarray(labels_flat, dtype=np.float32)
        total_slots = int(imp_lens.sum())
        assert len(labels_flat) == total_slots
        self.num_impressions = len(imp_lens)
        self.alpha = None if alpha is None else float(alpha)
        self.hist_slots = (
            None if hist_slots is None else jnp.asarray(hist_slots, jnp.int32)
        )
        base = (
            np.zeros(total_slots, np.float32)
            if baseline_slots is None
            else np.asarray(baseline_slots, dtype=np.float32)
        )
        assert len(base) == total_slots
        self.baseline = jnp.asarray(base)

        offsets = lengths_to_offsets(imp_lens)
        # Label-derived aux, computed once on host (vectorized over slots).
        pos_per_imp = np.add.reduceat(labels_flat, offsets[:-1]).astype(
            np.float32
        )
        single = (pos_per_imp == 0) | (pos_per_imp == imp_lens)
        if single.any():
            raise ValueError(
                f"{int(single.sum())} impression(s) have a single label class; "
                "AUC is undefined (the reference fails identically inside "
                "sklearn.roc_auc_score)"
            )

        if row_chunk is None:
            from ..utils.memory import estimate_metric_rows

            row_chunk = estimate_metric_rows(int(imp_lens.max()))
        buckets = _metric_buckets(int(imp_lens.max()))
        bucket_arr = np.asarray(buckets)
        bucket_ids = np.searchsorted(bucket_arr, imp_lens)
        grids = []
        for bid in np.unique(bucket_ids):
            L = int(bucket_arr[bid])
            rows = np.flatnonzero(bucket_ids == bid)
            chunk = min(row_chunk, 1 << int(np.ceil(np.log2(len(rows)))))
            chunk = max(chunk, 1)
            n_pad = -(-len(rows) // chunk) * chunk
            pad = n_pad - len(rows)
            lens_b = imp_lens[rows]
            # Row-major slot grid: row i covers slots [offsets[r], +len_r),
            # grid fill = total_slots -> the appended -inf sentinel slot.
            span = np.arange(L)
            idx = offsets[rows][:, None] + span[None, :]
            mask = span[None, :] < lens_b[:, None]
            idx = np.where(mask, np.minimum(idx, total_slots - 1), total_slots)
            ygrid = np.where(mask, labels_flat[np.minimum(idx, total_slots - 1)], 0.0)
            npos_b = pos_per_imp[rows]
            # Ideal DCG@k for binary labels = sum of the first min(n_pos, k)
            # discounts (host sorts labels descending; counts are sufficient).
            disc = 1.0 / np.log2(np.arange(1, L + 1, dtype=np.float64) + 1.0)
            cumdisc = np.concatenate([[0.0], np.cumsum(disc)])
            idcg5 = cumdisc[np.minimum(npos_b, 5).astype(np.int64)]
            idcg10 = cumdisc[np.minimum(npos_b, 10).astype(np.int64)]

            def padded(a, fill=0):
                return np.concatenate(
                    [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
                )

            nc = n_pad // chunk
            grids.append(
                MetricGrid(
                    idx=jnp.asarray(
                        padded(idx.astype(np.int32), total_slots).reshape(
                            nc, chunk, L
                        )
                    ),
                    labels=jnp.asarray(
                        padded(ygrid.astype(np.float32)).reshape(nc, chunk, L)
                    ),
                    lens=jnp.asarray(
                        padded(lens_b.astype(np.float32)).reshape(nc, chunk)
                    ),
                    n_pos=jnp.asarray(
                        padded(npos_b.astype(np.float32)).reshape(nc, chunk)
                    ),
                    idcg5=jnp.asarray(
                        padded(idcg5.astype(np.float32)).reshape(nc, chunk)
                    ),
                    idcg10=jnp.asarray(
                        padded(idcg10.astype(np.float32)).reshape(nc, chunk)
                    ),
                )
            )
        self.grids = tuple(grids)

    def compose(
        self, hist_scores: Optional[jnp.ndarray], alpha=None
    ) -> jnp.ndarray:
        """Traceable composition with this plan's constants (see
        ``compose_scores``)."""
        return compose_scores(
            self.baseline,
            self.hist_slots,
            hist_scores,
            alpha=self.alpha if alpha is None else alpha,
        )

    @staticmethod
    def finalize(sums) -> dict[str, float]:
        """Metric means from the five fetched sums."""
        auc_s, mrr_s, n5_s, n10_s, count = (float(x) for x in sums)
        return {
            "auc": auc_s / count,
            "mrr": mrr_s / count,
            "ndcg5": n5_s / count,
            "ndcg10": n10_s / count,
            "num_samples": int(count),
        }

    def compute(self, full_scores) -> dict[str, float]:
        """One-shot: composed full-slot scores (host or device) -> metric dict."""
        sums = _jit_sums(jnp.asarray(full_scores), self.grids)
        return self.finalize(jax.device_get(sums))


@jax.jit
def _jit_sums(full_scores, grids):
    return metric_sums(full_scores, grids)


def metrics_from_flat_scores(
    full_scores: np.ndarray,
    imp_lens: np.ndarray,
    labels_flat: np.ndarray,
    row_chunk: Optional[int] = None,
) -> dict[str, float]:
    """Convenience: device-metric dict for an already-composed flat score
    vector (the device counterpart of ``eval.ranker.compose_final_scores``'s
    rank+score stage)."""
    plan = DeviceMetricsPlan(imp_lens, labels_flat, row_chunk=row_chunk)
    return plan.compute(full_scores)
