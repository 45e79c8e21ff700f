"""Request-level serving API: rank candidate news for a user's clicked history.

The reference has no serving surface at all — its eval path is offline batch
scoring. This module packages a trained tower + embedding table into a
low-latency ranker: id lookup on host, one jitted tower call per request (shapes
bucketed so the jit cache stays bounded), cosine scoring on device, ranked ids
back.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import HISTORY_BUCKETS, IMPRESSION_BUCKETS, bucket_for, bucket_for_open
from .data.grouping import dense_rank_by_segment


@functools.partial(jax.jit, static_argnames=("tower_apply", "k"))
def _retrieve_one(tower_apply, params, news_emb, query_emb, hist_idx, hist_mask, k):
    gathered = query_emb[hist_idx][None] * hist_mask[None, :, None].astype(
        query_emb.dtype
    )
    user = tower_apply(params, gathered, hist_mask[None])[0]
    eps = 1e-8
    nu = jnp.maximum(jnp.linalg.norm(user), eps)
    nc = jnp.maximum(jnp.linalg.norm(news_emb, axis=-1), eps)
    scores = (news_emb @ user) / (nu * nc)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("tower_apply",))
def _rank_many(tower_apply, params, news_emb, query_emb, hist_idx, hist_mask, cand_idx):
    # hist_idx/hist_mask [B, L]; cand_idx [B, C] -> scores [B, C]
    gathered = query_emb[hist_idx] * hist_mask[..., None].astype(query_emb.dtype)
    user = tower_apply(params, gathered, hist_mask)
    cands = news_emb[cand_idx]
    eps = 1e-8
    nu = jnp.maximum(jnp.linalg.norm(user, axis=-1), eps)[:, None]
    nc = jnp.maximum(jnp.linalg.norm(cands, axis=-1), eps)
    return jnp.einsum("bcd,bd->bc", cands, user) / (nu * nc)


@functools.partial(jax.jit, static_argnames=("tower_apply",))
def _rank_one(tower_apply, params, news_emb, query_emb, hist_idx, hist_mask, cand_idx):
    gathered = query_emb[hist_idx][None] * hist_mask[None, :, None].astype(
        query_emb.dtype
    )
    user = tower_apply(params, gathered, hist_mask[None])[0]
    cands = news_emb[cand_idx]
    eps = 1e-8
    nu = jnp.maximum(jnp.linalg.norm(user), eps)
    nc = jnp.maximum(jnp.linalg.norm(cands, axis=-1), eps)
    return (cands @ user) / (nu * nc)


class Ranker:
    """Serve ranked candidates for one user request.

    ``news_ids`` aligns the embedding table rows with external news ids (the
    same id-keyed contract as the embedding dumps). Unknown history ids are
    dropped; unknown candidate ids score ``-inf`` and rank last.
    """

    def __init__(
        self,
        tower_apply: Callable,  # (params, [B,L,D], [B,L]) -> [B,D]
        params,
        news_emb,  # [N, D]
        news_ids: Sequence[str],
        query_news_emb=None,
        buckets: tuple[int, ...] = HISTORY_BUCKETS,
        candidate_buckets: tuple[int, ...] = IMPRESSION_BUCKETS,
    ):
        self.tower_apply = tower_apply
        self.params = params
        self.news_emb = jnp.asarray(news_emb)
        self.query_emb = (
            jnp.asarray(query_news_emb)
            if query_news_emb is not None
            else self.news_emb
        )
        self.row_of = {str(n): i for i, n in enumerate(news_ids)}
        self.id_of = [str(n) for n in news_ids]
        self.buckets = buckets
        self.candidate_buckets = candidate_buckets

    def rank(
        self, history_ids: Sequence[str], candidate_ids: Sequence[str]
    ) -> list[tuple[str, float]]:
        """Returns candidates sorted best-first with their cosine scores."""
        hist = [self.row_of[h] for h in history_ids if h in self.row_of]
        if not hist:
            raise ValueError("no known history ids; cold-start requests need the "
                             "classification baseline, not the tower ranker")
        known = [self.row_of.get(c, -1) for c in candidate_ids]
        L = bucket_for(len(hist), self.buckets)
        hist = hist[-L:]  # keep most recent clicks
        # Candidate axis is open-ended: dropping a candidate would be a
        # correctness bug (MIND impressions reach ~600, config.py:33).
        C = bucket_for_open(max(len(known), 1), self.candidate_buckets)
        hist_idx = np.zeros(L, np.int32)
        hist_idx[: len(hist)] = hist
        hist_mask = np.zeros(L, np.float32)
        hist_mask[: len(hist)] = 1.0
        cand_idx = np.zeros(C, np.int32)
        cand_idx[: len(known)] = np.maximum(known, 0)
        scores = np.asarray(
            _rank_one(
                self.tower_apply,
                self.params,
                self.news_emb,
                self.query_emb,
                jnp.asarray(hist_idx),
                jnp.asarray(hist_mask),
                jnp.asarray(cand_idx),
            )
        )[: len(known)]
        scores = np.where(np.asarray(known) >= 0, scores, -np.inf)
        order = np.argsort(-scores, kind="stable")
        return [(candidate_ids[i], float(scores[i])) for i in order]

    def warmup(
        self,
        history_buckets: Optional[Sequence[int]] = None,
        candidate_buckets: Optional[Sequence[int]] = None,
        retrieve_k: Optional[int] = 10,
    ) -> int:
        """Pre-compile the jitted programs for the given shape buckets so the
        first real requests don't pay jit latency (remote TPU compiles run
        30-500s; results land in the persistent compile cache). Defaults to
        every (history, candidate) bucket pair plus the top-k retrieve per
        history bucket. Returns the number of programs warmed."""
        hb = list(history_buckets or self.buckets)
        cb = list(candidate_buckets or self.candidate_buckets)
        anchor = self.id_of[0]
        n = 0
        for L in hb:
            self.rank([anchor] * L, [anchor] * cb[0])
            n += 1
            for C in cb[1:]:
                self.rank([anchor] * L, [anchor] * C)
                n += 1
            if retrieve_k:
                self.retrieve([anchor] * L, k=retrieve_k)
                n += 1
        return n

    def retrieve(
        self, history_ids: Sequence[str], k: int = 10
    ) -> list[tuple[str, float]]:
        """Exhaustive top-k retrieval over the ENTIRE news table (ANN-free
        full-corpus scoring — the north star's serving-side counterpart of the
        offline impression scorer): one matmul over [N, D] + on-device top_k."""
        hist = [self.row_of[h] for h in history_ids if h in self.row_of]
        if not hist:
            raise ValueError("no known history ids; cold-start requests need the "
                             "classification baseline, not the tower ranker")
        L = bucket_for(len(hist), self.buckets)
        hist = hist[-L:]
        hist_idx = np.zeros(L, np.int32)
        hist_idx[: len(hist)] = hist
        hist_mask = np.zeros(L, np.float32)
        hist_mask[: len(hist)] = 1.0
        scores, idx = _retrieve_one(
            self.tower_apply,
            self.params,
            self.news_emb,
            self.query_emb,
            jnp.asarray(hist_idx),
            jnp.asarray(hist_mask),
            min(k, self.news_emb.shape[0]),
        )
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        return [(self.id_of[i], float(s)) for i, s in zip(idx, scores)]

    def rank_batch(
        self,
        requests: Sequence[tuple[Sequence[str], Sequence[str]]],
    ) -> list[list[tuple[str, float]]]:
        """Throughput path: many (history_ids, candidate_ids) requests scored in
        one device call per (history-bucket, candidate-bucket) shape group."""
        prepared = []
        for req_i, (history_ids, candidate_ids) in enumerate(requests):
            hist = [self.row_of[h] for h in history_ids if h in self.row_of]
            if not hist:
                raise ValueError(f"request {req_i}: no known history ids")
            known = [self.row_of.get(c, -1) for c in candidate_ids]
            L = bucket_for(len(hist), self.buckets)
            C = bucket_for_open(max(len(known), 1), self.candidate_buckets)
            prepared.append((req_i, hist[-L:], known, L, C))

        results: list = [None] * len(requests)
        by_shape: dict[tuple[int, int], list] = {}
        for item in prepared:
            by_shape.setdefault((item[3], item[4]), []).append(item)
        for (L, C), group in by_shape.items():
            B = len(group)
            hist_idx = np.zeros((B, L), np.int32)
            hist_mask = np.zeros((B, L), np.float32)
            cand_idx = np.zeros((B, C), np.int32)
            for j, (_, hist, known, _, _) in enumerate(group):
                hist_idx[j, : len(hist)] = hist
                hist_mask[j, : len(hist)] = 1.0
                cand_idx[j, : len(known)] = np.maximum(known, 0)
            scores = np.asarray(
                _rank_many(
                    self.tower_apply,
                    self.params,
                    self.news_emb,
                    self.query_emb,
                    jnp.asarray(hist_idx),
                    jnp.asarray(hist_mask),
                    jnp.asarray(cand_idx),
                )
            )
            for j, (req_i, _, known, _, _) in enumerate(group):
                cand_ids = requests[req_i][1]
                s = np.where(
                    np.asarray(known) >= 0, scores[j, : len(known)], -np.inf
                )
                order = np.argsort(-s, kind="stable")
                results[req_i] = [(cand_ids[i], float(s[i])) for i in order]
        return results

    def rank_dense(self, history_ids, candidate_ids) -> np.ndarray:
        """Dense ranks (1 = best) in candidate order — the offline pipeline's
        rank convention."""
        ranked = self.rank(history_ids, candidate_ids)
        score_of = {c: s for c, s in ranked}
        scores = np.array([score_of[c] for c in candidate_ids])
        return dense_rank_by_segment(scores, np.array([len(candidate_ids)]))
