"""Request-level serving API: rank candidate news for a user's clicked history.

The reference has no serving surface at all — its eval path is offline batch
scoring. This module packages a trained tower + embedding table into a
low-latency ranker: id lookup on host, one jitted tower call per request (shapes
bucketed so the jit cache stays bounded), cosine scoring on device, ranked ids
back.

Pod serving (``mesh=``): the embedding tables row-shard over the mesh's
``model`` axis — the tables are the serving memory footprint (a 10M-news
1024d f32 corpus is 40GB, beyond one chip) — and ``rank_batch`` group batches
shard over ``data``; gathers ride XLA collectives like the training tier.
Single-device results are reproduced exactly (tested).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import HISTORY_BUCKETS, IMPRESSION_BUCKETS, bucket_for
from .data.grouping import dense_rank_by_segment


def _retrieve_impl(
    tower_apply, params, news_emb, query_emb, hist_idx, hist_mask, k, n_valid
):
    gathered = query_emb[hist_idx][None] * hist_mask[None, :, None].astype(
        query_emb.dtype
    )
    user = tower_apply(params, gathered, hist_mask[None])[0]
    eps = 1e-8
    nu = jnp.maximum(jnp.linalg.norm(user), eps)
    nc = jnp.maximum(jnp.linalg.norm(news_emb, axis=-1), eps)
    scores = (news_emb @ user) / (nu * nc)
    # Shard-padding rows (mesh tables pad to an equal-shard multiple) must
    # never win top-k: cosine can be negative, and a zero pad row scores 0.
    scores = jnp.where(
        jnp.arange(scores.shape[0]) < n_valid, scores, -jnp.inf
    )
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx  # explicit TUPLE (top_k yields a list in some versions)


@functools.partial(jax.jit, static_argnames=("tower_apply", "k"))
def _retrieve_one(tower_apply, params, news_emb, query_emb, hist_idx, hist_mask, k):
    return _retrieve_impl(
        tower_apply, params, news_emb, query_emb, hist_idx, hist_mask, k,
        news_emb.shape[0],
    )


def _rank_many_impl(
    tower_apply, params, news_emb, query_emb, hist_idx, hist_mask, cand_idx
):
    # hist_idx/hist_mask [B, L]; cand_idx [B, C] -> scores [B, C]
    gathered = query_emb[hist_idx] * hist_mask[..., None].astype(query_emb.dtype)
    user = tower_apply(params, gathered, hist_mask)
    cands = news_emb[cand_idx]
    eps = 1e-8
    nu = jnp.maximum(jnp.linalg.norm(user, axis=-1), eps)[:, None]
    nc = jnp.maximum(jnp.linalg.norm(cands, axis=-1), eps)
    return jnp.einsum("bcd,bd->bc", cands, user) / (nu * nc)


_rank_many = functools.partial(jax.jit, static_argnames=("tower_apply",))(
    _rank_many_impl
)


def _rank_one_impl(
    tower_apply, params, news_emb, query_emb, hist_idx, hist_mask, cand_idx
):
    gathered = query_emb[hist_idx][None] * hist_mask[None, :, None].astype(
        query_emb.dtype
    )
    user = tower_apply(params, gathered, hist_mask[None])[0]
    cands = news_emb[cand_idx]
    eps = 1e-8
    nu = jnp.maximum(jnp.linalg.norm(user), eps)
    nc = jnp.maximum(jnp.linalg.norm(cands, axis=-1), eps)
    return (cands @ user) / (nu * nc)


_rank_one = functools.partial(jax.jit, static_argnames=("tower_apply",))(
    _rank_one_impl
)


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
        mesh=None,  # jax.sharding.Mesh: row-shard the tables over `model`
    ):
        self.tower_apply = tower_apply
        self.params = params
        self.num_news = int(np.asarray(news_emb).shape[0])
        self.mesh = mesh
        if mesh is not None:
            # Pod serving: the embedding tables row-shard over the mesh's
            # `model` axis (tables are the serving memory footprint — a
            # 10M-news 1024d f32 corpus is 40GB, beyond one chip) and
            # request batches shard over `data`. Gathers against the sharded
            # tables ride XLA collectives, exactly like the training tier
            # (`shard_news_table`). Single-request paths run with replicated
            # grids (latency path); `rank_batch` shards its group batches
            # (throughput path). Multi-process serving is out of scope.
            assert jax.process_count() == 1, (
                "mesh serving is single-process (front-ends replicate per "
                "host; shard the mesh within one process)"
            )
            data_size = mesh.shape["data"]
            assert data_size & (data_size - 1) == 0, (
                "mesh serving needs a power-of-two data axis: rank_batch "
                "group batches run at power-of-two sizes, which must divide "
                "the data axis evenly"
            )
            from .parallel.sharding import shard_news_table
            same = query_news_emb is None
            self.news_emb = shard_news_table(mesh, jnp.asarray(news_emb))
            self.query_emb = (
                self.news_emb
                if same
                else shard_news_table(mesh, jnp.asarray(query_news_emb))
            )
            self._make_mesh_fns(mesh)
        else:
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
        self._cap_cache: dict[tuple[int, int], int] = {}

    def _make_mesh_fns(self, mesh) -> None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.sharding import batch_sharding, replicated, table_sharding

        rep = replicated(mesh)
        tab = table_sharding(mesh)
        dat = batch_sharding(mesh)
        dat2 = NamedSharding(mesh, P("data", None))
        ta = self.tower_apply
        self._rank_one_fn = jax.jit(
            lambda p, ne, qe, hi, hm, ci: _rank_one_impl(ta, p, ne, qe, hi, hm, ci),
            in_shardings=(rep, tab, tab, rep, rep, rep),
            out_shardings=rep,
        )
        self._rank_many_fn = jax.jit(
            lambda p, ne, qe, hi, hm, ci: _rank_many_impl(ta, p, ne, qe, hi, hm, ci),
            in_shardings=(rep, tab, tab, dat2, dat2, dat2),
            out_shardings=dat,
        )
        # Per-k jit cache: pjit rejects kwargs/statics alongside explicit
        # in_shardings (CLAUDE.md), so each requested k closes over its own
        # program (k values are few: the serving API's top-k sizes).
        self._retrieve_cache: dict[int, Callable] = {}
        n_valid = self.num_news

        def retrieve_for(k: int) -> Callable:
            if k not in self._retrieve_cache:
                self._retrieve_cache[k] = jax.jit(
                    lambda p, ne, qe, hi, hm: _retrieve_impl(
                        ta, p, ne, qe, hi, hm, k, n_valid
                    ),
                    in_shardings=(rep, tab, tab, rep, rep),
                    out_shardings=(rep, rep),
                )
            return self._retrieve_cache[k]

        self._retrieve_for = retrieve_for

    def _call_rank_one(self, hist_idx, hist_mask, cand_idx):
        if self.mesh is not None:
            return self._rank_one_fn(
                self.params, self.news_emb, self.query_emb,
                hist_idx, hist_mask, cand_idx,
            )
        return _rank_one(
            self.tower_apply, self.params, self.news_emb, self.query_emb,
            hist_idx, hist_mask, cand_idx,
        )

    def _call_rank_many(self, hist_idx, hist_mask, cand_idx):
        if self.mesh is not None:
            return self._rank_many_fn(
                self.params, self.news_emb, self.query_emb,
                hist_idx, hist_mask, cand_idx,
            )
        return _rank_many(
            self.tower_apply, self.params, self.news_emb, self.query_emb,
            hist_idx, hist_mask, cand_idx,
        )

    def _batch_cap(self, L: int, C: int) -> int:
        """Per-shape-group request-batch cap for ``rank_batch``: group sizes
        pad to powers of two up to this cap and larger groups chunk at it
        (bounds the batch-axis compile surface AND the pad waste). The cap
        comes from the analytic memory model, not a constant
        (``utils/memory.py`` — see the estimator's docstring)."""
        key = (L, C)
        if key not in self._cap_cache:
            from .utils.memory import estimate_serve_batch_cap

            self._cap_cache[key] = estimate_serve_batch_cap(
                int(self.news_emb.shape[1]), L, C
            )
        return self._cap_cache[key]

    def _chunk_sizes(self, n: int) -> list[int]:
        """Candidate-axis padded shapes for an ``n``-candidate request: one
        fixed bucket when it fits, else ceil(n / max_bucket) chunks of the
        LARGEST bucket. Every chunk shape is drawn from the finite
        ``candidate_buckets`` set, so ``warmup()`` covers every program any
        request can ever hit (MIND impressions reach ~600, config.py:33 —
        an open-ended padded axis would compile at request time, 30-500s on
        tunneled TPUs)."""
        max_c = self.candidate_buckets[-1]
        if n <= max_c:
            return [bucket_for(max(n, 1), self.candidate_buckets)]
        return [max_c] * (-(-n // max_c))

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
        hist_idx = np.zeros(L, np.int32)
        hist_idx[: len(hist)] = hist
        hist_mask = np.zeros(L, np.float32)
        hist_mask[: len(hist)] = 1.0
        hist_idx_j = jnp.asarray(hist_idx)
        hist_mask_j = jnp.asarray(hist_mask)
        # Chunked over fixed buckets: scores are independent per candidate
        # (the user vector is candidate-free), so a segment concat is exact.
        # Dispatch EVERY chunk before fetching any: jax dispatch is async, so
        # chunk k+1 computes while chunk k downloads — fetching inside the
        # loop would serialize one device round trip per chunk (the RTT, not
        # the compute, dominates tunneled links; CLAUDE.md).
        pending = []
        start = 0
        for C in self._chunk_sizes(len(known)):
            part = known[start : start + C]
            cand_idx = np.zeros(C, np.int32)
            cand_idx[: len(part)] = np.maximum(part, 0)
            pending.append(
                (
                    self._call_rank_one(
                        hist_idx_j, hist_mask_j, jnp.asarray(cand_idx)
                    ),
                    len(part),
                )
            )
            start += C
        scores = np.concatenate(
            [np.asarray(a)[:n] for a, n in pending]
        )[: len(known)]
        scores = np.where(np.asarray(known) >= 0, scores, -np.inf)
        order = np.argsort(-scores, kind="stable")
        return [(candidate_ids[i], float(scores[i])) for i in order]

    def warmup(
        self,
        history_buckets: Optional[Sequence[int]] = None,
        candidate_buckets: Optional[Sequence[int]] = None,
        retrieve_k: Optional[int] = 10,
        batch_sizes: Sequence[int] = (),
    ) -> int:
        """Pre-compile the jitted programs for the given shape buckets so the
        first real requests don't pay jit latency (remote TPU compiles run
        30-500s; results land in the persistent compile cache). Defaults to
        every (history, candidate) bucket pair plus the top-k retrieve per
        history bucket. Because oversized candidate lists chunk over the
        largest fixed bucket (``_chunk_sizes``), this covers EVERY program
        ``rank``/``retrieve`` can ever hit — a post-warmup request costs zero
        compiles regardless of candidate count (tested). ``rank_batch``
        additionally varies in the request-group batch dimension (powers of
        two up to the per-shape memory-model cap); pass the expected
        ``batch_sizes`` (each rounds to its pow2 program and duplicates are
        warmed once) to pre-compile those too — warming the full cross
        product is usually too many programs for a 30-500s-per-compile link,
        so the throughput path warms selectively.
        Returns the number of programs warmed."""
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
            for C in cb:
                # Distinct requested sizes can map to the same compiled
                # program (pow2 rounding + the cap); warm each program once.
                programs = sorted(
                    {
                        min(
                            1 << (max(int(B), 1) - 1).bit_length(),
                            self._batch_cap(L, C),
                        )
                        for B in batch_sizes
                    }
                )
                for B in programs:
                    self.rank_batch([([anchor] * L, [anchor] * C)] * B)
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
        kk = min(k, self.num_news)
        if self.mesh is not None:
            scores, idx = self._retrieve_for(kk)(
                self.params, self.news_emb, self.query_emb,
                jnp.asarray(hist_idx), jnp.asarray(hist_mask),
            )
        else:
            scores, idx = _retrieve_one(
                self.tower_apply,
                self.params,
                self.news_emb,
                self.query_emb,
                jnp.asarray(hist_idx),
                jnp.asarray(hist_mask),
                kk,
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
        # Oversized candidate lists expand into chunk sub-rows over the
        # LARGEST fixed bucket (see _chunk_sizes) — the candidate axis of
        # every shape group stays inside the finite bucket set, so the batch
        # path hits only warmup-coverable programs. The tower forward is
        # repeated per chunk of the same request (it is a few percent of the
        # cosine work at these shapes); scores are segment-merged after.
        prepared = []  # (req_i, chunk_start, hist, known_chunk, L, C)
        for req_i, (history_ids, candidate_ids) in enumerate(requests):
            hist = [self.row_of[h] for h in history_ids if h in self.row_of]
            if not hist:
                raise ValueError(f"request {req_i}: no known history ids")
            known = [self.row_of.get(c, -1) for c in candidate_ids]
            L = bucket_for(len(hist), self.buckets)
            start = 0
            for C in self._chunk_sizes(len(known)):
                prepared.append(
                    (req_i, start, hist[-L:], known[start : start + C], L, C)
                )
                start += C

        merged: list[dict[int, np.ndarray]] = [dict() for _ in requests]
        by_shape: dict[tuple[int, int], list] = {}
        for item in prepared:
            by_shape.setdefault((item[4], item[5]), []).append(item)

        # Pipelined dispatch (utils/inflight.py — the bounded window that
        # lifted token-store materialization 653 -> 4,740-7,870 news/s):
        # dispatch every shape-group's device call asynchronously and fetch
        # results as the window slides, instead of one synchronous
        # dispatch+fetch round trip PER group — on tunneled hosts the per-call
        # RTT, not the compute, dominates a multi-group batch. Inputs per call
        # are KB-scale int grids, so a deep window pins no meaningful memory.
        from .utils.inflight import InflightWindow

        def consume(item) -> None:
            dev, chunk = item
            scores = np.asarray(dev)
            for j, (req_i, start, _, known, _, _) in enumerate(chunk):
                s = np.where(
                    np.asarray(known) >= 0, scores[j, : len(known)], -np.inf
                )
                merged[req_i][start] = s

        window = InflightWindow(4, consume)
        for (L, C), group in by_shape.items():
            # The group's batch axis runs at power-of-two sizes capped at the
            # memory-model cap (larger groups chunk): without padding, every
            # distinct group size compiles a fresh XLA program — an unbounded
            # jit-cache/compile surface on the batch dim; without the cap,
            # one huge call would pad up to 2x its own size. Pad rows get one
            # live history token so the tower stays NaN-inert; their scores
            # are dropped below.
            cap = self._batch_cap(L, C)
            for g0 in range(0, len(group), cap):
                chunk = group[g0 : g0 + cap]
                B = 1 << (len(chunk) - 1).bit_length()
                if self.mesh is not None:
                    # pow2 B and pow2 data axis: max() keeps divisibility.
                    B = max(B, self.mesh.shape["data"])
                hist_idx = np.zeros((B, L), np.int32)
                hist_mask = np.zeros((B, L), np.float32)
                hist_mask[len(chunk):, 0] = 1.0
                cand_idx = np.zeros((B, C), np.int32)
                for j, (_, _, hist, known, _, _) in enumerate(chunk):
                    hist_idx[j, : len(hist)] = hist
                    hist_mask[j, : len(hist)] = 1.0
                    cand_idx[j, : len(known)] = np.maximum(known, 0)
                window.push(
                    (
                        self._call_rank_many(
                            jnp.asarray(hist_idx),
                            jnp.asarray(hist_mask),
                            jnp.asarray(cand_idx),
                        ),
                        chunk,
                    )
                )
        window.flush()

        results: list = [None] * len(requests)
        for req_i, (_, cand_ids) in enumerate(requests):
            parts = merged[req_i]
            s = np.concatenate([parts[k] for k in sorted(parts)])[: len(cand_ids)]
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
