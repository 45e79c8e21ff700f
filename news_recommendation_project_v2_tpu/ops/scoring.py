"""On-device impression scoring: user-tower inference over bucketed histories and
blocked cosine scoring of every candidate slot.

This replaces the reference's most TPU-hostile pattern — a per-impression Python
loop issuing one tiny ``F.cosine_similarity`` device call per impression
(``/root/reference/src/news_rec_utils/data_model_helper.py:197-239``) — with a
device-resident pipeline tuned for high-latency links between host and device:

1. One jitted call **per history bucket** (not per batch): the call receives the
   flat history index array plus per-row (start, length) and builds the padded
   gather + mask on device, then ``lax.scan``s the tower over fixed-size batches.
   Host->device traffic is two int32 vectors per bucket; the jit cache holds one
   program per bucket.
2. User vectors are scattered into a device-resident [rows, D] buffer (donated
   across bucket calls) and **never leave the device**; the final cosine pass
   reads them directly and only the flat candidate scores are fetched.
3. An analytic ``tokens_per_batch`` budget bounds activation memory — the
   TPU-native replacement for the reference's OOM-bisection batch autotuner
   (``batch_size_finder.py:103-149``).

The reference instead pads each batch to its own max on host, gathers
``news_embeddings[indices]`` on host, and round-trips every batch
(``data_utils.py:784-791``, ``modeling_utils.py:402-417``).

Cosine semantics match ``torch.nn.functional.cosine_similarity`` (eps 1e-8 clamp
on each norm).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import HISTORY_BUCKETS
from ..data.grouping import lengths_to_offsets, truncate_flat_end_aligned


def _cosine_impl(
    user_vecs: jnp.ndarray,  # [R, D] user vector per impression row
    news_emb: jnp.ndarray,  # [N, D] news embedding table
    cand_rev: jnp.ndarray,  # [C] candidate news index per flat slot
    cand_row: jnp.ndarray,  # [C] owning impression row per flat slot
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Flat cosine scores for every candidate slot (blocked gather + dot)."""
    u = user_vecs[cand_row]
    c = news_emb[cand_rev]
    dot = (u * c).sum(-1)
    nu = jnp.maximum(jnp.linalg.norm(u, axis=-1), eps)
    nc = jnp.maximum(jnp.linalg.norm(c, axis=-1), eps)
    return dot / (nu * nc)


cosine_scores_flat = functools.partial(jax.jit, static_argnames=("eps",))(
    _cosine_impl
)


def _on_mesh(mesh: Mesh, tree):
    """Replicate every leaf that is not already laid out on ``mesh``'s devices
    (jit with explicit in_shardings does NOT reshard committed arrays, it
    raises). Leaves already on the mesh — replicated or model-sharded — pass
    through untouched."""
    rep = NamedSharding(mesh, P())
    mesh_devices = frozenset(mesh.devices.flat)
    def place(x):
        if isinstance(x, jax.Array) and frozenset(x.devices()) == mesh_devices:
            return x
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


@functools.lru_cache(maxsize=None)
def _cosine_sharded(mesh: Mesh):
    """Data-parallel cosine pass: candidate slots sharded over ``data``; user
    vectors / table keep their existing mesh layout (None = unconstrained)."""
    dat = NamedSharding(mesh, P("data"))
    return jax.jit(
        _cosine_impl,
        static_argnames=("eps",),
        in_shardings=(None, None, dat, dat),
        out_shardings=dat,
    )


def cosine_scores_chunked(
    user_vecs: jnp.ndarray,
    news_emb: jnp.ndarray,
    cand_rev: np.ndarray,
    cand_row: np.ndarray,
    chunk: int = 1 << 19,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """``cosine_scores_flat`` over fixed-shape slot chunks: the gathered [C, D]
    matrices for MIND-large-scale slot counts (7M+ slots) exceed HBM if
    materialized whole; chunking bounds the transient to ~4GB and keeps one
    compiled program regardless of C. With ``mesh``, slots shard over the
    ``data`` axis."""
    cosine_fn = cosine_scores_flat if mesh is None else _cosine_sharded(mesh)
    total = len(cand_rev)
    if mesh is not None:
        user_vecs, news_emb = _on_mesh(mesh, (user_vecs, news_emb))
        # Candidate slots must arrive uncommitted (host arrays) so the jit can
        # place them per in_shardings; sharded axis sizes must divide evenly.
        ndata = mesh.shape["data"]
        pad = (-total) % ndata
        cand_rev = np.pad(np.asarray(cand_rev), (0, pad))
        cand_row = np.pad(np.asarray(cand_row), (0, pad))
        chunk = -(-chunk // ndata) * ndata
    if len(cand_rev) <= chunk:
        if mesh is not None:  # uncommitted host arrays; jit places them
            return np.asarray(
                cosine_fn(user_vecs, news_emb, cand_rev, cand_row)
            )[:total]
        return np.asarray(
            cosine_fn(
                user_vecs, news_emb, jnp.asarray(cand_rev), jnp.asarray(cand_row)
            )
        )
    def sliced(arr, a, b, pad):
        part = arr[a:b]  # stays on device for jax arrays
        if pad:
            if isinstance(part, jax.Array):
                part = jnp.concatenate([part, jnp.zeros((pad,), part.dtype)])
            else:
                part = np.pad(np.asarray(part), (0, pad))
        return part if mesh is not None else jnp.asarray(part)

    outs = []
    for a in range(0, total, chunk):
        b = min(a + chunk, total)
        pad = chunk - (b - a)
        outs.append(
            cosine_fn(
                user_vecs,
                news_emb,
                sliced(cand_rev, a, b, pad),
                sliced(cand_row, a, b, pad),
            )
        )
    fetched = jax.device_get(outs)
    return np.concatenate(fetched)[:total]


def _bucket_update_impl(
    user_vecs,  # [R, D] accumulator (donated)
    params,
    news_emb,  # [N, D]
    hist_rev_flat,  # [H] flat history indices (device-resident)
    starts,  # [n_pad] per-row start offset into hist_rev_flat
    lens,  # [n_pad] per-row (bucket-capped) length
    rows,  # [n_pad] destination row ids (R = drop)
    tower_apply: Callable,
    batch: int,
    bucket_len: int,
):
    """Run the tower over one bucket's rows (scanned in fixed batches) and
    scatter the resulting user vectors into the accumulator."""
    n_pad = starts.shape[0]
    num_batches = n_pad // batch
    pos = jax.lax.broadcasted_iota(jnp.int32, (batch, bucket_len), 1)
    limit = hist_rev_flat.shape[0] - 1

    def body(_, start_len):
        s, l = start_len
        gather_pos = jnp.minimum(s[:, None] + pos, limit)
        idx = hist_rev_flat[gather_pos]
        mask = (pos < l[:, None]).astype(news_emb.dtype)
        gathered = news_emb[idx] * mask[..., None]
        return None, tower_apply(params, gathered, mask)

    _, outs = jax.lax.scan(
        body,
        None,
        (
            starts.reshape(num_batches, batch),
            lens.reshape(num_batches, batch),
        ),
    )
    outs = outs.reshape(n_pad, -1).astype(user_vecs.dtype)
    return user_vecs.at[rows].set(outs, mode="drop")


_bucket_update = functools.partial(
    jax.jit,
    static_argnames=("tower_apply", "batch", "bucket_len"),
    donate_argnums=(0,),
)(_bucket_update_impl)


@functools.lru_cache(maxsize=None)
def _bucket_update_sharded(mesh: Mesh):
    """Mesh variant of ``_bucket_update``: the per-bucket row arrays shard over
    ``data`` (GSPMD propagates the layout through the scanned tower batches and
    combines the scatter); accumulator replicated, params/tables keep their
    existing mesh layout (callers run them through ``_on_mesh``)."""
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    return jax.jit(
        _bucket_update_impl,
        static_argnames=("tower_apply", "batch", "bucket_len"),
        donate_argnums=(0,),
        in_shardings=(rep, None, None, None, dat, dat, dat),
        out_shardings=rep,
    )


def _probe_out(tower_apply: Callable, params, table: jnp.ndarray):
    """Tower output shape/dtype via jax.eval_shape (no compute, no transfer)."""
    return jax.eval_shape(
        tower_apply,
        params,
        jax.ShapeDtypeStruct((1, 8, table.shape[1]), table.dtype),
        jax.ShapeDtypeStruct((1, 8), table.dtype),
    )


def _bucket_plan(
    hist_lens: np.ndarray,
    buckets: tuple[int, ...],
    batch_size: int,
    tokens_per_batch: Optional[int],
    align: int = 8,
):
    """Host-side plan: per bucket, the (rows, starts, lens, batch) arrays padded
    to a whole number of batches. ``align`` forces batch sizes to a multiple
    (mesh callers pass lcm(8, data-axis) so sharded axes divide evenly)."""
    offsets = lengths_to_offsets(hist_lens)
    bucket_arr = np.asarray(buckets)
    bucket_ids = np.searchsorted(bucket_arr, np.minimum(hist_lens, bucket_arr[-1]))
    plan = []
    for bid in np.unique(bucket_ids):
        bucket_len = int(bucket_arr[bid])
        rows = np.flatnonzero(bucket_ids == bid).astype(np.int32)
        if tokens_per_batch is not None:
            batch = max(8, min(batch_size, tokens_per_batch // bucket_len))
        else:
            batch = batch_size
        batch = max(align, (batch // align) * align)
        n_pad = -(-len(rows) // batch) * batch
        pad = n_pad - len(rows)
        lens_capped = np.minimum(hist_lens[rows], bucket_len).astype(np.int64)
        # End-aligned: rows longer than the bucket keep their most RECENT
        # clicks (MIND histories are chronological; the reference never
        # truncates, so dropping the oldest is the faithful approximation).
        starts = np.pad(
            (offsets[rows + 1] - lens_capped).astype(np.int32), (0, pad)
        )
        lens = np.pad(lens_capped.astype(np.int32), (0, pad))
        rows_padded = np.pad(
            rows, (0, pad), constant_values=len(hist_lens)  # OOB -> dropped
        )
        plan.append((bucket_len, batch, starts, lens, rows_padded))
    return plan


def user_vectors_device(
    tower_apply: Callable,
    params,
    news_emb: jnp.ndarray,
    hist_rev: np.ndarray,
    hist_lens: np.ndarray,
    out_dim: int,
    batch_size: int = 512,
    buckets: tuple[int, ...] = HISTORY_BUCKETS,
    tokens_per_batch: Optional[int] = None,
    out_dtype=jnp.float32,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Device-resident [num_rows, out_dim] user-vector matrix (see module doc).

    Each device call covers a FIXED-shape chunk of ``batch * scan_steps`` rows
    (last chunk padded), so compiled programs depend only on (bucket, batch) —
    never on the dataset's row count. The [num_rows, D] accumulator shape does
    vary per dataset, but scatter-into-donated-buffer recompiles are cheap
    relative to the tower program.
    """
    num_rows = len(hist_lens)
    user_vecs = jnp.zeros((num_rows, out_dim), dtype=out_dtype)
    if mesh is None:
        hist_rev_dev = jnp.asarray(hist_rev)
        update_fn = _bucket_update
        wrap = jnp.asarray
    else:
        params, news_emb, hist_rev_dev, user_vecs = _on_mesh(
            mesh, (params, news_emb, np.asarray(hist_rev), user_vecs)
        )
        update_fn = _bucket_update_sharded(mesh)
        wrap = lambda x: x  # uncommitted host arrays; jit places per sharding
    # Fixed chunk of batch*8 rows per call: program shapes depend only on
    # (bucket, batch) — never on the dataset's row count — keeping ONE compiled
    # program per bucket (remote compiles are the expensive resource here)
    # while chunks stay large enough to amortize dispatch.
    scan_steps = 8
    align = 8 if mesh is None else int(np.lcm(8, mesh.shape["data"]))
    for bucket_len, batch, starts, lens, rows in _bucket_plan(
        hist_lens, buckets, batch_size, tokens_per_batch, align=align
    ):
        chunk = batch * scan_steps
        n = len(starts)
        for a in range(0, n, chunk):
            b = min(a + chunk, n)
            pad = chunk - (b - a)
            # Statics passed positionally: pjit rejects kwargs when
            # in_shardings is set (the mesh variant).
            user_vecs = update_fn(
                user_vecs,
                params,
                news_emb,
                hist_rev_dev,
                wrap(np.pad(starts[a:b], (0, pad))),
                wrap(np.pad(lens[a:b], (0, pad))),
                wrap(np.pad(rows[a:b], (0, pad), constant_values=num_rows)),
                tower_apply,
                batch,
                bucket_len,
            )
    return user_vecs


def user_vectors_bucketed(
    tower_apply: Callable,
    params,
    news_emb: jnp.ndarray,
    hist_rev: np.ndarray,
    hist_lens: np.ndarray,
    batch_size: int = 512,
    buckets: tuple[int, ...] = HISTORY_BUCKETS,
    tokens_per_batch: Optional[int] = None,
) -> np.ndarray:
    """Host-array convenience wrapper around ``user_vectors_device``."""
    probe = _probe_out(tower_apply, params, news_emb)
    vecs = user_vectors_device(
        tower_apply,
        params,
        news_emb,
        hist_rev,
        hist_lens,
        out_dim=int(probe.shape[-1]),
        batch_size=batch_size,
        buckets=buckets,
        tokens_per_batch=tokens_per_batch,
        out_dtype=probe.dtype,
    )
    return np.asarray(vecs)


# ----------------------------------------------------------------------------
# Flat (zero-padding) scoring path for token-local towers.
#
# The latent tower's cross-attention attends each history token to the 64
# SHARED latents only (softmax over latents, per token); LayerNorms, the GEGLU
# feed-forward, and the residuals are all per-token, and the only cross-token
# op is the final masked mean-pool. The whole tower is therefore a per-token
# function followed by a segment reduction — so instead of padding ragged
# histories into [batch, bucket] blocks (2-2.5x padded tokens at MIND history
# statistics), we run it over the FLAT token stream with ZERO padding and
# pool with a sorted segment-add. One compiled program regardless of history
# length distribution; compute cost = real tokens, not padded tokens.
# ----------------------------------------------------------------------------


DEFAULT_FLAT_CHUNK = 64 * 1024


@functools.lru_cache(maxsize=None)
def _auto_flat_chunk(out_dim: int) -> int:
    """Flat chunk size from the analytic memory model when the caller doesn't
    supply one (CLAUDE.md: chunk sizes come from utils/memory.py, not
    constants). The envelope assumes the flagship latent geometry scaled to
    the probed output dim — the only flat-capable tower family."""
    from ..config import TowerConfig
    from ..utils.memory import estimate_flat_chunk

    cfg = TowerConfig(
        kind="latent",
        reduced_dim=out_dim,
        num_latents=min(64, out_dim),
        latent_dim_head=max(8, out_dim // 2),
    )
    return estimate_flat_chunk(cfg)


def _flat_chunk_update_impl(user_vecs, params, table, idx, rows, tower_apply):
    """Per-token tower over one flat token chunk + sorted segment-add of the
    hidden states into the per-row accumulator. ``rows`` is non-decreasing
    (tokens are stored row-major); out-of-range rows (padding) are dropped."""
    tokens = table[idx]  # [C, D] gather
    h = tower_apply(params, tokens[None], None)[0]  # [C, D] per-token hidden
    return user_vecs.at[rows].add(
        h.astype(user_vecs.dtype), mode="drop", indices_are_sorted=True
    )


_flat_chunk_update = functools.partial(
    jax.jit, static_argnames=("tower_apply",), donate_argnums=(0,)
)(_flat_chunk_update_impl)


@functools.lru_cache(maxsize=None)
def _flat_chunk_update_sharded(mesh: Mesh):
    """Mesh variant of ``_flat_chunk_update``: token chunks shard over ``data``
    (each device runs the per-token tower on its slice), the accumulator stays
    replicated — XLA inserts the cross-device combine for the segment-add.
    Rows straddling a shard boundary are handled by the add semantics. Params/
    table keep their existing mesh layout (callers use ``_on_mesh``)."""
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    return jax.jit(
        _flat_chunk_update_impl,
        static_argnames=("tower_apply",),
        donate_argnums=(0,),
        in_shardings=(rep, None, None, dat, dat),
        out_shardings=rep,
    )


@functools.partial(jax.jit, static_argnames=("normalize",))
def _flat_finalize(user_vecs, lens, normalize: bool):
    """Mean-pool denominators + optional L2 norm — exactly the tower's masked
    pooling epilogue (``models/latent_attention.py:127-139``), applied once to
    the accumulated sums instead of per padded batch."""
    denom = jnp.maximum(lens.astype(user_vecs.dtype), 1.0)[:, None]
    pooled = user_vecs / denom
    if normalize:
        norm = jnp.sqrt((pooled * pooled).sum(-1, keepdims=True) + 1e-12)
        pooled = pooled / norm
    return pooled


def user_vectors_flat(
    tower_apply: Callable,
    params,
    news_emb: jnp.ndarray,
    hist_rev: np.ndarray,
    hist_lens: np.ndarray,
    out_dim: int,
    chunk_tokens: int = DEFAULT_FLAT_CHUNK,
    max_len: Optional[int] = None,
    normalize: bool = True,
    out_dtype=jnp.float32,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Device-resident [num_rows, out_dim] user vectors via the flat path.

    ``tower_apply(params, tokens[None], None)`` must return the PER-TOKEN
    hidden states (mask=None skips the pool — the flax towers do this), and the
    tower must be token-local (``models.supports_flat_scoring``). ``normalize``
    must match the tower's ``output_normalize``. ``max_len=None`` uses every
    history token (the reference never truncates; with no padding cost there is
    no reason to); an int keeps the most RECENT ``max_len`` clicks per row for
    parity with the bucketed path's cap.
    """
    hist_lens = np.asarray(hist_lens)
    idx = np.ascontiguousarray(np.asarray(hist_rev, dtype=np.int32))
    num_rows = len(hist_lens)
    if max_len is not None:
        idx, lens_used = truncate_flat_end_aligned(idx, hist_lens, max_len)
    else:
        lens_used = hist_lens
    rows = np.repeat(np.arange(num_rows, dtype=np.int32), lens_used)
    if mesh is not None:  # sharded axis sizes must divide evenly
        ndata = mesh.shape["data"]
        chunk_tokens = -(-chunk_tokens // ndata) * ndata
    total = len(idx)
    n_chunks = max(1, -(-total // chunk_tokens))
    pad = n_chunks * chunk_tokens - total
    idx = np.pad(idx, (0, pad))
    rows = np.pad(rows, (0, pad), constant_values=num_rows)  # OOB -> dropped
    user_vecs = jnp.zeros((num_rows, out_dim), dtype=out_dtype)
    if mesh is None:
        update_fn = _flat_chunk_update
        wrap = jnp.asarray
    else:
        params, news_emb, user_vecs = _on_mesh(
            mesh, (params, news_emb, user_vecs)
        )
        update_fn = _flat_chunk_update_sharded(mesh)
        wrap = lambda x: x  # uncommitted host arrays; jit places per sharding
    for a in range(0, len(idx), chunk_tokens):
        # tower_apply positional: pjit rejects kwargs under in_shardings.
        user_vecs = update_fn(
            user_vecs,
            params,
            news_emb,
            wrap(idx[a : a + chunk_tokens]),
            wrap(rows[a : a + chunk_tokens]),
            tower_apply,
        )
    lens_f = jnp.asarray(np.asarray(lens_used, dtype=np.float32))
    return _flat_finalize(user_vecs, lens_f, normalize=normalize)


def _flat_eval_body(
    params,
    news_emb,  # [N, D] candidate table (f32)
    query_table,  # [N, D] table fed to the tower (may be the same array)
    idx2d,  # [n_chunks, chunk] flat history news indices
    rows2d,  # [n_chunks, chunk] owning impression row (num_rows = pad/drop)
    lens,  # [num_rows] history lengths (f32)
    cand_rev2d,  # [n_cchunks, cchunk] candidate news indices
    cand_row2d,  # [n_cchunks, cchunk] owning impression row
    tower_apply: Callable,
    normalize: bool,
    out_dim: int,
):
    """The ENTIRE flat eval — per-token tower over every history-token chunk,
    pooling epilogue, and the cosine pass — as one traced computation: a single
    host->device dispatch and a single score fetch per eval. On
    high-dispatch-latency links (tunneled TPUs) this removes ~1s of per-call
    overhead vs the chunk-per-dispatch path; user vectors never leave HBM.
    (Also the per-device body of the zero-collective sharded flat eval,
    ``parallel.flat_eval``.)"""
    num_rows = lens.shape[0]

    def chunk_body(acc, ir):
        i, r = ir
        h = tower_apply(params, query_table[i][None], None)[0]
        return (
            acc.at[r].add(h.astype(acc.dtype), mode="drop", indices_are_sorted=True),
            None,
        )

    acc = jnp.zeros((num_rows, out_dim), dtype=jnp.float32)
    acc, _ = jax.lax.scan(chunk_body, acc, (idx2d, rows2d))
    denom = jnp.maximum(lens, 1.0)[:, None]
    user = acc / denom
    if normalize:
        user = user / jnp.sqrt((user * user).sum(-1, keepdims=True) + 1e-12)

    def cos_body(_, cc):
        cr, cw = cc
        u = user[cw]
        c = news_emb[cr]
        nu = jnp.maximum(jnp.linalg.norm(u, axis=-1), 1e-8)
        nc = jnp.maximum(jnp.linalg.norm(c, axis=-1), 1e-8)
        return None, (u * c).sum(-1) / (nu * nc)

    _, scores = jax.lax.scan(cos_body, None, (cand_rev2d, cand_row2d))
    return scores.reshape(-1)


_flat_single_program = functools.partial(
    jax.jit,
    static_argnames=("tower_apply", "normalize", "out_dim"),
)(_flat_eval_body)


def _pad_to_grid(arr: np.ndarray, chunk: int, fill) -> np.ndarray:
    """Pad a flat host array to a whole number of ``chunk``-sized rows and
    reshape to [n_chunks, chunk]."""
    n_chunks = max(1, -(-len(arr) // chunk))
    padded = np.full(n_chunks * chunk, fill, dtype=arr.dtype)
    padded[: len(arr)] = arr
    return padded.reshape(n_chunks, chunk)


class FlatEvalPlan:
    """Pre-padded, device-resident index arrays for repeated single-dispatch
    flat evals of ONE dataset (training-epoch evals, benchmarks): the flat
    token/slot index grids are built and uploaded once, so each ``score`` call
    is exactly one dispatch plus one score fetch. The compiled program's shapes
    depend on the dataset's chunk counts — reuse across epochs hits the same
    program."""

    def __init__(
        self,
        hist_rev: np.ndarray,
        hist_lens: np.ndarray,
        cand_rev: np.ndarray,
        cand_row: np.ndarray,
        chunk_tokens: int = DEFAULT_FLAT_CHUNK,
        cand_chunk: int = 1 << 18,
        max_len: Optional[int] = None,
    ):
        hist_lens = np.asarray(hist_lens)
        num_rows = len(hist_lens)
        idx = np.ascontiguousarray(np.asarray(hist_rev, dtype=np.int32))
        if max_len is not None:
            idx, lens_used = truncate_flat_end_aligned(idx, hist_lens, max_len)
        else:
            lens_used = hist_lens
        rows = np.repeat(np.arange(num_rows, dtype=np.int32), lens_used)
        self.num_slots = len(cand_rev)
        self.idx2d = jnp.asarray(_pad_to_grid(idx, chunk_tokens, 0))
        self.rows2d = jnp.asarray(_pad_to_grid(rows, chunk_tokens, num_rows))
        self.lens = jnp.asarray(np.asarray(lens_used, dtype=np.float32))
        self.cand_rev2d = jnp.asarray(
            _pad_to_grid(np.asarray(cand_rev, np.int32), cand_chunk, 0)
        )
        self.cand_row2d = jnp.asarray(
            _pad_to_grid(np.asarray(cand_row, np.int32), cand_chunk, 0)
        )

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
        scores = _flat_single_program(
            params,
            news_emb,
            table_for_history,
            self.idx2d,
            self.rows2d,
            self.lens,
            self.cand_rev2d,
            self.cand_row2d,
            tower_apply=tower_apply,
            normalize=normalize,
            out_dim=int(probe.shape[-1]),
        )
        return np.asarray(scores)[: self.num_slots]

    def metrics(
        self,
        tower_apply: Callable,
        params,
        news_emb: jnp.ndarray,
        metrics_plan,
        query_news_emb: Optional[jnp.ndarray] = None,
        normalize: bool = True,
        alpha=None,
    ) -> dict[str, float]:
        """Fully-fused evaluation: one dispatch, fetch = five scalars. The
        composed-score + metric semantics come from ``metrics_plan``
        (``eval.device_metrics.DeviceMetricsPlan``), matching
        ``eval.ranker.compose_final_scores(...).metrics`` exactly (tie-order
        theorem in that module's docstring). ``alpha`` (traced blend weight)
        overrides the plan's constant without a recompile."""
        table_for_history = (
            query_news_emb if query_news_emb is not None else news_emb
        )
        probe = _probe_out(tower_apply, params, table_for_history)
        if alpha is None:
            alpha = metrics_plan.alpha
        if alpha is not None:
            alpha = jnp.asarray(alpha, jnp.float32)
        sums = _flat_metrics_program(
            params,
            news_emb,
            table_for_history,
            self.idx2d,
            self.rows2d,
            self.lens,
            self.cand_rev2d,
            self.cand_row2d,
            metrics_plan.baseline,
            metrics_plan.hist_slots,
            metrics_plan.grids,
            alpha,
            tower_apply=tower_apply,
            normalize=normalize,
            out_dim=int(probe.shape[-1]),
            num_slots=self.num_slots,
        )
        return metrics_plan.finalize(jax.device_get(sums))


@functools.partial(
    jax.jit,
    static_argnames=("tower_apply", "normalize", "out_dim", "num_slots"),
)
def _flat_metrics_program(
    params,
    news_emb,
    query_table,
    idx2d,
    rows2d,
    lens,
    cand_rev2d,
    cand_row2d,
    baseline,
    hist_slots,
    grids,
    alpha,
    tower_apply: Callable,
    normalize: bool,
    out_dim: int,
    num_slots: int,
):
    """Tower pass + cosine + score composition + MIND metrics as ONE program:
    the eval fetches five scalars instead of the per-slot score vector (30MB at
    MIND-large scale). The metric grids/composition constants arrive as
    ARGUMENTS — closure-captured arrays would be constant-folded by XLA at
    compile time (tens of seconds folding a grid-sized sort). ``alpha`` is an
    optional TRACED blend scalar (None composes by overwrite)."""
    from ..eval.device_metrics import compose_scores, metric_sums

    scores = _flat_eval_body(
        params,
        news_emb,
        query_table,
        idx2d,
        rows2d,
        lens,
        cand_rev2d,
        cand_row2d,
        tower_apply=tower_apply,
        normalize=normalize,
        out_dim=out_dim,
    )[:num_slots]
    full = compose_scores(baseline, hist_slots, scores, alpha=alpha)
    return metric_sums(full, grids)


def score_all_impressions_flat(
    tower_apply: Callable,
    params,
    news_emb: jnp.ndarray,
    hist_rev: np.ndarray,
    hist_lens: np.ndarray,
    cand_rev: np.ndarray,
    cand_row: np.ndarray,
    query_news_emb: Optional[jnp.ndarray] = None,
    chunk_tokens: int = DEFAULT_FLAT_CHUNK,
    cand_chunk: int = 1 << 18,
    max_len: Optional[int] = None,
    normalize: bool = True,
) -> np.ndarray:
    """One-shot single-dispatch flat eval scoring (see ``_flat_single_program``
    and ``FlatEvalPlan``); use a ``FlatEvalPlan`` directly to amortize the
    index-grid upload over repeated evals of the same dataset."""
    plan = FlatEvalPlan(
        hist_rev,
        hist_lens,
        cand_rev,
        cand_row,
        chunk_tokens=chunk_tokens,
        cand_chunk=cand_chunk,
        max_len=max_len,
    )
    return plan.score(
        tower_apply,
        params,
        news_emb,
        query_news_emb=query_news_emb,
        normalize=normalize,
    )


@functools.partial(
    jax.jit,
    static_argnames=("tower_apply", "plan_shapes", "num_rows", "out_dim"),
)
def _eval_single_program(
    params,
    news_emb,
    query_emb,
    hist_rev_flat,
    cand_rev,
    cand_row,
    bucket_args,  # tuple of (starts, lens, rows) per bucket
    tower_apply: Callable,
    plan_shapes: tuple[tuple[int, int], ...],  # (bucket_len, batch) per bucket
    num_rows: int,
    out_dim: int,
):
    """The whole eval — every bucket's scanned tower pass, the scatter, and the
    cosine pass — as ONE compiled program: a single host->device dispatch per
    eval, which matters on high-dispatch-latency links."""
    user_vecs = jnp.zeros((num_rows, out_dim), dtype=jnp.float32)
    limit = hist_rev_flat.shape[0] - 1
    for (bucket_len, batch), (starts, lens, rows) in zip(plan_shapes, bucket_args):
        n_pad = starts.shape[0]
        num_batches = n_pad // batch
        pos = jax.lax.broadcasted_iota(jnp.int32, (batch, bucket_len), 1)

        def body(_, start_len, pos=pos):
            s, l = start_len
            idx = hist_rev_flat[jnp.minimum(s[:, None] + pos, limit)]
            mask = (pos < l[:, None]).astype(query_emb.dtype)
            gathered = query_emb[idx] * mask[..., None]
            return None, tower_apply(params, gathered, mask)

        _, outs = jax.lax.scan(
            body,
            None,
            (starts.reshape(num_batches, batch), lens.reshape(num_batches, batch)),
        )
        outs = outs.reshape(n_pad, -1).astype(jnp.float32)
        user_vecs = user_vecs.at[rows].set(outs, mode="drop")
    u = user_vecs[cand_row]
    c = news_emb[cand_rev]
    nu = jnp.maximum(jnp.linalg.norm(u, axis=-1), 1e-8)
    nc = jnp.maximum(jnp.linalg.norm(c, axis=-1), 1e-8)
    return (u * c).sum(-1) / (nu * nc)


def score_all_impressions(
    tower_apply: Callable,
    params,
    news_emb: jnp.ndarray,
    hist_rev: np.ndarray,
    hist_lens: np.ndarray,
    cand_rev: np.ndarray,
    cand_row: np.ndarray,
    query_news_emb: Optional[jnp.ndarray] = None,
    batch_size: int = 512,
    tokens_per_batch: Optional[int] = None,
    buckets: tuple[int, ...] = HISTORY_BUCKETS,
    single_program: bool = False,
    flat_tokens: bool = False,
    flat_normalize: bool = True,
    flat_max_len: Optional[int] = None,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """Full eval scoring pipeline (reference ``get_cos_sim_scores``,
    ``data_model_helper.py:174-239``): tower over histories, cosine vs candidates.

    ``cand_row`` indexes the same row space as ``hist_lens`` (i.e. the caller has
    already restricted candidates to with-history rows, as the reference does via
    ``history_bool.repeat`` — ``components.py:444-447``). ``query_news_emb``
    feeds the tower a query-instruction embedding table while candidates score
    against the passage table (``data_model_helper.py:189-196``).

    ``single_program=True`` compiles the whole eval into one device call (one
    program per distinct bucket-plan shape signature). Measured on v5e it is
    ~25% SLOWER than the default per-bucket dispatches (which pipeline
    transfers against compute) and compiles longer — kept as an option for
    dispatch-latency-bound deployments.

    ``flat_tokens=True`` routes the tower pass through ``user_vectors_flat``
    (zero padding, one program, token-local towers only — see
    ``models.supports_flat_scoring``); ``flat_normalize`` must mirror the
    tower's ``output_normalize`` and ``tokens_per_batch`` doubles as the flat
    chunk size.

    ``mesh`` runs both the tower pass and the cosine pass data-parallel over
    the mesh's ``data`` axis (tables/params replicated).
    """
    assert len(hist_lens) == 0 or cand_row.max() < len(hist_lens)
    assert not (mesh is not None and single_program), (
        "single_program and mesh are mutually exclusive"
    )
    table_for_history = query_news_emb if query_news_emb is not None else news_emb
    probe = _probe_out(tower_apply, params, table_for_history)
    if flat_tokens:
        user_vecs = user_vectors_flat(
            tower_apply,
            params,
            table_for_history,
            hist_rev,
            hist_lens,
            out_dim=int(probe.shape[-1]),
            chunk_tokens=tokens_per_batch
            or _auto_flat_chunk(int(probe.shape[-1])),
            max_len=flat_max_len,
            normalize=flat_normalize,
            mesh=mesh,
        )
        return cosine_scores_chunked(
            user_vecs, news_emb, cand_rev, cand_row, mesh=mesh
        )
    if single_program:
        plan = _bucket_plan(hist_lens, buckets, batch_size, tokens_per_batch)
        plan_shapes = tuple((bl, b) for bl, b, *_ in plan)
        bucket_args = tuple(
            (jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(rows))
            for _, _, starts, lens, rows in plan
        )
        return np.asarray(
            _eval_single_program(
                params,
                news_emb,
                table_for_history,
                jnp.asarray(hist_rev),
                jnp.asarray(cand_rev),
                jnp.asarray(cand_row),
                bucket_args,
                tower_apply=tower_apply,
                plan_shapes=plan_shapes,
                num_rows=len(hist_lens),
                out_dim=int(probe.shape[-1]),
            )
        )
    user_vecs = user_vectors_device(
        tower_apply,
        params,
        table_for_history,
        hist_rev,
        hist_lens,
        out_dim=int(probe.shape[-1]),
        batch_size=batch_size,
        buckets=buckets,
        tokens_per_batch=tokens_per_batch,
        out_dtype=jnp.float32,
        mesh=mesh,
    )
    return cosine_scores_chunked(
        user_vecs, news_emb, cand_rev, cand_row, mesh=mesh
    )
