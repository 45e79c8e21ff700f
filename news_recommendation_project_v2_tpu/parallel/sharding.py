"""Sharding specs and the sharded training step.

Design (scaling-book recipe: pick a mesh, annotate shardings, let XLA insert the
collectives):

- **News-embedding table**: row-sharded over the ``model`` axis
  (``P("model", None)``). History/candidate gathers against it become XLA
  all-gather/all-to-all exchanges over ICI — replacing the reference's host-RAM
  fancy-index (``trainer.py:580-582``, ``data_utils.py:784-791``).
- **Batches**: sharded over ``data`` (DP). Params/opt-state replicated; with
  data-sharded inputs and replicated params, XLA emits the psum gradient
  reduction automatically inside the jitted step.
- The step function itself is the same pure function the single-chip trainer
  uses (``train.step.make_tower_train_step``) — only in/out shardings differ.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def put_global(x, sharding: NamedSharding):
    """Place a value with ``sharding`` across the WHOLE mesh, including
    non-addressable devices (multi-process ``jax.distributed`` meshes): every
    process supplies its addressable shards from the same host value — the
    standard multi-host feeding pattern. Single-process keeps the plain
    ``device_put`` (no host round-trip for arrays already on device)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard a [N, D] embedding table over the model axis."""
    return NamedSharding(mesh, P("model", None))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_news_table(mesh: Mesh, table: jnp.ndarray) -> jax.Array:
    """Place a news-embedding table row-sharded on the mesh (pads rows to a
    multiple of the model-axis size so every shard is equal)."""
    model_size = mesh.shape["model"]
    n = table.shape[0]
    pad = (-n) % model_size
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, table.shape[1]), table.dtype)], axis=0
        )
    return put_global(table, table_sharding(mesh))


def store_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard a flat [total_tokens, D] token-state store over EVERY mesh
    device — both axes combined, ``P(("data", "model"), None)`` — so an
    n-device pod holds total/n rows per chip. This is what keeps MIND-large
    stores (~10.2GB title-only) device-resident on pods where one chip's HBM
    cannot (VERDICT r4 #1): the in-program gather against it rides XLA
    collectives over ICI, replacing the reference's per-batch host SQLite
    fetch + PCIe re-upload (``data_utils.py:893-915``)."""
    return NamedSharding(mesh, P(("data", "model"), None))


def shard_token_store_states(mesh: Mesh, states) -> jax.Array:
    """Place a TokenStore's flat [total_tokens, D] states row-sharded across
    the whole mesh (``store_sharding``). Rows pad host-side to a multiple of
    the device count so shards are equal; pad rows append at the END with
    zeros, so existing token indices stay valid and gathers never read them
    (``TokenStore.padded_index_batch`` points masked slots at row 0).
    Multi-process safe: every process supplies its addressable shards from
    its full host copy (``put_global``)."""
    n_dev = mesh.devices.size
    states = np.asarray(states)
    pad = (-states.shape[0]) % n_dev
    if pad:
        padded = np.zeros(
            (states.shape[0] + pad, states.shape[1]), states.dtype
        )
        padded[: states.shape[0]] = states
        states = padded
    return put_global(states, store_sharding(mesh))


def tower_step_shardings(mesh: Mesh) -> tuple[tuple, tuple]:
    """(in_shardings, out_shardings) of the sharded tower train step — also
    used by the trainer's multi-process batch placement (each host places its
    addressable shards of every batch array before the call)."""
    rep = replicated(mesh)
    tab = table_sharding(mesh)
    dat = batch_sharding(mesh)
    dat2 = NamedSharding(mesh, P("data", None))
    return (rep, rep, tab, tab, dat2, dat2, dat, dat, dat, dat, rep), (
        rep, rep, rep,
    )


def flat_tower_step_shardings(mesh: Mesh, infonce: bool = False) -> tuple[tuple, tuple]:
    """(in_shardings, out_shardings) of the sharded FLAT-token tower train step
    (``make_tower_train_step_flat``): the flat token stream (tok_idx, tok_rows)
    shards over ``data`` — each device runs the per-token tower on its token
    chunk and scatter-adds into its local [U, D] accumulator replica, which
    GSPMD reduces with one [U, D] psum (U = deduped rows <= batch) before the
    pooling epilogue; pair columns shard over ``data`` like the padded step.

    Signature: (params, opt_state, news_emb, query_emb, tok_idx, tok_rows,
    lens, hist_rev, pos_idx, neg_idx, pair_mask, dropout_key)."""
    rep = replicated(mesh)
    tab = table_sharding(mesh)
    dat = batch_sharding(mesh)
    neg = NamedSharding(mesh, P("data", None)) if infonce else dat  # [B, K]
    return (rep, rep, tab, tab, dat, dat, rep, dat, dat, neg, dat, rep), (
        rep, rep, rep,
    )


def make_sharded_flat_tower_train_step(
    step_fn: Callable,
    mesh: Mesh,
    donate: bool = True,
    infonce: bool = False,
) -> Callable:
    """Wrap the flat-token train step with mesh shardings (see
    ``flat_tower_step_shardings``) — pods train on the fastest step instead of
    silently falling back to the padded one."""
    in_shardings, out_shardings = flat_tower_step_shardings(mesh, infonce=infonce)
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0, 1) if donate else (),
    )


def make_sharded_tower_train_step(
    step_fn: Callable,
    mesh: Mesh,
    donate: bool = True,
) -> Callable:
    """Wrap a pure tower train step with mesh shardings.

    Argument order of ``step_fn`` (see ``make_tower_train_step``):
    (params, opt_state, news_emb, query_emb, hist_idx, hist_mask, hist_rev,
    pos_idx, neg_idx, pair_mask, dropout_key).

    - params / opt_state / dropout_key: replicated
    - news_emb / query_emb: row-sharded over ``model``
    - hist_idx / hist_mask: unique-history rows sharded over ``data``
    - hist_rev / pos / neg / pair_mask: pair rows sharded over ``data``
    """
    in_shardings, out_shardings = tower_step_shardings(mesh)
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0, 1) if donate else (),
    )


def make_sharded_joint_train_step(
    step_fn: Callable,
    mesh: Mesh,
    donate: bool = True,
) -> Callable:
    """``make_sharded_tower_train_step`` for the joint (blend/reduce) step
    signature (see ``make_joint_train_step``), which adds two per-pair
    classification-baseline columns (sharded over ``data``) before the key."""
    rep = replicated(mesh)
    tab = table_sharding(mesh)
    dat = batch_sharding(mesh)
    dat2 = NamedSharding(mesh, P("data", None))
    in_shardings = (
        rep, rep, tab, tab, dat2, dat2, dat, dat, dat, dat, dat, dat, rep,
    )
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1) if donate else (),
    )


def make_sharded_e2e_train_step(
    step_fn: Callable,
    mesh: Mesh,
    donate: bool = True,
    infonce: bool = False,
) -> Callable:
    """Sharded end-to-end (token encoder + tower) step
    (see ``make_end2end_train_step``): the unique-news token states shard over
    ``data`` (the token-encoder forward/backward is the dominant compute), the
    pair batch shards over ``data`` too; the gather of per-news embeddings by
    batch rows becomes an XLA collective. Params/opt-state replicated, so the
    gradient psum is inserted by SPMD as usual. ``infonce``: the negative
    column is [B, K] instead of [B] (``make_end2end_infonce_step``)."""
    in_shardings, out_shardings = e2e_step_shardings(mesh, infonce=infonce)
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0, 1) if donate else (),
    )


def e2e_step_shardings(mesh: Mesh, infonce: bool = False) -> tuple[tuple, tuple]:
    """(in_shardings, out_shardings) of the sharded end-to-end step — also
    used by the trainer's multi-process batch placement. The token-state
    block [M, T, D] shards its unique-news axis over ``data``."""
    rep = replicated(mesh)
    dat = batch_sharding(mesh)
    dat2 = NamedSharding(mesh, P("data", None))
    dat3 = NamedSharding(mesh, P("data", None, None))
    neg = dat2 if infonce else dat  # [B, K] vs [B]
    return (rep, rep, dat3, dat2, dat2, dat2, dat, dat, neg, dat, rep), (
        rep, rep, rep,
    )


def make_sharded_e2e_train_step_gathered(
    step_fn: Callable,
    mesh: Mesh,
    donate: bool = True,
    sharded_store: bool = False,
    infonce: bool = False,
) -> Callable:
    """Sharded device-resident-store end-to-end step
    (``make_end2end_train_step_gathered``): the flat token store lives in HBM
    either REPLICATED (default; zero collectives in the gather) or
    ROW-SHARDED over every device (``sharded_store=True``,
    ``shard_token_store_states`` — for stores bigger than one chip's HBM;
    GSPMD turns the in-program gather into the partial-gather + psum
    exchange over ICI). Commit the store with the matching sharding BEFORE
    the first call — explicit in_shardings do not reshard committed arrays.
    The per-batch [M, T] index grids shard their unique-news axis over
    ``data`` (so the gathered [M, T, D] block comes out sharded exactly like
    the host-upload step's), and the pair batch shards over ``data``."""
    in_shardings, out_shardings = e2e_gathered_step_shardings(
        mesh, sharded_store=sharded_store, infonce=infonce
    )
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0, 1) if donate else (),
    )


def e2e_gathered_step_shardings(
    mesh: Mesh, sharded_store: bool = False, infonce: bool = False
) -> tuple[tuple, tuple]:
    rep = replicated(mesh)
    dat = batch_sharding(mesh)
    dat2 = NamedSharding(mesh, P("data", None))
    sto = store_sharding(mesh) if sharded_store else rep
    neg = dat2 if infonce else dat  # [B, K] vs [B]
    return (
        (rep, rep, sto, dat2, dat2, dat2, dat2, dat, dat, neg, dat, rep),
        (rep, rep, rep),
    )


def make_sequence_sharded_tower_fn(mesh: Mesh, tower_apply: Callable) -> Callable:
    """Sequence-parallel tower forward: the history axis of [B, L, D] inputs is
    sharded over the ``model`` axis (batch over ``data``), so very long clicked
    histories split across chips (SURVEY.md §2.6 SP/CP row; the reference's
    600-item cap, ``config.py:33``, is the single-device analogue).

    Works for towers whose per-item compute is independent up to masked
    reductions (the latent tower qualifies: per-item Q projections and
    cross-attention against shared latents, then a masked mean — XLA inserts
    the psum for the reduction).
    """
    rep = replicated(mesh)
    seq3 = NamedSharding(mesh, P("data", "model", None))
    seq2 = NamedSharding(mesh, P("data", "model"))
    out = batch_sharding(mesh)

    def fn(params, gathered, mask):
        return tower_apply(params, gathered, mask)

    return jax.jit(fn, in_shardings=(rep, seq3, seq2), out_shardings=out)


def make_sharded_classification_step(
    step_fn: Callable,
    mesh: Mesh,
    donate: bool = True,
) -> Callable:
    """DP classification-head step (see ``make_classification_train_step`` /
    ``make_classification_infonce_step``): news table row-sharded over
    ``model``, pos/neg/mask pair columns over ``data``, params replicated
    (SPMD inserts the gradient psum)."""
    rep = replicated(mesh)
    tab = table_sharding(mesh)
    dat = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, tab, dat, dat, dat),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1) if donate else (),
    )


def make_sharded_encode_fn(mesh: Mesh, encoder_apply: Callable) -> Callable:
    """Data-parallel corpus encoding over the mesh: token batches sharded over
    ``data``, params replicated, pooled embeddings returned data-sharded (the
    "sharded encode -> dump" stage of the multi-host pipeline, BASELINE
    config[4])."""
    rep = replicated(mesh)
    dat = batch_sharding(mesh, 2)

    def fn(params, ids, mask):
        return encoder_apply(params, ids, mask)

    return jax.jit(fn, in_shardings=(rep, dat, dat), out_shardings=dat)


def shard_encoder_params_tp(mesh: Mesh, params) -> object:
    """Tensor-parallel layout for NewsEncoder params: FFN in-projection kernels
    column-sharded and out-projection kernels row-sharded over ``model``
    (Megatron layout — the all-reduce after ffn_out is inserted by XLA).
    Attention q/k/v kernels are column-sharded (heads split), attn_out
    row-sharded. Everything else replicated.

    SURVEY.md §2.6 marks TP optional for the <=560M encoder; this provides it
    for pods where the encoder's weights/activations dominate HBM.
    """

    col = NamedSharding(mesh, P(None, "model"))  # [in, out] split on out
    row = NamedSharding(mesh, P("model", None))  # [in, out] split on in
    rep = replicated(mesh)

    def place(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(names)
        if "kernel" in joined:
            if any(n in joined for n in ("ffn_in", "q/", "k/", "v/")) or joined.endswith(("q/kernel", "k/kernel", "v/kernel")):
                return jax.device_put(leaf, col)
            if "ffn_out" in joined or "attn_out" in joined:
                return jax.device_put(leaf, row)
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map_with_path(place, params)


def make_sharded_scoring_fn(mesh: Mesh, tower_apply: Callable) -> Callable:
    """Jitted eval scoring over the mesh: tower forward on data-sharded history
    batches against the model-sharded table, then flat cosine scores for
    data-sharded candidate slots (replaces ``ops.scoring`` single-device path
    on pods)."""
    rep = replicated(mesh)
    tab = table_sharding(mesh)
    dat = batch_sharding(mesh)
    dat2 = NamedSharding(mesh, P("data", None))

    def fn(params, news_emb, hist_idx, hist_mask, cand_rev, cand_row):
        gathered = news_emb[hist_idx] * hist_mask[..., None].astype(news_emb.dtype)
        user = tower_apply(params, gathered, hist_mask)
        u = user[cand_row]
        c = news_emb[cand_rev]
        eps = 1e-8
        nu = jnp.maximum(jnp.linalg.norm(u, axis=-1), eps)
        nc = jnp.maximum(jnp.linalg.norm(c, axis=-1), eps)
        return (u * c).sum(-1) / (nu * nc)

    return jax.jit(
        fn,
        in_shardings=(rep, tab, dat2, dat2, dat, dat),
        out_shardings=dat,
    )
