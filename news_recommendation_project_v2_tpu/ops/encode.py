"""Batched tokenize -> encode -> embed-to-HBM pipeline and the token-state store.

Capability parity with the reference embedding precompute (call stack §3.3:
``get_embeddings`` -> ``get_embed_from_model`` -> ``get_text_embed_eval``,
``data_model_helper.py:45-84``, ``modeling_utils.py:282-323``) and the per-token
SQLite store (``modeling_utils.py:456-495``, ``data_utils.py:878-890``):

- ``encode_corpus``: one scanned device program per batch shape; embeddings stay
  in HBM (returned as a device array), with the e5 query/passage instruction
  duality handled by encoding the corpus once per instruction prefix.
- ``save/load_embeddings``: the ``save_emb`` dump (``components.py:178-258``),
  as ``.npy`` files.
- ``TokenStore``: mask-trimmed per-news token states packed into one flat
  [total_tokens, D] array + offsets (replacing torch-pickle BLOBs in SQLite);
  batched padded readback feeds the token-attention news encoder and the
  end-to-end trainer (``trainer.py:952-1206``).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("encoder_apply", "batch"))
def _encode_scan(encoder_apply: Callable, params, ids, mask, batch: int):
    n = ids.shape[0]
    num_batches = n // batch

    def body(_, im):
        i, m = im
        return None, encoder_apply(params, i, m)

    _, out = jax.lax.scan(
        body,
        None,
        (
            ids.reshape(num_batches, batch, -1),
            mask.reshape(num_batches, batch, -1),
        ),
    )
    return out.reshape(n, -1)


def encode_corpus(
    encoder_apply: Callable,  # (params, ids [B,T], mask [B,T]) -> [B,D]
    params,
    token_ids: np.ndarray,  # [N, T]
    token_mask: np.ndarray,  # [N, T]
    batch_size: Optional[int] = 256,
    encoder_config=None,  # EncoderConfig: enables batch_size=None auto-sizing
) -> jax.Array:
    """Encode a tokenized corpus into a device-resident [N, D] embedding table
    (one compiled program; rows padded to a whole number of batches).
    ``batch_size=None`` + ``encoder_config`` sizes the batch analytically
    (reference ``get_text_inference_batch_size``)."""
    if batch_size is None:
        from ..utils.memory import estimate_encoder_batch

        assert encoder_config is not None, "batch_size=None needs encoder_config"
        # Cap at ~128k tokens/program (see encode_corpus_bucketed).
        batch_size = min(
            max(1024, 131072 // token_ids.shape[1]),
            estimate_encoder_batch(encoder_config, length=token_ids.shape[1]),
        )
    n = token_ids.shape[0]
    # An empty corpus still runs one pad batch so the result has the right
    # embedding dim (and callers get a well-formed [0, D] array back).
    n_pad = max(batch_size, -(-n // batch_size) * batch_size)
    ids = np.pad(token_ids, ((0, n_pad - n), (0, 0)))
    mask = np.pad(token_mask, ((0, n_pad - n), (0, 0)))
    mask[n:, 0] = 1  # keep padded rows non-degenerate (discarded below)
    out = _encode_scan(
        encoder_apply, params, jnp.asarray(ids), jnp.asarray(mask), batch_size
    )
    return out[:n]


def encode_corpus_bucketed(
    encoder_apply: Callable,
    params,
    token_ids: np.ndarray,  # [N, T]
    token_mask: np.ndarray,  # [N, T]
    buckets: tuple[int, ...] = (32, 64, 128, 256, 512),
    batch_size: Optional[int] = None,
    encoder_config=None,
) -> jax.Array:
    """Length-bucketed corpus encode: rows are grouped by token count into the
    smallest sufficient static length bucket and each group runs through
    ``encode_corpus`` at that width, so short texts (MIND title-only news is
    ~15-30 tokens, reference ``data_utils.py:436``) never pay full-width
    encoder FLOPs. The reference gets this effect from pad-to-batch-max
    tokenization (``data_utils.py:471-482``) at the cost of dynamic shapes;
    static buckets keep XLA happy while recovering the same ~5-20x saving.

    The input width T is always appended as the final bucket, so no row is ever
    truncated relative to ``encode_corpus`` on the same arrays. Padded-key
    attention contributions are exactly zero (masked softmax), so per-row
    results match the unbucketed path to float-associativity.

    ``batch_size=None`` + ``encoder_config`` sizes each bucket's batch from the
    analytic memory model at that bucket's length (longer rows -> smaller
    batches), keeping HBM use flat across buckets.
    """
    n, T = token_ids.shape
    if n == 0:
        return encode_corpus(
            encoder_apply, params, token_ids, token_mask, batch_size or 8,
            encoder_config,
        )
    lengths = np.asarray(token_mask).sum(axis=1).astype(np.int64)
    widths = tuple(sorted({int(b) for b in buckets if 0 < b < T})) + (T,)
    # Smallest bucket that fits each row.
    assignment = np.searchsorted(np.asarray(widths), lengths, side="left")
    out: Optional[jax.Array] = None
    for bi, width in enumerate(widths):
        rows = np.nonzero(assignment == bi)[0]
        if len(rows) == 0:
            continue
        if batch_size is None and encoder_config is not None:
            from ..utils.memory import estimate_encoder_batch

            # Cap so batch*width stays ~128k tokens/program: narrow buckets
            # need large batches to keep the MXU fed (measured: width-32 at
            # batch 1024 runs ~2x under the width-128 rate), while the cap
            # keeps compile sizes and pad waste bounded.
            bs = min(
                max(1024, 131072 // width),
                estimate_encoder_batch(encoder_config, length=width),
            )
        else:
            bs = batch_size or 256
        # Small buckets shouldn't pad up to a huge batch; cap at the next
        # power of two >= the group size (powers of two keep the set of
        # compiled (batch, width) programs bounded across calls).
        bs = max(8, min(bs, 1 << (len(rows) - 1).bit_length()))
        emb = encode_corpus(
            encoder_apply,
            params,
            np.ascontiguousarray(token_ids[rows, :width]),
            np.ascontiguousarray(token_mask[rows, :width]),
            bs,
            encoder_config,
        )
        if out is None:
            out = jnp.zeros((n, emb.shape[1]), emb.dtype)
        out = out.at[jnp.asarray(rows)].set(emb)
    assert out is not None
    return out


def encode_query_and_passage(
    encoder_apply: Callable,
    params,
    tokenize: Callable[[list[str]], tuple[np.ndarray, np.ndarray]],
    texts: list[str],
    query_instruction: str,
    batch_size: Optional[int] = 256,
    encoder_config=None,
    buckets: Optional[tuple[int, ...]] = None,
) -> tuple[jax.Array, jax.Array]:
    """The e5 dual encode (reference ``data_model_helper.py:59-80``): passage
    embeddings from raw text, query embeddings from instruction-prefixed text.
    ``buckets`` routes through :func:`encode_corpus_bucketed` (length-grouped
    static shapes — the TPU answer to the reference's pad-to-batch-max)."""
    ids, mask = tokenize(texts)
    q_ids, q_mask = tokenize([query_instruction + t for t in texts])
    if buckets is not None:
        passage = encode_corpus_bucketed(
            encoder_apply, params, ids, mask, buckets, batch_size, encoder_config
        )
        query = encode_corpus_bucketed(
            encoder_apply, params, q_ids, q_mask, buckets, batch_size,
            encoder_config,
        )
        return query, passage
    passage = encode_corpus(
        encoder_apply, params, ids, mask, batch_size, encoder_config
    )
    query = encode_corpus(
        encoder_apply, params, q_ids, q_mask, batch_size, encoder_config
    )
    return query, passage


def save_embeddings(
    save_dir: Path,
    dataset_name: str,
    embeddings: np.ndarray,
    query_embeddings: Optional[np.ndarray] = None,
    news_ids: Optional[np.ndarray] = None,
) -> None:
    """The save_emb dump (reference ``components.py:193-223`` writes
    ``{dataset}.pt`` / ``query_{dataset}.pt``). Passing ``news_ids`` writes the
    row->news-id key alongside, making the dump order-independent: loads can
    realign to any compiled row order (the reference's purely positional dumps
    silently misalign when the loading run uses a different row subset)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    np.save(save_dir / f"{dataset_name}.npy", np.asarray(embeddings))
    if query_embeddings is not None:
        np.save(save_dir / f"query_{dataset_name}.npy", np.asarray(query_embeddings))
    if news_ids is not None:
        np.save(save_dir / f"{dataset_name}_ids.npy", np.asarray(news_ids, dtype=np.str_))


def load_embeddings(
    save_dir: Path,
    dataset_name: str,
    with_query: bool = False,
    align_to_news_ids: Optional[np.ndarray] = None,
):
    """Reference ``LoadEmbeddingComponent`` (``components.py:226-258``).

    With ``align_to_news_ids`` (and an id-keyed dump) the rows are reordered to
    that news-id order; a KeyError names any id missing from the dump.
    """
    save_dir = Path(save_dir)
    emb = np.load(save_dir / f"{dataset_name}.npy")
    query = (
        np.load(save_dir / f"query_{dataset_name}.npy") if with_query else None
    )
    if align_to_news_ids is not None:
        ids_path = save_dir / f"{dataset_name}_ids.npy"
        if not ids_path.exists():
            raise FileNotFoundError(
                f"{ids_path} missing: this dump is positional-only and cannot "
                "be realigned; re-run save_emb to write the id key"
            )
        dump_ids = np.load(ids_path)
        row_of = {str(n): i for i, n in enumerate(dump_ids)}
        try:
            order = np.array([row_of[str(n)] for n in align_to_news_ids])
        except KeyError as e:
            raise KeyError(
                f"news id {e.args[0]!r} not present in embedding dump "
                f"{dataset_name!r}"
            ) from None
        emb = emb[order]
        if query is not None:
            query = query[order]
    if not with_query:
        return emb
    return emb, query


# ---------------------------------------------------------------------------
# Token-state store
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TokenStore:
    """Mask-trimmed per-news token hidden states, packed flat.

    Replaces the reference's SQLite table of torch-pickled BLOBs
    (``modeling_utils.py:456-473``): one [total_tokens, D] float array plus
    int64 offsets; ``gather_padded`` returns a [len(indices), T, D] padded batch
    + mask like ``get_embeds_from_db`` (``data_utils.py:878-890``).
    """

    states: np.ndarray  # [total_tokens, D]
    offsets: np.ndarray  # [num_news + 1]

    @property
    def num_items(self) -> int:
        return len(self.offsets) - 1

    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    def gather_padded(
        self, indices: np.ndarray, max_len: Optional[int] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        indices = np.asarray(indices)
        starts = self.offsets[indices]
        lens = (self.offsets[indices + 1] - starts).astype(np.int64)
        if max_len is not None:
            lens = np.minimum(lens, max_len)  # keep the FIRST max_len tokens
        T = int(lens.max())
        out = np.zeros((len(indices), T, self.states.shape[1]), self.states.dtype)
        mask = np.zeros((len(indices), T), np.float32)
        # Per-item loop is the MEASURED winner here, not an oversight: each
        # item's tokens are contiguous, so this is B big memcpys; the
        # repeat/cumsum fancy-index vectorization was tried and runs
        # 1.4-1.9x SLOWER at D=1024 (B=512/2048, 65k-row store) because it
        # degrades into per-token row gathers plus an indexed scatter.
        for j, (a, ln) in enumerate(zip(starts, lens)):
            out[j, :ln] = self.states[a : a + ln]
            mask[j, :ln] = 1.0
        return out, mask

    def padded_index_batch(
        self,
        indices: np.ndarray,
        T: int,
        out_rows: Optional[int] = None,
        max_len: Optional[int] = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """[M, T] int32 indices into the FLAT states row axis + [M, T] mask —
        the host half of a DEVICE-resident gather: the states stay in HBM and
        only these index grids cross the host-device link (KBs vs the
        [M, T, D] block's hundreds of MBs at MIND scale). Pad slots point at
        flat row 0 and are mask-zeroed (the device gather multiplies them
        away); pad ROWS past ``len(indices)`` keep one live mask slot so
        downstream masked reductions stay non-degenerate (same convention as
        the host ``gather_padded`` path)."""
        indices = np.asarray(indices)
        M = len(indices) if out_rows is None else out_rows
        starts = self.offsets[indices]
        lens = (self.offsets[indices + 1] - starts).astype(np.int64)
        if max_len is not None:
            lens = np.minimum(lens, max_len)  # keep the FIRST max_len tokens
        lens = np.minimum(lens, T)
        tok_idx = np.zeros((M, T), np.int32)
        mask = np.zeros((M, T), np.float32)
        ar = np.arange(T, dtype=np.int64)
        valid = ar[None, :] < lens[:, None]
        tok_idx[: len(indices)] = np.where(valid, starts[:, None] + ar[None, :], 0)
        mask[: len(indices)] = valid
        mask[len(indices) :, 0] = 1.0
        return tok_idx, mask

    def save(self, path: Path) -> None:
        """``.npz`` single-file dump (in-RAM stores). For out-of-core stores
        use ``save_dir``/``open_dir``."""
        np.savez(Path(path), states=self.states, offsets=self.offsets)

    @classmethod
    def load(cls, path: Path) -> "TokenStore":
        z = np.load(Path(path))
        return cls(states=z["states"], offsets=z["offsets"])

    def save_dir(self, path: Path) -> None:
        """Directory format (``states.npy`` + ``offsets.npy``): unlike npz this
        reopens zero-copy via memmap, which is what makes MIND-scale stores
        usable (65k news x 512 tokens x 1024 f32 ~ 137GB; see size model in
        BASELINE.md)."""
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.save(path / "states.npy", self.states)
        np.save(path / "offsets.npy", self.offsets)

    @classmethod
    def open_dir(cls, path: Path, mmap: bool = True) -> "TokenStore":
        """Open a directory-format store; with ``mmap`` (default) token states
        stay on disk and ``gather_padded`` reads only the requested rows —
        the out-of-core equivalent of the reference's SQLite BLOB readback
        (``modeling_utils.py:456-495``, ``data_utils.py:878-890``) without the
        per-item torch-unpickle cost."""
        path = Path(path)
        states = np.load(path / "states.npy", mmap_mode="r" if mmap else None)
        offsets = np.load(path / "offsets.npy")
        return cls(states=states, offsets=offsets)

    @classmethod
    def from_reference_sqlite(
        cls,
        db_path: Path,
        out_dir: Optional[Path] = None,
        dtype=None,
    ) -> "TokenStore":
        """Import the reference's SQLite token-state DB (``mydb_train.sqlite``
        et al.) — the ``tensors(id INTEGER PRIMARY KEY, data BLOB)`` table of
        mask-trimmed torch-pickled ``[L_i, D]`` tensors that
        ``store_text_embed_full_eval`` writes (reference
        ``modeling_utils.py:456-473``; 1-based implicit rowids in corpus
        order, readback ``data_utils.py:878-890``).

        With ``out_dir`` the import streams OUT-OF-CORE: two passes over the
        DB (lengths, then rows) filling a memmapped ``states.npy``, so a
        MIND-scale store (~137GB f32) imports in O(one blob) memory; the
        returned store is the memmap-backed ``open_dir(out_dir)``. Without it
        the states are assembled in RAM. ``dtype`` optionally downcasts
        (e.g. ``np.float16``, halving the store like ``build_token_store``'s
        f16 option). Needs ``torch`` to unpickle the blobs (migration-time
        only — nothing in the serving path)."""
        import io
        import sqlite3

        import torch

        db_path = Path(db_path)
        if not db_path.exists():
            raise FileNotFoundError(db_path)

        def rows(conn):
            # id order IS corpus order (1-based implicit rowids).
            cur = conn.execute("SELECT id, data FROM tensors ORDER BY id")
            expect = 1
            for rowid, blob in cur:
                if rowid != expect:
                    raise ValueError(
                        f"reference token DB has non-contiguous ids (expected "
                        f"{expect}, got {rowid}) — ids must be the implicit "
                        "1..N rowids store_text_embed_full_eval writes"
                    )
                expect += 1
                with io.BytesIO(blob) as f:
                    t = torch.load(f, map_location="cpu", weights_only=True)
                yield np.asarray(t.float().numpy())

        from contextlib import closing

        # closing(): sqlite3's context manager only commits/rolls back — it
        # does NOT close, and a multi-GB DB's fd + page cache would otherwise
        # live until process exit in a long-lived pipeline process.
        with closing(sqlite3.connect(db_path)) as conn:
            if out_dir is None:
                arrays = [
                    a if dtype is None else a.astype(dtype) for a in rows(conn)
                ]
                if not arrays:
                    raise ValueError(f"token DB {db_path} is empty")
                return cls.from_ragged(arrays)

            # Out-of-core: pass 1 sizes the memmap, pass 2 fills it.
            lens, dim = [], None
            for a in rows(conn):
                lens.append(len(a))
                if dim is None:
                    dim = a.shape[1]
                    out_dtype = np.dtype(dtype or a.dtype)
                elif a.shape[1] != dim:
                    raise ValueError(
                        f"inconsistent hidden dim in token DB: {a.shape[1]} "
                        f"vs {dim}"
                    )
            if dim is None:
                raise ValueError(f"token DB {db_path} is empty")
            offsets = np.concatenate(
                [[0], np.cumsum(np.asarray(lens, np.int64))]
            )
            out_dir = Path(out_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            states = np.lib.format.open_memmap(
                out_dir / "states.npy",
                mode="w+",
                dtype=out_dtype,
                shape=(int(offsets[-1]), dim),
            )
            for i, a in enumerate(rows(conn)):
                states[offsets[i] : offsets[i + 1]] = a
            states.flush()
            del states
            # offsets.npy is written LAST (build_token_store's convention):
            # an interrupted import must not leave a directory that open_dir
            # would load as a complete, zero-filled store.
            np.save(out_dir / "offsets.npy", offsets)
        return cls.open_dir(out_dir)

    @classmethod
    def from_ragged(cls, arrays: list[np.ndarray]) -> "TokenStore":
        lens = np.array([len(a) for a in arrays], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        states = (
            np.concatenate(arrays, axis=0)
            if arrays
            else np.zeros((0, 0), np.float32)
        )
        return cls(states=states, offsets=offsets)


def materialize_from_token_store(
    token_encoder_apply: Callable,  # (params, [B,T,D], [B,T]) -> [B,D]
    params,
    store: "TokenStore",
    batch_size: Optional[int] = 64,
    max_token_len: int = 512,
    token_buckets: tuple[int, ...] = (64, 128, 256, 512),
    dev_states=None,  # HBM-resident flat [total_tokens, D] (device-store mode)
) -> np.ndarray:
    """Run a (learned) token encoder over the whole store -> [N, D] news
    embedding matrix (reference ``apply_token_attn`` + ``store_embeddings``,
    ``data_model_helper.py:374-413``). ``batch_size=None`` sizes the batch from
    the analytic memory model (reference
    ``get_token_attention_inference_batch_size``). With ``dev_states`` (the
    store's flat states already resident in HBM) each batch uploads only its
    [B, T] index grid and gathers on device.

    Dispatches are PIPELINED: up to ``pipeline_depth`` chunks stay in flight
    and results are fetched in order as the window slides, so per-chunk
    dispatch+fetch latency (the whole cost on high-RTT hosts — see
    ``benchmarks/train_profile.py mat``) overlaps with device compute instead
    of serializing with it. Bounded, not unbounded: deep async queues stall
    on tunneled links."""
    from ..config import bucket_for_open

    n = store.num_items
    if batch_size is None:
        from ..utils.memory import estimate_token_attention_batch

        batch_size = min(
            1024,
            # No batch larger than the corpus rounded up to a power of two
            # (pad rows are computed then discarded).
            max(8, 1 << max(0, int(n) - 1).bit_length()),
            estimate_token_attention_batch(
                dim=int(store.states.shape[1]), token_len=max_token_len
            ),
        )
    from ..utils.inflight import InflightWindow

    out = []
    # Device-store chunks upload only [B, T] index grids (KBs) — a deep
    # window is free. Host-streaming chunks pin their [B, T, D] f32 input
    # block until the program runs, and the analytic batch estimator sizes B
    # assuming ONE resident block — keep at most one extra in flight there.
    window = InflightWindow(
        4 if dev_states is not None else 1,
        lambda item: out.append(np.asarray(item[0])[: item[1]]),
    )

    apply = jax.jit(lambda p, s, m: token_encoder_apply(p, s, m))
    apply_gathered = jax.jit(
        lambda p, flat, i, m: token_encoder_apply(
            p, flat[i].astype(jnp.float32) * m[..., None], m
        )
    )
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        if dev_states is not None:
            lens = np.minimum(
                store.offsets[idx + 1] - store.offsets[idx], max_token_len
            )
            T = bucket_for_open(int(lens.max()), token_buckets)
            tok_idx, mask = store.padded_index_batch(
                idx, T, out_rows=batch_size, max_len=max_token_len
            )
            window.push(
                (
                    apply_gathered(
                        params, dev_states, jnp.asarray(tok_idx), jnp.asarray(mask)
                    ),
                    len(idx),
                )
            )
            continue
        states, mask = store.gather_padded(idx, max_len=max_token_len)
        T = bucket_for_open(states.shape[1], token_buckets)
        states = np.pad(
            states,
            (
                (0, batch_size - len(idx)),
                (0, max(0, T - states.shape[1])),
                (0, 0),
            ),
        )
        mask = np.pad(
            mask,
            ((0, batch_size - len(idx)), (0, max(0, T - mask.shape[1]))),
        )
        mask[len(idx):, 0] = 1.0  # keep pad rows non-degenerate
        window.push(
            (apply(params, jnp.asarray(states), jnp.asarray(mask)), len(idx))
        )
    window.flush()
    return np.concatenate(out)


def materialize_from_token_store_mesh(
    token_encoder_apply: Callable,  # (params, [B,T,D], [B,T]) -> [B,D]
    params,  # replicated on the mesh (committed globals or host values)
    store: "TokenStore",
    mesh,  # jax.sharding.Mesh
    dev_states,  # COMMITTED flat [total_tokens, D] (replicated OR row-sharded)
    batch_size: Optional[int] = None,
    max_token_len: int = 512,
    token_buckets: tuple[int, ...] = (64, 128, 256, 512),
    multiprocess: bool = False,
    apply_cache: Optional[dict] = None,  # caller-held: reuse the jitted program across epochs
) -> np.ndarray:
    """``materialize_from_token_store``'s device-store path as a GLOBAL mesh
    program: each chunk's [B, T] index grids shard their row axis over
    ``data`` (the token encoder runs data-parallel), the gather reads the
    committed HBM store in place (replicated or row-sharded —
    ``dev_states.sharding`` is matched exactly, so both placements work), and
    the pooled [B, D] output comes back REPLICATED, which is addressable on
    every process — this is what lets multi-process e2e training keep the
    device-resident store for its per-epoch materialization instead of
    falling back to the host streaming path (a local jit cannot mix with
    global arrays; a global program with explicit shardings can). Chunk
    dispatches ride the same bounded in-flight window as the local path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import bucket_for_open
    from ..utils.inflight import InflightWindow

    n = store.num_items
    data_size = mesh.shape["data"]
    if batch_size is None:
        from ..utils.memory import estimate_token_attention_batch

        batch_size = min(
            1024,
            max(8, 1 << max(0, int(n) - 1).bit_length()),
            estimate_token_attention_batch(
                dim=int(store.states.shape[1]), token_len=max_token_len
            ),
        )
    batch_size = max(data_size, (batch_size // data_size) * data_size)

    rep = NamedSharding(mesh, P())
    dat2 = NamedSharding(mesh, P("data", None))
    cache_key = (mesh, dev_states.sharding)
    if apply_cache is not None and cache_key in apply_cache:
        apply = apply_cache[cache_key]
    else:
        apply = jax.jit(
            lambda p, flat, i, m: token_encoder_apply(
                p, flat[i].astype(jnp.float32) * m[..., None], m
            ),
            in_shardings=(rep, dev_states.sharding, dat2, dat2),
            out_shardings=rep,
        )
        if apply_cache is not None:
            apply_cache[cache_key] = apply

    def place(x, sharding):
        if multiprocess:
            from ..parallel.sharding import put_global

            return put_global(np.asarray(x), sharding)
        return jnp.asarray(x)

    out = []
    window = InflightWindow(
        4, lambda item: out.append(np.asarray(item[0])[: item[1]])
    )
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        lens = np.minimum(
            store.offsets[idx + 1] - store.offsets[idx], max_token_len
        )
        T = bucket_for_open(int(lens.max()), token_buckets)
        tok_idx, mask = store.padded_index_batch(
            idx, T, out_rows=batch_size, max_len=max_token_len
        )
        window.push(
            (
                apply(
                    params,
                    dev_states,
                    place(tok_idx, dat2),
                    place(mask.astype(np.float32), dat2),
                ),
                len(idx),
            )
        )
    window.flush()
    return np.concatenate(out)


def build_token_store(
    encoder_hidden_apply: Callable,  # (params, ids, mask) -> [B, T, D] hidden states
    params,
    token_ids: np.ndarray,
    token_mask: np.ndarray,
    batch_size: int = 64,
    out_dir: Optional[Path] = None,
    store_dtype=np.float32,
    token_buckets: Optional[tuple[int, ...]] = (32, 64, 128, 256, 512),
) -> TokenStore:
    """Run the encoder WITHOUT pooling and store mask-trimmed token states
    (reference ``store_text_embed_full_eval``, ``modeling_utils.py:456-473``).

    With ``out_dir`` the states stream straight into a preallocated disk-backed
    memmap (total size is known up front from the mask), so corpora whose token
    states exceed host RAM build without ever materializing in memory; the
    returned store reads back through the memmap. ``store_dtype=np.float16``
    halves the footprint (the reference's fp16-weights path persists fp16
    states too, ``modeling_utils.py:98,463``).

    ``token_buckets`` groups rows by token count into static length buckets so
    short news never pay full-width encoder FLOPs (the stored trimmed states
    are identical either way — padded positions are mask-inert; see
    ``encode_corpus_bucketed``). ``None`` keeps the single fixed-width pass."""
    n, width = token_ids.shape
    lens = np.asarray(token_mask).sum(axis=1).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])

    if token_buckets is not None and n > 0:
        widths = tuple(
            sorted({int(b) for b in token_buckets if 0 < b < width})
        ) + (width,)
        assignment = np.searchsorted(np.asarray(widths), lens, side="left")
        row_order = np.argsort(assignment, kind="stable")
        row_widths = np.asarray(widths)[assignment]
    else:
        row_order = np.arange(n)
        row_widths = np.full(n, width, np.int64)

    hidden_dim: Optional[int] = None
    states = None  # allocated lazily once D is known from the first batch
    arrays: list[Optional[np.ndarray]] = [None] * n
    # Pipelined dispatch (utils/inflight.py): up to two [B,T,D] hidden blocks
    # stay in flight so the encoder computes the next chunk while this one's
    # fetch/trim/memmap-write runs — bounded at depth 1 (the appended block
    # plus one pending) because each block holds ~B*T*D*4 bytes of HBM.
    from ..utils.inflight import InflightWindow

    def consume(item) -> None:
        nonlocal states, hidden_dim, out_dir
        rows_d, dev = item
        hidden = np.asarray(dev)
        if out_dir is not None and states is None:
            hidden_dim = hidden.shape[-1]
            out_dir = Path(out_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            states = np.lib.format.open_memmap(
                out_dir / "states.npy",
                mode="w+",
                dtype=store_dtype,
                shape=(int(offsets[-1]), hidden_dim),
            )
        for j, row in enumerate(rows_d):
            ln = int(lens[row])
            trimmed = hidden[j, :ln].astype(store_dtype)
            if states is not None:
                a = int(offsets[row])
                states[a : a + ln] = trimmed
            else:
                arrays[row] = trimmed

    window = InflightWindow(1, consume)
    for start in range(0, n, batch_size):
        rows = row_order[start : start + batch_size]
        w = int(row_widths[rows].max())
        pad = batch_size - len(rows)
        ids_b = np.pad(np.ascontiguousarray(token_ids[rows, :w]), ((0, pad), (0, 0)))
        mask_b = np.pad(np.ascontiguousarray(token_mask[rows, :w]), ((0, pad), (0, 0)))
        window.push(
            (
                rows,
                _hidden_batch(
                    encoder_hidden_apply, params, jnp.asarray(ids_b),
                    jnp.asarray(mask_b),
                ),
            )
        )
    window.flush()
    if out_dir is not None:
        if states is None:  # empty corpus: write a valid, empty store
            out_dir = Path(out_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            np.save(out_dir / "states.npy", np.zeros((0, 1), np.float32))
        else:
            states.flush()
        np.save(Path(out_dir) / "offsets.npy", offsets)
        # Reopen read-only: training must never mutate the store in place.
        return TokenStore.open_dir(out_dir, mmap=True)
    return TokenStore.from_ragged(arrays)


@functools.partial(jax.jit, static_argnames=("encoder_hidden_apply",))
def _hidden_batch(encoder_hidden_apply, params, ids, mask):
    return encoder_hidden_apply(params, ids, mask)
