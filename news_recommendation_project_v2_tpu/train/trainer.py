"""Training engine: jitted margin-ranking train steps over static bucketed shapes,
per-epoch negative resampling, epoch evaluation with the full MIND metric suite,
JSONL logging, and best-checkpoint tracking.

Capability parity with the reference trainer family (``trainer.py:47-1206``),
re-architected TPU-first:

- The reference's hot loop gathers ``news_embeddings[history_indices]`` on host
  per batch and pads each batch to its own max length (``trainer.py:569-636``,
  ``data_utils.py:794-843``). Here the embedding table lives on device, the
  gather happens inside the jitted step, and batches are padded to static
  (batch, bucket) shapes so the jit cache stays bounded.
- Within-batch history dedup (a real win: many impressions share a user) moves to
  the host input pipeline with padding to the fixed batch size (reference does a
  dynamic-shape ``np.unique`` in the collate, ``data_utils.py:820-843``).
- AdamW(1e-5) + global-norm clip 0.5 via optax (torch AdamW defaults:
  betas (0.9, 0.999), eps 1e-8, weight_decay 0.01; reference ``trainer.py:469-472,
  626-631``), margin-2 ranking loss, per-epoch ``reset()`` resampling
  (reference ``trainer.py:713``).
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from pathlib import Path
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import HISTORY_BUCKETS, TrainConfig, bucket_for, bucket_for_open
from ..data.compiler import CompiledBehaviors
from ..data.grouping import gather_end_aligned, lengths_to_offsets
from ..data.sampling import neg_batch_column, sample_epoch_pairs
from ..eval.ranker import compose_final_scores, history_candidate_slots
from ..ops.scoring import score_all_impressions
from .checkpoint import BestTracker
from .step import make_classification_train_step, make_tower_train_step


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
        ),
    )


class PlateauScheduler:
    """ReduceLROnPlateau(patience, factor) over the epoch val metric (reference
    ``trainer.py:97-101``): rewrites the injected learning-rate hyperparameter
    in the optimizer state when the metric stalls."""

    def __init__(self, cfg: TrainConfig):
        self.patience = cfg.plateau_patience
        self.factor = cfg.plateau_factor
        self.lr = cfg.learning_rate
        self.best = -np.inf
        self.stale = 0

    def update(self, opt_state, metric: Optional[float]):
        """Returns a possibly lr-rewritten opt_state (no-op when disabled)."""
        if self.patience <= 0 or metric is None:
            return opt_state
        if metric > self.best:
            self.best = metric
            self.stale = 0
            return opt_state
        self.stale += 1
        if self.stale <= self.patience:
            return opt_state
        self.stale = 0
        self.lr *= self.factor
        return _rewrite_injected_lr(opt_state, self.lr)


def _rewrite_injected_lr(opt_state, new_lr: float):
    """Rewrite the ``learning_rate`` entry of the (unique) ``inject_hyperparams``
    state inside ``opt_state``, located by structural traversal rather than a
    positional index so optax restructuring its chain/wrapper states cannot
    silently corrupt the wrong leaf. Raises if zero or multiple candidate
    states are found (the unrecognized-structure case must fail loudly)."""
    hits = []

    def rewrite(node):
        hp = getattr(node, "hyperparams", None)
        if (
            isinstance(hp, dict)
            and "learning_rate" in hp
            and hasattr(node, "_replace")
        ):
            hits.append(type(node).__name__)
            new_hp = dict(hp)
            new_hp["learning_rate"] = jnp.asarray(
                new_lr, dtype=jnp.asarray(hp["learning_rate"]).dtype
            )
            # Keep traversing the OTHER fields (inner_state, ...): a nested
            # inject_hyperparams must be counted so the uniqueness guard
            # below fires instead of silently rewriting only the outer one.
            return node._replace(
                hyperparams=new_hp,
                **{
                    f: rewrite(getattr(node, f))
                    for f in node._fields
                    if f != "hyperparams"
                },
            )
        if hasattr(node, "_fields") and hasattr(node, "_replace"):
            # A namedtuple state: recurse into fields (containers are rebuilt;
            # array leaves and param pytrees pass through untouched).
            return node._replace(
                **{f: rewrite(getattr(node, f)) for f in node._fields}
            )
        if isinstance(node, tuple):
            return tuple(rewrite(c) for c in node)
        if isinstance(node, list):
            return [rewrite(c) for c in node]
        return node

    new_state = rewrite(opt_state)
    if len(hits) != 1:
        raise RuntimeError(
            "PlateauScheduler could not locate a unique inject_hyperparams "
            f"state carrying 'learning_rate' in the optimizer state (found "
            f"{len(hits)}: {hits}). The optax state structure is not the one "
            "make_optimizer builds — refusing to guess."
        )
    return new_state


def _log_jsonl(log_dir: Optional[Path], fname: str, record: dict) -> None:
    if log_dir is None:
        return
    if jax.process_index() != 0:  # one writer on multi-host runs
        return
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    with open(log_dir / fname, "a") as f:
        f.write(json.dumps({"timestamp": datetime.now().isoformat(), **record}) + "\n")


def _fused_eval_metrics(
    plan_cache: dict,
    eval_apply: Callable,
    params,
    compiled: CompiledBehaviors,
    news_emb,
    query_emb,
    max_len: int,
    baseline=None,
    alpha=None,
    mesh=None,
) -> dict[str, float]:
    """Epoch eval through ``FlatEvalPlan.metrics``: ONE compiled program
    (tower + cosine + score composition + MIND metrics), fetch = five scalars —
    no per-slot score download. With a ``mesh``, routes through the
    zero-communication sharded plans (``parallel.flat_eval``) instead — the
    whole eval's cross-device traffic is one 5-scalar psum. Plans (index
    grids, metric grids) are built once per compiled set and cached in
    ``plan_cache`` across epochs. Semantically identical to
    score_all_impressions(flat_tokens=True) + compose_final_scores(...).metrics
    (tested, tests/test_device_metrics.py)."""
    from ..eval.device_metrics import DeviceMetricsPlan
    from ..ops.scoring import FlatEvalPlan, _auto_flat_chunk, _probe_out

    plans = plan_cache.get(id(compiled))
    if plans is None:
        slots, cand_rows = history_candidate_slots(compiled)
        table = query_emb if query_emb is not None else news_emb
        probe = _probe_out(eval_apply, params, table)
        baseline_slots = (
            None
            if baseline is None
            else np.asarray(baseline, np.float32)[compiled.imp_rev]
        )
        if mesh is None:
            fplan = FlatEvalPlan(
                compiled.hist_rev,
                compiled.hist_lens,
                compiled.imp_rev[slots],
                cand_rows,
                chunk_tokens=_auto_flat_chunk(int(probe.shape[-1])),
                max_len=max_len,
            )
            mplan = DeviceMetricsPlan(
                compiled.imp_lens,
                compiled.labels_flat,
                hist_slots=slots,
                baseline_slots=baseline_slots,
            )
        else:
            from ..parallel.flat_eval import (
                ShardedFlatEvalPlan,
                ShardedMetricsPlan,
            )

            fplan = ShardedFlatEvalPlan(
                mesh,
                compiled.hist_rev,
                compiled.hist_lens,
                compiled.imp_rev[slots],
                cand_rows,
                chunk_tokens=_auto_flat_chunk(int(probe.shape[-1])),
                max_len=max_len,
            )
            # Trainers require with-history views: impression i == row i.
            mplan = ShardedMetricsPlan(
                fplan,
                compiled.imp_lens,
                compiled.labels_flat,
                hist_slots=slots,
                baseline_slots=baseline_slots,
            )
        plans = (fplan, mplan)
        plan_cache[id(compiled)] = plans
    fplan, mplan = plans
    return fplan.metrics(
        eval_apply, params, news_emb, mplan, query_news_emb=query_emb,
        alpha=alpha,
    )


# ---------------------------------------------------------------------------
# Attention-tower trainer
# ---------------------------------------------------------------------------


class ResumableTrainer:
    """Preemption-safe training-state save/restore shared by every trainer
    (SURVEY.md §5 failure detection: the TPU-native recovery story is
    deterministic sharded steps + restartable state).

    Persists params + optimizer state + epoch count, plus everything else a
    resume needs to continue the ORIGINAL run rather than restart pieces of
    it: the best-checkpoint score (so the first post-resume eval can't
    silently overwrite ``Best_model_*`` with a worse model), the epoch
    history, both RNG streams (so post-resume epochs don't replay epoch-1
    sampling), and — when the trainer has one — the plateau scheduler (or a
    post-restore plateau would rewrite the lr UPWARD from its original
    value). The reference has no equivalent: its trainers restart from bare
    ``Epoch_N.pt`` param dumps (``trainer.py:205-213``)."""

    def save_training_state(self, path: Path) -> None:
        from .checkpoint import save_pytree

        path = Path(path)
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "epochs_done": len(self.history),
            "best_score": float(self.best.best_score),
        }
        plateau = getattr(self, "plateau", None)
        if plateau is not None:
            state["plateau_lr"] = plateau.lr
            state["plateau_best"] = float(plateau.best)
            state["plateau_stale"] = plateau.stale
        if getattr(self, "key", None) is not None:  # dropout stream
            state["key_data"] = np.asarray(jax.random.key_data(self.key))
        save_pytree(path, state)
        # History records + numpy bit-generator state are JSON-shaped (the
        # PCG64 state holds 128-bit ints no array format carries) -> sidecar.
        meta = {
            "history": self.history,
            "rng_state": self.rng.bit_generator.state,
        }
        if jax.process_index() == 0:  # one writer for the shared sidecar
            # Write-then-rename: a concurrent reader never sees a half file.
            tmp = f"{path}_meta.json.tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, f"{path}_meta.json")
        if getattr(self, "_multiprocess", False):
            # Barrier so that when ANY process returns from save, the full
            # checkpoint (Orbax dir + meta sidecar) is visible to all — a
            # same-run save -> restore sequence needs no caller-side sync.
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"nrtpu_save_{path.name}")

    def restore_training_state(self, path: Path) -> int:
        """Restore params/opt_state/scheduler/best/rng; returns completed epoch
        count."""
        from .checkpoint import load_pytree

        path = Path(path)
        # Host-array `like`: restores land as plain host arrays (the jitted
        # step re-places them), which also works when self.params are global
        # multi-host arrays (they are re-placed below).
        like = {
            "params": jax.tree.map(np.asarray, self.params),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "epochs_done": 0,
            "best_score": float(self.best.best_score),
        }
        plateau = getattr(self, "plateau", None)
        if plateau is not None:
            like["plateau_lr"] = plateau.lr
            like["plateau_best"] = float(plateau.best)
            like["plateau_stale"] = 0
        if getattr(self, "key", None) is not None:
            like["key_data"] = np.asarray(jax.random.key_data(self.key))
        state = load_pytree(path, like=like)
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        if getattr(self, "_multiprocess", False):
            self.params = self._ensure_global(self.params)
            self.opt_state = self._ensure_global(self.opt_state)
        if plateau is not None:
            plateau.lr = float(state["plateau_lr"])
            plateau.best = float(state["plateau_best"])
            plateau.stale = int(state["plateau_stale"])
        self.best.best_score = float(state["best_score"])
        if "key_data" in state:
            self.key = jax.random.wrap_key_data(jnp.asarray(state["key_data"]))
        meta_path = Path(f"{path}_meta.json")
        if getattr(self, "_multiprocess", False) and not meta_path.exists():
            raise FileNotFoundError(
                f"{meta_path} missing: multi-process restores need the shared "
                "rng/history sidecar, or the processes' sampling streams "
                "would silently diverge"
            )
        if meta_path.exists():
            with open(meta_path) as f:
                meta = json.load(f)
            self.history = list(meta["history"])
            self.rng.bit_generator.state = meta["rng_state"]
        return int(state["epochs_done"])

    def _ensure_global(self, tree):
        """Re-place any process-local leaves of a mostly-global tree as
        replicated global arrays (multi-process meshes only)."""
        from ..parallel.sharding import put_global

        mesh_devs = frozenset(self.mesh.devices.flat)
        return jax.tree.map(
            lambda l: l
            if isinstance(l, jax.Array) and frozenset(l.devices()) == mesh_devs
            else put_global(np.asarray(l), self._rep_sharding),
            tree,
        )


class TowerTrainer(ResumableTrainer):
    """Trains a user-history tower with pairwise margin ranking over sampled
    impression pos/neg pairs (reference ``AttentionTrainer``,
    ``trainer.py:439-713``).

    ``compiled_train`` / ``compiled_val`` must be with-history views
    (``CompiledBehaviors.with_history_view``).
    """

    def __init__(
        self,
        tower_apply: Callable,  # (params, [B,L,D], [B,L], deterministic, rngs)->[B,D]
        params,
        compiled_train: CompiledBehaviors,
        news_emb_train: jnp.ndarray,
        compiled_val: Optional[CompiledBehaviors] = None,
        news_emb_val: Optional[jnp.ndarray] = None,
        cfg: TrainConfig = TrainConfig(),
        query_news_emb_train: Optional[jnp.ndarray] = None,
        query_news_emb_val: Optional[jnp.ndarray] = None,
        log_dir: Optional[Path] = None,
        ckpt_dir: Optional[Path] = None,
        exp_name: str = "",
        buckets: tuple[int, ...] = HISTORY_BUCKETS,
        mesh=None,  # jax.sharding.Mesh: run train steps + eval data-parallel
        flat_eval: bool = False,  # token-local towers only (supports_flat_scoring)
        flat_train: bool = False,  # flat-token train step (token-local towers)
        device_metrics: bool = False,  # fused eval->metrics (flat_eval only)
    ):
        assert len(compiled_train.hist_lens) == compiled_train.num_rows, (
            "TowerTrainer needs a with-history view (every row must have history)"
        )
        self.tower_apply = tower_apply
        self.params = params
        self.cfg = cfg
        self.ct = compiled_train
        self.cv = compiled_val
        self.news_emb_train = news_emb_train
        self.news_emb_val = news_emb_val
        self.query_train = (
            query_news_emb_train if query_news_emb_train is not None else news_emb_train
        )
        self.query_val = (
            query_news_emb_val
            if query_news_emb_val is not None
            else (news_emb_val if news_emb_val is not None else None)
        )
        self.log_dir = log_dir
        self.exp_name = exp_name
        self.buckets = buckets
        self.rng = np.random.default_rng(cfg.seed)
        self.key = jax.random.key(cfg.seed)
        self.optimizer = make_optimizer(cfg)
        self.opt_state = jax.jit(self.optimizer.init)(params)
        self.best = BestTracker(ckpt_dir, exp_name)
        self.plateau = PlateauScheduler(cfg)
        self.history: list[dict] = []

        self._hist_offsets = lengths_to_offsets(compiled_train.hist_lens)
        # Stable callable identity so the bucketed-eval jit cache persists
        # across evaluate() calls.
        self._eval_apply = lambda p, e, m: tower_apply(p, e, m)

        self.mesh = mesh
        self.flat_eval = flat_eval
        self.device_metrics = device_metrics
        self._fused_plans: dict = {}
        if device_metrics:
            assert flat_eval, (
                "device_metrics rides the fused flat eval (FlatEvalPlan."
                "metrics / ShardedFlatEvalPlan.metrics); token-local towers "
                "only"
            )
        # Multi-process (jax.distributed) mesh: feed every step/eval input as
        # a global array (each host places its addressable shards) and fetch
        # only replicated scalars — the multi-host pod training mode.
        self._multiprocess = mesh is not None and any(
            d.process_index != jax.process_index() for d in mesh.devices.flat
        )
        self.flat_train = flat_train
        if mesh is not None:
            assert cfg.batch_size % mesh.shape["data"] == 0, (
                f"batch_size {cfg.batch_size} must divide over the data axis "
                f"({mesh.shape['data']})"
            )
            if self._multiprocess:
                from ..parallel.sharding import (
                    flat_tower_step_shardings,
                    put_global,
                    replicated,
                    tower_step_shardings,
                )

                self._put_global = put_global
                assert device_metrics, (
                    "multi-process meshes require device_metrics=True: every "
                    "other eval path fetches per-slot scores, which are not "
                    "addressable across processes (the fused metrics eval "
                    "fetches five replicated scalars)"
                )
                rep = replicated(mesh)
                self.params = jax.tree.map(
                    lambda l: put_global(l, rep), self.params
                )
                self.opt_state = jax.tree.map(
                    lambda l: put_global(l, rep), self.opt_state
                )
                self._rep_sharding = rep
                # Batch-arg shardings = the step's in_shardings after the
                # (params, opt_state, tables x2) prefix, before the key.
                shardings = (
                    flat_tower_step_shardings(
                        mesh, infonce=cfg.loss == "infonce"
                    )
                    if flat_train
                    else tower_step_shardings(mesh)
                )
                self._batch_shardings = shardings[0][4:-1]
            self._place_tables(mesh)
        if flat_train:
            if cfg.loss == "infonce":
                from .step import make_tower_infonce_step_flat

                raw_step = make_tower_infonce_step_flat(
                    tower_apply, self.optimizer, cfg.num_neg_per_pos
                )
            else:
                from .step import make_tower_train_step_flat

                raw_step = make_tower_train_step_flat(
                    tower_apply, self.optimizer, cfg.margin
                )
            if mesh is not None:
                from ..parallel.sharding import make_sharded_flat_tower_train_step

                self._train_step = make_sharded_flat_tower_train_step(
                    raw_step, mesh, infonce=cfg.loss == "infonce"
                )
            else:
                self._train_step = jax.jit(raw_step, donate_argnums=(0, 1))
            return
        if cfg.loss == "infonce":
            from .step import make_tower_infonce_step

            raw_step = make_tower_infonce_step(
                tower_apply, self.optimizer, cfg.num_neg_per_pos
            )
        else:
            raw_step = make_tower_train_step(tower_apply, self.optimizer, cfg.margin)
        if mesh is not None:
            from ..parallel.sharding import make_sharded_tower_train_step

            self._train_step = make_sharded_tower_train_step(raw_step, mesh)
        else:
            self._train_step = jax.jit(raw_step, donate_argnums=(0, 1))

    def _place_tables(self, mesh) -> None:
        """Row-shard the news/query embedding tables over the mesh's model axis
        once at construction (the sharded step re-uses the placement every
        step; eval programs re-shard to replicated on the fly)."""
        from ..parallel.sharding import shard_news_table

        same_train = self.query_train is self.news_emb_train
        self.news_emb_train = shard_news_table(mesh, self.news_emb_train)
        self.query_train = (
            self.news_emb_train
            if same_train
            else shard_news_table(mesh, self.query_train)
        )
        if self.news_emb_val is not None:
            same_val = self.query_val is self.news_emb_val
            self.news_emb_val = shard_news_table(mesh, self.news_emb_val)
            self.query_val = (
                self.news_emb_val
                if same_val
                else shard_news_table(mesh, self.query_val)
            )

    # ------------------------------------------------------------------
    # Host input pipeline
    # ------------------------------------------------------------------

    def _epoch_batches(self) -> Iterator[tuple]:
        """Sample pairs, batch-aligned shuffle, dedup histories per batch, pad to
        static (batch_size, bucket) shapes. With ``cfg.loss == "infonce"`` the
        negative column becomes [B, K] with -1 padding."""
        cfg = self.cfg
        # Shared epoch prologue (sampling + batch-aligned permutation) — one
        # implementation for every trainer so the flat/padded equal-trajectory
        # guarantee can't silently diverge.
        pairs, negs = sample_epoch_pairs(
            self.rng,
            self.ct.imp_rev,
            self.ct.imp_lens,
            self.ct.labels_flat,
            loss=cfg.loss,
            num_neg_per_pos=cfg.num_neg_per_pos,
            max_neg_ratio=cfg.max_neg_ratio,
            max_pos_ratio=cfg.max_pos_ratio,
            batch_size=cfg.batch_size,
        )
        B = cfg.batch_size
        total = pairs.shape[1]
        offsets = self._hist_offsets
        for start in range(0, total, B):
            stop = min(start + B, total)
            pos = pairs[0, start:stop]
            rows = pairs[-1, start:stop]
            uniq_rows, rev = np.unique(rows, return_inverse=True)
            max_len = int(self.ct.hist_lens[uniq_rows].max())
            L = bucket_for(max_len, self.buckets)
            # End-aligned gather (most recent clicks when capping), vectorized.
            hist_idx, hist_mask = gather_end_aligned(
                self.ct.hist_rev,
                offsets[uniq_rows + 1],
                self.ct.hist_lens[uniq_rows],
                L,
                out_rows=B,
            )
            pad = B - (stop - start)
            neg_padded = neg_batch_column(pairs, negs, start, stop, pad)
            yield (
                hist_idx,
                hist_mask,
                np.pad(rev.astype(np.int32), (0, pad)),
                np.pad(pos.astype(np.int32), (0, pad)),
                neg_padded,
                np.pad(np.ones(stop - start, np.float32), (0, pad)),
            )

    def _epoch_batches_flat(self) -> Iterator[tuple]:
        """``_epoch_batches`` for the flat-token step: instead of a padded
        [B, bucket] history block, each batch carries the deduped rows' flat
        token stream (end-aligned cap at the largest bucket) padded to the next
        power of two — ~40% fewer tower FLOPs at MIND history statistics."""
        cfg = self.cfg
        cap = self.buckets[-1]
        offsets = self._hist_offsets
        pairs, negs = sample_epoch_pairs(
            self.rng,
            self.ct.imp_rev,
            self.ct.imp_lens,
            self.ct.labels_flat,
            loss=cfg.loss,
            num_neg_per_pos=cfg.num_neg_per_pos,
            max_neg_ratio=cfg.max_neg_ratio,
            max_pos_ratio=cfg.max_pos_ratio,
            batch_size=cfg.batch_size,
        )
        B = cfg.batch_size
        for start in range(0, pairs.shape[1], B):
            stop = min(start + B, pairs.shape[1])
            pos = pairs[0, start:stop]
            rows = pairs[-1, start:stop]
            uniq_rows, rev = np.unique(rows, return_inverse=True)
            lens = np.minimum(self.ct.hist_lens[uniq_rows], cap).astype(np.int64)
            ends = offsets[uniq_rows + 1]
            keep_off = lengths_to_offsets(lens)
            total = int(keep_off[-1])
            sel = np.repeat(ends - lens, lens) + (
                np.arange(total) - np.repeat(keep_off[:-1], lens)
            )
            T = max(1024, 1 << int(np.ceil(np.log2(max(total, 1)))))
            tok_idx = np.zeros(T, np.int32)
            tok_idx[:total] = self.ct.hist_rev[sel]
            tok_rows = np.full(T, B, np.int32)  # out-of-range -> dropped
            tok_rows[:total] = np.repeat(
                np.arange(len(uniq_rows), dtype=np.int32), lens
            )
            lens_arr = np.zeros(B, np.float32)
            lens_arr[: len(uniq_rows)] = lens
            pad = B - (stop - start)
            neg_padded = neg_batch_column(pairs, negs, start, stop, pad)
            yield (
                tok_idx,
                tok_rows,
                lens_arr,
                np.pad(rev.astype(np.int32), (0, pad)),
                np.pad(pos.astype(np.int32), (0, pad)),
                neg_padded,
                np.pad(np.ones(stop - start, np.float32), (0, pad)),
            )

    def train_one_epoch(self) -> float:
        from ..data.prefetch import prefetch

        sync = max(1, self.cfg.loss_sync_every)
        batches = (
            self._epoch_batches_flat() if self.flat_train else self._epoch_batches()
        )
        losses, counts = [], []
        for batch in prefetch(batches):
            self.key, sub = jax.random.split(self.key)
            if self._multiprocess:
                # Same host value on every process (identical rng streams);
                # each process commits its addressable shards. The dropout key
                # travels as raw uint32 key data (typed key arrays cannot be
                # placed via make_array_from_callback).
                args = tuple(
                    self._put_global(np.asarray(b), s)
                    for b, s in zip(batch, self._batch_shardings)
                )
                sub = self._put_global(
                    np.asarray(jax.random.key_data(sub)), self._rep_sharding
                )
            else:
                args = tuple(map(jnp.asarray, batch))
            self.params, self.opt_state, loss = self._train_step(
                self.params,
                self.opt_state,
                self.news_emb_train,
                self.query_train,
                *args,
                sub,
            )
            losses.append(loss)
            if len(losses) % sync == 0:
                # Bound the async dispatch queue (unbounded queues stall on
                # tunneled devices); cfg.loss_sync_every=1 syncs every step.
                losses[-1] = float(losses[-1])
            counts.append(float(batch[-1].sum()))
        losses = [float(x) for x in losses]
        # Weighted epoch loss (reference trainer.py:635).
        return float(np.dot(losses, counts) / np.sum(counts))

    # ------------------------------------------------------------------
    # Evaluation
    # ------------------------------------------------------------------

    def _fused_metrics(
        self, compiled, news_emb, query_emb, baseline=None, alpha=None
    ) -> dict[str, float]:
        return _fused_eval_metrics(
            self._fused_plans,
            self._eval_apply,
            self.params,
            compiled,
            news_emb,
            query_emb,
            max_len=self.buckets[-1],  # match the padded/flat eval cap
            baseline=baseline,
            alpha=alpha,
            mesh=self.mesh,
        )

    def _eval_split(
        self, compiled: CompiledBehaviors, news_emb, query_emb
    ) -> dict[str, float]:
        if self.device_metrics:
            return self._fused_metrics(compiled, news_emb, query_emb)
        slots, cand_rows = history_candidate_slots(compiled)
        scores = score_all_impressions(
            self._eval_apply,
            self.params,
            news_emb,
            compiled.hist_rev,
            compiled.hist_lens,
            compiled.imp_rev[slots],
            cand_rows,
            query_news_emb=query_emb,
            batch_size=self.cfg.batch_size,
            buckets=self.buckets,
            mesh=self.mesh,
            flat_tokens=self.flat_eval,
            # Cap at the largest bucket so flat eval sees the SAME truncated
            # histories as the padded eval and the (flat or padded) train
            # step — otherwise >bucket rows silently change eval semantics.
            flat_max_len=self.buckets[-1],
        )
        return compose_final_scores(compiled, history_scores=scores).metrics

    def evaluate(self) -> tuple[dict, Optional[dict]]:
        train_scores = self._eval_split(
            self.ct, self.news_emb_train, self.query_train
        )
        val_scores = (
            self._eval_split(self.cv, self.news_emb_val, self.query_val)
            if self.cv is not None
            else None
        )
        return train_scores, val_scores

    def train(self, num_epochs: Optional[int] = None) -> list[dict]:
        num_epochs = num_epochs or self.cfg.num_epochs
        # Continue numbering after a restore_training_state resume so Epoch_N
        # checkpoints and JSONL records extend the original run.
        done = len(self.history)
        for epoch in range(done + 1, done + num_epochs + 1):
            loss = self.train_one_epoch()
            train_scores, val_scores = self.evaluate()
            record = {
                "exp_name": self.exp_name,
                "epoch": epoch,
                "loss": loss,
                "train": train_scores,
                "val": val_scores,
            }
            self.history.append(record)
            _log_jsonl(
                self.log_dir,
                "train_final_history_score.jsonl",
                {"exp_name": self.exp_name, "epoch": epoch, "scores": train_scores, "loss": loss},
            )
            if val_scores is not None:
                _log_jsonl(
                    self.log_dir,
                    "eval_final_history_score.jsonl",
                    {"exp_name": self.exp_name, "epoch": epoch, "scores": val_scores},
                )
                self.best.update(epoch, val_scores, self.params)
                from .checkpoint import mean_metric

                self.opt_state = self.plateau.update(
                    self.opt_state, mean_metric(val_scores)
                )
                if self._multiprocess:
                    # A plateau lr rewrite creates a process-local scalar leaf
                    # inside the otherwise-global opt_state; re-place it.
                    self.opt_state = self._ensure_global(self.opt_state)
        return self.history


# ---------------------------------------------------------------------------
# Joint trainers: tower + blend (alpha) and tower + reducer
# ---------------------------------------------------------------------------


class JointTowerTrainer(TowerTrainer):
    """Joint training of the tower with a WeightedSum blender and/or a
    ReducingModel projector (reference ``AttentionWeightTrainer``
    ``trainer.py:217-436`` and ``AttentionReduceTrainer`` ``trainer.py:716-949``).

    ``params`` becomes {"tower": ..., ["blend": ...], ["reduce": ...]} under a
    single optimizer (one AdamW over all parameter groups).

    Evaluation semantics: with a reducer, BOTH the history table and the
    candidate table are reduced (the reference inconsistently skips the
    reduction of a provided query table at eval, ``data_model_helper.py:150-158``
    — here training and eval see the same transform). With a blender, history
    slots score ``sigmoid(alpha)*cos + (1-sigmoid(alpha))*baseline`` over the
    classification baseline (reference ``get_cos_sim_final_score``).
    """

    def __init__(
        self,
        tower_apply: Callable,
        tower_params,
        compiled_train: CompiledBehaviors,
        news_emb_train: jnp.ndarray,
        blend_apply: Optional[Callable] = None,
        blend_params=None,
        reduce_apply: Optional[Callable] = None,
        reduce_params=None,
        baseline_train: Optional[np.ndarray] = None,  # per-unique-news scores
        baseline_val: Optional[np.ndarray] = None,
        **kwargs,
    ):
        cfg = kwargs.get("cfg", TrainConfig())
        assert cfg.loss != "infonce", (
            "JointTowerTrainer supports margin-ranking only (the reference's "
            "joint trainers are margin-only too); use TowerTrainer for InfoNCE"
        )
        assert not kwargs.get("flat_train"), (
            "JointTowerTrainer runs the padded joint step (blend/reduce "
            "consume per-pair baseline columns); flat_train applies to "
            "TowerTrainer only"
        )
        joint_params = {"tower": tower_params}
        if blend_apply is not None:
            assert blend_params is not None and baseline_train is not None
            joint_params["blend"] = blend_params
        if reduce_apply is not None:
            assert reduce_params is not None
            joint_params["reduce"] = reduce_params
        self.blend_apply = blend_apply
        self.reduce_apply = reduce_apply
        self.baseline_train = baseline_train
        self.baseline_val = baseline_val
        super().__init__(
            tower_apply, joint_params, compiled_train, news_emb_train, **kwargs
        )
        from .step import make_joint_train_step

        raw_step = make_joint_train_step(
            tower_apply,
            self.optimizer,
            self.cfg.margin,
            reduce_apply=reduce_apply,
            blend_apply=blend_apply,
        )
        if self.mesh is not None:
            from ..parallel.sharding import make_sharded_joint_train_step

            self._train_step = make_sharded_joint_train_step(raw_step, self.mesh)
        else:
            self._train_step = jax.jit(raw_step, donate_argnums=(0, 1))
        self._eval_apply = lambda p, e, m: tower_apply(p["tower"], e, m)
        if reduce_apply is not None:
            self._reduce_table = jax.jit(lambda p, t: reduce_apply(p, t))

    def train_one_epoch(self) -> float:
        losses, counts = [], []
        baseline = (
            self.baseline_train
            if self.baseline_train is not None
            else np.zeros(self.ct.num_news, np.float32)
        )
        from ..data.prefetch import prefetch

        sync = max(1, self.cfg.loss_sync_every)
        for batch in prefetch(self._epoch_batches()):
            hist_idx, hist_mask, rev, pos, neg, pair_mask = batch
            self.key, sub = jax.random.split(self.key)
            extras = (
                baseline[pos].astype(np.float32),
                baseline[neg].astype(np.float32),
            )
            if self._multiprocess:
                # Same placement discipline as TowerTrainer.train_one_epoch;
                # the two baseline columns shard over the pair (data) axis.
                dat = self._batch_shardings[2]
                args = tuple(
                    self._put_global(np.asarray(b), s)
                    for b, s in zip(batch, self._batch_shardings)
                ) + tuple(self._put_global(e, dat) for e in extras)
                sub = self._put_global(
                    np.asarray(jax.random.key_data(sub)), self._rep_sharding
                )
            else:
                args = tuple(map(jnp.asarray, batch + extras))
            self.params, self.opt_state, loss = self._train_step(
                self.params,
                self.opt_state,
                self.news_emb_train,
                self.query_train,
                *args,
                sub,
            )
            losses.append(loss)
            if len(losses) % sync == 0:  # queue bound (see TowerTrainer)
                losses[-1] = float(losses[-1])
            counts.append(float(pair_mask.sum()))
        losses = [float(x) for x in losses]
        return float(np.dot(losses, counts) / np.sum(counts))

    def _alpha(self) -> Optional[float]:
        if self.blend_apply is None:
            return None
        alpha_leaf = jax.tree.leaves(self.params["blend"])[0]
        return float(jax.nn.sigmoid(jnp.asarray(alpha_leaf)))

    def _eval_split(self, compiled, news_emb, query_emb, baseline=None):
        if self.reduce_apply is not None:
            news_emb = self._reduce_table(self.params["reduce"], news_emb)
            query_emb = (
                self._reduce_table(self.params["reduce"], query_emb)
                if query_emb is not None
                else None
            )
        if self.device_metrics:
            # alpha is a TRAINED blend weight — passed traced (no recompile).
            return self._fused_metrics(
                compiled, news_emb, query_emb,
                baseline=baseline, alpha=self._alpha(),
            )
        slots, cand_rows = history_candidate_slots(compiled)
        scores = score_all_impressions(
            self._eval_apply,
            self.params,
            news_emb,
            compiled.hist_rev,
            compiled.hist_lens,
            compiled.imp_rev[slots],
            cand_rows,
            query_news_emb=query_emb,
            batch_size=self.cfg.batch_size,
            buckets=self.buckets,
            mesh=self.mesh,
            flat_tokens=self.flat_eval,
            flat_max_len=self.buckets[-1],  # see TowerTrainer._eval_split
        )
        return compose_final_scores(
            compiled,
            history_scores=scores,
            baseline_scores=baseline,
            alpha=self._alpha(),
        ).metrics

    def evaluate(self):
        train_scores = self._eval_split(
            self.ct, self.news_emb_train, self.query_train, self.baseline_train
        )
        val_scores = (
            self._eval_split(
                self.cv, self.news_emb_val, self.query_val, self.baseline_val
            )
            if self.cv is not None
            else None
        )
        return train_scores, val_scores


# ---------------------------------------------------------------------------
# End-to-end two-level trainer (token states -> news encoder -> tower)
# ---------------------------------------------------------------------------


class EndToEndTrainer(ResumableTrainer):
    """Backprops through a learned token-attention news encoder AND the history
    tower from frozen per-token states (reference ``AttentionAttentionTrainer``,
    ``trainer.py:952-1206``): NaN-loss abort, per-epoch checkpoints;
    ``materialize_news_embeddings`` covers the offline ``apply_token_attn``
    pass (``data_model_helper.py:374-413``).

    Exceeds the reference's loss-only epochs: with ``eval_each_epoch=True`` the
    learned news embeddings are materialized per epoch and full MIND metrics
    computed (plus best-checkpoint gating when ``compiled_val``/
    ``val_token_store`` are given) — cheap now that materialization is one
    scanned device program."""

    TOKEN_BUCKETS = (64, 128, 256, 512)
    UNIQUE_BUCKETS = (128, 256, 512, 1024, 2048, 4096)

    def __init__(
        self,
        token_encoder_apply: Callable,
        token_encoder_params,
        tower_apply: Callable,
        tower_params,
        compiled_train: CompiledBehaviors,
        token_store,  # ops.encode.TokenStore
        cfg: TrainConfig = TrainConfig(),
        log_dir: Optional[Path] = None,
        ckpt_dir: Optional[Path] = None,
        exp_name: str = "",
        buckets: tuple[int, ...] = HISTORY_BUCKETS,
        max_token_len: int = 512,
        remote_sync: Optional[Callable[[Path], None]] = None,
        compiled_val: Optional[CompiledBehaviors] = None,
        val_token_store=None,
        eval_each_epoch: bool = False,
        mesh=None,  # jax.sharding.Mesh: shard token states + batch over `data`
        flat_eval: bool = False,  # token-local towers only
        device_metrics: bool = False,  # fused eval->metrics (flat_eval only)
        device_store: Optional[bool] = None,  # HBM-resident token store (auto)
        shard_store: Optional[bool] = None,  # row-shard it over the mesh (auto)
    ):
        assert len(compiled_train.hist_lens) == compiled_train.num_rows
        assert (compiled_val is None) == (val_token_store is None), (
            "compiled_val and val_token_store come together (val impressions "
            "score against the val corpus's learned embeddings)"
        )
        # The reference's e2e trainer is margin-only (trainer.py:985); this
        # repo measured InfoNCE better on the tower families (BASELINE.md
        # config[1]) and extends the option here — cfg.loss selects it on
        # both the streaming and device-store steps (VERDICT r4 #6).
        # remote_sync generalizes the reference's hardcoded Azure Blob upload of
        # epoch checkpoints (trainer.py:1007-1015,1172-1197): any callable
        # receiving the local checkpoint path (rsync, gcs upload, ...).
        self.remote_sync = remote_sync
        self.params = {"token_encoder": token_encoder_params, "tower": tower_params}
        self.token_encoder_apply = token_encoder_apply
        self.tower_apply = tower_apply
        self.ct = compiled_train
        self.store = token_store
        self.cv = compiled_val
        self.store_val = val_token_store
        self.eval_each_epoch = eval_each_epoch
        self.flat_eval = flat_eval
        self.device_metrics = device_metrics
        self._fused_plans: dict = {}
        if device_metrics:
            assert flat_eval, "device_metrics rides the fused flat eval"
        self._eval_tower_apply = lambda p, e, m: tower_apply(p["tower"], e, m)
        self.cfg = cfg
        self.log_dir = log_dir
        self.exp_name = exp_name
        self.buckets = buckets
        self.max_token_len = max_token_len
        self.rng = np.random.default_rng(cfg.seed)
        self.key = jax.random.key(cfg.seed)
        self.optimizer = make_optimizer(cfg)
        self.opt_state = jax.jit(self.optimizer.init)(self.params)
        self.best = BestTracker(ckpt_dir, exp_name)
        self.history: list[dict] = []
        self._hist_offsets = lengths_to_offsets(compiled_train.hist_lens)
        self._mat_mesh_cache: dict = {}  # mesh-materialize program reuse

        self.mesh = mesh
        self._multiprocess = mesh is not None and any(
            d.process_index != jax.process_index() for d in mesh.devices.flat
        )
        # Device-resident token store (auto when it fits HBM): the flat
        # [total_tokens, D] states upload ONCE and each step gathers its
        # [M, T, D] block on device — per-step host->device traffic drops
        # from the token block (hundreds of MBs at MIND scale) to index
        # grids (see make_end2end_train_step_gathered; benchmarks/
        # e2e_bench.py: 18.4x the streaming step on a tunneled v5e host).
        # On meshes a store too big for ONE chip can still live ROW-SHARDED
        # across the fleet's aggregate HBM (shard_token_store_states); the
        # gather then rides ICI collectives instead of falling back to the
        # ~18x-slower host streaming path — exactly the MIND-large regime
        # (~10.2GB title-only: exceeds a 16GB chip's budget, ~1.3GB/chip on
        # 8 devices).
        from ..utils.memory import fits_device_token_store

        store_geom = (
            int(token_store.offsets[-1]),
            int(token_store.states.shape[1]),
            int(token_store.states.dtype.itemsize),
        )
        fits_one_chip = fits_device_token_store(*store_geom)
        if device_store is None:
            device_store = fits_one_chip or (
                mesh is not None
                and fits_device_token_store(
                    *store_geom, num_shards=mesh.devices.size
                )
            )
        if shard_store is None:
            # Replicated wins when it fits (zero collectives in the gather);
            # shard only when one chip's HBM cannot hold the store.
            shard_store = bool(device_store) and mesh is not None and not fits_one_chip
        assert not (shard_store and mesh is None), (
            "shard_store requires a mesh (the store shards over its devices)"
        )
        assert not (shard_store and not device_store), (
            "shard_store=True requires the device-resident store "
            "(device_store must not be disabled)"
        )
        self.device_store = bool(device_store)
        self.store_sharded = bool(shard_store) and self.device_store
        self._dev_states = None
        infonce = cfg.loss == "infonce"
        if self.device_store:
            if infonce:
                from .step import make_end2end_infonce_step_gathered

                raw_step = make_end2end_infonce_step_gathered(
                    token_encoder_apply, tower_apply, self.optimizer,
                    cfg.num_neg_per_pos,
                )
            else:
                from .step import make_end2end_train_step_gathered

                raw_step = make_end2end_train_step_gathered(
                    token_encoder_apply, tower_apply, self.optimizer, cfg.margin
                )
            if mesh is not None:
                assert cfg.batch_size % mesh.shape["data"] == 0
                from ..parallel.sharding import (
                    e2e_gathered_step_shardings,
                    make_sharded_e2e_train_step_gathered,
                    put_global,
                    replicated,
                    shard_token_store_states,
                )

                rep = replicated(mesh)
                if self._multiprocess:
                    self._put_global = put_global
                    assert device_metrics, (
                        "multi-process meshes require device_metrics=True "
                        "(see the streaming-path branch below)"
                    )
                    self.params = jax.tree.map(
                        lambda l: put_global(l, rep), self.params
                    )
                    self.opt_state = jax.tree.map(
                        lambda l: put_global(l, rep), self.opt_state
                    )
                    self._rep_sharding = rep
                    self._batch_shardings = e2e_gathered_step_shardings(
                        mesh, infonce=infonce
                    )[0][3:-1]
                # Commit the store with its step sharding BEFORE the first
                # call: explicit in_shardings do not reshard committed
                # arrays. Sharded: each device holds total/n rows
                # (aggregate-HBM stores); replicated: one full copy per
                # device, zero gather collectives. Both placements are one
                # upload for the whole run (multi-process included:
                # put_global feeds each process's addressable shards).
                if self.store_sharded:
                    self._dev_states = shard_token_store_states(
                        mesh, token_store.states
                    )
                elif self._multiprocess:
                    self._dev_states = put_global(
                        np.asarray(token_store.states), rep
                    )
                else:
                    self._dev_states = jax.device_put(
                        jnp.asarray(token_store.states), rep
                    )
                self._train_step = make_sharded_e2e_train_step_gathered(
                    raw_step, mesh, sharded_store=self.store_sharded,
                    infonce=infonce,
                )
            else:
                self._dev_states = jnp.asarray(token_store.states)
                self._train_step = jax.jit(raw_step, donate_argnums=(0, 1))
            return

        if infonce:
            from .step import make_end2end_infonce_step

            raw_step = make_end2end_infonce_step(
                token_encoder_apply, tower_apply, self.optimizer,
                cfg.num_neg_per_pos,
            )
        else:
            from .step import make_end2end_train_step

            raw_step = make_end2end_train_step(
                token_encoder_apply, tower_apply, self.optimizer, cfg.margin
            )
        if mesh is not None:
            assert cfg.batch_size % mesh.shape["data"] == 0
            if self._multiprocess:
                from ..parallel.sharding import (
                    e2e_step_shardings,
                    put_global,
                    replicated,
                )

                self._put_global = put_global
                assert device_metrics, (
                    "multi-process meshes require device_metrics=True: the "
                    "materialize->eval path otherwise fetches per-slot "
                    "scores, which are not addressable across processes "
                    "(the fused metrics eval fetches five replicated "
                    "scalars; news embeddings are materialized identically "
                    "on every process from the shared token store)"
                )
                rep = replicated(mesh)
                self.params = jax.tree.map(
                    lambda l: put_global(l, rep), self.params
                )
                self.opt_state = jax.tree.map(
                    lambda l: put_global(l, rep), self.opt_state
                )
                self._rep_sharding = rep
                self._batch_shardings = e2e_step_shardings(
                    mesh, infonce=infonce
                )[0][2:-1]
            from ..parallel.sharding import make_sharded_e2e_train_step

            self._train_step = make_sharded_e2e_train_step(
                raw_step, mesh, infonce=infonce
            )
        else:
            self._train_step = jax.jit(raw_step, donate_argnums=(0, 1))

    def _epoch_batches(self) -> Iterator[tuple]:
        cfg = self.cfg
        pairs, negs = sample_epoch_pairs(
            self.rng, self.ct.imp_rev, self.ct.imp_lens, self.ct.labels_flat,
            loss=cfg.loss, num_neg_per_pos=cfg.num_neg_per_pos,
            max_neg_ratio=cfg.max_neg_ratio, max_pos_ratio=cfg.max_pos_ratio,
            batch_size=cfg.batch_size,
        )
        B = cfg.batch_size
        offsets = self._hist_offsets
        for start in range(0, pairs.shape[1], B):
            stop = min(start + B, pairs.shape[1])
            pos = pairs[0, start:stop]
            rows = pairs[-1, start:stop]
            if negs is None:
                neg = pairs[1, start:stop]  # [b] margin negative
                neg_union = neg
            else:
                neg = negs[:, start:stop].T  # [b, K] infonce, -1 pad
                neg_union = neg[neg >= 0]
            uniq_rows, rev = np.unique(rows, return_inverse=True)
            # Union of news needed by this batch (histories + candidates),
            # reference collate data_utils.py:893-915.
            hist_slices = [
                self.ct.hist_rev[offsets[r] : offsets[r + 1]] for r in uniq_rows
            ]
            all_news = np.concatenate(hist_slices + [pos, neg_union])
            uniq_news, inv = np.unique(all_news, return_inverse=True)
            # Open-ended: a batch's unique-news union must never be truncated.
            M = bucket_for_open(len(uniq_news), self.UNIQUE_BUCKETS)
            if self.device_store:
                # Index grids only — the [M, T, D] block is gathered inside
                # the jitted step from the HBM-resident flat store.
                lens = np.minimum(
                    self.store.offsets[uniq_news + 1]
                    - self.store.offsets[uniq_news],
                    self.max_token_len,
                )
                T = bucket_for(int(lens.max()), self.TOKEN_BUCKETS)
                tok_states, tok_mask = self.store.padded_index_batch(
                    uniq_news, T, out_rows=M, max_len=self.max_token_len
                )
            else:
                tok_states, tok_mask = self.store.gather_padded(
                    uniq_news, max_len=self.max_token_len
                )
                T = bucket_for(tok_states.shape[1], self.TOKEN_BUCKETS)
                tok_states = np.pad(
                    tok_states[:, :T],
                    (
                        (0, M - len(uniq_news)),
                        (0, max(0, T - tok_states.shape[1])),
                        (0, 0),
                    ),
                )
                tok_mask = np.pad(
                    tok_mask[:, :T],
                    ((0, M - len(uniq_news)), (0, max(0, T - tok_mask.shape[1]))),
                )
                tok_mask[len(uniq_news):, 0] = 1.0  # keep pad rows non-degenerate
            # Split relative indices back out.
            hist_lens_b = np.array([len(h) for h in hist_slices], dtype=np.int64)
            cuts = np.cumsum(hist_lens_b)
            total_hist = int(cuts[-1]) if len(cuts) else 0
            pos_rel = inv[total_hist : total_hist + len(pos)]
            if negs is None:
                neg_rel = inv[total_hist + len(pos) :]  # [b]
            else:
                # [b, K]: valid ids are all in uniq_news (unioned above), so
                # sorted-search recovers their rows; -1 padding survives.
                neg_rel = np.where(
                    neg >= 0,
                    np.searchsorted(uniq_news, np.maximum(neg, 0)),
                    -1,
                )
            max_hist = int(hist_lens_b.max()) if len(hist_lens_b) else 1
            L = bucket_for(max_hist, self.buckets)
            # End-aligned gather (most recent clicks when capping), vectorized.
            hist_idx, hist_mask = gather_end_aligned(
                inv[:total_hist], cuts, hist_lens_b, L, out_rows=B
            )
            pad = B - (stop - start)
            yield (
                # device_store: int32 index grid, NOT the float block
                tok_states if self.device_store else tok_states.astype(np.float32),
                tok_mask.astype(np.float32),
                hist_idx,
                hist_mask,
                np.pad(rev.astype(np.int32), (0, pad)),
                np.pad(pos_rel.astype(np.int32), (0, pad)),
                (
                    np.pad(
                        neg_rel.astype(np.int32), ((0, pad), (0, 0)),
                        constant_values=-1,
                    )
                    if negs is not None
                    else np.pad(neg_rel.astype(np.int32), (0, pad))
                ),
                np.pad(np.ones(stop - start, np.float32), (0, pad)),
            )

    def train_one_epoch(self) -> float:
        from ..data.prefetch import prefetch

        sync = max(1, self.cfg.loss_sync_every)
        losses, counts = [], []
        for batch in prefetch(self._epoch_batches()):
            self.key, sub = jax.random.split(self.key)
            if self._multiprocess:
                # Identical rng streams per process; each process commits its
                # addressable shards (see TowerTrainer.train_one_epoch).
                args = tuple(
                    self._put_global(np.asarray(b), s)
                    for b, s in zip(batch, self._batch_shardings)
                )
                sub = self._put_global(
                    np.asarray(jax.random.key_data(sub)), self._rep_sharding
                )
            else:
                args = tuple(map(jnp.asarray, batch))
            if self.device_store:
                # The HBM-resident flat store rides as a non-donated arg.
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, self._dev_states, *args, sub
                )
            else:
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, *args, sub
                )
            losses.append(loss)
            if len(losses) % sync == 0:  # queue bound (see TowerTrainer)
                loss = float(loss)
                losses[-1] = loss
                # NaN abort (reference trainer.py:1070-1072); with a sync
                # cadence > 1 detection lags by at most ``sync - 1`` steps.
                if not np.isfinite(loss):
                    raise FloatingPointError("NaN/Inf loss in end-to-end training")
            counts.append(float(batch[7].sum()))
        losses = [float(x) for x in losses]
        if losses and not np.isfinite(losses).all():
            raise FloatingPointError("NaN/Inf loss in end-to-end training")
        return float(np.dot(losses, counts) / np.sum(counts))

    def _eval_split(self, compiled: CompiledBehaviors, store) -> dict[str, float]:
        """Materialize the learned news embeddings for this split's corpus,
        then run the standard tower-over-histories scoring + MIND metrics."""
        emb = jnp.asarray(self.materialize_news_embeddings(store=store))
        if self.device_metrics:
            return _fused_eval_metrics(
                self._fused_plans,
                self._eval_tower_apply,
                self.params,
                compiled,
                emb,
                None,
                max_len=self.buckets[-1],
                mesh=self.mesh,
            )
        slots, cand_rows = history_candidate_slots(compiled)
        scores = score_all_impressions(
            self._eval_tower_apply,
            self.params,
            emb,
            compiled.hist_rev,
            compiled.hist_lens,
            compiled.imp_rev[slots],
            cand_rows,
            batch_size=self.cfg.batch_size,
            buckets=self.buckets,
            flat_tokens=self.flat_eval,
            flat_max_len=self.buckets[-1],  # see TowerTrainer._eval_split
        )
        return compose_final_scores(compiled, history_scores=scores).metrics

    def evaluate(self) -> tuple[dict, Optional[dict]]:
        train_scores = self._eval_split(self.ct, self.store)
        val_scores = (
            self._eval_split(self.cv, self.store_val)
            if self.cv is not None
            else None
        )
        return train_scores, val_scores

    def train(self, num_epochs: Optional[int] = None) -> list[dict]:
        num_epochs = num_epochs or self.cfg.num_epochs
        # Continue numbering after a restore_training_state resume so Epoch_N
        # checkpoints and JSONL records extend the original run.
        done = len(self.history)
        for epoch in range(done + 1, done + num_epochs + 1):
            loss = self.train_one_epoch()
            record: dict = {"exp_name": self.exp_name, "epoch": epoch, "loss": loss}
            val_scores = None
            if self.eval_each_epoch:
                train_scores, val_scores = self.evaluate()
                record["train"] = train_scores
                record["val"] = val_scores
            self.history.append(record)
            _log_jsonl(
                self.log_dir,
                "train_final_history_score.jsonl",
                record,
            )
            if self.best.ckpt_dir is not None:
                if val_scores is not None:
                    # Metric-gated best checkpoint (BestTracker also writes the
                    # Epoch_N checkpoint itself).
                    self.best.update(epoch, val_scores, self.params)
                    ckpt_path = self.best.ckpt_dir / f"Epoch_{epoch}"
                else:
                    from .checkpoint import save_pytree

                    self.best.ckpt_dir.mkdir(parents=True, exist_ok=True)
                    ckpt_path = self.best.ckpt_dir / f"Epoch_{epoch}"
                    save_pytree(ckpt_path, self.params)
                if self.remote_sync is not None:
                    self.remote_sync(ckpt_path)
        return self.history

    def materialize_news_embeddings(
        self, batch_size: Optional[int] = None, store=None
    ) -> np.ndarray:
        """Learned token encoder over the whole store -> [N, D] news embeddings
        (reference ``apply_token_attn``; shared helper in ``ops.encode``)."""
        from ..ops.encode import (
            materialize_from_token_store,
            materialize_from_token_store_mesh,
        )

        params = self.params["token_encoder"]
        target = self.store if store is None else store
        # The HBM-resident states belong to the TRAIN store; other stores
        # (val corpus) stream through the host path.
        dev = self._dev_states if target is self.store else None
        if self.mesh is not None and dev is not None:
            # Global mesh program: reads the committed store in place
            # (replicated OR row-sharded), replicated output addressable on
            # every process — multi-process runs keep the device store here
            # too (round 5; previously they fell back to host streaming
            # because a local jit cannot mix with global arrays).
            return materialize_from_token_store_mesh(
                self.token_encoder_apply,
                params,
                target,
                self.mesh,
                dev,
                batch_size=batch_size,
                max_token_len=self.max_token_len,
                token_buckets=self.TOKEN_BUCKETS,
                multiprocess=self._multiprocess,
                apply_cache=self._mat_mesh_cache,
            )
        if self._multiprocess:
            # Host streaming path, process-LOCALLY from host copies of the
            # replicated params (every process holds the full value and the
            # full token store, so the results are identical everywhere).
            params = jax.tree.map(np.asarray, params)
        return materialize_from_token_store(
            self.token_encoder_apply,
            params,
            target,
            batch_size=batch_size,
            max_token_len=self.max_token_len,
            token_buckets=self.TOKEN_BUCKETS,
            dev_states=dev,
        )


# ---------------------------------------------------------------------------
# Classification-head trainer
# ---------------------------------------------------------------------------


class ClassificationTrainer(ResumableTrainer):
    """Trains the content-only MLP scorer on pos/neg embedding pairs
    (reference ``ClassificationModelTrainer``, ``trainer.py:47-214``)."""

    def __init__(
        self,
        head_apply: Callable,  # (params, [B,D]) -> [B,1]
        params,
        compiled_train: CompiledBehaviors,
        news_emb_train: jnp.ndarray,
        compiled_val: Optional[CompiledBehaviors] = None,
        news_emb_val: Optional[jnp.ndarray] = None,
        cfg: TrainConfig = TrainConfig(),
        log_dir: Optional[Path] = None,
        ckpt_dir: Optional[Path] = None,
        exp_name: str = "",
        mesh=None,  # jax.sharding.Mesh: DP train steps over `data`
    ):
        self.head_apply = head_apply
        self.params = params
        self.cfg = cfg
        self.ct = compiled_train
        self.cv = compiled_val
        self.news_emb_train = news_emb_train
        self.news_emb_val = news_emb_val
        self.log_dir = log_dir
        self.exp_name = exp_name
        self.rng = np.random.default_rng(cfg.seed)
        self.optimizer = make_optimizer(cfg)
        self.opt_state = jax.jit(self.optimizer.init)(params)
        self.best = BestTracker(ckpt_dir, exp_name)
        self.plateau = PlateauScheduler(cfg)
        self.history: list[dict] = []

        self.mesh = mesh
        self._multiprocess = mesh is not None and any(
            d.process_index != jax.process_index() for d in mesh.devices.flat
        )
        if mesh is not None:
            assert cfg.batch_size % mesh.shape["data"] == 0
            from ..parallel.sharding import shard_news_table

            if self._multiprocess:
                from ..parallel.sharding import put_global, replicated

                self._put_global = put_global
                rep = replicated(mesh)
                self.params = jax.tree.map(
                    lambda l: put_global(l, rep), self.params
                )
                self.opt_state = jax.tree.map(
                    lambda l: put_global(l, rep), self.opt_state
                )
                self._rep_sharding = rep
            # Tables stay PADDED to a shard multiple (pad rows are never
            # indexed by pos/neg; eval slices preds back to num_news).
            self.news_emb_train = shard_news_table(
                mesh, jnp.asarray(self.news_emb_train)
            )
            if self.news_emb_val is not None:
                self.news_emb_val = shard_news_table(
                    mesh, jnp.asarray(self.news_emb_val)
                )

        if cfg.loss == "infonce":
            from .step import make_classification_infonce_step

            raw_step = make_classification_infonce_step(head_apply, self.optimizer)
        else:
            raw_step = make_classification_train_step(
                head_apply, self.optimizer, cfg.margin
            )
        if mesh is not None:
            from ..parallel.sharding import (
                batch_sharding,
                make_sharded_classification_step,
                replicated,
                table_sharding,
            )
            from jax.sharding import NamedSharding, PartitionSpec

            self._train_step = make_sharded_classification_step(raw_step, mesh)
            dat = batch_sharding(mesh)
            neg_sh = (
                NamedSharding(mesh, PartitionSpec("data", None))
                if cfg.loss == "infonce"
                else dat
            )
            self._batch_shardings = (dat, neg_sh, dat)
            # Head scores over the row-sharded table with a REPLICATED output:
            # fully-replicated arrays are addressable on every process, so
            # baseline_scores stays a plain np fetch on multi-host pods.
            self._predict = jax.jit(
                lambda p, t: self.head_apply(p, t)[:, 0],
                in_shardings=(replicated(mesh), table_sharding(mesh)),
                out_shardings=replicated(mesh),
            )
        else:
            self._train_step = jax.jit(raw_step, donate_argnums=(0, 1))
            self._predict = jax.jit(
                lambda p, t: self.head_apply(p, t)[:, 0]
            )

    def train_one_epoch(self) -> float:
        cfg = self.cfg
        # Shared epoch prologue; batch_size=None = full permutation (the
        # reference classification DataLoader shuffles items freely).
        pairs, negs = sample_epoch_pairs(
            self.rng,
            self.ct.imp_rev,
            self.ct.imp_lens,
            self.ct.labels_flat,
            loss=cfg.loss,
            num_neg_per_pos=cfg.num_neg_per_pos,
            batch_size=None,
        )
        B = cfg.batch_size
        losses, counts = [], []
        for start in range(0, pairs.shape[1], B):
            stop = min(start + B, pairs.shape[1])
            pad = B - (stop - start)
            pos = np.pad(pairs[0, start:stop].astype(np.int32), (0, pad))
            neg = neg_batch_column(pairs, negs, start, stop, pad)
            mask = np.pad(np.ones(stop - start, np.float32), (0, pad))
            # Count from the HOST array, before device placement (a device
            # mask.sum() fetch would defeat loss_sync_every's queue bound).
            counts.append(float(mask.sum()))
            if self._multiprocess:
                # Identical rng streams per process; each process commits its
                # addressable shards (see TowerTrainer.train_one_epoch).
                pos, neg, mask = (
                    self._put_global(np.asarray(b), s)
                    for b, s in zip((pos, neg, mask), self._batch_shardings)
                )
            else:
                pos, neg, mask = jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(mask)
            self.params, self.opt_state, loss = self._train_step(
                self.params,
                self.opt_state,
                self.news_emb_train,
                pos,
                neg,
                mask,
            )
            losses.append(loss)
            if len(losses) % max(1, cfg.loss_sync_every) == 0:
                losses[-1] = float(losses[-1])  # queue bound (see TowerTrainer)
        losses = [float(x) for x in losses]
        return float(np.dot(losses, counts) / np.sum(counts))

    def baseline_scores(self, news_emb) -> np.ndarray:
        """Per-unique-news content scores (reference ``get_classification_preds``,
        ``data_model_helper.py:91-98``)."""
        return np.asarray(self._predict(self.params, news_emb))

    def _eval_split(self, compiled, news_emb) -> dict[str, float]:
        # Slice away shard-padding rows (mesh mode pads tables to a multiple
        # of the model axis).
        preds = self.baseline_scores(news_emb)[: compiled.num_news]
        return compose_final_scores(compiled, baseline_scores=preds).metrics

    def train(self, num_epochs: Optional[int] = None) -> list[dict]:
        num_epochs = num_epochs or self.cfg.num_epochs
        # Continue numbering after a restore_training_state resume (see
        # ResumableTrainer).
        done = len(self.history)
        for epoch in range(done + 1, done + num_epochs + 1):
            loss = self.train_one_epoch()
            train_scores = self._eval_split(self.ct, self.news_emb_train)
            val_scores = (
                self._eval_split(self.cv, self.news_emb_val)
                if self.cv is not None
                else None
            )
            self.history.append(
                {
                    "exp_name": self.exp_name,
                    "epoch": epoch,
                    "loss": loss,
                    "train": train_scores,
                    "val": val_scores,
                }
            )
            _log_jsonl(
                self.log_dir,
                "train_classification_score.jsonl",
                {"exp_name": self.exp_name, "epoch": epoch, "scores": train_scores, "loss": loss},
            )
            if val_scores is not None:
                _log_jsonl(
                    self.log_dir,
                    "eval_classification_score.jsonl",
                    {"exp_name": self.exp_name, "epoch": epoch, "scores": val_scores},
                )
                self.best.update(epoch, val_scores, self.params)
                from .checkpoint import mean_metric

                self.opt_state = self.plateau.update(
                    self.opt_state, mean_metric(val_scores)
                )
        return self.history
