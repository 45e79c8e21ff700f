"""Checkpointing: per-epoch + metric-gated best checkpoints via Orbax.

Capability parity with the reference scheme (``trainer.py:205-213,692-711``):
``Epoch_{i}`` every epoch, ``Best_model_{exp}`` gated on the mean of
(auc, mrr, ndcg5, ndcg10) on the dev split; every factory warm-starts from a
path. Orbax gives async-capable sharded checkpoints (the TPU-native replacement
for ``torch.save`` state dicts, SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_pytree(path: Path, tree: Any) -> None:
    path = Path(path).absolute()
    if jax.process_count() > 1:
        # Multi-host: hand Orbax host copies of replicated leaves (np.asarray
        # of a fully-replicated global array reads local shards); leaves that
        # are genuinely SHARDED stay as global arrays — Orbax writes per-host
        # shards natively. EVERY process must call save — Orbax runs its own
        # cross-process barrier inside and elects the writing host.
        tree = jax.tree.map(
            lambda l: l
            if isinstance(l, jax.Array) and not l.is_fully_replicated
            else np.asarray(l),
            tree,
        )
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_pytree(path: Path, like: Optional[Any] = None) -> Any:
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, item=like)
        return ckptr.restore(path)


def mean_metric(scores: dict[str, float]) -> float:
    """Model-selection criterion: mean of (auc, mrr, ndcg5, ndcg10)
    (reference ``trainer.py:203,691``)."""
    return float(
        np.mean([scores["auc"], scores["mrr"], scores["ndcg5"], scores["ndcg10"]])
    )


class BestTracker:
    """Single best-score tracker (fixes the reference's drift-prone dual update
    ordering, ``trainer.py:418-435``; quirks ledger SURVEY.md §7.4)."""

    def __init__(self, ckpt_dir: Optional[Path], exp_name: str):
        self.ckpt_dir = Path(ckpt_dir) if ckpt_dir else None
        self.exp_name = exp_name
        self.best_score = -np.inf
        self.best_path: Optional[Path] = None

    def update(self, epoch: int, scores: dict[str, float], tree: Any) -> bool:
        if self.ckpt_dir is None:
            return False
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        save_pytree(self.ckpt_dir / f"Epoch_{epoch}", tree)
        m = mean_metric(scores)
        if m > self.best_score:
            self.best_score = m
            self.best_path = self.ckpt_dir / f"Best_model_{self.exp_name}"
            save_pytree(self.best_path, tree)
            return True
        return False
