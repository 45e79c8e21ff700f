"""The five BASELINE experiment configurations (BASELINE.json ``configs[0..4]``)
as runnable presets, plus a scenario runner usable on real MIND data or the
synthetic fixture.

0. MIND-small, frozen precomputed embeddings + mean-pooled history +
   dot-product scorer (CPU-runnable, no training)
1. MIND-small, latent-attention user tower + sampled negatives
2. MIND-small, end-to-end trained news encoder (token level) + user tower
3. MIND-large, row-sharded news-embedding table, data-parallel towers
4. MIND-large multi-host: full pipeline (sharded encode -> dump -> on-device
   impression ranking eval)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import MeshConfig, TowerConfig, TrainConfig
from .data.compiler import CompiledBehaviors
from .eval.ranker import compose_final_scores, history_candidate_slots
from .models import build_tower
from .models.pooling import average_pool
from .ops.scoring import score_all_impressions


@dataclasses.dataclass(frozen=True)
class BaselineScenario:
    index: int
    description: str
    tower: Optional[TowerConfig]
    train: Optional[TrainConfig]
    mesh: Optional[MeshConfig]


BASELINE_CONFIGS: tuple[BaselineScenario, ...] = (
    BaselineScenario(
        0,
        "frozen embeddings + mean-pooled history + dot-product scorer",
        tower=None,
        train=None,
        mesh=None,
    ),
    BaselineScenario(
        1,
        "latent-attention user tower + sampled negatives",
        tower=TowerConfig(kind="latent"),
        train=TrainConfig(num_epochs=5),
        mesh=None,
    ),
    BaselineScenario(
        2,
        "end-to-end trained news encoder + latent user tower",
        tower=TowerConfig(kind="latent"),
        train=TrainConfig(num_epochs=5, learning_rate=1e-6),
        mesh=None,
    ),
    BaselineScenario(
        3,
        "row-sharded embedding table, data-parallel towers",
        tower=TowerConfig(kind="latent"),
        train=TrainConfig(num_epochs=5),
        mesh=MeshConfig(model_size=2),
    ),
    BaselineScenario(
        4,
        "multi-host full pipeline: sharded encode -> dump -> on-device ranking",
        tower=TowerConfig(kind="latent"),
        train=TrainConfig(num_epochs=5),
        mesh=MeshConfig(model_size=2),
    ),
)


def run_config0(
    compiled: CompiledBehaviors,
    news_embeddings: np.ndarray,
    query_news_embeddings: Optional[np.ndarray] = None,
) -> dict:
    """Config[0] end to end: no training, mean-pool + cosine, full metrics."""
    slots, cand_rows = history_candidate_slots(compiled)
    view = compiled.with_history_view()
    scores = score_all_impressions(
        lambda p, e, m: average_pool(e, m),
        None,
        jnp.asarray(news_embeddings),
        view.hist_rev,
        view.hist_lens,
        compiled.imp_rev[slots],
        cand_rows,
        query_news_emb=(
            jnp.asarray(query_news_embeddings)
            if query_news_embeddings is not None
            else None
        ),
    )
    return compose_final_scores(compiled, history_scores=scores).metrics


def run_config1(
    compiled: CompiledBehaviors,
    news_embeddings: np.ndarray,
    compiled_val: Optional[CompiledBehaviors] = None,
    news_embeddings_val: Optional[np.ndarray] = None,
    train_cfg: Optional[TrainConfig] = None,
    tower_cfg: Optional[TowerConfig] = None,
) -> dict:
    """Config[1]: train the latent tower, return final val (or train) metrics."""
    from .train.trainer import TowerTrainer

    tower_cfg = tower_cfg or _sized_tower(news_embeddings.shape[1])
    train_cfg = train_cfg or TrainConfig(num_epochs=2, batch_size=256)
    tower = build_tower(tower_cfg)
    dim = news_embeddings.shape[1]
    params = jax.jit(
        lambda: tower.init(
            jax.random.key(train_cfg.seed), jnp.zeros((1, 8, dim)), jnp.ones((1, 8))
        )
    )()
    trainer = TowerTrainer(
        tower.apply,
        params,
        compiled.with_history_view(),
        jnp.asarray(news_embeddings),
        compiled_val=compiled_val.with_history_view() if compiled_val else None,
        news_emb_val=(
            jnp.asarray(news_embeddings_val)
            if news_embeddings_val is not None
            else None
        ),
        cfg=train_cfg,
    )
    history = trainer.train()
    last = history[-1]
    return last["val"] if last["val"] is not None else last["train"]


def _sized_tower(dim: int) -> TowerConfig:
    return TowerConfig(
        kind="latent",
        embedding_dim=dim,
        reduced_dim=dim,
        hidden_dim=4 * dim,
        num_latents=min(64, dim),
        latent_dim_head=max(8, dim // 2),
    )
