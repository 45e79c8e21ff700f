"""Concrete pipeline components — the orchestration tier.

Capability parity with the reference's 13 components (``components.py:45-1073``),
re-keyed on a standardized context vocabulary:

- ``"compiled"``: CompiledBehaviors (from TransformDataComponent)
- ``"news_embeddings"`` / ``"query_news_embeddings"``: [N, D] tables aligned to
  ``compiled.news_ids``
- ``"classification_preds"``: per-unique-news content scores
- ``"scores"`` / ``"grouped_ranks"`` / ``"metrics"``: final outputs
- ``"token_store"``: TokenStore of frozen per-token states
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TowerConfig, TrainConfig
from ..data.compiler import CompiledBehaviors, compile_behaviors
from ..eval.ranker import compose_final_scores, history_candidate_slots
from ..models import ClassificationHead, ReducingModel, WeightedSumModel, build_tower
from ..ops.encode import load_embeddings, save_embeddings
from ..ops.scoring import score_all_impressions
from ..train.checkpoint import load_pytree
from ..train.trainer import ClassificationTrainer, JointTowerTrainer, TowerTrainer
from .pipeline import PipelineComponent


class TransformDataComponent(PipelineComponent):
    """behaviors DataFrame -> CompiledBehaviors (reference ``TransformData``,
    ``components.py:45-114``). Drops the raw frame from the context.

    When per-news feature dicts are present (from ``data.ingest.load_dataset``),
    also materializes arrays aligned to ``compiled.news_ids``: category /
    subcategory ids and mean title/abstract entity vectors (the reference emits
    the same tensors, ``components.py:75-108``)."""

    required_keys = {"behaviors"}

    def transform(self, context: dict[str, Any]) -> dict[str, Any]:
        behaviors = context.pop("behaviors")
        compiled = compile_behaviors(
            behaviors["Impressions"].tolist(), behaviors["History"].tolist()
        )
        context["compiled"] = compiled
        context["imp_ids"] = behaviors["ImpressionID"].to_numpy()
        for key, dtype in (
            ("news_category", np.int32),
            ("news_subcategory", np.int32),
        ):
            if key in context:
                lut = context.pop(key)
                context[key + "_ids"] = np.array(
                    [lut.get(n, 0) for n in compiled.news_ids], dtype=dtype
                )
        for key in ("news_title_entity", "news_abstract_entity"):
            if key in context:
                lut = context.pop(key)
                any_vec = next(iter(lut.values()))
                context[key + "_vecs"] = np.stack(
                    [
                        np.asarray(lut.get(n, np.zeros_like(any_vec)))
                        for n in compiled.news_ids
                    ]
                ).astype(np.float32)
        return context


class EmbeddingsComponent(PipelineComponent):
    """Encode news texts into query+passage embedding tables (reference
    ``EmbeddingsComponent``, ``components.py:117-175``)."""

    required_keys = {"compiled", "news_text_dict"}
    cacheable = False  # encoder params live outside the context

    def __init__(
        self,
        encoder_apply: Callable,
        encoder_params,
        tokenize: Callable,
        query_instruction: str,
        batch_size: Optional[int] = 256,
        encoder_config=None,  # enables batch_size=None analytic auto-sizing
        token_buckets: Optional[tuple[int, ...]] = (32, 64, 128, 256, 512),
    ):
        self.encoder_apply = encoder_apply
        self.encoder_params = encoder_params
        self.tokenize = tokenize
        self.query_instruction = query_instruction
        self.batch_size = batch_size
        self.encoder_config = encoder_config
        self.token_buckets = token_buckets

    def transform(self, context):
        from ..ops.encode import encode_query_and_passage

        compiled: CompiledBehaviors = context["compiled"]
        texts = [context["news_text_dict"][n] for n in compiled.news_ids]
        query, passage = encode_query_and_passage(
            self.encoder_apply,
            self.encoder_params,
            self.tokenize,
            texts,
            self.query_instruction,
            self.batch_size,
            self.encoder_config,
            buckets=self.token_buckets,
        )
        context["news_embeddings"] = np.asarray(passage)
        context["query_news_embeddings"] = np.asarray(query)
        return context


@dataclasses.dataclass
class SaveEmbeddingComponent(PipelineComponent):
    """reference ``components.py:178-223`` (dump is id-keyed here)."""

    save_dir: Path
    dataset_name: str
    required_keys = {"news_embeddings", "compiled"}

    def transform(self, context):
        save_embeddings(
            self.save_dir,
            self.dataset_name,
            context["news_embeddings"],
            context.get("query_news_embeddings"),
            news_ids=context["compiled"].news_ids,
        )
        return context


@dataclasses.dataclass
class LoadEmbeddingComponent(PipelineComponent):
    """reference ``components.py:226-258``. Rows are realigned to the current
    context's compiled news-id order via the dump's id key, so the dump's row
    subset/order need not match this run's (the reference's positional load
    silently misaligns across subsets)."""

    save_dir: Path
    dataset_name: str
    with_query: bool = True
    required_keys = {"compiled"}

    def transform(self, context):
        align = context["compiled"].news_ids
        if self.with_query:
            emb, query = load_embeddings(
                self.save_dir,
                self.dataset_name,
                with_query=True,
                align_to_news_ids=align,
            )
            context["news_embeddings"] = emb
            context["query_news_embeddings"] = query
        else:
            context["news_embeddings"] = load_embeddings(
                self.save_dir, self.dataset_name, align_to_news_ids=align
            )
        return context


class ClassificationComponent(PipelineComponent):
    """Content-only scorer: train the MLP head, transform to baseline scores
    (reference ``ClassificationComponent``, ``components.py:261-372``)."""

    required_keys = {"compiled", "news_embeddings"}

    def __init__(
        self,
        cfg: TrainConfig = TrainConfig(),
        log_dir: Optional[Path] = None,
        ckpt_dir: Optional[Path] = None,
        exp_name: str = "classification",
        warm_start: Optional[Path] = None,
        mesh=None,  # jax.sharding.Mesh: DP train steps
    ):
        self.cfg = cfg
        self.log_dir = log_dir
        self.ckpt_dir = ckpt_dir
        self.exp_name = exp_name
        self.warm_start = warm_start
        self.mesh = mesh
        self._trainer: Optional[ClassificationTrainer] = None

    def cache_token(self) -> str:
        return f"{self.cfg}|{self.exp_name}|{self.warm_start}"

    def _head_and_params(self, dim: int):
        head = ClassificationHead(in_dim=dim, hidden_dim=dim)
        params = jax.jit(
            lambda: head.init(jax.random.key(self.cfg.seed), jnp.zeros((1, dim)))
        )()
        if self.warm_start:
            params = load_pytree(self.warm_start, like=params)
        return head, params

    def train(self, context, val_context=None):
        emb = jnp.asarray(context["news_embeddings"])
        head, params = self._head_and_params(emb.shape[1])
        self._trainer = ClassificationTrainer(
            head.apply,
            params,
            context["compiled"],
            emb,
            compiled_val=val_context["compiled"] if val_context else None,
            news_emb_val=(
                jnp.asarray(val_context["news_embeddings"]) if val_context else None
            ),
            cfg=self.cfg,
            log_dir=self.log_dir,
            ckpt_dir=self.ckpt_dir,
            exp_name=self.exp_name,
            mesh=self.mesh,
        )
        self._trainer.train()
        # Reload best checkpoint (reference components.py:363-372).
        if self._trainer.best.best_path is not None:
            self._trainer.params = load_pytree(
                self._trainer.best.best_path, like=self._trainer.params
            )

    def transform(self, context):
        emb = jnp.asarray(context["news_embeddings"])
        if self._trainer is None:
            head, params = self._head_and_params(emb.shape[1])
            self._trainer = ClassificationTrainer(
                head.apply, params, context["compiled"], emb, cfg=self.cfg
            )
        preds = self._trainer.baseline_scores(emb)
        context["classification_preds"] = preds
        res = compose_final_scores(
            context["compiled"],
            baseline_scores=preds,
            compute_metrics=context["compiled"].label_present,
        )
        context["scores"] = res.scores
        context["grouped_ranks"] = res.grouped_ranks
        context["metrics"] = res.metrics
        return context


class _TowerComponentBase(PipelineComponent):
    required_keys = {"compiled", "news_embeddings"}

    def __init__(
        self,
        tower_config: TowerConfig = TowerConfig(),
        cfg: TrainConfig = TrainConfig(),
        log_dir: Optional[Path] = None,
        ckpt_dir: Optional[Path] = None,
        exp_name: str = "attention",
        warm_start: Optional[Path] = None,
        buckets: Optional[tuple[int, ...]] = None,
        mesh=None,  # jax.sharding.Mesh: sharded training + sharded eval scoring
    ):
        self.tower_config = tower_config
        self.cfg = cfg
        self.log_dir = log_dir
        self.ckpt_dir = ckpt_dir
        self.exp_name = exp_name
        self.warm_start = warm_start
        self.buckets = buckets
        self.mesh = mesh
        self.tower = build_tower(tower_config)
        self.params = None

    def cache_token(self) -> str:
        return f"{self.tower_config}|{self.cfg}|{self.exp_name}|{self.warm_start}"

    def _init_params(self, dim: int):
        from ..models import check_tower_input_dim

        check_tower_input_dim(self.tower_config, dim)
        if self.params is None:
            self.params = jax.jit(
                lambda: self.tower.init(
                    jax.random.key(self.cfg.seed),
                    jnp.zeros((1, 8, dim)),
                    jnp.ones((1, 8)),
                )
            )()
            if self.warm_start:
                self.params = load_pytree(self.warm_start, like=self.params)
        return self.params

    def _flat(self) -> bool:
        """Token-local towers route through the zero-padding flat paths.
        Explicit ``buckets`` force the padded path EVERYWHERE (train + eval +
        transform must share one truncation/scoring semantics)."""
        from ..models import supports_flat_scoring

        return supports_flat_scoring(self.tower_config) and self.buckets is None

    def _history_scores(self, context, params=None, tower_apply=None):
        from ..config import HISTORY_BUCKETS

        compiled: CompiledBehaviors = context["compiled"]
        view = compiled.with_history_view()
        slots, cand_rows = history_candidate_slots(compiled)
        kwargs = {} if self.buckets is None else {"buckets": self.buckets}
        if self._flat():
            kwargs["flat_tokens"] = True
            kwargs["flat_max_len"] = HISTORY_BUCKETS[-1]  # same cap as padded
        scores = score_all_impressions(
            tower_apply or (lambda p, e, m: self.tower.apply(p, e, m)),
            params if params is not None else self.params,
            jnp.asarray(context["news_embeddings"]),
            view.hist_rev,
            view.hist_lens,
            compiled.imp_rev[slots],
            cand_rows,
            query_news_emb=(
                jnp.asarray(context["query_news_embeddings"])
                if "query_news_embeddings" in context
                else None
            ),
            batch_size=self.cfg.batch_size,
            mesh=self.mesh,
            **kwargs,
        )
        return scores


class AttentionComponent(_TowerComponentBase):
    """History tower trained alone; transform composes attention scores over the
    classification baseline for cold-start rows (reference ``AttentionComponent``
    ``components.py:477-643`` / ``NewAttentionComponent`` ``:760-855`` — one
    class here, the tower kind comes from ``TowerConfig``)."""

    def train(self, context, val_context=None):
        compiled: CompiledBehaviors = context["compiled"]
        emb = jnp.asarray(context["news_embeddings"])
        query = (
            jnp.asarray(context["query_news_embeddings"])
            if "query_news_embeddings" in context
            else None
        )
        self._init_params(emb.shape[1])
        view = compiled.with_history_view()
        trainer = TowerTrainer(
            self.tower.apply,
            self.params,
            view,
            emb,
            compiled_val=(
                val_context["compiled"].with_history_view() if val_context else None
            ),
            news_emb_val=(
                jnp.asarray(val_context["news_embeddings"]) if val_context else None
            ),
            cfg=self.cfg,
            query_news_emb_train=query,
            query_news_emb_val=(
                jnp.asarray(val_context["query_news_embeddings"])
                if val_context and "query_news_embeddings" in val_context
                else None
            ),
            log_dir=self.log_dir,
            ckpt_dir=self.ckpt_dir,
            exp_name=self.exp_name,
            mesh=self.mesh,
            flat_train=self._flat() and self.cfg.loss == "margin" and self.mesh is None,
            flat_eval=self._flat(),
            device_metrics=self._flat(),  # epoch evals fused to 5-scalar fetches
            **({} if self.buckets is None else {"buckets": self.buckets}),
        )
        trainer.train()
        if trainer.best.best_path is not None:
            trainer.params = load_pytree(trainer.best.best_path, like=trainer.params)
        self.params = trainer.params

    def transform(self, context):
        compiled: CompiledBehaviors = context["compiled"]
        self._init_params(context["news_embeddings"].shape[1])
        hist_scores = self._history_scores(context)
        res = compose_final_scores(
            compiled,
            history_scores=hist_scores,
            baseline_scores=context.get("classification_preds"),
            compute_metrics=compiled.label_present,
        )
        context["scores"] = res.scores
        context["grouped_ranks"] = res.grouped_ranks
        context["metrics"] = res.metrics
        return context


class FinalAttentionComponent(AttentionComponent):
    """Attention-only scoring without the classification fallback — intended for
    WITH_HISTORY runs (reference ``FinalAttentionComponent``,
    ``components.py:980-1073`` -> ``get_final_second_attention_score``)."""

    def transform(self, context):
        compiled: CompiledBehaviors = context["compiled"]
        self._init_params(context["news_embeddings"].shape[1])
        hist_scores = self._history_scores(context)
        res = compose_final_scores(
            compiled,
            history_scores=hist_scores,
            baseline_scores=None,
            compute_metrics=compiled.label_present,
        )
        context["scores"] = res.scores
        context["grouped_ranks"] = res.grouped_ranks
        context["metrics"] = res.metrics
        return context


class AttentionWeightComponent(_TowerComponentBase):
    """Joint tower + alpha-blend training and blended transform (reference
    ``AttentionWeightComponent``, ``components.py:375-474``)."""

    required_keys = {"compiled", "news_embeddings", "classification_preds"}

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.blend = WeightedSumModel()
        self.blend_params = None
        self._trainer: Optional[JointTowerTrainer] = None

    def train(self, context, val_context=None):
        emb = jnp.asarray(context["news_embeddings"])
        self._init_params(emb.shape[1])
        self.blend_params = jax.jit(
            lambda: self.blend.init(
                jax.random.key(self.cfg.seed + 1), jnp.zeros(2), jnp.zeros(2)
            )
        )()
        self._trainer = JointTowerTrainer(
            self.tower.apply,
            self.params,
            context["compiled"].with_history_view(),
            emb,
            blend_apply=self.blend.apply,
            blend_params=self.blend_params,
            baseline_train=context["classification_preds"],
            baseline_val=(
                val_context.get("classification_preds") if val_context else None
            ),
            compiled_val=(
                val_context["compiled"].with_history_view() if val_context else None
            ),
            news_emb_val=(
                jnp.asarray(val_context["news_embeddings"]) if val_context else None
            ),
            cfg=self.cfg,
            query_news_emb_train=(
                jnp.asarray(context["query_news_embeddings"])
                if "query_news_embeddings" in context
                else None
            ),
            log_dir=self.log_dir,
            ckpt_dir=self.ckpt_dir,
            exp_name=self.exp_name,
            mesh=self.mesh,
            flat_eval=self._flat(),
            device_metrics=self._flat(),
        )
        self._trainer.train()
        self.params = self._trainer.params["tower"]
        self.blend_params = self._trainer.params["blend"]

    def transform(self, context):
        compiled: CompiledBehaviors = context["compiled"]
        self._init_params(context["news_embeddings"].shape[1])
        hist_scores = self._history_scores(context)
        alpha = 0.5
        if self._trainer is not None:
            alpha = self._trainer._alpha()
        res = compose_final_scores(
            compiled,
            history_scores=hist_scores,
            baseline_scores=context["classification_preds"],
            alpha=alpha,
            compute_metrics=compiled.label_present,
        )
        context["scores"] = res.scores
        context["grouped_ranks"] = res.grouped_ranks
        context["metrics"] = res.metrics
        return context


class AttentionReduceComponent(_TowerComponentBase):
    """Joint reducer + tower training (reference ``AttentionReduceComponent``,
    ``components.py:646-757``)."""

    def __init__(self, *args, reduced_dim: Optional[int] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.reduced_dim = reduced_dim
        self.reducer = None
        self.reduce_params = None
        self._trainer: Optional[JointTowerTrainer] = None

    def train(self, context, val_context=None):
        emb = jnp.asarray(context["news_embeddings"])
        dim = emb.shape[1]
        out_dim = self.reduced_dim or dim
        self.reducer = ReducingModel(input_dim=dim, output_dim=out_dim)
        self.reduce_params = jax.jit(
            lambda: self.reducer.init(
                jax.random.key(self.cfg.seed + 2), jnp.zeros((1, dim))
            )
        )()
        self._init_params(out_dim)
        self._trainer = JointTowerTrainer(
            self.tower.apply,
            self.params,
            context["compiled"].with_history_view(),
            emb,
            reduce_apply=self.reducer.apply,
            reduce_params=self.reduce_params,
            compiled_val=(
                val_context["compiled"].with_history_view() if val_context else None
            ),
            news_emb_val=(
                jnp.asarray(val_context["news_embeddings"]) if val_context else None
            ),
            cfg=self.cfg,
            log_dir=self.log_dir,
            ckpt_dir=self.ckpt_dir,
            exp_name=self.exp_name,
            mesh=self.mesh,
        )
        self._trainer.train()
        self.params = self._trainer.params["tower"]
        self.reduce_params = self._trainer.params["reduce"]

    def transform(self, context):
        compiled: CompiledBehaviors = context["compiled"]
        assert self._trainer is not None, "AttentionReduceComponent needs train()"
        emb = self._trainer._reduce_table(
            self.reduce_params, jnp.asarray(context["news_embeddings"])
        )
        reduce_ctx = dict(context)
        reduce_ctx["news_embeddings"] = np.asarray(emb)
        reduce_ctx.pop("query_news_embeddings", None)
        hist_scores = self._history_scores(reduce_ctx)
        res = compose_final_scores(
            compiled,
            history_scores=hist_scores,
            baseline_scores=context.get("classification_preds"),
            compute_metrics=compiled.label_present,
        )
        context["scores"] = res.scores
        context["grouped_ranks"] = res.grouped_ranks
        context["metrics"] = res.metrics
        return context


@dataclasses.dataclass
class StoreTokenStatesComponent(PipelineComponent):
    """Encode news texts WITHOUT pooling and persist the mask-trimmed token
    states (reference ``StoreEmbeddingsComponent``, ``components.py:858-880``;
    it also drops the text dict from the context)."""

    encoder_hidden_apply: Callable
    encoder_params: Any
    tokenize: Callable
    db_path: Optional[Path] = None
    batch_size: int = 64
    required_keys = {"compiled", "news_text_dict"}
    cacheable = False

    def transform(self, context):
        from ..ops.encode import build_token_store

        compiled: CompiledBehaviors = context["compiled"]
        texts = [context["news_text_dict"][n] for n in compiled.news_ids]
        ids, mask = self.tokenize(texts)
        store = build_token_store(
            self.encoder_hidden_apply,
            self.encoder_params,
            ids,
            mask,
            self.batch_size,
        )
        if self.db_path is not None:
            store.save(self.db_path)
        context["token_store"] = store
        context.pop("news_text_dict", None)
        return context


class AttentionAttentionComponent(PipelineComponent):
    """Train-only end-to-end component (reference ``AttentionAttentionComponent``,
    ``components.py:883-952``: transform is identity there too); after training
    it materializes learned news embeddings into the context so downstream
    scoring components can run."""

    required_keys = {"compiled", "token_store"}
    cacheable = False

    def __init__(
        self,
        token_encoder_apply: Callable,
        token_encoder_params,
        tower_apply: Callable,
        tower_params,
        cfg: TrainConfig = TrainConfig(),
        log_dir: Optional[Path] = None,
        ckpt_dir: Optional[Path] = None,
        exp_name: str = "attn_attn",
        max_token_len: int = 512,
    ):
        self.token_encoder_apply = token_encoder_apply
        self.token_encoder_params = token_encoder_params
        self.tower_apply = tower_apply
        self.tower_params = tower_params
        self.cfg = cfg
        self.log_dir = log_dir
        self.ckpt_dir = ckpt_dir
        self.exp_name = exp_name
        self.max_token_len = max_token_len
        self._trainer = None

    def train(self, context, val_context=None):
        from ..train.trainer import EndToEndTrainer

        self._trainer = EndToEndTrainer(
            self.token_encoder_apply,
            self.token_encoder_params,
            self.tower_apply,
            self.tower_params,
            context["compiled"].with_history_view(),
            context["token_store"],
            cfg=self.cfg,
            log_dir=self.log_dir,
            ckpt_dir=self.ckpt_dir,
            exp_name=self.exp_name,
            max_token_len=self.max_token_len,
        )
        self._trainer.train()

    def transform(self, context):
        if self._trainer is not None:
            context["news_embeddings"] = self._trainer.materialize_news_embeddings()
        return context


@dataclasses.dataclass
class TokenEmbeddingsComponent(PipelineComponent):
    """Materialize a learned news-embedding table from a token store + trained
    token encoder (reference ``TokenEmbeddingsComponent``,
    ``components.py:955-977``)."""

    token_encoder_apply: Callable
    token_encoder_params: Any
    batch_size: Optional[int] = None  # None -> analytic memory model
    max_token_len: int = 512
    required_keys = {"token_store"}
    cacheable = False

    def transform(self, context):
        from ..ops.encode import materialize_from_token_store

        context["news_embeddings"] = materialize_from_token_store(
            self.token_encoder_apply,
            self.token_encoder_params,
            context["token_store"],
            batch_size=self.batch_size,
            max_token_len=self.max_token_len,
        )
        return context
