"""Pipeline-level tests for the joint components (blend / reduce) and the
token-level components — the orchestration paths not covered by the direct
trainer tests."""

import numpy as np
import pandas as pd
import pytest

from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
from news_recommendation_project_v2_tpu.data.synthetic import (
    align_embeddings,
    synthetic_learnable_behaviors,
)
from news_recommendation_project_v2_tpu.pipeline import (
    AttentionReduceComponent,
    AttentionWeightComponent,
    ClassificationComponent,
    Pipeline,
    TransformDataComponent,
)

D = 32


@pytest.fixture(scope="module")
def base_context():
    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=80, num_rows=80, dim=D, noise=0.05
    )
    behaviors = pd.DataFrame(
        {"ImpressionID": np.arange(len(imps)), "History": hist, "Impressions": imps}
    )
    context = {"behaviors": behaviors}
    context = TransformDataComponent().transform(context)
    context["news_embeddings"] = align_embeddings(context["compiled"].news_ids, emb)
    return context


def tiny_tower_cfg():
    return TowerConfig(kind="latent", reduced_dim=D, num_latents=4, latent_dim_head=8)


def train_cfg():
    return TrainConfig(learning_rate=3e-4, num_epochs=1, batch_size=32, seed=0)


def test_attention_weight_component_pipeline(base_context):
    context = dict(base_context)
    cls = ClassificationComponent(cfg=train_cfg())
    cls.train(context)
    context = cls.transform(context)
    comp = AttentionWeightComponent(
        tower_config=tiny_tower_cfg(), cfg=train_cfg(), exp_name="w"
    )
    comp.train(context)
    context = comp.transform(context)
    m = context["metrics"]
    assert m is not None and 0 <= m["auc"] <= 1
    # The blend produced an alpha in (0, 1).
    assert 0.0 < comp._trainer._alpha() < 1.0


def test_attention_reduce_component_pipeline(base_context):
    context = dict(base_context)
    comp = AttentionReduceComponent(
        tower_config=tiny_tower_cfg(), cfg=train_cfg(), exp_name="r"
    )
    comp.train(context)
    context = comp.transform(context)
    m = context["metrics"]
    assert m is not None and 0 <= m["auc"] <= 1


def test_full_pipeline_chain(base_context, tmp_path):
    """Transform -> classification -> weight component as a Pipeline with the
    content-addressed cache enabled."""
    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=60, num_rows=50, dim=D, noise=0.05, seed=7
    )
    behaviors = pd.DataFrame(
        {"ImpressionID": np.arange(len(imps)), "History": hist, "Impressions": imps}
    )

    class InjectEmb(TransformDataComponent):
        def transform(self, context):
            context = super().transform(context)
            context["news_embeddings"] = align_embeddings(
                context["compiled"].news_ids, emb
            )
            return context

    pipe = Pipeline(
        "joint_chain",
        [
            ("transform", InjectEmb()),
            ("classification", ClassificationComponent(cfg=train_cfg())),
            (
                "weight",
                AttentionWeightComponent(
                    tower_config=tiny_tower_cfg(), cfg=train_cfg()
                ),
            ),
        ],
        cache_dir=tmp_path,
    )
    context, _ = pipe.train({"behaviors": behaviors})
    assert context["metrics"] is not None
    # Cached second run returns the same result without retraining.
    context2, _ = pipe.train({"behaviors": behaviors})
    assert context2["metrics"] == context["metrics"]
