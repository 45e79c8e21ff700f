"""End-to-end pipeline + CLI tests on the synthetic fixture: ingest -> save_emb
-> train -> eval through the real argparse entry points (reference call stacks
§3.1-3.4)."""

import json

import numpy as np
import pytest

from news_recommendation_project_v2_tpu.cli import eval as eval_cli
from news_recommendation_project_v2_tpu.cli import ingest as ingest_cli
from news_recommendation_project_v2_tpu.cli import save_emb as save_emb_cli
from news_recommendation_project_v2_tpu.cli import train as train_cli
from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
from news_recommendation_project_v2_tpu.data import compile_behaviors
from news_recommendation_project_v2_tpu.pipeline import (
    AttentionComponent,
    ClassificationComponent,
    Pipeline,
    PipelineComponent,
    TransformDataComponent,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mind")
    for ds in ("MINDsmall_train", "MINDsmall_dev"):
        ingest_cli.main([str(root), ds, "--synthetic"])
        save_emb_cli.main(
            [
                str(root),
                ds,
                "--save-dir",
                str(root / "embeddings"),
                "--tiny-encoder",
                "--max-length",
                "24",
                "--batch-size",
                "16",
            ]
        )
    return root


def test_cli_train_and_eval(data_root, capsys):
    train_cli.main(
        [
            str(data_root),
            "--emb-dir",
            str(data_root / "embeddings"),
            "--tower",
            "latent",
            "--epochs",
            "1",
            "--cls-epochs",
            "1",
            "--batch-size",
            "32",
            "--dim",
            "128",
            "--log-dir",
            str(data_root / "logs"),
            "--ckpt-dir",
            str(data_root / "models"),
            "--no-cache",
        ]
    )
    out = capsys.readouterr().out
    assert "dev metrics" in out
    final = (data_root / "logs" / "final_scores.jsonl").read_text().strip().splitlines()
    rec = json.loads(final[-1])
    assert rec["train_scores"]["auc"] >= 0
    assert rec["eval_scores"]["auc"] >= 0
    # Checkpoints written by both trainers.
    assert (data_root / "models" / "attention" / "Epoch_1").exists()

    eval_cli.main(
        [
            str(data_root),
            "--dataset",
            "MINDsmall_dev",
            "--emb-dir",
            str(data_root / "embeddings"),
            "--ckpt",
            str(data_root / "models" / "attention" / "Epoch_1"),
            "--tower",
            "latent",
            "--dim",
            "128",
            "--log-dir",
            str(data_root / "logs"),
        ]
    )
    out = capsys.readouterr().out
    assert "metrics" in out


def test_cli_train_with_mesh_matches_single_device(data_root, capsys):
    """--mesh 4,2: the whole CLI pipeline (classification + tower, training
    AND eval scoring) runs sharded over the 8 virtual devices and produces the
    same final metrics as the single-device run."""
    common = [
        str(data_root),
        "--emb-dir", str(data_root / "embeddings"),
        "--tower", "latent",
        "--epochs", "1",
        "--cls-epochs", "1",
        "--batch-size", "32",
        "--dim", "128",
        "--log-dir", str(data_root / "logs_mesh"),
        "--ckpt-dir", str(data_root / "models_mesh"),
        "--no-cache",
    ]
    train_cli.main(common + ["--mesh", "4,2"])
    out_mesh = capsys.readouterr().out
    train_cli.main(common)
    out_single = capsys.readouterr().out

    def metrics_of(out):
        line = next(l for l in out.splitlines() if l.startswith("dev metrics"))
        return eval(line.split(":", 1)[1])  # repr of a plain dict of floats

    m_mesh, m_single = metrics_of(out_mesh), metrics_of(out_single)
    for k, v in m_single.items():
        assert m_mesh[k] == pytest.approx(v, abs=1e-5), k


def test_pipeline_cache_hit_and_invalidation(tmp_path, rng):
    calls = {"n": 0}

    class Counting(PipelineComponent):
        def __init__(self, tag):
            self.tag = tag

        def transform(self, context):
            calls["n"] += 1
            context["out"] = context.get("out", 0) + 1
            return context

    p1 = Pipeline("t", [("s", Counting("a"))], cache_dir=tmp_path)
    p1.transform({"x": 1})
    assert calls["n"] == 1
    # Same config -> cache hit.
    p2 = Pipeline("t", [("s", Counting("a"))], cache_dir=tmp_path)
    p2.transform({"x": 1})
    assert calls["n"] == 1
    # Changed component config -> cache MISS (fixes reference stale-cache quirk).
    p3 = Pipeline("t", [("s", Counting("b"))], cache_dir=tmp_path)
    p3.transform({"x": 1})
    assert calls["n"] == 2


def test_required_keys_enforced():
    class Needs(PipelineComponent):
        required_keys = {"missing"}

        def transform(self, context):
            return context

    p = Pipeline("t2", [("s", Needs())], use_cache=False)
    with pytest.raises(AssertionError, match="missing"):
        p.transform({})


def test_components_direct(rng):
    from news_recommendation_project_v2_tpu.data.synthetic import (
        align_embeddings,
        synthetic_learnable_behaviors,
    )

    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=80, num_rows=80, dim=32, noise=0.05
    )
    import pandas as pd

    behaviors = pd.DataFrame(
        {
            "ImpressionID": np.arange(len(imps)),
            "History": hist,
            "Impressions": imps,
        }
    )
    c = compile_behaviors(imps, hist)
    context = {"behaviors": behaviors}
    context = TransformDataComponent().transform(context)
    context["news_embeddings"] = align_embeddings(
        context["compiled"].news_ids, emb
    )
    cfg = TrainConfig(learning_rate=3e-4, num_epochs=1, batch_size=32, seed=0)
    cls = ClassificationComponent(cfg=cfg)
    cls.train(context)
    context = cls.transform(context)
    assert "classification_preds" in context
    attn = AttentionComponent(
        tower_config=TowerConfig(
            kind="latent", reduced_dim=32, num_latents=4, latent_dim_head=8
        ),
        cfg=cfg,
    )
    attn.train(context)
    context = attn.transform(context)
    assert context["metrics"] is not None
    assert 0 <= context["metrics"]["auc"] <= 1
