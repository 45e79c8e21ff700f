"""Eval-only CLI (reference ``scripts/eval.py``): Transform -> LoadEmbedding ->
FinalAttention scoring from a checkpoint, WITH_HISTORY subset, scores to JSONL.

    python -m news_recommendation_project_v2_tpu.cli.eval DATA_DIR \
        --dataset MINDsmall_dev --emb-dir embeddings --ckpt models/attention/Epoch_5
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..config import DataSubset, NewsDataset, TowerConfig
from ..pipeline import FinalAttentionComponent, Pipeline, TransformDataComponent
from .common import build_context, log_final_scores
from .train import _PerSplitLoad
from ..utils.compile_cache import enable_persistent_compile_cache


def main(argv=None):
    # Durable XLA compile cache: every invocation after the first skips
    # the 30-500s-per-program cold compiles (utils/compile_cache.py).
    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("--dataset", default="MINDsmall_dev", choices=NewsDataset._member_names_)
    parser.add_argument("--emb-dir", type=Path, default=Path("embeddings"))
    parser.add_argument("--ckpt", type=Path, default=None)
    parser.add_argument("--tower", default="latent", choices=["latent", "final_attention", "transformer"])
    parser.add_argument("--dim", type=int, default=None)
    parser.add_argument("--log-dir", type=Path, default=Path("logs"))
    parser.add_argument("--exp-name", default="eval")
    args = parser.parse_args(argv)

    from .common import tower_kwargs_for_dim

    dataset = NewsDataset[args.dataset]
    tower_kwargs = tower_kwargs_for_dim(args.dim)
    pipe = Pipeline(
        name=f"eval_{args.exp_name}",
        steps=[
            ("transform", TransformDataComponent()),
            ("load_embedding", _PerSplitLoad(args.emb_dir)),
            (
                "final_attention",
                FinalAttentionComponent(
                    tower_config=TowerConfig(kind=args.tower, **tower_kwargs),
                    warm_start=args.ckpt,
                    exp_name=args.exp_name,
                ),
            ),
        ],
        use_cache=False,
    )
    context, _ = pipe.transform(
        build_context(args.data_dir, dataset, data_subset=DataSubset.WITH_HISTORY)
    )
    log_final_scores(args.log_dir, args.exp_name, None, context.get("metrics"))
    print("metrics:", context.get("metrics"))


if __name__ == "__main__":
    main()
