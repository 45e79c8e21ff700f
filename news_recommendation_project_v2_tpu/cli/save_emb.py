"""Embedding precompute CLI (reference ``scripts/save_emb.py``): transform ->
encode -> save query+passage embedding dumps.

    python -m news_recommendation_project_v2_tpu.cli.save_emb DATA_DIR MINDsmall_train --save-dir embeddings
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..config import QUERY_INSTRUCTION, EncoderConfig, NewsDataset
from ..pipeline import (
    EmbeddingsComponent,
    Pipeline,
    SaveEmbeddingComponent,
    TransformDataComponent,
)
from .common import build_context, build_encoder
from ..utils.compile_cache import enable_persistent_compile_cache


def main(argv=None):
    # Durable XLA compile cache: every invocation after the first skips
    # the 30-500s-per-program cold compiles (utils/compile_cache.py).
    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("news_dataset", choices=NewsDataset._member_names_)
    parser.add_argument("--save-dir", type=Path, default=Path("embeddings"))
    parser.add_argument("--hf-checkpoint", type=Path, default=None)
    parser.add_argument(
        "--batch-size",
        type=int,
        default=0,
        help="0 (default) sizes the encode batch from the analytic memory model",
    )
    parser.add_argument("--max-length", type=int, default=128)
    parser.add_argument(
        "--tiny-encoder",
        action="store_true",
        help="small random encoder (offline/synthetic mode)",
    )
    args = parser.parse_args(argv)
    dataset = NewsDataset[args.news_dataset]

    enc_cfg = (
        EncoderConfig(
            vocab_size=5003,
            hidden_dim=128,
            num_layers=2,
            num_heads=4,
            intermediate_dim=256,
            max_position=args.max_length + 2,
        )
        if args.tiny_encoder
        else None
    )
    enc, tok, params = build_encoder(args.hf_checkpoint, enc_cfg, args.max_length)

    pipe = Pipeline(
        name=f"save_emb_{dataset.value}",
        steps=[
            ("transform", TransformDataComponent()),
            (
                "embed",
                EmbeddingsComponent(
                    lambda p, i, m: enc.apply(p, i, m),
                    params,
                    lambda texts: tok(texts, max_length=args.max_length),
                    QUERY_INSTRUCTION,
                    args.batch_size or None,  # 0 -> analytic auto-sizing
                    encoder_config=enc.config,
                ),
            ),
            ("save", SaveEmbeddingComponent(args.save_dir, dataset.value)),
        ],
        use_cache=False,
    )
    context, _ = pipe.transform(build_context(args.data_dir, dataset))
    emb = context["news_embeddings"]
    print(
        f"saved {emb.shape} embeddings to {args.save_dir} "
        f"(unit-norm: {bool(np.allclose(np.linalg.norm(emb, axis=1), 1, atol=1e-3))})"
    )


if __name__ == "__main__":
    main()
