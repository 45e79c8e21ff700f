"""End-to-end token-level training CLI (reference ``scripts/train_v3.py``):
Transform -> StoreTokenStates -> AttentionAttention on the WITH_HISTORY subset.

    python -m news_recommendation_project_v2_tpu.cli.train_e2e DATA_DIR \
        --dataset MINDsmall_train --epochs 5
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from ..config import DataSubset, EncoderConfig, NewsDataset, TowerConfig, TrainConfig
from ..models import TokenAttentionPool, build_tower
from ..pipeline import (
    AttentionAttentionComponent,
    FinalAttentionComponent,
    Pipeline,
    StoreTokenStatesComponent,
    TransformDataComponent,
)
from .common import build_context, build_encoder, log_final_scores
from ..utils.compile_cache import enable_persistent_compile_cache


def main(argv=None):
    # Durable XLA compile cache: every invocation after the first skips
    # the 30-500s-per-program cold compiles (utils/compile_cache.py).
    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("--dataset", default="MINDsmall_train", choices=NewsDataset._member_names_)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-6)  # reference trainer.py:982
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--max-length", type=int, default=64)
    parser.add_argument("--log-dir", type=Path, default=Path("logs"))
    parser.add_argument("--ckpt-dir", type=Path, default=Path("models"))
    parser.add_argument("--exp-name", default="attn_attn")
    parser.add_argument("--hf-checkpoint", type=Path, default=None)
    args = parser.parse_args(argv)

    dataset = NewsDataset[args.dataset]
    enc_cfg = EncoderConfig(
        vocab_size=5003,
        hidden_dim=args.dim,
        num_layers=2,
        num_heads=4,
        intermediate_dim=args.dim * 2,
        max_position=args.max_length + 2,
    )
    enc, tok, enc_params = build_encoder(args.hf_checkpoint, enc_cfg, args.max_length)

    # Frozen encoder WITHOUT pooling feeds the token store; a 1-layer learned
    # token-attention encoder + the history tower then train end to end.
    def hidden_apply(p, ids, mask):
        return enc.apply(p, ids, mask, method="hidden_states")

    tok_model = TokenAttentionPool(hidden_size=args.dim, num_layers=1)
    tok_params = jax.jit(
        lambda: tok_model.init(
            jax.random.key(1),
            jnp.zeros((1, 8, args.dim)),
            jnp.ones((1, 8)),
        )
    )()
    tower = build_tower(
        TowerConfig(
            kind="latent",
            reduced_dim=args.dim,
            num_latents=min(64, args.dim),
            latent_dim_head=max(8, args.dim // 2),
        )
    )
    tower_params = jax.jit(
        lambda: tower.init(
            jax.random.key(2), jnp.zeros((1, 8, args.dim)), jnp.ones((1, 8))
        )
    )()

    cfg = TrainConfig(
        learning_rate=args.lr, num_epochs=args.epochs, batch_size=args.batch_size
    )
    pipe = Pipeline(
        name=f"train_e2e_{args.exp_name}",
        steps=[
            ("transform", TransformDataComponent()),
            (
                "store_tokens",
                StoreTokenStatesComponent(
                    hidden_apply,
                    enc_params,
                    lambda texts: tok(texts, max_length=args.max_length),
                    batch_size=16,
                ),
            ),
            (
                "attn_attn",
                AttentionAttentionComponent(
                    tok_model.apply,
                    tok_params,
                    tower.apply,
                    tower_params,
                    cfg=cfg,
                    log_dir=args.log_dir,
                    ckpt_dir=args.ckpt_dir / "attn_attn",
                    exp_name=args.exp_name,
                    max_token_len=args.max_length,
                ),
            ),
        ],
        use_cache=False,
    )
    context = build_context(
        args.data_dir, dataset, data_subset=DataSubset.WITH_HISTORY
    )
    context, _ = pipe.train(context)

    # Score with the learned embeddings (attention-only, with-history rows).
    scorer = FinalAttentionComponent(
        tower_config=TowerConfig(
            kind="latent",
            reduced_dim=args.dim,
            num_latents=min(64, args.dim),
            latent_dim_head=max(8, args.dim // 2),
        ),
        exp_name=args.exp_name,
    )
    scorer.params = pipe._steps[2][1]._trainer.params["tower"]
    context = scorer.transform(context)
    log_final_scores(args.log_dir, args.exp_name, context.get("metrics"), None)
    print("metrics:", context.get("metrics"))


if __name__ == "__main__":
    main()
