"""Primary training CLI (reference ``scripts/train_v2.py``): Transform ->
LoadEmbedding -> Classification -> Attention tower, with final scores logged.

    python -m news_recommendation_project_v2_tpu.cli.train DATA_DIR \
        --train MINDsmall_train --dev MINDsmall_dev --emb-dir embeddings \
        --tower latent --epochs 5
"""

from __future__ import annotations

import argparse
from pathlib import Path

from ..config import NewsDataset, TowerConfig, TrainConfig
from ..pipeline import (
    AttentionComponent,
    ClassificationComponent,
    LoadEmbeddingComponent,
    Pipeline,
    TransformDataComponent,
)
from .common import build_context, log_final_scores
from ..utils.compile_cache import enable_persistent_compile_cache


def main(argv=None):
    # Durable XLA compile cache: every invocation after the first skips
    # the 30-500s-per-program cold compiles (utils/compile_cache.py).
    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("--train", default="MINDsmall_train", choices=NewsDataset._member_names_)
    parser.add_argument("--dev", default="MINDsmall_dev", choices=NewsDataset._member_names_)
    parser.add_argument("--emb-dir", type=Path, default=Path("embeddings"))
    parser.add_argument(
        "--encode-inline",
        action="store_true",
        help="encode news texts inside the pipeline instead of loading a dump "
        "(the reference's scripts/train.py full-from-raw-text configuration)",
    )
    parser.add_argument("--hf-checkpoint", type=Path, default=None)
    parser.add_argument("--max-length", type=int, default=128)
    parser.add_argument("--tower", default="latent", choices=["latent", "final_attention", "transformer"])
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--cls-epochs", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--dim", type=int, default=None, help="embedding dim override")
    parser.add_argument(
        "--mesh",
        default=None,
        metavar="DATA,MODEL",
        help="run training + eval scoring sharded over a (data, model) device "
        "mesh, e.g. --mesh 4,2 (the config[3] scenario; device count must "
        "equal data*model)",
    )
    parser.add_argument("--log-dir", type=Path, default=Path("logs"))
    parser.add_argument("--ckpt-dir", type=Path, default=Path("models"))
    parser.add_argument("--exp-name", default=None)
    parser.add_argument("--no-cache", action="store_true")
    args = parser.parse_args(argv)

    train_ds = NewsDataset[args.train]
    dev_ds = NewsDataset[args.dev]
    exp_name = args.exp_name or f"e5_query_{args.tower}"

    from .common import tower_kwargs_for_dim

    mesh = None
    if args.mesh:
        from ..config import MeshConfig
        from ..parallel import build_mesh

        try:
            data_size, model_size = (int(x) for x in args.mesh.split(","))
        except ValueError:
            parser.error("--mesh wants DATA,MODEL integers, e.g. 4,2")
        mesh = build_mesh(MeshConfig(data_size=data_size, model_size=model_size))

    tower_cfg = TowerConfig(kind=args.tower, **tower_kwargs_for_dim(args.dim))
    cls_cfg = TrainConfig(
        learning_rate=args.lr, num_epochs=args.cls_epochs, batch_size=args.batch_size
    )
    attn_cfg = TrainConfig(
        learning_rate=args.lr, num_epochs=args.epochs, batch_size=args.batch_size
    )

    if args.encode_inline:
        from ..config import QUERY_INSTRUCTION, EncoderConfig
        from ..pipeline import EmbeddingsComponent
        from .common import build_encoder

        if args.hf_checkpoint and args.dim:
            parser.error(
                "--hf-checkpoint uses the full-size encoder; drop --dim "
                "(tower dims then default to the checkpoint's 1024)"
            )
        enc_cfg = (
            EncoderConfig(
                vocab_size=5003,
                hidden_dim=args.dim,
                num_layers=2,
                num_heads=4,
                intermediate_dim=2 * args.dim,
                max_position=args.max_length + 2,
            )
            if args.dim
            else None
        )
        enc, tok, enc_params = build_encoder(
            args.hf_checkpoint, enc_cfg, args.max_length
        )
        embedding_step = (
            "embed",
            EmbeddingsComponent(
                lambda p, i, m: enc.apply(p, i, m),
                enc_params,
                lambda texts: tok(texts, max_length=args.max_length),
                QUERY_INSTRUCTION,
            ),
        )
    else:
        embedding_step = ("load_embedding", _PerSplitLoad(args.emb_dir))

    pipe = Pipeline(
        name=f"train_{exp_name}",
        steps=[
            ("init_transform", TransformDataComponent()),
            embedding_step,
            (
                "classification",
                ClassificationComponent(
                    cfg=cls_cfg,
                    log_dir=args.log_dir,
                    ckpt_dir=args.ckpt_dir / "classification",
                    exp_name=exp_name,
                    mesh=mesh,
                ),
            ),
            (
                "only_attention",
                AttentionComponent(
                    tower_config=tower_cfg,
                    cfg=attn_cfg,
                    log_dir=args.log_dir,
                    ckpt_dir=args.ckpt_dir / "attention",
                    exp_name=exp_name,
                    mesh=mesh,
                ),
            ),
        ],
        use_cache=not args.no_cache,
    )
    train_context = build_context(args.data_dir, train_ds)
    val_context = build_context(args.data_dir, dev_ds)
    train_context, val_context = pipe.train(train_context, val_context)

    log_final_scores(
        args.log_dir,
        exp_name,
        train_context.get("metrics"),
        val_context.get("metrics") if val_context else None,
    )
    print("train metrics:", train_context.get("metrics"))
    print("dev metrics:", val_context.get("metrics") if val_context else None)


class _PerSplitLoad(LoadEmbeddingComponent):
    """Load the embedding dump matching each context's dataset split."""

    def __init__(self, save_dir: Path):
        super().__init__(save_dir, dataset_name="", with_query=True)

    def transform(self, context):
        self.dataset_name = context["dataset_name"]
        return super().transform(context)


if __name__ == "__main__":
    main()
