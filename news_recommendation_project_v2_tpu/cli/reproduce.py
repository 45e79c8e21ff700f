"""One-command BASELINE reproduction protocol (SURVEY.md §6): ingest ->
tokenize+encode (real checkpoint when given) -> run the BASELINE config[0..4]
scenarios -> emit one metric row per config, in BASELINE.md's row format.

Real MIND data (reference pipeline reproduction):

    nrtpu-reproduce DATA_DIR --hf-checkpoint /path/to/e5-large-instruct

Offline / CI dry-run on the synthetic fixture:

    nrtpu-reproduce DATA_DIR --synthetic --tiny-encoder --epochs 1

DATA_DIR must hold the raw MIND TSVs under <dataset>/ (``--synthetic``
generates them). Rows print as ``CONFIG_ROW {json}`` lines and are written to
``--out`` as JSON; config[2] (end-to-end encoder training) is opt-in via
``--with-e2e`` (its frozen token store is the heavy artifact), and the mesh
scenarios config[3..4] run whenever more than one device is visible.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..config import (
    QUERY_INSTRUCTION,
    MeshConfig,
    NewsDataset,
    TrainConfig,
)
from .common import build_context, build_encoder
from ..utils.compile_cache import enable_persistent_compile_cache


def _compile_and_encode(data_dir, dataset, enc, tok, params, max_length):
    from ..pipeline import (
        EmbeddingsComponent,
        Pipeline,
        TransformDataComponent,
    )

    pipe = Pipeline(
        name=f"reproduce_{dataset.value}",
        steps=[
            ("transform", TransformDataComponent()),
            (
                "embed",
                EmbeddingsComponent(
                    lambda p, i, m: enc.apply(p, i, m),
                    params,
                    lambda texts: tok(texts, max_length=max_length),
                    QUERY_INSTRUCTION,
                    batch_size=None,  # analytic auto-sizing
                    encoder_config=enc.config,
                ),
            ),
        ],
        use_cache=False,
    )
    ctx, _ = pipe.transform(build_context(data_dir, dataset))
    return ctx


def _row(index: int, description: str, metrics: dict) -> dict:
    return {
        "config": index,
        "description": description,
        **{k: round(float(v), 4) for k, v in metrics.items()},
    }


def main(argv=None):
    # Durable XLA compile cache: every invocation after the first skips
    # the 30-500s-per-program cold compiles (utils/compile_cache.py).
    enable_persistent_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("--train-dataset", default="MINDsmall_train",
                        choices=NewsDataset._member_names_)
    parser.add_argument("--dev-dataset", default="MINDsmall_dev",
                        choices=NewsDataset._member_names_)
    parser.add_argument("--hf-checkpoint", type=Path, default=None,
                        help="HF e5 checkpoint dir (real tokenizer + weights)")
    parser.add_argument("--synthetic", action="store_true",
                        help="generate the synthetic raw fixture first")
    parser.add_argument("--tiny-encoder", action="store_true",
                        help="small random encoder (offline/CI dry-run)")
    parser.add_argument("--max-length", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--with-e2e", action="store_true",
                        help="also run config[2] (frozen token store + e2e)")
    parser.add_argument("--out", type=Path, default=Path("reproduction.json"))
    args = parser.parse_args(argv)

    import jax

    from ..configs import (
        BASELINE_CONFIGS,
        _sized_tower,
        run_config0,
        run_config1,
        run_config2,
        run_config3,
        run_config4,
    )
    from ..data.ingest import store_processed_data

    train_ds = NewsDataset[args.train_dataset]
    dev_ds = NewsDataset[args.dev_dataset]

    # 1. Ingest (nrtpu-ingest equivalent).
    if args.synthetic:
        from ..data.synthetic import write_synthetic_mind

        for ds in (train_ds, dev_ds):
            write_synthetic_mind(args.data_dir, ds)
    for ds in (train_ds, dev_ds):
        store_processed_data(args.data_dir, ds)

    # 2. Encoder + tokenizer (nrtpu-save-emb equivalent, kept in memory).
    enc_cfg = None
    if args.tiny_encoder:
        from ..config import EncoderConfig

        enc_cfg = EncoderConfig(
            vocab_size=5003, hidden_dim=128, num_layers=2, num_heads=4,
            intermediate_dim=256, max_position=args.max_length + 2,
        )
    enc, tok, params = build_encoder(
        args.hf_checkpoint, enc_cfg, args.max_length
    )
    ctx_train = _compile_and_encode(
        args.data_dir, train_ds, enc, tok, params, args.max_length
    )
    ctx_dev = _compile_and_encode(
        args.data_dir, dev_ds, enc, tok, params, args.max_length
    )
    c_train, c_dev = ctx_train["compiled"], ctx_dev["compiled"]
    emb_train = ctx_train["news_embeddings"]
    emb_dev = ctx_dev["news_embeddings"]
    query_dev = ctx_dev["query_news_embeddings"]
    dim = emb_train.shape[1]
    tower_cfg = _sized_tower(dim)
    train_cfg = TrainConfig(
        learning_rate=args.lr, num_epochs=args.epochs, batch_size=args.batch_size
    )

    rows = []

    def emit(index, metrics):
        row = _row(index, BASELINE_CONFIGS[index].description, metrics)
        rows.append(row)
        print("CONFIG_ROW", json.dumps(row), flush=True)

    # 3. The scenarios.
    emit(0, run_config0(c_dev, emb_dev, query_news_embeddings=query_dev))
    emit(1, run_config1(
        c_train, emb_train, c_dev, emb_dev,
        train_cfg=train_cfg, tower_cfg=tower_cfg,
    ))
    if args.with_e2e:
        from ..ops.encode import build_token_store

        store = build_token_store(
            lambda p, i, m: enc.apply(p, i, m, method=type(enc).hidden_states),
            params,
            *tok([ctx_train["news_text_dict"][n] for n in c_train.news_ids],
                 max_length=args.max_length),
            batch_size=16,
        )
        emit(2, run_config2(
            c_train, store, dim=dim,
            train_cfg=TrainConfig(
                learning_rate=args.lr, num_epochs=max(1, args.epochs // 5),
                batch_size=min(32, args.batch_size),
            ),
            max_token_len=args.max_length,
        ))
    if jax.device_count() >= 2:
        mesh_cfg = MeshConfig(model_size=2 if jax.device_count() % 2 == 0 else 1)
        emit(3, run_config3(
            c_train, emb_train, c_dev, emb_dev,
            mesh_cfg=mesh_cfg, train_cfg=train_cfg, tower_cfg=tower_cfg,
        ))
        ids, mask = tok(
            [ctx_dev["news_text_dict"][n] for n in c_dev.news_ids],
            max_length=args.max_length,
        )
        emit(4, run_config4(
            c_dev, ids, mask, lambda p, i, m: enc.apply(p, i, m), params,
            mesh_cfg=mesh_cfg,
        ))
    else:
        print(
            f"configs 3-4 skipped: {jax.device_count()} device(s) visible, "
            "mesh scenarios need >=2 (use the virtual CPU mesh: "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8)"
        )

    args.out.parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"\n{len(rows)} config rows written to {args.out}")
    header = "| config | AUC | MRR | nDCG@5 | nDCG@10 |"
    print(header)
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| [{r['config']}] {r['description']} | {r['auc']} | {r['mrr']} "
            f"| {r['ndcg5']} | {r['ndcg10']} |"
        )
    return rows


if __name__ == "__main__":
    main()
