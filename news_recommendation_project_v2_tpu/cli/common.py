"""Shared CLI plumbing: dataset loading into pipeline contexts, encoder setup,
final-score logging (reference ``scripts/*.py`` preamble + tail)."""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import DataSubset, EncoderConfig, NewsDataset
from ..data.ingest import load_dataset
from ..models.news_encoder import HashTokenizer, NewsEncoder, convert_hf_state_dict


def build_context(
    data_dir: Path,
    dataset: NewsDataset,
    data_subset: DataSubset = DataSubset.ALL,
    num_samples: Optional[int] = None,
) -> dict:
    ds = load_dataset(data_dir, dataset, num_samples=num_samples, data_subset=data_subset)
    return {
        "behaviors": ds.behaviors,
        "news_text_dict": ds.news_text,
        "dataset_name": dataset.value,
        "news_category": ds.news_category,
        "news_subcategory": ds.news_subcategory,
        "news_title_entity": ds.news_title_entity,
        "news_abstract_entity": ds.news_abstract_entity,
    }


def build_encoder(
    hf_checkpoint: Optional[Path] = None,
    encoder_config: Optional[EncoderConfig] = None,
    max_length: int = 128,
):
    """Encoder + tokenizer. With ``hf_checkpoint`` (a torch state-dict file or
    HF model dir) the weights are converted; otherwise a seeded random encoder
    + hash tokenizer (offline mode — synthetic/CI use)."""
    if hf_checkpoint is not None and encoder_config is not None:
        raise ValueError(
            "--hf-checkpoint requires the full-size default encoder geometry; "
            "a custom/tiny EncoderConfig would silently drop checkpoint layers"
        )
    cfg = encoder_config or EncoderConfig()
    enc = NewsEncoder(cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size, max_length=max_length)
    if hf_checkpoint is not None:
        import torch

        path = Path(hf_checkpoint)
        if path.is_dir():
            state = torch.load(
                path / "pytorch_model.bin", map_location="cpu", weights_only=True
            )
        else:
            state = torch.load(path, map_location="cpu", weights_only=True)
        params = convert_hf_state_dict(
            {k: v.numpy() for k, v in state.items()}, cfg
        )
    else:
        ids, mask = tok(["init"])
        params = jax.jit(
            lambda: enc.init(
                jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask)
            )
        )()
    return enc, tok, params


def log_final_scores(
    log_dir: Path, exp_name: str, train_metrics: Optional[dict], val_metrics: Optional[dict]
) -> None:
    """Append final metrics (reference ``scripts/train_v2.py:120-135``)."""
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    with open(log_dir / "final_scores.jsonl", "a") as f:
        f.write(
            json.dumps(
                {
                    "timestamp": datetime.now().isoformat(),
                    "exp_name": exp_name,
                    "train_scores": train_metrics,
                    "eval_scores": val_metrics,
                }
            )
            + "\n"
        )
