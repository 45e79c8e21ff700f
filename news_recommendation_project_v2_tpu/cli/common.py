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
from ..models.news_encoder import (
    HashTokenizer,
    NewsEncoder,
    convert_hf_state_dict,
    encoder_config_from_hf,
    load_hf_weights,
)


def tower_kwargs_for_dim(dim: Optional[int]) -> dict:
    """The CLI's ``--dim`` -> TowerConfig overrides mapping, shared by train /
    eval / serve so a checkpoint trained at ``--dim X`` restores everywhere."""
    if not dim:
        return {}
    return dict(
        embedding_dim=dim,
        reduced_dim=dim,
        hidden_dim=4 * dim,
        num_latents=min(64, dim),
        latent_dim_head=max(8, dim // 2),
    )


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
    allow_hash_tokenizer: bool = False,
    compute_dtype: Optional[str] = None,
):
    """Encoder + tokenizer + params.

    With ``hf_checkpoint`` pointing at an HF model directory, everything is
    derived from the checkpoint the way the reference's ``AutoModel``/
    ``AutoTokenizer`` pair does (``modeling_utils.py:92-103``): geometry +
    pooling from ``config.json``, weights from safetensors (single or sharded)
    or ``pytorch_model.bin``, tokenization from ``tokenizer.json`` via the
    ``tokenizers`` engine — so raw text reproduces the reference's embeddings.

    Without a checkpoint: seeded random encoder + ``HashTokenizer`` (offline
    mode — synthetic/CI use only). A real checkpoint WITHOUT tokenizer files is
    an error unless ``allow_hash_tokenizer=True``, because real weights + hash
    token ids produce garbage embeddings.
    """
    import dataclasses

    path = Path(hf_checkpoint) if hf_checkpoint is not None else None
    hf_config = None
    if path is not None and path.is_dir() and (path / "config.json").exists():
        with open(path / "config.json") as f:
            hf_config = json.load(f)

    if path is not None and encoder_config is not None:
        # With real weights present, an explicit EncoderConfig would make
        # convert_hf_state_dict silently map only the first cfg.num_layers of
        # a deeper checkpoint -> garbage embeddings with no error. Geometry
        # must come from the checkpoint (config.json, or the e5 default for a
        # bare state-dict file).
        raise ValueError(
            "pass either hf_checkpoint or encoder_config, not both: an "
            "explicit EncoderConfig would silently mismatch checkpoint layers"
        )
    if hf_config is not None:
        cfg = encoder_config_from_hf(hf_config)
    elif path is not None:
        cfg = EncoderConfig()  # bare state-dict file: assume e5 geometry
    else:
        cfg = encoder_config or EncoderConfig()
    if compute_dtype is not None:
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    enc = NewsEncoder(cfg)

    if path is not None:
        from ..data.tokenizer import HFTokenizer, has_tokenizer_file

        if path.is_dir() and has_tokenizer_file(path):
            tok = HFTokenizer.from_dir(path, max_length=max_length)
        elif allow_hash_tokenizer:
            tok = HashTokenizer(vocab_size=cfg.vocab_size, max_length=max_length)
        else:
            raise FileNotFoundError(
                f"{path} has no tokenizer.json: real encoder weights with hash "
                "token ids produce garbage embeddings. Export the checkpoint "
                "with tokenizer.save_pretrained(...), or pass "
                "allow_hash_tokenizer=True for synthetic-data use."
            )
        params = convert_hf_state_dict(load_hf_weights(path), cfg)
    else:
        tok = HashTokenizer(vocab_size=cfg.vocab_size, max_length=max_length)
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
