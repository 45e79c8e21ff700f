"""Global constants, enums, and experiment configuration dataclasses.

Capability parity with the reference's constants module
(``/root/reference/src/news_rec_utils/config.py:5-56``), re-designed as explicit
dataclasses instead of scattered literals (reference hyperparameters live inline in
``trainer.py:95,111,253,256,471,479``).
"""

from __future__ import annotations

import dataclasses
import enum
from pathlib import Path
from typing import Optional


class NewsDataset(enum.Enum):
    """MIND dataset splits (reference ``config.py:5-10``)."""

    MINDsmall_train = "MINDsmall_train"
    MINDsmall_dev = "MINDsmall_dev"
    MINDlarge_train = "MINDlarge_train"
    MINDlarge_dev = "MINDlarge_dev"
    MINDlarge_test = "MINDlarge_test"


class DataSubset(enum.Enum):
    """Row filter on the behaviors table (reference ``config.py:13-16``)."""

    WITH_HISTORY = "with_history"
    WITHOUT_HISTORY = "without_history"
    ALL = "all"


# Encoder/embedding geometry (reference ``config.py:24-35``).
MODEL_PATH = "intfloat/multilingual-e5-large-instruct"
NEWS_TEXT_MAXLEN = 512
EMBEDDING_DIM = 1024
REDUCED_DIM = EMBEDDING_DIM
IMPRESSION_MAXLEN = 600
NUM_HIDDEN_LAYERS = 1
ENTITY_EMBEDDING_DIM = 100

# Instruction prompts (reference ``config.py:37-39``).
NEWS_CLASSIFICATION_PROMPT = (
    "Please analyze the following news article to inform if the user would read "
    "the following news article.\nThe news article is: "
)
QUERY_INSTRUCTION = (
    "Instruct: Given a news article that the user has read, retrieve news articles "
    "that the user would also read \nQuery: "
)

# Global default seed (reference ``config.py:55-56`` / ``scripts/train_v2.py:32``).
DEFAULT_SEED = 1234

# Host-side parallelism for input pipeline / metrics (reference ``config.py:43``).
NUM_WORKERS = 4

# Static shape buckets. XLA compiles one program per distinct shape, so ragged
# history / impression lengths are padded up to the nearest bucket instead of the
# reference's pad-to-batch-max (``data_utils.py:723-750``).
HISTORY_BUCKETS: tuple[int, ...] = (16, 32, 64, 128, 256, IMPRESSION_MAXLEN)
IMPRESSION_BUCKETS: tuple[int, ...] = (8, 16, 32, 64, 128, 300)


def bucket_for(length: int, buckets: tuple[int, ...]) -> int:
    """Smallest bucket >= length (lengths beyond the last bucket are truncated to it)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def bucket_for_open(length: int, buckets: tuple[int, ...]) -> int:
    """Like ``bucket_for`` but open-ended: lengths beyond the last bucket round
    UP to the next multiple of it (never truncates — for axes where dropping
    items would be a correctness bug, e.g. a batch's unique-news union)."""
    for b in buckets:
        if length <= b:
            return b
    step = buckets[-1]
    return -(-length // step) * step


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes for pjit/shard_map sharding.

    ``data`` shards batches (replaces the reference's single-device batches,
    ``config.py:19``); ``model`` shards the news-embedding table rows and tower
    weights where profitable.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_size: int = -1  # -1: infer from available devices
    model_size: int = 1


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    """User-tower architecture (capability of reference ``modeling_utils.py:175-228``,
    ``attention.py:210-272``, ``latent_attention.py:77-171``)."""

    kind: str = "latent"  # final_attention | transformer | latent
    embedding_dim: int = EMBEDDING_DIM
    reduced_dim: int = REDUCED_DIM
    hidden_dim: int = 4096
    num_heads: int = 8
    num_layers: int = NUM_HIDDEN_LAYERS
    num_latents: int = 64
    latent_dim_head: int = 512
    dropout_rate: float = 0.1
    # Reference parity: ``attention.py:193`` makes each transformer layer return
    # LayerNorm(input), discarding attention/MLP outputs. ``as_built=True``
    # reproduces that behavior; False implements the intended block.
    as_built: bool = False
    # Route the latent tower's cross-attention through the Pallas fused kernel.
    fused_attention: bool = False
    param_dtype: str = "float32"
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization settings (reference ``trainer.py:469-483,626-631``)."""

    learning_rate: float = 1e-5
    weight_decay: float = 0.01  # torch AdamW default
    grad_clip_norm: float = 0.5
    margin: float = 2.0
    num_epochs: int = 5
    batch_size: int = 512
    num_neg_per_pos: int = 5  # InfoNCE sampler (reference ``data_utils.py:279``)
    max_neg_ratio: Optional[float] = None
    max_pos_ratio: Optional[float] = None
    seed: int = DEFAULT_SEED
    loss: str = "margin"  # margin | infonce
    # ReduceLROnPlateau(patience=2) parity (reference ``trainer.py:97-101``):
    # multiply the lr by ``plateau_factor`` after ``plateau_patience`` epochs
    # without val-metric improvement. 0 disables.
    plateau_patience: int = 0
    plateau_factor: float = 0.1
    # Fetch the step loss to host every N steps (bounding the async dispatch
    # queue) instead of every step. On local-PCIe hosts 1 is free; on
    # high-RTT tunneled devices the per-step sync dominates the step time
    # (measured ~58ms device vs ~500ms synced on the build box) — raise to
    # 8-32 there. Losses are still recorded for EVERY step.
    loss_sync_every: int = 1


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """News text encoder (capability of ``intfloat/multilingual-e5-large-instruct``:
    24-layer XLM-R-large geometry, mean pooling, L2 normalize; reference
    ``config.py:24-29``, ``modeling_utils.py:55-75``, ``data_model_helper.py:59-80``)."""

    vocab_size: int = 250002
    hidden_dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_dim: int = 4096
    max_position: int = 514
    layer_norm_eps: float = 1e-5
    pooling: str = "mean"  # mean | first | last
    normalize: bool = True
    max_length: int = NEWS_TEXT_MAXLEN
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # Decoder-architecture (Qwen2-class: rotary + RMSNorm + GQA + SwiGLU +
    # causal mask) support — the NV-Embed/gte-Qwen2 family on the reference's
    # model-shopping list (``config.py:60-69``, loaded via AutoModel
    # ``modeling_utils.py:85-89``). ``arch="bert"`` keeps the XLM-R/BERT
    # post-norm encoder layout.
    arch: str = "bert"  # bert | qwen2
    num_kv_heads: Optional[int] = None  # GQA; None -> num_heads (MHA)
    head_dim: Optional[int] = None  # None -> hidden_dim // num_heads
    rope_theta: float = 10000.0
    qkv_bias: bool = True  # Qwen2 biases q/k/v; HF config field attention_bias
    # NV-Embed-class wrapper pieces (reference ``get_nvembed_model``,
    # ``modeling_utils.py:371-399``, loaded there via trust_remote_code; here
    # the checkpoint's TENSORS map natively — no checkpoint-shipped Python
    # runs). ``bidirectional`` drops the causal half of the decoder attention
    # mask (NV-Embed's bidirectional-attention patch over its Mistral
    # backbone); ``latent_pool`` replaces the POOLING epilogue with the
    # latent-attention pooling head (the same module as the user tower,
    # ``models/latent_attention.py``) in the published geometry.
    bidirectional: bool = False
    latent_pool: bool = False
    latent_pool_num_latents: int = 512
    latent_pool_heads: int = 8
    latent_pool_dim_head: int = 4096


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """One experiment = data + tower + training + mesh (replaces per-script literals,
    reference ``scripts/train_v2.py:22-30``)."""

    name: str = "e5_query_latent_attention"
    data_dir: Path = Path("data")
    dataset_train: NewsDataset = NewsDataset.MINDsmall_train
    dataset_dev: NewsDataset = NewsDataset.MINDsmall_dev
    data_subset: DataSubset = DataSubset.ALL
    tower: TowerConfig = dataclasses.field(default_factory=TowerConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    log_dir: Path = Path("logs")
    ckpt_dir: Path = Path("models")
