"""Transformer news-text encoder (e5 / XLM-RoBERTa geometry), TPU-native.

Capability parity with the reference's frozen HF encoder path
(``modeling_utils.py:85-103`` loads ``intfloat/multilingual-e5-large-instruct``,
a 24-layer XLM-R-large; pooling dispatch ``:62-75`` selects masked-mean for
``XLMRobertaModel``; embeddings are L2-normalized downstream,
``data_model_helper.py:65-78``).

Differences by design:
- pure flax module, bf16 compute / f32 params, everything jittable;
- ``convert_hf_state_dict`` maps a HuggingFace ``XLMRobertaModel`` /
  ``BertModel``-family torch state dict onto this module's params so existing
  checkpoints load without the transformers runtime in the serving path;
- instruction prefixes (query vs passage duality, ``config.py:37-39``) are
  handled at tokenization time by the caller.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from .pooling import POOLING


class EncoderLayer(nn.Module):
    """Post-norm BERT/XLM-R block."""

    hidden_dim: int
    num_heads: int
    intermediate_dim: int
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        head_dim = self.hidden_dim // self.num_heads
        b, l, _ = hidden.shape
        q = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q")(hidden)
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k")(hidden)
        v = nn.Dense(self.hidden_dim, dtype=self.dtype, name="v")(hidden)

        def split(t):
            return t.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k)
        ) * (head_dim**-0.5)
        bias = (1.0 - mask[:, None, None, :].astype(logits.dtype)) * jnp.finfo(
            logits.dtype
        ).min
        probs = nn.softmax(logits + bias, axis=-1)
        ctx = (
            jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
            .transpose(0, 2, 1, 3)
            .reshape(b, l, self.hidden_dim)
        )
        attn_out = nn.Dense(self.hidden_dim, dtype=self.dtype, name="attn_out")(ctx)
        hidden = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="attn_norm"
        )(hidden + attn_out)

        inter = nn.gelu(
            nn.Dense(self.intermediate_dim, dtype=self.dtype, name="ffn_in")(hidden),
            approximate=False,
        )
        ffn_out = nn.Dense(self.hidden_dim, dtype=self.dtype, name="ffn_out")(inter)
        return nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=self.dtype, name="ffn_norm"
        )(hidden + ffn_out)


class NewsEncoder(nn.Module):
    """XLM-R-style encoder producing pooled, optionally L2-normalized news
    embeddings."""

    config: EncoderConfig = EncoderConfig()

    @nn.compact
    def hidden_states(
        self,
        token_ids: jnp.ndarray,  # [B, T] int32
        mask: jnp.ndarray,  # [B, T]
    ) -> jnp.ndarray:
        """Per-token last hidden states [B, T, D] (the token-store producer;
        reference ``store_text_embed_full_eval`` reads ``last_hidden_state``,
        ``modeling_utils.py:463``)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_dim, dtype=dtype, name="word_embeddings"
        )(token_ids)
        # RoBERTa position ids: pad_token positions are skipped; positions start
        # at padding_idx+1 = 2 for real tokens (HF create_position_ids...).
        positions = (
            jnp.cumsum(mask.astype(jnp.int32), axis=1) * mask.astype(jnp.int32) + 1
        )
        pos = nn.Embed(
            cfg.max_position, cfg.hidden_dim, dtype=dtype, name="position_embeddings"
        )(positions)
        tok_type = nn.Embed(
            1, cfg.hidden_dim, dtype=dtype, name="token_type_embeddings"
        )(jnp.zeros_like(token_ids))
        hidden = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="embeddings_norm")(
            word + pos + tok_type
        )
        for i in range(cfg.num_layers):
            hidden = EncoderLayer(
                cfg.hidden_dim,
                cfg.num_heads,
                cfg.intermediate_dim,
                dtype=dtype,
                name=f"layer_{i}",
            )(hidden, mask)
        return hidden.astype(jnp.float32)

    def __call__(
        self,
        token_ids: jnp.ndarray,  # [B, T] int32
        mask: jnp.ndarray,  # [B, T]
    ) -> jnp.ndarray:
        cfg = self.config
        hidden = self.hidden_states(token_ids, mask)
        pooled = POOLING[cfg.pooling](hidden, mask)
        if cfg.normalize:
            pooled = pooled / jnp.sqrt(
                (pooled * pooled).sum(-1, keepdims=True) + 1e-12
            )
        return pooled


# ---------------------------------------------------------------------------
# HF torch state-dict conversion
# ---------------------------------------------------------------------------


def convert_hf_state_dict(
    state_dict: dict[str, "np.ndarray"], config: EncoderConfig
) -> dict:
    """Map a HuggingFace ``XLMRobertaModel``/``BertModel`` torch state dict (as
    numpy arrays) onto ``NewsEncoder`` params. Torch ``Linear`` stores [out, in];
    flax ``Dense`` wants [in, out]."""

    def g(key):
        arr = state_dict[key]
        return np.asarray(arr)

    def lin(prefix):
        return {"kernel": g(prefix + ".weight").T, "bias": g(prefix + ".bias")}

    def ln(prefix):
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    emb = "embeddings"
    params: dict[str, Any] = {
        "word_embeddings": {"embedding": g(f"{emb}.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": g(f"{emb}.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "embedding": g(f"{emb}.token_type_embeddings.weight")
        },
        "embeddings_norm": ln(f"{emb}.LayerNorm"),
    }
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": lin(f"{p}.attention.self.query"),
            "k": lin(f"{p}.attention.self.key"),
            "v": lin(f"{p}.attention.self.value"),
            "attn_out": lin(f"{p}.attention.output.dense"),
            "attn_norm": ln(f"{p}.attention.output.LayerNorm"),
            "ffn_in": lin(f"{p}.intermediate.dense"),
            "ffn_out": lin(f"{p}.output.dense"),
            "ffn_norm": ln(f"{p}.output.LayerNorm"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# Offline-safe tokenizer fallback
# ---------------------------------------------------------------------------


class HashTokenizer:
    """Deterministic whitespace+hash tokenizer for environments without HF
    tokenizer files (tests, synthetic data). Produces [B, T] int32 ids + mask
    with BOS=0 / EOS=2 / PAD=1, ids in [3, vocab)."""

    def __init__(self, vocab_size: int = 250002, max_length: int = 512):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos, self.pad, self.eos = 0, 1, 2

    def _tok(self, word: str) -> int:
        import hashlib

        h = int.from_bytes(
            hashlib.md5(word.lower().encode()).digest()[:4], "little"
        )
        return 3 + h % (self.vocab_size - 3)

    def __call__(
        self, texts: list[str], max_length: Optional[int] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        T = max_length or self.max_length
        ids = np.full((len(texts), T), self.pad, dtype=np.int32)
        mask = np.zeros((len(texts), T), dtype=np.int32)
        for i, text in enumerate(texts):
            toks = [self.bos] + [self._tok(w) for w in text.split()][: T - 2] + [
                self.eos
            ]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask
