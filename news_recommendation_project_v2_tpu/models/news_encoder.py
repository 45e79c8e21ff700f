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


def _rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float, dtype):
    """HF rotate-half RoPE tables: [T, head_dim] cos/sin with the frequency
    vector repeated twice (transformers ``Qwen2RotaryEmbedding`` convention,
    NOT interleaved)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class DecoderLayer(nn.Module):
    """Qwen2-class pre-norm decoder block: RMSNorm -> GQA attention with
    rotary embeddings and a causal+padding mask -> RMSNorm -> SwiGLU MLP
    (HF ``Qwen2DecoderLayer``; q/k/v biased, o/gate/up/down bias-free)."""

    hidden_dim: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_dim: int
    rms_norm_eps: float = 1e-6
    qkv_bias: bool = True  # Qwen2 carries q/k/v biases; Qwen3-style do not
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,  # [B, T, D]
        cos: jnp.ndarray,  # [T, head_dim]
        sin: jnp.ndarray,
        attn_bias: jnp.ndarray,  # [B, 1, T, T] additive
    ) -> jnp.ndarray:
        b, t, _ = hidden.shape
        h, kv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        x = nn.RMSNorm(
            epsilon=self.rms_norm_eps, dtype=self.dtype, name="input_norm"
        )(hidden)
        q = nn.Dense(
            h * hd, use_bias=self.qkv_bias, dtype=self.dtype, name="q_proj"
        )(x)
        k = nn.Dense(
            kv * hd, use_bias=self.qkv_bias, dtype=self.dtype, name="k_proj"
        )(x)
        v = nn.Dense(
            kv * hd, use_bias=self.qkv_bias, dtype=self.dtype, name="v_proj"
        )(x)
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, kv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, kv, hd).transpose(0, 2, 1, 3)
        q = q * cos[None, None] + _rotate_half(q) * sin[None, None]
        k = k * cos[None, None] + _rotate_half(k) * sin[None, None]
        if kv != h:  # grouped-query: repeat kv heads
            rep = h // kv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
        probs = nn.softmax(logits + attn_bias.astype(logits.dtype), axis=-1)
        ctx = (
            jnp.einsum("bhqk,bhkd->bhqd", probs, v)
            .transpose(0, 2, 1, 3)
            .reshape(b, t, h * hd)
        )
        attn_out = nn.Dense(
            self.hidden_dim, use_bias=False, dtype=self.dtype, name="o_proj"
        )(ctx)
        hidden = hidden + attn_out
        x = nn.RMSNorm(
            epsilon=self.rms_norm_eps, dtype=self.dtype, name="post_attn_norm"
        )(hidden)
        gate = nn.Dense(
            self.intermediate_dim, use_bias=False, dtype=self.dtype, name="gate_proj"
        )(x)
        up = nn.Dense(
            self.intermediate_dim, use_bias=False, dtype=self.dtype, name="up_proj"
        )(x)
        down = nn.Dense(
            self.hidden_dim, use_bias=False, dtype=self.dtype, name="down_proj"
        )(nn.silu(gate) * up)
        return hidden + down


class NewsEncoder(nn.Module):
    """News-text encoder producing pooled, optionally L2-normalized
    embeddings. Two layouts, selected by ``config.arch``:

    - ``"bert"``: XLM-R/BERT post-norm encoder (the e5 family);
    - ``"qwen2"``: causal-decoder layout with rotary/RMSNorm/GQA/SwiGLU —
      Qwen2, Mistral, and Llama checkpoints all map onto it (they share
      state-dict keys; only q/k/v bias presence differs). This covers the
      gte-Qwen2 family and the Mistral base NV-Embed-class models are built
      on (reference AutoModel load ``modeling_utils.py:85-89``,
      ``get_nvembed_model`` ``:371-399``; pooling dispatch ->last, ``:62-75``).
    """

    config: EncoderConfig = EncoderConfig()

    def setup(self):
        # setup() style (not @nn.compact): both ``hidden_states`` and
        # ``__call__`` are public entry points that create/use params, and
        # flax allows only one compact method per module — the latent_pool
        # head made the split unavoidable.
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.arch == "qwen2":
            self.word_embeddings = nn.Embed(
                cfg.vocab_size, cfg.hidden_dim, dtype=dtype,
                name="word_embeddings",
            )
            hd = cfg.head_dim or cfg.hidden_dim // cfg.num_heads
            kv = cfg.num_kv_heads or cfg.num_heads
            self.layers = [
                DecoderLayer(
                    cfg.hidden_dim,
                    cfg.num_heads,
                    kv,
                    hd,
                    cfg.intermediate_dim,
                    rms_norm_eps=cfg.layer_norm_eps,
                    qkv_bias=cfg.qkv_bias,
                    dtype=dtype,
                    name=f"layer_{i}",
                )
                for i in range(cfg.num_layers)
            ]
            self.final_norm = nn.RMSNorm(
                epsilon=cfg.layer_norm_eps, dtype=dtype, name="final_norm"
            )
        else:
            assert cfg.arch == "bert", f"unknown encoder arch {cfg.arch!r}"
            self.word_embeddings = nn.Embed(
                cfg.vocab_size, cfg.hidden_dim, dtype=dtype,
                name="word_embeddings",
            )
            self.position_embeddings = nn.Embed(
                cfg.max_position, cfg.hidden_dim, dtype=dtype,
                name="position_embeddings",
            )
            self.token_type_embeddings = nn.Embed(
                1, cfg.hidden_dim, dtype=dtype, name="token_type_embeddings"
            )
            self.embeddings_norm = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=dtype, name="embeddings_norm"
            )
            self.layers = [
                EncoderLayer(
                    cfg.hidden_dim,
                    cfg.num_heads,
                    cfg.intermediate_dim,
                    layer_norm_eps=cfg.layer_norm_eps,
                    dtype=dtype,
                    name=f"layer_{i}",
                )
                for i in range(cfg.num_layers)
            ]
        if cfg.latent_pool:
            # NV-Embed-class latent-attention pooling head — the SAME module
            # as the flagship user tower (the reference copied NV-Embed's
            # design for it, ``latent_attention.py:77-171``): tokens query
            # the learned latents, GEGLU FF, masked mean over tokens.
            from .latent_attention import LatentAttentionTower

            self.latent_pool = LatentAttentionTower(
                dim=cfg.hidden_dim,
                num_latents=cfg.latent_pool_num_latents,
                heads=cfg.latent_pool_heads,
                dim_head=cfg.latent_pool_dim_head,
                output_normalize=False,
                name="latent_pool",
            )

    def hidden_states(
        self,
        token_ids: jnp.ndarray,  # [B, T] int32
        mask: jnp.ndarray,  # [B, T]
    ) -> jnp.ndarray:
        """Per-token last hidden states [B, T, D] (the token-store producer;
        reference ``store_text_embed_full_eval`` reads ``last_hidden_state``,
        ``modeling_utils.py:463``)."""
        cfg = self.config
        if cfg.arch == "qwen2":
            return self._decoder_hidden_states(token_ids, mask)
        word = self.word_embeddings(token_ids)
        # RoBERTa position ids: pad_token positions are skipped; positions start
        # at padding_idx+1 = 2 for real tokens (HF create_position_ids...).
        positions = (
            jnp.cumsum(mask.astype(jnp.int32), axis=1) * mask.astype(jnp.int32) + 1
        )
        pos = self.position_embeddings(positions)
        tok_type = self.token_type_embeddings(jnp.zeros_like(token_ids))
        hidden = self.embeddings_norm(word + pos + tok_type)
        for layer in self.layers:
            hidden = layer(hidden, mask)
        return hidden.astype(jnp.float32)

    def _decoder_hidden_states(self, token_ids, mask) -> jnp.ndarray:
        """Qwen2-class forward: token embeddings (no learned positions —
        rotary inside attention), causal+padding mask, final RMSNorm.
        Position ids are ``arange(T)`` (transformers' default forward path;
        right-padding keeps real tokens at the front)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        hd = cfg.head_dim or cfg.hidden_dim // cfg.num_heads
        hidden = self.word_embeddings(token_ids)
        t = token_ids.shape[1]
        cos, sin = _rope_cos_sin(jnp.arange(t), hd, cfg.rope_theta, dtype)
        if cfg.bidirectional:
            # NV-Embed-class bidirectional attention: the remote-code wrapper
            # patches the causal mask out of its Mistral backbone (reference
            # loads it via trust_remote_code, ``modeling_utils.py:371-379``);
            # natively that is just padding-only masking.
            keep = jnp.broadcast_to(mask[:, None, None, :] > 0,
                                    (mask.shape[0], 1, t, t))
        else:
            causal = jnp.tril(jnp.ones((t, t), bool))
            keep = causal[None, None] & (mask[:, None, None, :] > 0)
        # Finite min of the COMPUTE dtype (like the bert path): f32's min
        # rounds to -inf in bfloat16, and an all-pad row (batch padding) would
        # then softmax to NaN instead of the harmless uniform distribution —
        # padded rows must stay NaN-inert (CLAUDE.md invariant).
        attn_bias = jnp.where(keep, 0.0, float(jnp.finfo(dtype).min))
        for layer in self.layers:
            hidden = layer(hidden, cos, sin, attn_bias)
        hidden = self.final_norm(hidden)
        return hidden.astype(jnp.float32)

    def __call__(
        self,
        token_ids: jnp.ndarray,  # [B, T] int32
        mask: jnp.ndarray,  # [B, T]
    ) -> jnp.ndarray:
        cfg = self.config
        hidden = self.hidden_states(token_ids, mask)
        if cfg.latent_pool:
            # The head normalizes via the shared epilogue below (the
            # published wrapper normalizes twice — module + ``get_nv_embeds``'s
            # F.normalize, ``modeling_utils.py:399`` — which is idempotent).
            pooled = self.latent_pool(hidden, mask.astype(jnp.float32))
        else:
            pooled = POOLING[cfg.pooling](hidden, mask)
        if cfg.normalize:
            pooled = pooled / jnp.sqrt(
                (pooled * pooled).sum(-1, keepdims=True) + 1e-12
            )
        return pooled


# ---------------------------------------------------------------------------
# HF torch state-dict conversion
# ---------------------------------------------------------------------------


_HF_KEY_PREFIXES = ("roberta.", "bert.", "model.")


def convert_hf_state_dict(
    state_dict: dict[str, "np.ndarray"], config: EncoderConfig
) -> dict:
    """Map a HuggingFace torch state dict (as numpy arrays) onto
    ``NewsEncoder`` params — BERT/XLM-R layouts, or Qwen2-class decoder
    layouts when ``config.arch == "qwen2"``. Torch ``Linear`` stores
    [out, in]; flax ``Dense`` wants [in, out]. Task-head prefixes
    (``roberta.`` / ``model.`` from ``*ForMaskedLM``/``*ForCausalLM``-style
    exports) are stripped."""
    if config.arch == "qwen2":
        return _convert_qwen2_state_dict(state_dict, config)
    for prefix in _HF_KEY_PREFIXES:
        if any(k.startswith(prefix + "embeddings.") for k in state_dict):
            state_dict = {
                k[len(prefix):]: v
                for k, v in state_dict.items()
                if k.startswith(prefix)
            }
            break

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


def _convert_qwen2_state_dict(
    state_dict: dict[str, "np.ndarray"], config: EncoderConfig
) -> dict:
    """Qwen2-class (``Qwen2Model``/``Qwen2ForCausalLM``) state dict ->
    ``NewsEncoder(arch="qwen2")`` params. The ``lm_head`` is dropped (the
    encoder consumes hidden states, never logits).

    NV-Embed-layout checkpoints (``NVEmbedModel``: Mistral backbone under
    ``embedding_model.``, pooling head under ``latent_attention_model.`` —
    reference loads them with trust_remote_code, ``modeling_utils.py:371-
    399``) convert natively too: the head's tensors map onto the
    ``latent_pool`` module via ``convert_latent_attention`` (the head IS the
    module this repo already ships, ``models/latent_attention.py``). No
    checkpoint-shipped Python executes."""
    head_state = None
    if any(k.startswith("embedding_model.") for k in state_dict):
        head_state = {
            k[len("latent_attention_model."):]: v
            for k, v in state_dict.items()
            if k.startswith("latent_attention_model.")
        }
        state_dict = {
            k[len("embedding_model."):]: v
            for k, v in state_dict.items()
            if k.startswith("embedding_model.")
        }
    if head_state is not None or config.latent_pool:
        if not head_state:
            raise ValueError(
                "EncoderConfig.latent_pool is set but the checkpoint has no "
                "latent_attention_model.* tensors — is this really an "
                "NV-Embed-layout checkpoint?"
            )
        if not config.latent_pool:
            raise ValueError(
                "checkpoint carries an NV-Embed latent_attention_model head "
                "but EncoderConfig.latent_pool is False; derive the config "
                "with encoder_config_from_hf on the checkpoint's config.json "
                "(architectures=['NVEmbedModel'] sets latent_pool and "
                "bidirectional)"
            )
    if any(k.startswith("model.") for k in state_dict):
        state_dict = {
            k[len("model."):]: v
            for k, v in state_dict.items()
            if k.startswith("model.")
        }

    def g(key):
        try:
            return np.asarray(state_dict[key])
        except KeyError:
            raise KeyError(
                f"Qwen2 checkpoint is missing {key!r} — is this really a "
                "Qwen2-class model? Present keys start with: "
                f"{sorted(state_dict)[:8]}"
            ) from None

    def lin(prefix, bias):
        out = {"kernel": g(prefix + ".weight").T}
        if bias:
            out["bias"] = g(prefix + ".bias")
        return out

    params: dict[str, Any] = {
        "word_embeddings": {"embedding": g("embed_tokens.weight")},
        "final_norm": {"scale": g("norm.weight")},
    }
    # q/k/v bias presence must agree with the module (EncoderConfig.qkv_bias,
    # filled from the HF config's attention_bias by encoder_config_from_hf);
    # a checkpoint that disagrees gets a clear error, not a flax
    # missing-parameter failure deep inside apply.
    has_bias = "layers.0.self_attn.q_proj.bias" in state_dict
    if has_bias != config.qkv_bias:
        raise ValueError(
            f"checkpoint qkv bias presence ({has_bias}) does not match "
            f"EncoderConfig.qkv_bias ({config.qkv_bias}); set "
            "EncoderConfig(qkv_bias=...) to match the checkpoint (HF config "
            "field: attention_bias)"
        )
    qkv_bias = config.qkv_bias
    for i in range(config.num_layers):
        p = f"layers.{i}"
        params[f"layer_{i}"] = {
            "input_norm": {"scale": g(f"{p}.input_layernorm.weight")},
            "q_proj": lin(f"{p}.self_attn.q_proj", qkv_bias),
            "k_proj": lin(f"{p}.self_attn.k_proj", qkv_bias),
            "v_proj": lin(f"{p}.self_attn.v_proj", qkv_bias),
            "o_proj": lin(f"{p}.self_attn.o_proj", bias=False),
            "post_attn_norm": {
                "scale": g(f"{p}.post_attention_layernorm.weight")
            },
            "gate_proj": lin(f"{p}.mlp.gate_proj", bias=False),
            "up_proj": lin(f"{p}.mlp.up_proj", bias=False),
            "down_proj": lin(f"{p}.mlp.down_proj", bias=False),
        }
    if head_state:
        from .convert_towers import convert_latent_attention

        params["latent_pool"] = convert_latent_attention(head_state)["params"]
    return {"params": params}


# Architectures with a native layout here. Everything else is a DESIGNED
# boundary: a clear error naming the supported families, not a KeyError deep
# inside weight conversion.
_SUPPORTED_ARCHS = {
    "XLMRobertaModel": ("bert", "mean"),
    "XLMRobertaForMaskedLM": ("bert", "mean"),
    "BertModel": ("bert", "first"),
    "BertForMaskedLM": ("bert", "first"),
    "Qwen2Model": ("qwen2", "last"),
    "Qwen2ForCausalLM": ("qwen2", "last"),
    # Mistral/Llama share the Qwen2 decoder layout (rotate-half rotary, GQA,
    # RMSNorm, SwiGLU, identical state-dict keys) modulo q/k/v biases, which
    # these families omit (HF ``attention_bias`` defaults False). This is the
    # base family NV-Embed-class models are built on (reference
    # ``get_nvembed_model``, ``modeling_utils.py:371-399``); the remote-code
    # wrapper itself (latent-attention pooling head) stays a designed boundary
    # — see MIGRATION.md.
    "MistralModel": ("qwen2", "last"),
    "MistralForCausalLM": ("qwen2", "last"),
    "LlamaModel": ("qwen2", "last"),
    "LlamaForCausalLM": ("qwen2", "last"),
}


def encoder_config_from_hf(hf_config: dict, **overrides) -> EncoderConfig:
    """Derive an ``EncoderConfig`` from an HF ``config.json`` dict, including
    the architecture-name pooling dispatch (reference ``output_pool``,
    ``modeling_utils.py:62-75``: Qwen2->last, XLM-R (e5)->mean) and the
    decoder-layout fields for Qwen2-class checkpoints. Unsupported
    architectures raise immediately with the supported list."""
    import dataclasses

    arch_name = (hf_config.get("architectures") or ["XLMRobertaModel"])[0]
    if arch_name == "NVEmbedModel":
        # NV-Embed composite config: Mistral-family backbone fields under
        # ``text_config``, pooling-head geometry under
        # ``latent_attention_config`` (the field names the reference's own
        # copy of the module reads, ``latent_attention.py``'s commented
        # config block). The wrapper's two behavioral pieces become plain
        # config: bidirectional attention + the latent_pool head.
        text = dict(hf_config.get("text_config") or {})
        if not text:
            raise ValueError(
                "NVEmbedModel config has no text_config (the Mistral-family "
                "backbone fields) — is this a complete NV-Embed config.json?"
            )
        text.setdefault("architectures", ["MistralModel"])
        lat = hf_config.get("latent_attention_config") or {}
        latent_dim = lat.get("latent_dim", text.get("hidden_size"))
        if latent_dim != text.get("hidden_size"):
            raise ValueError(
                f"NV-Embed latent_attention latent_dim={latent_dim} != "
                f"backbone hidden_size={text.get('hidden_size')}; the head is "
                "residual in the token stream so these must match"
            )
        return encoder_config_from_hf(
            text,
            **{
                "bidirectional": True,
                "latent_pool": True,
                "latent_pool_num_latents": lat.get(
                    "num_latents_value", lat.get("num_latents", 512)
                ),
                "latent_pool_heads": lat.get(
                    "num_cross_heads", lat.get("cross_heads", 8)
                ),
                "latent_pool_dim_head": lat.get("cross_dim_head", 4096),
                "pooling": "mean",  # the head mean-pools over tokens itself
                **overrides,
            },
        )
    try:
        arch, pooling = _SUPPORTED_ARCHS[arch_name]
    except KeyError:
        raise ValueError(
            f"architecture {arch_name!r} is not supported; supported HF "
            f"architectures: {sorted(_SUPPORTED_ARCHS)} (BERT/XLM-R encoder "
            "layouts and Qwen2/Mistral/Llama-class decoder layouts)"
        ) from None
    # Designed boundaries, raised LOUDLY at config time rather than silently
    # producing wrong embeddings: the rotary path applies plain rope_theta
    # only, and attention is always full (no sliding window).
    if hf_config.get("rope_scaling") is not None:
        raise ValueError(
            f"checkpoint {arch_name!r} uses rope_scaling="
            f"{hf_config['rope_scaling']!r}, which this rotary implementation "
            "does not apply (plain rope_theta only) — loading it would "
            "silently diverge from the checkpoint's positional encoding. "
            "Llama-3.1+-style scaled-RoPE checkpoints are out of scope; "
            "Llama/Mistral/Qwen2 checkpoints with rope_scaling null load "
            "natively."
        )
    sliding = hf_config.get("sliding_window")
    max_pos = hf_config.get("max_position_embeddings", 514)
    if sliding is not None and sliding < min(512, max_pos):
        raise ValueError(
            f"checkpoint {arch_name!r} uses sliding_window={sliding} (< the "
            "512-token news texts this framework encodes); attention here is "
            "always full-context, so hidden states would diverge from the "
            "checkpoint's. Windowed-attention checkpoints are out of scope."
        )
    cfg = EncoderConfig(
        vocab_size=hf_config["vocab_size"],
        hidden_dim=hf_config["hidden_size"],
        num_layers=hf_config["num_hidden_layers"],
        num_heads=hf_config["num_attention_heads"],
        intermediate_dim=hf_config["intermediate_size"],
        max_position=hf_config.get("max_position_embeddings", 514),
        layer_norm_eps=hf_config.get(
            "layer_norm_eps", hf_config.get("rms_norm_eps", 1e-5)
        ),
        pooling=pooling,
        arch=arch,
        num_kv_heads=hf_config.get("num_key_value_heads"),
        head_dim=hf_config.get("head_dim"),
        rope_theta=hf_config.get("rope_theta", 10000.0),
        # Qwen2 always biases q/k/v (its configs predate the field);
        # Mistral/Llama (and Qwen3-style configs) expose ``attention_bias``
        # and default to bias-free.
        qkv_bias=hf_config.get("attention_bias", arch_name.startswith("Qwen2")),
    )
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def load_hf_weights(path) -> dict[str, "np.ndarray"]:
    """Read an HF checkpoint's weights as numpy arrays, handling every format
    the ecosystem ships (the reference delegates to ``AutoModel``,
    ``modeling_utils.py:93-99``): single/sharded safetensors, then
    ``pytorch_model.bin``; a direct file path loads that file."""
    from pathlib import Path

    path = Path(path)

    def load_safetensors(f):
        from safetensors.numpy import load_file

        try:
            return load_file(f)
        except Exception:
            # bf16 tensors can't be viewed as numpy directly in older
            # safetensors; go through torch and downcast explicitly.
            import torch
            from safetensors.torch import load_file as load_torch

            return {k: v.float().numpy() for k, v in load_torch(f).items()}

    if path.is_file():
        if path.suffix == ".safetensors":
            return load_safetensors(path)
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
        return {k: np.asarray(v.float().numpy()) for k, v in state.items()}

    single = path / "model.safetensors"
    if single.exists():
        return load_safetensors(single)
    index = path / "model.safetensors.index.json"
    if index.exists():
        import json

        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        out: dict[str, np.ndarray] = {}
        for shard in sorted(set(weight_map.values())):
            out.update(load_safetensors(path / shard))
        return out
    binfile = path / "pytorch_model.bin"
    if binfile.exists():
        import torch

        state = torch.load(binfile, map_location="cpu", weights_only=True)
        return {k: np.asarray(v.float().numpy()) for k, v in state.items()}
    raise FileNotFoundError(
        f"No weights found under {path} (looked for model.safetensors, "
        "model.safetensors.index.json, pytorch_model.bin)"
    )


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
