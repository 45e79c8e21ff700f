"""Mistral/Llama decoder-layout encoder tests — VERDICT r3 item 4.

NV-Embed-class models (reference ``get_nvembed_model``,
``modeling_utils.py:371-399``; shopping list ``config.py:58-69``) are built on
Mistral-7B. The ``NewsEncoder(arch="qwen2")`` decoder layout must load
Mistral- and Llama-layout checkpoints natively (same state-dict keys as
Qwen2; q/k/v bias-free per HF ``attention_bias`` default False) and
reproduce the ACTUAL transformers forward from a converted checkpoint. The
remote-code NV-Embed wrapper itself (latent-attention pooling head) remains a
designed boundary documented in MIGRATION.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformers import LlamaConfig, MistralConfig  # noqa: E402
from transformers.models.llama.modeling_llama import LlamaModel  # noqa: E402
from transformers.models.mistral.modeling_mistral import MistralModel  # noqa: E402

from news_recommendation_project_v2_tpu.models.news_encoder import (  # noqa: E402
    NewsEncoder,
    convert_hf_state_dict,
    encoder_config_from_hf,
)

BASE_HF = {
    "vocab_size": 310,
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,  # grouped-query, like Mistral-7B's 32/8
    "intermediate_size": 64,
    "max_position_embeddings": 64,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
}


def _sd(model):
    return {k: v.detach().cpu().numpy().copy() for k, v in model.state_dict().items()}


def _parity_case(hf_model, arch_name, rng):
    cfg = encoder_config_from_hf(
        {**BASE_HF, "architectures": [arch_name]},
        compute_dtype="float32",
        normalize=False,
    )
    assert cfg.arch == "qwen2" and cfg.pooling == "last"
    assert cfg.qkv_bias is False, "Mistral/Llama layouts are q/k/v bias-free"
    variables = convert_hf_state_dict(_sd(hf_model), cfg)
    B, T = 3, 12
    ids = rng.integers(3, BASE_HF["vocab_size"], size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 8:] = 0
    mask[2, 3:] = 0
    ids = ids * mask
    with torch.no_grad():
        want = hf_model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    enc = NewsEncoder(cfg)
    got = np.asarray(
        jax.jit(
            lambda i, m: enc.apply(variables, i, m, method=NewsEncoder.hidden_states)
        )(jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(
        got * mask[..., None], want * mask[..., None], atol=2e-5, rtol=0
    )


def test_mistral_hidden_state_parity(rng):
    """Converted Mistral weights reproduce transformers' last_hidden_state
    <= 2e-5 on right-padded inputs (news max_length=512 sits far inside
    Mistral's 4096 sliding window, so full causal == windowed here)."""
    torch.manual_seed(0)
    ref = MistralModel(MistralConfig(**BASE_HF)).eval()
    _parity_case(ref, "MistralForCausalLM", rng)


def test_llama_hidden_state_parity(rng):
    """Converted Llama weights (attention_bias=False in-config) reproduce
    transformers' last_hidden_state <= 2e-5."""
    torch.manual_seed(1)
    ref = LlamaModel(LlamaConfig(**BASE_HF, attention_bias=False)).eval()
    _parity_case(ref, "LlamaModel", rng)


def test_llama_attention_bias_true_is_respected(rng):
    """A Llama-layout checkpoint exported WITH attention biases converts and
    matches when the HF config says attention_bias=True (the config drives
    bias presence, not the family name)."""
    torch.manual_seed(2)
    ref = LlamaModel(LlamaConfig(**BASE_HF, attention_bias=True)).eval()
    cfg = encoder_config_from_hf(
        {**BASE_HF, "architectures": ["LlamaForCausalLM"], "attention_bias": True},
        compute_dtype="float32",
        normalize=False,
    )
    assert cfg.qkv_bias is True
    variables = convert_hf_state_dict(_sd(ref), cfg)
    ids = rng.integers(3, BASE_HF["vocab_size"], size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[1, 6:] = 0
    ids = ids * mask
    with torch.no_grad():
        want = ref(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    enc = NewsEncoder(cfg)
    got = np.asarray(
        enc.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                  method=NewsEncoder.hidden_states)
    )
    np.testing.assert_allclose(
        got * mask[..., None], want * mask[..., None], atol=2e-5, rtol=0
    )


def test_rope_scaling_rejected_loudly():
    """Scaled-RoPE checkpoints (Llama 3.1+) must raise at config time, not
    silently load with divergent positional encodings."""
    with pytest.raises(ValueError, match="rope_scaling"):
        encoder_config_from_hf(
            {
                **BASE_HF,
                "architectures": ["LlamaModel"],
                "rope_scaling": {"rope_type": "llama3", "factor": 8.0},
            }
        )
    # Explicit null (what Llama-2/Mistral configs ship) loads fine.
    cfg = encoder_config_from_hf(
        {**BASE_HF, "architectures": ["LlamaModel"], "rope_scaling": None}
    )
    assert cfg.arch == "qwen2"


def test_sliding_window_smaller_than_news_length_rejected():
    """A window narrower than the 512-token news texts would silently change
    attention semantics; windows >= the text length are exactly equivalent to
    full attention and load."""
    prod = {**BASE_HF, "max_position_embeddings": 32768}
    with pytest.raises(ValueError, match="sliding_window"):
        encoder_config_from_hf(
            {**prod, "architectures": ["MistralModel"], "sliding_window": 256}
        )
    cfg = encoder_config_from_hf(
        {**prod, "architectures": ["MistralModel"], "sliding_window": 4096}
    )
    assert cfg.arch == "qwen2"
    # A window below 512 is still fine when the model's own position cap is
    # lower yet: sequences can't exceed it, so the window never truncates.
    cfg = encoder_config_from_hf(
        {**BASE_HF, "architectures": ["MistralModel"], "sliding_window": 256}
    )
    assert cfg.arch == "qwen2"
