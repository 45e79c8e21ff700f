"""Decoder-architecture (Qwen2-class) encoder tests — VERDICT r2 item 6.

The reference's model-shopping list contemplates NV-Embed/gte-Qwen2-class
decoder encoders (reference ``config.py:60-69``) loaded via AutoModel
(``modeling_utils.py:85-89``) with last-token pooling (``:62-75``). Here the
``NewsEncoder(arch="qwen2")`` layout (rotary + RMSNorm + GQA + SwiGLU + causal
mask) must reproduce the ACTUAL transformers ``Qwen2Model`` forward from a
converted checkpoint, end to end from a checkpoint DIRECTORY; unsupported
architectures must fail at config time with the supported list (the designed
boundary), never a ``KeyError`` deep inside weight conversion.
"""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformers import Qwen2Config  # noqa: E402
from transformers.models.qwen2.modeling_qwen2 import Qwen2Model  # noqa: E402

from news_recommendation_project_v2_tpu.cli.common import build_encoder  # noqa: E402
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
    "num_key_value_heads": 2,  # exercises grouped-query attention
    "intermediate_size": 64,
    "max_position_embeddings": 64,
    "rms_norm_eps": 1e-6,
    "rope_theta": 10000.0,
}


def _sd(model):
    return {k: v.detach().cpu().numpy().copy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def qwen2_ref():
    torch.manual_seed(0)
    return Qwen2Model(Qwen2Config(**BASE_HF)).eval()


def test_qwen2_hidden_state_parity(qwen2_ref, rng):
    """Converted weights reproduce transformers' last_hidden_state <= 2e-5 on
    masked (right-padded) inputs, including the GQA kv-head repeat and the
    rotate-half rotary convention."""
    cfg = encoder_config_from_hf(
        {**BASE_HF, "architectures": ["Qwen2ForCausalLM"]},
        compute_dtype="float32",
        normalize=False,
    )
    assert cfg.arch == "qwen2" and cfg.pooling == "last"
    assert cfg.num_kv_heads == 2 and cfg.layer_norm_eps == 1e-6
    variables = convert_hf_state_dict(_sd(qwen2_ref), cfg)
    B, T = 3, 12
    ids = rng.integers(3, BASE_HF["vocab_size"], size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 8:] = 0
    mask[2, 3:] = 0
    ids = ids * mask
    with torch.no_grad():
        want = qwen2_ref(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    enc = NewsEncoder(cfg)
    got = np.asarray(
        jax.jit(lambda i, m: enc.apply(variables, i, m, method=NewsEncoder.hidden_states))(
            jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(
        got * mask[..., None], want * mask[..., None], atol=2e-5, rtol=0
    )


def test_qwen2_checkpoint_dir_end_to_end(qwen2_ref, tmp_path, rng):
    """build_encoder on a saved Qwen2ForCausalLM checkpoint DIR (config.json +
    safetensors + tokenizer.json): raw text -> last-token pooled, normalized
    embedding matches the torch pipeline."""
    from transformers.models.qwen2.modeling_qwen2 import Qwen2ForCausalLM

    causal = Qwen2ForCausalLM(Qwen2Config(**BASE_HF)).eval()
    causal.model.load_state_dict(qwen2_ref.state_dict())
    path = tmp_path / "tiny_qwen2"
    causal.save_pretrained(path, safe_serialization=True)

    # Reuse the proven tiny Unigram tokenizer recipe (test_tokenizer.py).
    from tokenizers import Tokenizer, models, pre_tokenizers, processors, trainers

    tok = Tokenizer(models.Unigram())
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=300,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        unk_token="<unk>",
    )
    tok.train_from_iterator(
        ["Title: stock markets rally", "Title: heavy rain this weekend"] * 30,
        trainer,
    )
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> </s> $B </s>",
        special_tokens=[
            ("<s>", tok.token_to_id("<s>")),
            ("</s>", tok.token_to_id("</s>")),
        ],
    )
    tok.save(str(path / "tokenizer.json"))

    enc, hf_tok, params = build_encoder(path, max_length=16, compute_dtype="float32")
    assert enc.config.arch == "qwen2" and enc.config.pooling == "last"
    texts = ["Title: markets rally", "Title: rain weekend " * 5]
    ids, mask = hf_tok(texts)
    ours = np.asarray(
        jax.jit(enc.apply)(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    with torch.no_grad():
        hidden = qwen2_ref(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state
        lens = torch.from_numpy(mask).sum(1) - 1
        pooled = hidden[torch.arange(len(texts)), lens]
        want = torch.nn.functional.normalize(pooled, dim=-1).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5, rtol=0)


def test_unsupported_architecture_is_a_designed_boundary():
    """Unsupported remote-code architectures raise a clear ValueError naming
    the supported families — not a KeyError mid-conversion. (NVEmbedModel
    left this list in round 5: it now loads natively,
    tests/test_nv_embed_native.py; an INCOMPLETE NV-Embed config still gets
    its own clear error.)"""
    for arch in ("NewModel", "GPT2Model"):
        with pytest.raises(ValueError, match="not supported; supported"):
            encoder_config_from_hf({**BASE_HF, "architectures": [arch]})
    with pytest.raises(ValueError, match="text_config"):
        encoder_config_from_hf({"architectures": ["NVEmbedModel"]})


def test_qwen2_bf16_pad_rows_are_nan_inert(qwen2_ref, rng):
    """Regression: the causal+padding bias must use the COMPUTE dtype's finite
    min — f32's min rounds to -inf in bfloat16 and an all-pad (batch padding)
    row would softmax to NaN, violating the pad-rows-are-inert invariant."""
    cfg = encoder_config_from_hf(
        {**BASE_HF, "architectures": ["Qwen2ForCausalLM"]},
        compute_dtype="bfloat16",
        normalize=False,
    )
    variables = convert_hf_state_dict(_sd(qwen2_ref), cfg)
    ids = rng.integers(3, BASE_HF["vocab_size"], size=(2, 6)).astype(np.int32)
    mask = np.ones((2, 6), np.int32)
    mask[1] = 0  # an all-pad batch-padding row
    ids = ids * mask
    enc = NewsEncoder(cfg)
    got = np.asarray(
        enc.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                  method=NewsEncoder.hidden_states)
    )
    assert np.isfinite(got).all(), "pad row produced NaN/Inf hidden states"


def test_qwen2_bias_mismatch_is_a_clear_error(qwen2_ref):
    """A checkpoint whose q/k/v bias presence disagrees with
    EncoderConfig.qkv_bias raises at CONVERT time with an actionable message,
    not a flax missing-parameter failure inside apply."""
    cfg = encoder_config_from_hf(
        {**BASE_HF, "architectures": ["Qwen2ForCausalLM"], "attention_bias": False},
    )
    assert cfg.qkv_bias is False
    with pytest.raises(ValueError, match="qkv bias"):
        convert_hf_state_dict(_sd(qwen2_ref), cfg)  # checkpoint HAS biases
