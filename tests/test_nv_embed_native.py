"""NV-Embed-layout checkpoints load NATIVELY — weights, not remote code
(VERDICT r4 #2, closes inventory item #14).

The reference loads NV-Embed with ``trust_remote_code=True`` and calls the
checkpoint-shipped ``model._do_encode`` (``modeling_utils.py:371-399``). The
wrapper has exactly two behavioral pieces on top of its Mistral backbone:
bidirectional attention (the causal mask patched out) and a latent-attention
pooling head — the SAME module this repo ships as the flagship user tower
(the reference copied NV-Embed's design: ``latent_attention.py:77-171``).
Here both become plain config (``EncoderConfig.bidirectional`` /
``latent_pool``) and the checkpoint's TENSORS map onto the native modules; no
checkpoint-shipped Python ever executes.

The torch reference in these tests is fabricated at small dims from public
parts: a transformers ``MistralModel`` driven bidirectionally via an explicit
4D additive mask + the reference's own PreNorm/Attention/FeedForward latent
head classes, composed exactly like the published ``LatentAttentionModel``
forward."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)
if REF.exists():
    sys.path.insert(0, str(REF))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from transformers import MistralConfig  # noqa: E402
from transformers.models.mistral.modeling_mistral import MistralModel  # noqa: E402

from news_recommendation_project_v2_tpu.models.news_encoder import (  # noqa: E402
    NewsEncoder,
    convert_hf_state_dict,
    encoder_config_from_hf,
    load_hf_weights,
)

H, HEADS, KV, INTER, VOCAB = 32, 4, 2, 64, 310
NUM_LATENTS, CROSS_HEADS, CROSS_DIM_HEAD = 6, 2, 8

NV_HF_CONFIG = {
    "architectures": ["NVEmbedModel"],
    "model_type": "nvembed",
    "text_config": {
        "architectures": ["MistralModel"],
        "model_type": "bidir_mistral",
        "vocab_size": VOCAB,
        "hidden_size": H,
        "num_hidden_layers": 2,
        "num_attention_heads": HEADS,
        "num_key_value_heads": KV,
        "intermediate_size": INTER,
        "max_position_embeddings": 64,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
    },
    "latent_attention_config": {
        "model_type": "latent_attention",
        "num_latents_value": NUM_LATENTS,
        "num_cross_heads": CROSS_HEADS,
        "cross_dim_head": CROSS_DIM_HEAD,
        "latent_dim": H,
        "hidden_dim": H,
    },
}


class TorchLatentHead(torch.nn.Module):
    """The published NV-Embed ``LatentAttentionModel`` at test dims, composed
    from the reference's own copies of its building blocks
    (``latent_attention.py``: PreNorm / Attention / FeedForward) with the
    exact published key layout (``latents``, ``cross_attend_blocks.{0,1}``)."""

    def __init__(self):
        super().__init__()
        from news_rec_utils.latent_attention import (
            Attention,
            FeedForward,
            PreNorm,
        )

        self.cross_attend_blocks = torch.nn.ModuleList(
            [
                PreNorm(
                    H,
                    Attention(H, H, heads=CROSS_HEADS, dim_head=CROSS_DIM_HEAD),
                    context_dim=H,
                ),
                PreNorm(H, FeedForward(H)),
            ]
        )
        self.register_parameter(
            "latents", torch.nn.Parameter(torch.randn(NUM_LATENTS, H))
        )

    def forward(self, hiddens, attention_mask):
        cross_attn, cross_ff = self.cross_attend_blocks
        x = self.latents.unsqueeze(0).expand(hiddens.shape[0], -1, -1)
        hiddens = cross_attn(hiddens, context=x, mask=None) + hiddens
        hiddens = cross_ff(hiddens) + hiddens
        s = (hiddens * attention_mask.unsqueeze(-1).float()).sum(1)
        d = attention_mask.sum(dim=1, keepdim=True).float()
        return torch.nn.functional.normalize(s / d, p=2, dim=-1)


def _fabricate(rng):
    torch.manual_seed(int(rng.integers(0, 2**31)))
    backbone = MistralModel(
        MistralConfig(
            vocab_size=VOCAB,
            hidden_size=H,
            num_hidden_layers=2,
            num_attention_heads=HEADS,
            num_key_value_heads=KV,
            intermediate_size=INTER,
            max_position_embeddings=64,
            attn_implementation="eager",
        )
    ).eval()
    head = TorchLatentHead().eval()
    state = {f"embedding_model.{k}": v.detach().numpy().copy()
             for k, v in backbone.state_dict().items()}
    state.update(
        {f"latent_attention_model.{k}": v.detach().numpy().copy()
         for k, v in head.state_dict().items()}
    )
    return backbone, head, state


def _inputs(rng, b=3, t=12):
    ids = rng.integers(3, VOCAB, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[1, t - 4 :] = 0
    if b > 2:
        mask[2, 3:] = 0
    return ids * mask, mask


def _torch_nv_encode(backbone, head, ids, mask):
    """The wrapper pipeline the remote code implements: bidirectional
    backbone forward (4D additive mask with NO causal tril) -> latent head ->
    L2 normalize (``get_nv_embeds`` normalizes the output,
    ``modeling_utils.py:399``)."""
    m = torch.from_numpy(mask)
    bias = torch.zeros(mask.shape[0], 1, mask.shape[1], mask.shape[1])
    bias.masked_fill_(
        ~(m[:, None, None, :] > 0), torch.finfo(torch.float32).min
    )
    with torch.no_grad():
        hidden = backbone(
            input_ids=torch.from_numpy(ids).long(), attention_mask=bias
        ).last_hidden_state
        return head(hidden, m).numpy()


def test_nv_embed_config_derivation():
    cfg = encoder_config_from_hf(NV_HF_CONFIG, compute_dtype="float32")
    assert cfg.arch == "qwen2" and cfg.bidirectional and cfg.latent_pool
    assert cfg.qkv_bias is False  # Mistral backbone is q/k/v bias-free
    assert cfg.latent_pool_num_latents == NUM_LATENTS
    assert cfg.latent_pool_heads == CROSS_HEADS
    assert cfg.latent_pool_dim_head == CROSS_DIM_HEAD
    assert cfg.hidden_dim == H and cfg.num_kv_heads == KV


def test_nv_embed_latent_dim_mismatch_is_loud():
    bad = json.loads(json.dumps(NV_HF_CONFIG))
    bad["latent_attention_config"]["latent_dim"] = H * 2
    with pytest.raises(ValueError, match="latent_dim"):
        encoder_config_from_hf(bad)


def test_nv_embed_native_parity(rng):
    """Converted NV-Embed-layout tensors reproduce the full wrapper pipeline
    (bidirectional backbone -> latent-attention pooling -> normalize) to
    float tolerance — the reference needs trust_remote_code for this
    (``modeling_utils.py:371-399``); here no checkpoint Python runs."""
    backbone, head, state = _fabricate(rng)
    cfg = encoder_config_from_hf(NV_HF_CONFIG, compute_dtype="float32")
    variables = convert_hf_state_dict(state, cfg)
    ids, mask = _inputs(rng)
    want = _torch_nv_encode(backbone, head, ids, mask)
    enc = NewsEncoder(cfg)
    got = np.asarray(
        jax.jit(enc.apply)(variables, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)
    # Bidirectionality really engaged: flipping a LATE token must move an
    # EARLY token's contribution (causal attention could not).
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1 - 3) % (VOCAB - 3) + 3
    h = enc.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask),
        method=NewsEncoder.hidden_states,
    )
    h2 = enc.apply(
        variables, jnp.asarray(ids2), jnp.asarray(mask),
        method=NewsEncoder.hidden_states,
    )
    assert not np.allclose(np.asarray(h)[0, 0], np.asarray(h2)[0, 0])


def test_nv_embed_checkpoint_dir_roundtrip(rng, tmp_path):
    """The on-disk checkpoint format loads through the standard loader path:
    config.json + model.safetensors -> encoder_config_from_hf +
    load_hf_weights + convert_hf_state_dict."""
    from safetensors.numpy import save_file

    backbone, head, state = _fabricate(rng)
    (tmp_path / "config.json").write_text(json.dumps(NV_HF_CONFIG))
    save_file(state, tmp_path / "model.safetensors")
    with open(tmp_path / "config.json") as f:
        cfg = encoder_config_from_hf(json.load(f), compute_dtype="float32")
    variables = convert_hf_state_dict(load_hf_weights(tmp_path), cfg)
    ids, mask = _inputs(rng, b=2, t=9)
    want = _torch_nv_encode(backbone, head, ids, mask)
    got = np.asarray(
        jax.jit(NewsEncoder(cfg).apply)(
            variables, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_nv_embed_head_without_config_is_loud(rng):
    """A checkpoint carrying the head but a config without latent_pool (or
    vice versa) fails with a clear error, not a flax param mismatch."""
    _, _, state = _fabricate(rng)
    plain = encoder_config_from_hf(
        {**NV_HF_CONFIG["text_config"]}, compute_dtype="float32"
    )
    with pytest.raises(ValueError, match="latent_pool"):
        convert_hf_state_dict(state, plain)
    nv_cfg = encoder_config_from_hf(NV_HF_CONFIG, compute_dtype="float32")
    backbone_only = {
        k: v for k, v in state.items() if k.startswith("embedding_model.")
    }
    with pytest.raises(ValueError, match="latent_attention_model"):
        convert_hf_state_dict(backbone_only, nv_cfg)
