"""Real-tokenizer and HF-checkpoint loading tests (VERDICT r1 items 1 & 6).

Builds a real sentencepiece-style Unigram tokenizer with the ``tokenizers``
engine (the exact Rust engine inside HF fast tokenizers — the same machinery
that tokenizes for the reference's ``AutoTokenizer``, ``modeling_utils.py:
92-103``) plus a tiny torch XLMRobertaModel checkpoint, then verifies the whole
text -> ids -> pooled-embedding path matches the HF torch pipeline, end to end
from a checkpoint DIRECTORY (config.json + safetensors + tokenizer.json).
"""

import json
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_project_v2_tpu.cli.common import build_encoder
from news_recommendation_project_v2_tpu.data.tokenizer import HFTokenizer
from news_recommendation_project_v2_tpu.models.news_encoder import (
    encoder_config_from_hf,
)

CORPUS = [
    "Title: The quick brown fox jumps over the lazy dog",
    "Title: Stock markets rally as tech earnings beat expectations",
    "Title: Local team wins championship in dramatic overtime",
    "Title: New study reveals health benefits of morning walks",
    "Title: Weather forecast predicts heavy rain this weekend",
] * 20

TEXTS = [
    "Title: Stock markets rally",
    "Title: " + "dramatic overtime " * 30,  # forces truncation
    "x",
    "Title: completely unseen words zebra quartz",
]


@pytest.fixture(scope="module")
def tokenizer_file(tmp_path_factory):
    """Train a tiny XLM-R-style Unigram tokenizer (specials <s>=0 <pad>=1
    </s>=2, template "<s> $A </s>") and save tokenizer.json."""
    from tokenizers import Tokenizer, models, pre_tokenizers, processors, trainers

    tok = Tokenizer(models.Unigram())
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=300,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        unk_token="<unk>",
    )
    tok.train_from_iterator(CORPUS, trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> </s> $B </s>",
        special_tokens=[
            ("<s>", tok.token_to_id("<s>")),
            ("</s>", tok.token_to_id("</s>")),
        ],
    )
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return path


@pytest.fixture(scope="module")
def hf_checkpoint(tokenizer_file, tmp_path_factory):
    """Tiny random XLMRobertaModel saved as an HF dir: config.json +
    model.safetensors + tokenizer.json."""
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    vocab = HFTokenizer.from_file(tokenizer_file).vocab_size
    cfg = XLMRobertaConfig(
        vocab_size=vocab,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    model = XLMRobertaModel(cfg, add_pooling_layer=False).eval()
    path = tmp_path_factory.mktemp("ckpt") / "tiny_e5"
    model.save_pretrained(path, safe_serialization=True)
    shutil.copy(tokenizer_file, path / "tokenizer.json")
    return path, model


def _torch_reference_embed(model, tokenizer_file, texts, max_length):
    """The reference pipeline: HF fast tokenize (pad/truncate,
    data_utils.py:471-482) -> encoder -> masked mean pool -> L2 normalize
    (modeling_utils.py:55-59, data_model_helper.py:65-78)."""
    import torch
    from transformers import PreTrainedTokenizerFast

    hftok = PreTrainedTokenizerFast(
        tokenizer_file=str(tokenizer_file), pad_token="<pad>"
    )
    batch = hftok(
        texts, padding=True, truncation=True, max_length=max_length,
        return_tensors="pt",
    )
    with torch.no_grad():
        out = model(**batch).last_hidden_state
    m = batch["attention_mask"][..., None].float()
    pooled = (out * m).sum(1) / m.sum(1)
    return torch.nn.functional.normalize(pooled, p=2, dim=-1).numpy()


def test_tokenizer_matches_hf_fast(tokenizer_file):
    """Ids + mask identical to transformers' fast tokenizer on the same file,
    including truncation (reference collate semantics)."""
    from transformers import PreTrainedTokenizerFast

    ours = HFTokenizer.from_file(tokenizer_file, max_length=16)
    assert ours.pad_id == 1
    hf = PreTrainedTokenizerFast(tokenizer_file=str(tokenizer_file), pad_token="<pad>")
    for T in (16, 24):
        ids, mask = ours(TEXTS, max_length=T)
        enc = hf(
            TEXTS, padding="max_length", truncation=True, max_length=T,
            return_tensors="np",
        )
        np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
        np.testing.assert_array_equal(mask, enc["attention_mask"].astype(np.int32))


def test_text_to_embedding_parity(hf_checkpoint, tokenizer_file):
    """The VERDICT r1 'done' bar: raw text through build_encoder (real
    tokenizer + converted safetensors weights) matches the HF torch pipeline's
    pooled embedding <= 2e-5."""
    path, model = hf_checkpoint
    enc, tok, params = build_encoder(path, max_length=16, compute_dtype="float32")
    assert isinstance(tok, HFTokenizer)
    ids, mask = tok(TEXTS)
    ours = np.asarray(jax.jit(enc.apply)(params, jnp.asarray(ids), jnp.asarray(mask)))
    want = _torch_reference_embed(model, tokenizer_file, TEXTS, 16)
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_sharded_safetensors_loading(hf_checkpoint, tokenizer_file, tmp_path):
    path, model = hf_checkpoint
    sharded = tmp_path / "sharded"
    model.save_pretrained(sharded, safe_serialization=True, max_shard_size="20KB")
    assert (sharded / "model.safetensors.index.json").exists()
    shutil.copy(tokenizer_file, sharded / "tokenizer.json")
    enc, tok, params = build_encoder(sharded, max_length=16, compute_dtype="float32")
    ids, mask = tok(TEXTS[:2])
    ours = np.asarray(jax.jit(enc.apply)(params, jnp.asarray(ids), jnp.asarray(mask)))
    want = _torch_reference_embed(model, tokenizer_file, TEXTS[:2], 16)
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_pytorch_bin_loading(hf_checkpoint, tokenizer_file, tmp_path):
    path, model = hf_checkpoint
    bindir = tmp_path / "bin"
    model.save_pretrained(bindir, safe_serialization=False)
    assert (bindir / "pytorch_model.bin").exists()
    shutil.copy(tokenizer_file, bindir / "tokenizer.json")
    enc, tok, params = build_encoder(bindir, max_length=16, compute_dtype="float32")
    ids, mask = tok(TEXTS[:2])
    ours = np.asarray(jax.jit(enc.apply)(params, jnp.asarray(ids), jnp.asarray(mask)))
    want = _torch_reference_embed(model, tokenizer_file, TEXTS[:2], 16)
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_missing_tokenizer_is_an_error(hf_checkpoint, tmp_path):
    """Real weights + hash tokenization produce garbage embeddings; the
    combination must be an explicit opt-in, never a silent default."""
    path, model = hf_checkpoint
    bare = tmp_path / "bare"
    model.save_pretrained(bare, safe_serialization=True)
    with pytest.raises(FileNotFoundError, match="tokenizer.json"):
        build_encoder(bare, max_length=16)
    enc, tok, params = build_encoder(bare, max_length=16, allow_hash_tokenizer=True)
    from news_recommendation_project_v2_tpu.models.news_encoder import HashTokenizer

    assert isinstance(tok, HashTokenizer)


def test_encoder_config_from_hf_pooling_dispatch():
    base = {
        "vocab_size": 100,
        "hidden_size": 32,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "intermediate_size": 64,
    }
    assert encoder_config_from_hf({**base, "architectures": ["XLMRobertaModel"]}).pooling == "mean"
    assert encoder_config_from_hf({**base, "architectures": ["BertModel"]}).pooling == "first"
    qwen = encoder_config_from_hf({**base, "architectures": ["Qwen2ForCausalLM"]})
    assert qwen.pooling == "last" and qwen.arch == "qwen2"
    # Architectures without a native layout here raise at config time — the
    # designed boundary (was: advertised pooling, then KeyError mid-convert).
    with pytest.raises(ValueError, match="not supported"):
        encoder_config_from_hf({**base, "architectures": ["SomethingElse"]})
    cfg = encoder_config_from_hf({**base, "layer_norm_eps": 1e-12})
    assert cfg.layer_norm_eps == 1e-12
    assert cfg.vocab_size == 100
