"""News-encoder tests: forward shapes/unit-norm, HF weight-conversion parity
against torch XLMRobertaModel (random tiny config, no network), and the
encode/dump/token-store pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from news_recommendation_project_v2_tpu.config import EncoderConfig
from news_recommendation_project_v2_tpu.models.news_encoder import (
    HashTokenizer,
    NewsEncoder,
    convert_hf_state_dict,
)
from news_recommendation_project_v2_tpu.ops.encode import (
    TokenStore,
    build_token_store,
    encode_corpus,
    encode_corpus_bucketed,
    encode_query_and_passage,
    load_embeddings,
    save_embeddings,
)

TINY = EncoderConfig(
    vocab_size=120,
    hidden_dim=32,
    num_layers=2,
    num_heads=4,
    intermediate_dim=64,
    max_position=66,
    compute_dtype="float32",
)


@pytest.fixture(scope="module")
def tiny_encoder():
    enc = NewsEncoder(TINY)
    tok = HashTokenizer(vocab_size=TINY.vocab_size, max_length=16)
    ids, mask = tok(["hello world news", "short"])
    params = jax.jit(
        lambda: enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))
    )()
    return enc, tok, params


def test_forward_shape_and_norm(tiny_encoder):
    enc, tok, params = tiny_encoder
    ids, mask = tok(["a b c d", "x y"])
    out = jax.jit(enc.apply)(params, jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (2, TINY.hidden_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), np.ones(2), atol=1e-5
    )


def test_padding_invariance(tiny_encoder):
    enc, tok, params = tiny_encoder
    ids, mask = tok(["same text here"], max_length=8)
    ids2, mask2 = tok(["same text here"], max_length=16)
    o1 = jax.jit(enc.apply)(params, jnp.asarray(ids), jnp.asarray(mask))
    o2 = jax.jit(enc.apply)(params, jnp.asarray(ids2), jnp.asarray(mask2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_bucketed_encode_matches_fixed_width(tiny_encoder):
    """Length-bucketed corpus encode must equal the fixed-width encode row for
    row (the bucketing only changes the amount of masked padding, which is
    inert by construction — see test_padding_invariance)."""
    enc, tok, params = tiny_encoder
    rng = np.random.default_rng(0)
    texts = [
        " ".join(f"w{rng.integers(100)}" for _ in range(int(n)))
        for n in rng.integers(1, 30, size=37)
    ]
    ids, mask = tok(texts, max_length=32)
    apply = lambda p, i, m: enc.apply(p, i, m)
    fixed = np.asarray(encode_corpus(apply, params, ids, mask, batch_size=8))
    bucketed = np.asarray(
        encode_corpus_bucketed(
            apply, params, ids, mask, buckets=(4, 8, 16), batch_size=8
        )
    )
    np.testing.assert_allclose(bucketed, fixed, atol=2e-5)
    # Auto-sized per-bucket batches (analytic memory model) take the same path.
    auto = np.asarray(
        encode_corpus_bucketed(
            apply, params, ids, mask, buckets=(8,), encoder_config=TINY
        )
    )
    np.testing.assert_allclose(auto, fixed, atol=2e-5)


def test_encode_empty_corpus(tiny_encoder):
    """Zero news rows must yield a well-formed [0, D] table from both the
    fixed-width and bucketed paths (an EmbeddingsComponent run over an empty
    news set)."""
    enc, tok, params = tiny_encoder
    apply = lambda p, i, m: enc.apply(p, i, m)
    ids = np.zeros((0, 8), np.int32)
    mask = np.zeros((0, 8), np.int32)
    out = np.asarray(encode_corpus(apply, params, ids, mask, batch_size=4))
    assert out.shape == (0, TINY.hidden_dim)
    out = np.asarray(
        encode_corpus_bucketed(apply, params, ids, mask, buckets=(4,), batch_size=4)
    )
    assert out.shape == (0, TINY.hidden_dim)


def test_hf_conversion_parity():
    """Convert a randomly-initialized torch XLMRobertaModel and check the flax
    forward matches torch mean-pooled output."""
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_cfg = XLMRobertaConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_dim,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_dim,
        max_position_embeddings=TINY.max_position,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    hf = XLMRobertaModel(hf_cfg).eval()

    tok = HashTokenizer(vocab_size=TINY.vocab_size, max_length=12)
    ids, mask = tok(["the quick brown fox", "jumped"])
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    torch_pooled = (out * m).sum(1) / m.sum(1)
    torch_pooled /= np.linalg.norm(torch_pooled, axis=-1, keepdims=True)

    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_state_dict(state, TINY)
    enc = NewsEncoder(TINY)
    flax_pooled = np.asarray(
        jax.jit(enc.apply)(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(flax_pooled, torch_pooled, atol=2e-5)


def test_encode_corpus_and_dump(tiny_encoder, tmp_path):
    enc, tok, params = tiny_encoder
    texts = [f"document number {i} with words" for i in range(10)]
    query, passage = encode_query_and_passage(
        lambda p, i, m: enc.apply(p, i, m),
        params,
        lambda ts: tok(ts, max_length=16),
        texts,
        query_instruction="Instruct: retrieve. Query: ",
        batch_size=4,
    )
    assert passage.shape == (10, TINY.hidden_dim)
    assert not np.allclose(np.asarray(query), np.asarray(passage))
    save_embeddings(tmp_path, "ds", np.asarray(passage), np.asarray(query))
    back, qback = load_embeddings(tmp_path, "ds", with_query=True)
    np.testing.assert_array_equal(back, np.asarray(passage))
    np.testing.assert_array_equal(qback, np.asarray(query))


def test_encode_corpus_batch_padding_consistency(tiny_encoder):
    enc, tok, params = tiny_encoder
    texts = [f"text {i}" for i in range(7)]  # not a multiple of batch 4
    ids, mask = tok(texts, max_length=8)
    out = np.asarray(
        encode_corpus(lambda p, i, m: enc.apply(p, i, m), params, ids, mask, 4)
    )
    out_1 = np.asarray(
        encode_corpus(lambda p, i, m: enc.apply(p, i, m), params, ids, mask, 7)
    )
    np.testing.assert_allclose(out, out_1, atol=1e-5)


def test_token_store_roundtrip(tmp_path, rng):
    arrays = [rng.standard_normal((int(l), 8)).astype(np.float32) for l in rng.integers(1, 9, size=5)]
    store = TokenStore.from_ragged(arrays)
    assert store.num_items == 5
    batch, mask = store.gather_padded(np.array([0, 3, 4]))
    for j, i in enumerate([0, 3, 4]):
        ln = len(arrays[i])
        np.testing.assert_array_equal(batch[j, :ln], arrays[i])
        assert mask[j].sum() == ln
    store.save(tmp_path / "store.npz")
    back = TokenStore.load(tmp_path / "store.npz")
    np.testing.assert_array_equal(back.states, store.states)


def test_build_token_store(tiny_encoder):
    enc, tok, params = tiny_encoder

    def hidden_apply(p, ids, mask):
        # Embedding layer output as a stand-in "last hidden state".
        cfg = TINY

        def f(p_, i_, m_):
            return enc.apply(p_, i_, m_)

        # Use the pooled output broadcast over tokens (shape check only).
        pooled = f(p, ids, mask)
        return jnp.broadcast_to(
            pooled[:, None, :], (ids.shape[0], ids.shape[1], cfg.hidden_dim)
        )

    ids, mask = tok(["one two three", "four"], max_length=8)
    store = build_token_store(hidden_apply, params, ids, mask, batch_size=2)
    assert store.num_items == 2
    assert store.lengths().tolist() == [int(mask[0].sum()), int(mask[1].sum())]


def test_build_token_store_bucketed_matches_fixed(tiny_encoder):
    """Length-bucketed token-store builds must store the exact same trimmed
    states as the fixed-width pass, in the same row order."""
    enc, tok, params = tiny_encoder
    rng = np.random.default_rng(1)
    texts = [
        " ".join(f"w{rng.integers(100)}" for _ in range(int(n)))
        for n in rng.integers(1, 14, size=13)
    ]
    ids, mask = tok(texts, max_length=16)

    def hidden_apply(p, i, m):
        return enc.apply(p, i, m, method="hidden_states")

    fixed = build_token_store(
        hidden_apply, params, ids, mask, batch_size=4, token_buckets=None
    )
    bucketed = build_token_store(
        hidden_apply, params, ids, mask, batch_size=4, token_buckets=(4, 8)
    )
    assert bucketed.offsets.tolist() == fixed.offsets.tolist()
    np.testing.assert_allclose(bucketed.states, fixed.states, atol=2e-5)


def test_gather_padded_matches_source_arrays(rng):
    """gather_padded is element-identical to slicing the ORIGINAL ragged
    arrays (a true oracle, independent of the gather's implementation),
    including max_len truncation (keep the FIRST max_len tokens) and
    duplicate indices."""
    arrays = [
        rng.standard_normal((int(l), 6)).astype(np.float32)
        for l in rng.integers(1, 12, size=20)
    ]
    store = TokenStore.from_ragged(arrays)

    for max_len in (None, 4, 1):
        idx = rng.integers(0, 20, size=13)  # duplicates likely
        got_b, got_m = store.gather_padded(idx, max_len=max_len)
        lens = [
            len(arrays[i]) if max_len is None else min(len(arrays[i]), max_len)
            for i in idx
        ]
        assert got_b.shape[1] == max(lens)
        for j, (i, ln) in enumerate(zip(idx, lens)):
            np.testing.assert_array_equal(got_b[j, :ln], arrays[i][:ln])
            np.testing.assert_array_equal(got_b[j, ln:], 0.0)
            assert got_m[j, :ln].all() and not got_m[j, ln:].any()


def test_gather_padded_memmap(tmp_path, rng):
    arrays = [
        rng.standard_normal((int(l), 4)).astype(np.float32)
        for l in rng.integers(1, 6, size=7)
    ]
    TokenStore.from_ragged(arrays).save_dir(tmp_path / "st")
    store = TokenStore.open_dir(tmp_path / "st")
    batch, mask = store.gather_padded(np.array([6, 0, 6]))
    np.testing.assert_array_equal(batch[0, : len(arrays[6])], arrays[6])
    np.testing.assert_array_equal(batch[2], batch[0])
    assert mask[1].sum() == len(arrays[0])
