"""Weight-import parity: every trained tower, converted torch->flax, must
reproduce the ACTUAL reference module's forward to float tolerance on random
masked inputs at the real production dims (EMBEDDING_DIM = REDUCED_DIM = 1024).

This is the numeric proof behind MIGRATION.md's "import your reference
checkpoints": reference factories warm-start from ``torch.save``'d state dicts
(``/root/reference/src/news_rec_utils/modeling_utils.py:139-148``); the
converters in ``models/convert_towers.py`` carry those into flax. Skipped when
the reference checkout is absent."""

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

from news_recommendation_project_v2_tpu.models import (  # noqa: E402
    ClassificationHead,
    ClassificationHeadCatEmbed,
    EmbeddingWrapper,
    FinalAttention,
    LatentAttentionTower,
    ReducingModel,
    ResizeWrapperModel,
    TokenAttentionPool,
    TransformerTower,
    WeightedSumModel,
)
from news_recommendation_project_v2_tpu.models.convert_towers import (  # noqa: E402
    convert_classification_head,
    convert_classification_head_cat_embed,
    convert_embedding_wrapper,
    convert_final_attention,
    convert_latent_attention,
    convert_reducing_model,
    convert_resize_wrapper,
    convert_token_attention_pool,
    convert_transformer_tower,
    convert_weighted_sum,
    load_reference_tower_checkpoint,
)

DIM = 1024  # reference EMBEDDING_DIM == REDUCED_DIM (config.py:29-31)


def sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def masked_inputs(rng, b=3, l=6, d=DIM):
    x = rng.standard_normal((b, l, d)).astype(np.float32)
    mask = np.ones((b, l), dtype=np.float32)
    if b > 1:
        mask[1, l - 2 :] = 0.0
    if b > 2:
        mask[2, 1:] = 0.0
    return x, mask


def assert_close(ours, theirs, tol=1e-5):
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().cpu().numpy(), rtol=tol, atol=tol
    )


def test_classification_head_parity(rng):
    from news_rec_utils.modeling_utils import ClassificationHead as RefHead

    torch.manual_seed(0)
    ref = RefHead(in_dim=DIM, hidden_dim=DIM, out_dim=1).eval()
    x = rng.standard_normal((4, DIM)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = ClassificationHead(DIM, DIM, 1).apply(convert_classification_head(sd(ref)), x)
    assert_close(got, want)


def test_final_attention_parity(rng):
    from news_rec_utils.modeling_utils import FinalAttention as RefFA

    torch.manual_seed(1)
    ref = RefFA(reduced_dim=DIM, hidden_dim=4096).eval()
    x, mask = masked_inputs(rng)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(mask))
    got = FinalAttention(reduced_dim=DIM, hidden_dim=4096).apply(
        convert_final_attention(sd(ref)), x, mask
    )
    assert_close(got, want)


def test_weighted_sum_parity(rng):
    from news_rec_utils.modeling_utils import WeightedSumModel as RefWS

    ref = RefWS().eval()
    with torch.no_grad():
        ref.alpha.copy_(torch.tensor(0.37))
    cos = rng.standard_normal(16).astype(np.float32)
    base = rng.standard_normal(16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(cos), torch.from_numpy(base))
    got = WeightedSumModel().apply(convert_weighted_sum(sd(ref)), cos, base)
    assert_close(got, want)


def test_reducing_model_parity(rng):
    from news_rec_utils.modeling_utils import ReducingModel as RefRM

    torch.manual_seed(2)
    ref = RefRM(input_dim=DIM, output_dim=DIM).eval()
    x = rng.standard_normal((5, DIM)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = ReducingModel(DIM, DIM).apply(convert_reducing_model(sd(ref)), x)
    assert_close(got, want)


def test_transformer_tower_as_built_parity(rng):
    """The reference ``NewAttention`` ships the dead-code ``MyLayer``
    (attention.py:193 discards the block's work); ``as_built=True`` must equal
    it exactly with converted weights."""
    from news_rec_utils.attention import NewAttention as RefNA

    torch.manual_seed(3)
    ref = RefNA(hidden_size=DIM, num_hidden_layers=1).eval()
    x, mask = masked_inputs(rng)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(mask))
    variables = convert_transformer_tower(sd(ref), num_layers=1)
    got = TransformerTower(hidden_size=DIM, num_layers=1, as_built=True).apply(
        variables, x, mask
    )
    assert_close(got, want)

    # The same converted weights must load into the INTENDED block (live
    # attention/MLP) — identical param tree, different (finite) output.
    intended = TransformerTower(hidden_size=DIM, num_layers=1, as_built=False).apply(
        variables, x, mask
    )
    assert np.all(np.isfinite(np.asarray(intended)))
    assert not np.allclose(np.asarray(intended), np.asarray(got))


def test_latent_attention_parity(rng):
    from news_rec_utils.latent_attention import LatentAttentionModel as RefLA

    torch.manual_seed(4)
    ref = RefLA().eval()
    x, mask = masked_inputs(rng)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(mask))
    got = LatentAttentionTower().apply(convert_latent_attention(sd(ref)), x, mask)
    assert_close(got, want)


def test_latent_attention_parity_no_mask(rng):
    """mask=None returns the un-pooled per-item hidden states in both."""
    from news_rec_utils.latent_attention import LatentAttentionModel as RefLA

    torch.manual_seed(5)
    ref = RefLA().eval()
    x, _ = masked_inputs(rng, b=2, l=4)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), None)
    got = LatentAttentionTower().apply(convert_latent_attention(sd(ref)), x, None)
    # un-normalized output: plain f32 accumulation noise through the 4096-wide
    # attention (torch SDPA vs XLA einsum ordering) reaches ~1e-4
    assert_close(got, want, tol=3e-4)


def test_token_attention_pool_parity(rng):
    from news_rec_utils.modeling_utils import (
        FirstAttentionPoolFunc as RefPool,
        last_token_pool,
    )

    torch.manual_seed(6)
    ref = RefPool(pool_func=last_token_pool, embedding_dim=DIM, num_layers=1).eval()
    x, mask = masked_inputs(rng)
    with torch.no_grad():
        # the reference pool indexes with mask.sum(), so the mask must be integer
        want = ref(torch.from_numpy(x), torch.from_numpy(mask.astype(np.int64)))
    got = TokenAttentionPool(hidden_size=DIM, num_layers=1, as_built=True).apply(
        convert_token_attention_pool(sd(ref), num_layers=1), x, mask
    )
    assert_close(got, want)


def test_classification_head_cat_embed_parity(rng):
    from news_rec_utils.modeling_utils import (
        ClassificationHeadCatEmbed as RefCat,
    )

    torch.manual_seed(7)
    ref = RefCat(in_dim=DIM - 1 + 128, hidden_dim=DIM, out_dim=1).eval()
    x = rng.standard_normal((4, DIM)).astype(np.float32)
    x[:, -1] = rng.integers(0, 15, size=4)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = ClassificationHeadCatEmbed(
        in_dim=DIM - 1 + 128, hidden_dim=DIM, out_dim=1
    ).apply(convert_classification_head_cat_embed(sd(ref)), x)
    assert_close(got, want)


def test_embedding_wrapper_parity(rng):
    from news_rec_utils.modeling_utils import (
        ClassificationHead as RefHead,
        EmbeddingWrapper as RefWrap,
    )

    torch.manual_seed(8)
    feat = DIM - 256 + 2  # last two features are cat/subcat ids
    ref = RefWrap(RefHead(in_dim=DIM, hidden_dim=DIM, out_dim=1)).eval()
    x = rng.standard_normal((4, feat)).astype(np.float32)
    x[:, -2] = rng.integers(0, 15, size=4)
    x[:, -1] = rng.integers(0, 134, size=4)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = EmbeddingWrapper(wrapped=ClassificationHead(DIM, DIM, 1)).apply(
        convert_embedding_wrapper(sd(ref), convert_classification_head), x
    )
    assert_close(got, want)


def test_resize_wrapper_parity(rng):
    from news_rec_utils.modeling_utils import (
        ReducingModel as RefRM,
        ResizeWrapperModel as RefResize,
    )

    torch.manual_seed(9)
    ref = RefResize(RefRM(input_dim=DIM, output_dim=DIM)).eval()
    x = rng.standard_normal((4, DIM)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = ResizeWrapperModel(wrapped=ReducingModel(DIM, DIM)).apply(
        convert_resize_wrapper(sd(ref), convert_reducing_model), x
    )
    assert_close(got, want)


def test_checkpoint_file_roundtrip(rng, tmp_path):
    """torch.save'd state dict on disk -> ``load_reference_tower_checkpoint``
    (the reference ``model_path`` warm-start surface)."""
    from news_rec_utils.modeling_utils import FinalAttention as RefFA

    torch.manual_seed(10)
    ref = RefFA(reduced_dim=DIM, hidden_dim=4096).eval()
    ckpt = tmp_path / "final_attention.pt"
    torch.save(ref.state_dict(), ckpt)
    variables = load_reference_tower_checkpoint(ckpt, "final_attention")
    x, mask = masked_inputs(rng)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(mask))
    got = FinalAttention(reduced_dim=DIM, hidden_dim=4096).apply(variables, x, mask)
    assert_close(got, want)

    with pytest.raises(ValueError, match="Unknown tower kind"):
        load_reference_tower_checkpoint(ckpt, "nope")
