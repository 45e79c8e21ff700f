"""Pipeline-level behavioral parity against the reference's ACTUAL torch
training loops: ``ClassificationModelTrainer``, ``AttentionTrainer``,
``AttentionWeightTrainer``, ``AttentionReduceTrainer``, and
``AttentionAttentionTrainer`` (imported read-only
from /root/reference, run on CPU) head-to-head against our
``ClassificationTrainer`` / ``TowerTrainer`` / ``JointTowerTrainer`` /
``EndToEndTrainer`` on the SAME behaviors fixture with weight-converted
identical initializations — ALL FIVE of the reference's trainer families.
The fifth (``AttentionAttentionTrainer``) needs no remote model: its
token-attention head is a bare ``MyEncoder`` (``modeling_utils.py:498-513``)
and its sqlite token store is fabricated directly in the reference's own
format (``tensors(id INTEGER PRIMARY KEY, data BLOB)`` of mask-trimmed
torch-pickled ``[L, D]`` tensors, ``modeling_utils.py:460-471``).

Controlled comparison design (this is what makes exactness possible):

- every impression holds exactly one positive and one negative, so both pair
  samplers (reference ``split_impressions_pos_neg``, ours
  ``sample_pos_neg_pairs``) are FORCED to the identical pair set;
- one full batch per epoch, so pair order is irrelevant under the margin
  loss's mean reduction;
- dropout zeroed on both sides (the only stochastic op in the models);
- identical init: the torch modules' fresh state dicts are carried into flax
  through ``models/convert_towers.py``.

With those controls both frameworks compute the same full-batch gradient and
the same AdamW(1e-5, wd=0.01) + global-norm-clip(0.5) update chain
(reference ``trainer.py:95-101,466-479,580-586``), so per-epoch losses, final
parameters, and final MIND metrics must agree to float32 accumulation noise.
This is the strongest reference-baseline proxy this environment allows (real
MIND downloads are blocked — BASELINE.md); it upgrades the unit-level oracle
tests to whole-training-loop evidence.

Skipped when the reference checkout is absent.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference checkout not available"),
]

torch = pytest.importorskip("torch")

if REF.exists():
    sys.path.insert(0, str(REF))
    # The reference trainer imports cloud/env modules at module level
    # (trainer.py:7,18); stub the ones not installed here — they are used
    # only by the (commented-out) Azure blob upload path.
    if "dotenv" not in sys.modules:
        dotenv = types.ModuleType("dotenv")
        dotenv.load_dotenv = lambda *a, **k: None
        sys.modules["dotenv"] = dotenv
    if "azure.storage.blob" not in sys.modules:
        azure = types.ModuleType("azure")
        storage = types.ModuleType("azure.storage")
        blob = types.ModuleType("azure.storage.blob")
        blob.ContainerClient = object
        blob.BlobClient = object
        sys.modules.update(
            {"azure": azure, "azure.storage": storage, "azure.storage.blob": blob}
        )

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from news_recommendation_project_v2_tpu.config import TrainConfig  # noqa: E402
from news_recommendation_project_v2_tpu.data import compile_behaviors  # noqa: E402
from news_recommendation_project_v2_tpu.models import (  # noqa: E402
    ClassificationHead,
    FinalAttention,
)
from news_recommendation_project_v2_tpu.models.convert_towers import (  # noqa: E402
    convert_classification_head,
    convert_final_attention,
)
from news_recommendation_project_v2_tpu.train import (  # noqa: E402
    ClassificationTrainer,
    TowerTrainer,
)

D = 32  # embedding dim (tiny: the parity claim is about the update chain)
HID = 64
ROWS = 96
NUM_NEWS = 64
EPOCHS = 3
BATCH = 128  # > ROWS pairs -> exactly one batch per epoch on both sides
METRIC_KEYS = ("auc", "mrr", "ndcg5", "ndcg10")


def _sd(model):
    # .numpy() on a CPU tensor SHARES storage with the live parameter; copy so
    # the captured init doesn't silently track the torch training run.
    return {k: v.detach().cpu().numpy().copy() for k, v in model.state_dict().items()}


def _make_forced_pair_behaviors(rng):
    """Every row has history; every impression is [1 pos, 1 neg] so pair
    sampling is deterministic on both frameworks — except the last, which is
    [1 pos, 2 neg]: the pair SET stays forced (equalizing sampling must use
    both negatives and duplicate the positive) while keeping impression
    lengths ragged (the reference's ``group_items`` builds a degenerate 2-D
    object array on uniform lengths and crashes its own eval,
    ``data_utils.py:400-411``)."""
    impressions, history = [], []
    for i in range(ROWS):
        if i == ROWS - 1:
            pos, neg, neg2 = rng.choice(NUM_NEWS, size=3, replace=False)
            impressions.append(f"N{pos}-1 N{neg}-0 N{neg2}-0")
        else:
            pos, neg = rng.choice(NUM_NEWS, size=2, replace=False)
            impressions.append(f"N{pos}-1 N{neg}-0")
        k = int(rng.integers(2, 9))
        history.append(
            " ".join(f"N{j}" for j in rng.choice(NUM_NEWS, size=k, replace=False))
        )
    return impressions, history


@pytest.fixture(scope="module")
def h2h():
    from news_rec_utils.data_utils import split_impressions_and_history

    rng = np.random.default_rng(7)
    impressions, history = _make_forced_pair_behaviors(rng)
    ref = split_impressions_and_history(impressions, history)
    ours = compile_behaviors(impressions, history).with_history_view()
    # Unique-news tables are identically ordered (oracle-tested,
    # test_reference_oracle.py); one embedding table serves both.
    emb = rng.standard_normal((len(ref["news_list"]), D)).astype(np.float32) * 0.5
    assert ours.num_news == len(ref["news_list"])
    return ref, ours, emb


def _flax_leaves_close(got, want, atol, what):
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    flat_want = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(want)
    )
    assert len(flat_got) == len(flat_want)
    for path, leaf in flat_got:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(flat_want[key]),
            atol=atol,
            rtol=0,
            err_msg=f"{what}: {key}",
        )


def test_classification_trainer_head_to_head(h2h, monkeypatch):
    """Our ClassificationTrainer reproduces the reference
    ClassificationModelTrainer's losses, parameters, and metrics
    (reference ``trainer.py:47-214``, driven as ``scripts/train_v2.py``)."""
    import news_rec_utils.trainer as ref_trainer_mod
    from news_rec_utils.data_model_helper import get_classification_baseline_scores
    from news_rec_utils.data_utils import rank_group_preds
    from news_rec_utils.evaluation import score as ref_score
    from news_rec_utils.modeling_utils import ClassificationHead as RefHead

    ref, ours, emb = h2h
    # The reference sizes batches with a CUDA memory probe (trainer.py:98-100);
    # pin it to one-full-batch for the controlled comparison.
    monkeypatch.setattr(
        ref_trainer_mod, "get_classification_train_batch_size", lambda m, o: 4 * BATCH
    )
    monkeypatch.setattr(ref_trainer_mod, "NUM_WORKERS", 0)

    torch.manual_seed(0)
    ref_model = RefHead(in_dim=D, hidden_dim=D, out_dim=1)
    init_variables = convert_classification_head(_sd(ref_model))

    emb_t = torch.from_numpy(emb)
    ref_tr = ref_trainer_mod.ClassificationModelTrainer(
        ref_model,
        train_embeddings=emb_t,
        train_rev_index=ref["impression_rev_ind_array"][0],
        train_impression_len_list=ref["impression_len_list"],
        train_labels=ref["labels"],
        val_embeddings=emb_t,
        val_rev_index=ref["impression_rev_ind_array"][0],
        val_impression_len_list=ref["impression_len_list"],
        val_labels=ref["labels"],
        rng=np.random.default_rng(1234),
    )
    ref_losses = []
    for _ in range(EPOCHS):
        ref_losses.append(float(ref_tr.train_one_epoch()))
        ref_tr.train_dataset.reset()
    ref_metrics = ref_score(
        rank_group_preds(
            get_classification_baseline_scores(
                emb_t, ref_model, ref["impression_rev_ind_array"][0]
            )["baseline_scores"],
            ref["impression_len_list"],
        ),
        ref["labels"],
    )

    head = ClassificationHead(in_dim=D, hidden_dim=D, out_dim=1)
    trainer = ClassificationTrainer(
        head.apply,
        init_variables,
        ours,
        jnp.asarray(emb),
        compiled_val=ours,
        news_emb_val=jnp.asarray(emb),
        cfg=TrainConfig(num_epochs=EPOCHS, batch_size=BATCH, seed=3),
    )
    history = trainer.train()
    our_losses = [h["loss"] for h in history]

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4, atol=1e-5)
    _flax_leaves_close(
        trainer.params,
        convert_classification_head(_sd(ref_model)),
        atol=2e-4,
        what="final params",
    )
    for key in METRIC_KEYS:
        assert history[-1]["val"][key] == pytest.approx(
            ref_metrics[key], abs=1e-3
        ), key


def test_attention_trainer_head_to_head(h2h, monkeypatch):
    """Our TowerTrainer reproduces the reference AttentionTrainer's losses,
    parameters, and metrics (reference ``trainer.py:439-713``), dropout zeroed
    on both sides."""
    import news_rec_utils.data_model_helper as ref_helper_mod
    import news_rec_utils.trainer as ref_trainer_mod
    from news_rec_utils.data_utils import rank_group_preds
    from news_rec_utils.data_model_helper import get_cos_sim_scores
    from news_rec_utils.evaluation import score as ref_score
    from news_rec_utils.modeling_utils import FinalAttention as RefFA

    ref, ours, emb = h2h
    monkeypatch.setattr(
        ref_trainer_mod, "get_attention_train_batch_size", lambda m, o: BATCH
    )
    monkeypatch.setattr(
        ref_helper_mod, "get_attention_inference_batch_size", lambda m: 2 * BATCH
    )
    monkeypatch.setattr(ref_trainer_mod, "NUM_WORKERS", 0)
    monkeypatch.setattr(ref_helper_mod, "NUM_WORKERS", 0)

    torch.manual_seed(1)
    ref_model = RefFA(reduced_dim=D, hidden_dim=HID)
    for m in ref_model.modules():  # controlled comparison: no dropout noise
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    init_variables = convert_final_attention(_sd(ref_model))

    emb_t = torch.from_numpy(emb)
    ref_tr = ref_trainer_mod.AttentionTrainer(
        ref_model,
        train_history_rev_index=ref["history_rev_ind_array"][0],
        train_history_len_list=ref["history_len_list"],
        train_news_rev_index=ref["impression_rev_ind_array"][0],
        train_impression_len_list=ref["impression_len_list"],
        train_news_embeddings=emb_t,
        train_labels=ref["labels"],
        val_history_rev_index=ref["history_rev_ind_array"][0],
        val_history_len_list=ref["history_len_list"],
        val_news_rev_index=ref["impression_rev_ind_array"][0],
        val_impression_len_list=ref["impression_len_list"],
        val_news_embeddings=emb_t,
        val_labels=ref["labels"],
        rng=np.random.default_rng(1234),
    )
    ref_losses = []
    for _ in range(EPOCHS):
        ref_losses.append(float(ref_tr.train_one_epoch()))
        ref_tr.train_dataset.reset()
    ref_metrics = ref_score(
        rank_group_preds(
            get_cos_sim_scores(
                history_rev_index=ref["history_rev_ind_array"][0],
                history_len_list=ref["history_len_list"],
                news_rev_index=ref["impression_rev_ind_array"][0],
                impression_len_list=ref["impression_len_list"],
                news_embeddings=emb_t,
                model=ref_model,
            )
            .detach()
            .cpu()
            .numpy(),
            ref["impression_len_list"],
        ),
        ref["labels"],
    )

    tower = FinalAttention(reduced_dim=D, hidden_dim=HID, dropout_rate=0.0)
    trainer = TowerTrainer(
        tower.apply,
        init_variables,
        ours,
        jnp.asarray(emb),
        compiled_val=ours,
        news_emb_val=jnp.asarray(emb),
        cfg=TrainConfig(num_epochs=EPOCHS, batch_size=BATCH, seed=3),
    )
    history = trainer.train()
    our_losses = [h["loss"] for h in history]

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4, atol=1e-5)
    _flax_leaves_close(
        trainer.params,
        convert_final_attention(_sd(ref_model)),
        atol=2e-4,
        what="final params",
    )
    for key in METRIC_KEYS:
        assert history[-1]["val"][key] == pytest.approx(
            ref_metrics[key], abs=1e-3
        ), key


def test_attention_weight_trainer_head_to_head(h2h, monkeypatch):
    """Our JointTowerTrainer(blend) reproduces the reference
    AttentionWeightTrainer (joint FinalAttention + WeightedSum over
    classification baselines, ``trainer.py:217-436``), dropout zeroed."""
    import news_rec_utils.data_model_helper as ref_helper_mod
    import news_rec_utils.trainer as ref_trainer_mod
    from news_rec_utils.data_model_helper import get_cos_sim_final_score
    from news_rec_utils.data_utils import rank_group_preds
    from news_rec_utils.evaluation import score as ref_score
    from news_rec_utils.modeling_utils import (
        FinalAttention as RefFA,
        WeightedSumModel as RefWS,
    )

    from news_recommendation_project_v2_tpu.models import WeightedSumModel
    from news_recommendation_project_v2_tpu.models.convert_towers import (
        convert_weighted_sum,
    )
    from news_recommendation_project_v2_tpu.train import JointTowerTrainer

    ref, ours, emb = h2h
    monkeypatch.setattr(
        ref_trainer_mod, "get_attention_train_batch_size", lambda m, o: BATCH
    )
    monkeypatch.setattr(
        ref_helper_mod, "get_attention_inference_batch_size", lambda m: 2 * BATCH
    )
    monkeypatch.setattr(ref_trainer_mod, "NUM_WORKERS", 0)
    monkeypatch.setattr(ref_helper_mod, "NUM_WORKERS", 0)

    torch.manual_seed(2)
    ref_model = RefFA(reduced_dim=D, hidden_dim=HID)
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    ref_ws = RefWS()
    with torch.no_grad():
        ref_ws.alpha.copy_(torch.tensor(0.25))
    init_tower = convert_final_attention(_sd(ref_model))
    init_blend = convert_weighted_sum(_sd(ref_ws))
    baseline = (
        np.random.default_rng(9).random(len(emb)).astype(np.float32) - 0.5
    )

    emb_t = torch.from_numpy(emb)
    ref_tr = ref_trainer_mod.AttentionWeightTrainer(
        ref_model,
        ref_ws,
        train_history_rev_index=ref["history_rev_ind_array"][0],
        train_history_len_list=ref["history_len_list"],
        train_news_rev_index=ref["impression_rev_ind_array"][0],
        train_impression_len_list=ref["impression_len_list"],
        train_news_embeddings=emb_t,
        train_classification_score=baseline,
        train_labels=ref["labels"],
        val_history_rev_index=ref["history_rev_ind_array"][0],
        val_history_len_list=ref["history_len_list"],
        val_news_rev_index=ref["impression_rev_ind_array"][0],
        val_impression_len_list=ref["impression_len_list"],
        val_news_embeddings=emb_t,
        val_classification_score=baseline,
        val_labels=ref["labels"],
        rng=np.random.default_rng(1234),
    )
    ref_losses = []
    for _ in range(EPOCHS):
        ref_losses.append(float(ref_tr.train_one_epoch()))
        ref_tr.train_dataset.reset()
    ref_metrics = ref_score(
        rank_group_preds(
            get_cos_sim_final_score(
                history_rev_index=ref["history_rev_ind_array"][0],
                history_len_list=ref["history_len_list"],
                news_rev_index=ref["impression_rev_ind_array"][0],
                impression_len_list=ref["impression_len_list"],
                news_embeddings=emb_t,
                classification_score=baseline,
                attention_model=ref_model,
                weight_model=ref_ws,
            ),
            ref["impression_len_list"],
        ),
        ref["labels"],
    )

    tower = FinalAttention(reduced_dim=D, hidden_dim=HID, dropout_rate=0.0)
    blend = WeightedSumModel()
    trainer = JointTowerTrainer(
        tower.apply,
        init_tower,
        ours,
        jnp.asarray(emb),
        blend_apply=blend.apply,
        blend_params=init_blend,
        baseline_train=baseline,
        baseline_val=baseline,
        compiled_val=ours,
        news_emb_val=jnp.asarray(emb),
        cfg=TrainConfig(num_epochs=EPOCHS, batch_size=BATCH, seed=3),
    )
    history = trainer.train()
    our_losses = [h["loss"] for h in history]

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4, atol=1e-5)
    _flax_leaves_close(
        trainer.params["tower"],
        convert_final_attention(_sd(ref_model)),
        atol=2e-4,
        what="final tower params",
    )
    _flax_leaves_close(
        trainer.params["blend"],
        convert_weighted_sum(_sd(ref_ws)),
        atol=2e-4,
        what="final blend params",
    )
    for key in METRIC_KEYS:
        assert history[-1]["val"][key] == pytest.approx(
            ref_metrics[key], abs=1e-3
        ), key


def test_attention_reduce_trainer_head_to_head(h2h, monkeypatch):
    """Our JointTowerTrainer(reduce) reproduces the reference
    AttentionReduceTrainer's TRAINING loop (losses + both models' parameters;
    reference ``trainer.py:716-949``). Eval metrics are excluded: the
    reference's reduce eval transforms the tables inconsistently (PARITY.md
    row 37, documented divergence). Two notes on comparability:

    - the reference applies ``reduce(emb * mask)`` vs our ``reduce(emb) *
      mask`` — identical on real slots, and padded slots are inert under
      FinalAttention's masked exp-weights either way;
    - the reference clips ONLY the attention model's gradients
      (``trainer.py:860-863``), unlike every other trainer (global clip); at
      this fixture's scale the global gradient norm stays under the 0.5
      threshold so the clip is inactive on both sides, which the final-param
      equality itself verifies.
    """
    import news_rec_utils.trainer as ref_trainer_mod
    from news_rec_utils.modeling_utils import (
        FinalAttention as RefFA,
        ReducingModel as RefRM,
    )

    from news_recommendation_project_v2_tpu.models import ReducingModel
    from news_recommendation_project_v2_tpu.models.convert_towers import (
        convert_reducing_model,
    )
    from news_recommendation_project_v2_tpu.train import JointTowerTrainer

    ref, ours, emb = h2h
    monkeypatch.setattr(
        ref_trainer_mod, "get_attention_train_batch_size", lambda m, o: 2 * BATCH
    )
    monkeypatch.setattr(ref_trainer_mod, "NUM_WORKERS", 0)

    torch.manual_seed(3)
    ref_model = RefFA(reduced_dim=D, hidden_dim=HID)
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    ref_reduce = RefRM(input_dim=D, output_dim=D)
    init_tower = convert_final_attention(_sd(ref_model))
    init_reduce = convert_reducing_model(_sd(ref_reduce))

    emb_t = torch.from_numpy(emb)
    ref_tr = ref_trainer_mod.AttentionReduceTrainer(
        ref_model,
        ref_reduce,
        train_history_rev_index=ref["history_rev_ind_array"][0],
        train_history_len_list=ref["history_len_list"],
        train_news_rev_index=ref["impression_rev_ind_array"][0],
        train_impression_len_list=ref["impression_len_list"],
        train_news_embeddings=emb_t,
        train_labels=ref["labels"],
        val_history_rev_index=ref["history_rev_ind_array"][0],
        val_history_len_list=ref["history_len_list"],
        val_news_rev_index=ref["impression_rev_ind_array"][0],
        val_impression_len_list=ref["impression_len_list"],
        val_news_embeddings=emb_t,
        val_labels=ref["labels"],
        rng=np.random.default_rng(1234),
    )
    ref_losses = []
    for _ in range(EPOCHS):
        ref_losses.append(float(ref_tr.train_one_epoch()))
        ref_tr.train_dataset.reset()

    tower = FinalAttention(reduced_dim=D, hidden_dim=HID, dropout_rate=0.0)
    reducer = ReducingModel(input_dim=D, output_dim=D)
    trainer = JointTowerTrainer(
        tower.apply,
        init_tower,
        ours,
        jnp.asarray(emb),
        reduce_apply=reducer.apply,
        reduce_params=init_reduce,
        compiled_val=ours,
        news_emb_val=jnp.asarray(emb),
        cfg=TrainConfig(num_epochs=EPOCHS, batch_size=BATCH, seed=3),
    )
    losses = []
    for _ in range(EPOCHS):
        losses.append(trainer.train_one_epoch())

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4, atol=1e-5)
    _flax_leaves_close(
        trainer.params["tower"],
        convert_final_attention(_sd(ref_model)),
        atol=2e-4,
        what="final tower params",
    )
    _flax_leaves_close(
        trainer.params["reduce"],
        convert_reducing_model(_sd(ref_reduce)),
        atol=2e-4,
        what="final reduce params",
    )


def test_attention_attention_trainer_head_to_head(h2h, monkeypatch, tmp_path):
    """Our EndToEndTrainer reproduces the reference AttentionAttentionTrainer
    (two-level token-attention + history-tower training from frozen per-token
    states, ``trainer.py:952-1117``): per-epoch losses and BOTH models' final
    parameters.

    Offline construction notes:

    - the token-attention head is built directly (``FirstAttentionPoolFunc``
      = bare ``MyEncoder`` + last-token pool, ``modeling_utils.py:498-513``;
      no AutoModel involved), with ``as_built=True`` on our side matching the
      reference's dead-layer quirk (``attention.py:193`` returns
      ``LayerNorm(input)``; only the final LayerNorm trains — in torch the
      dead params keep ``grad=None`` so AdamW skips them entirely, while
      optax sees exact-zero grads and applies only weight decay: at
      lr=1e-6 x wd=0.01 x 3 steps that is a ~3e-8 relative drift, far under
      the 2e-4 atol, and the quirk also makes the head's dropout inert (it
      only touches discarded tensors), so no dropout control is needed there;
    - the sqlite token store is fabricated in the reference's exact format
      (1-based INTEGER PRIMARY KEY, torch-pickled mask-trimmed ``[L, D]``
      blobs, ``modeling_utils.py:460-471``); our ``TokenStore`` holds the
      same ragged states 0-indexed (news tables are identically ordered,
      oracle-tested);
    - the Azure blob client the reference constructs unconditionally
      (``trainer.py:1009-1019``) is stubbed out — it is only used by the
      commented-out mid-epoch upload path;
    - the reference hardcodes AdamW lr=1e-6 for this trainer
      (``trainer.py:979-983``), unlike the others' 1e-5.
    """
    import news_rec_utils.trainer as ref_trainer_mod
    from news_rec_utils.modeling_utils import (
        FirstAttentionPoolFunc as RefPool,
        FinalAttention as RefFA,
        last_token_pool as ref_last_token_pool,
    )

    from news_recommendation_project_v2_tpu.models import TokenAttentionPool
    from news_recommendation_project_v2_tpu.models.convert_towers import (
        convert_token_attention_pool,
    )
    from news_recommendation_project_v2_tpu.ops.encode import TokenStore
    from news_recommendation_project_v2_tpu.train import EndToEndTrainer

    ref, ours, _ = h2h
    monkeypatch.setattr(
        ref_trainer_mod,
        "get_attention_attention_train_batch_size",
        lambda **kw: BATCH,
    )
    monkeypatch.setattr(ref_trainer_mod, "NUM_WORKERS", 0)
    monkeypatch.setenv("ACCOUNT_URL", "https://offline.invalid")
    monkeypatch.setenv("CONTAINER_NAME", "offline")
    monkeypatch.setenv("BLOB_SAS_TOKEN", "offline")

    class _OfflineContainer:
        def __init__(self, **kwargs):
            pass

    monkeypatch.setattr(ref_trainer_mod, "ContainerClient", _OfflineContainer)

    # Fabricate the frozen per-token states: ragged [L_i, D], L_i in [3, 10].
    import io
    import sqlite3

    state_rng = np.random.default_rng(11)
    toks = [
        (state_rng.standard_normal((int(state_rng.integers(3, 11)), D)) * 0.4).astype(
            np.float32
        )
        for _ in range(NUM_NEWS)
    ]
    db = tmp_path / "tok.sqlite"
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE tensors (id INTEGER PRIMARY KEY, data BLOB)")
        for t in toks:  # implicit rowids 1..N, matching store order
            buf = io.BytesIO()
            torch.save(torch.from_numpy(t), buf)
            buf.seek(0)
            conn.execute("INSERT INTO tensors (data) VALUES (?)", (buf.read(),))

    torch.manual_seed(4)
    ref_pool = RefPool(pool_func=ref_last_token_pool, embedding_dim=D, num_layers=1)
    ref_fa = RefFA(reduced_dim=D, hidden_dim=HID)
    for m in ref_fa.modules():  # controlled comparison: no dropout noise
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    init_pool = convert_token_attention_pool(_sd(ref_pool), num_layers=1)
    init_tower = convert_final_attention(_sd(ref_fa))

    ref_tr = ref_trainer_mod.AttentionAttentionTrainer(
        db_name=str(db),
        token_attention_model=ref_pool,
        final_attention_model=ref_fa,
        train_history_rev_index=ref["history_rev_ind_array"][0],
        train_history_len_list=ref["history_len_list"],
        train_news_rev_index=ref["impression_rev_ind_array"][0],
        train_impression_len_list=ref["impression_len_list"],
        train_labels=ref["labels"],
        rng=np.random.default_rng(1234),
    )
    ref_losses = []
    for _ in range(EPOCHS):
        ref_losses.append(float(ref_tr.train_one_epoch()))
        ref_tr.train_dataset.reset()

    pool = TokenAttentionPool(hidden_size=D, num_layers=1, as_built=True)
    tower = FinalAttention(reduced_dim=D, hidden_dim=HID, dropout_rate=0.0)
    trainer = EndToEndTrainer(
        pool.apply,
        init_pool,
        tower.apply,
        init_tower,
        ours,
        TokenStore.from_ragged(toks),
        cfg=TrainConfig(
            num_epochs=EPOCHS, batch_size=BATCH, learning_rate=1e-6, seed=3
        ),
    )
    losses = [trainer.train_one_epoch() for _ in range(EPOCHS)]

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-4, atol=1e-5)
    _flax_leaves_close(
        trainer.params["token_encoder"],
        convert_token_attention_pool(_sd(ref_pool), num_layers=1),
        atol=2e-4,
        what="final token-encoder params",
    )
    _flax_leaves_close(
        trainer.params["tower"],
        convert_final_attention(_sd(ref_fa)),
        atol=2e-4,
        what="final tower params",
    )
