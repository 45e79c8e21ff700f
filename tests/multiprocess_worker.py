"""Worker for tests/test_multiprocess.py: one of two OS processes whose 2
virtual CPU devices each join a single 4-device (data=2, model=2) mesh via
``jax.distributed``. The data axis spans the two processes, so the sharded
train step's gradient psum crosses a REAL process boundary (Gloo collectives)
— the closest single-box analogue of a multi-host pod (SURVEY.md §2.6
collectives backend; the reference has no distributed backend at all).

Usage (spawned by the test): worker.py PID NPROC COORD OUT_JSON
Requires XLA_FLAGS=--xla_force_host_platform_device_count=2 in the env.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # the axon plugin overrides the env var

pid, nproc, coord, out_path = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    sys.argv[3],
    sys.argv[4],
)
jax.distributed.initialize(
    coordinator_address=coord, num_processes=nproc, process_id=pid
)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from news_recommendation_project_v2_tpu.config import (
    MeshConfig,
    TowerConfig,
    TrainConfig,
)
from news_recommendation_project_v2_tpu.models import build_tower
from news_recommendation_project_v2_tpu.parallel import (
    build_mesh,
    make_sharded_tower_train_step,
)
from news_recommendation_project_v2_tpu.parallel.sharding import (
    batch_sharding,
    put_global,
    replicated,
    table_sharding,
)
from news_recommendation_project_v2_tpu.train.step import make_tower_train_step
from news_recommendation_project_v2_tpu.train.trainer import make_optimizer

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()
mesh = build_mesh(MeshConfig(data_size=nproc, model_size=2))

D, N, B, L = 32, 16, 8, 4
tower = build_tower(
    TowerConfig(kind="latent", reduced_dim=D, num_latents=4, latent_dim_head=8)
)
# Same seed on every process -> identical params/batch (SPMD discipline).
params = jax.jit(
    lambda: tower.init(jax.random.key(0), jnp.zeros((1, L, D)), jnp.ones((1, L)))
)()
cfg = TrainConfig()
optimizer = make_optimizer(cfg)
opt_state = jax.jit(optimizer.init)(params)

rng = np.random.default_rng(0)
table = rng.standard_normal((N, D)).astype(np.float32)
hist_idx = rng.integers(0, N, (B, L)).astype(np.int32)
hist_mask = np.ones((B, L), np.float32)
hist_rev = rng.integers(0, B, B).astype(np.int32)
pos = rng.integers(0, N, B).astype(np.int32)
neg = rng.integers(0, N, B).astype(np.int32)
pmask = np.ones(B, np.float32)
# Legacy uint32 key: representable as a plain array on every process.
key = np.asarray(jax.random.PRNGKey(1))

# Single-process reference loss on this process's local device.
local_step = jax.jit(make_tower_train_step(tower.apply, optimizer, cfg.margin))
_, _, loss_ref = local_step(
    params, opt_state, jnp.asarray(table), jnp.asarray(table),
    jnp.asarray(hist_idx), jnp.asarray(hist_mask), jnp.asarray(hist_rev),
    jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(pmask), jnp.asarray(key),
)
loss_ref = float(loss_ref)

# Global (cross-process) arrays matching the sharded step's in_shardings:
# every process holds the full value; put_global (the library's multi-host
# placement helper) hands each addressable device its slice.
gshard = put_global
rep, tab, dat = replicated(mesh), table_sharding(mesh), batch_sharding(mesh)
dat2 = NamedSharding(mesh, P("data", None))
step = make_sharded_tower_train_step(
    make_tower_train_step(tower.apply, optimizer, cfg.margin), mesh, donate=False
)
new_params, new_opt, loss = step(
    jax.tree.map(lambda l: gshard(l, rep), params),
    jax.tree.map(lambda l: gshard(l, rep), opt_state),
    gshard(table, tab),
    gshard(table, tab),
    gshard(hist_idx, dat2),
    gshard(hist_mask, dat2),
    gshard(hist_rev, dat),
    gshard(pos, dat),
    gshard(neg, dat),
    gshard(pmask, dat),
    gshard(key, rep),
)
loss = float(loss)  # replicated output: readable on every process

# Param update equality (norm of a leaf's delta, replicated).
leaf = jax.tree.leaves(new_params)[0]
leaf_norm = float(jnp.linalg.norm(leaf.astype(jnp.float32)))

# --- Zero-fetch sharded eval METRICS across the process boundary ---------
# The eval's only cross-device (here: cross-PROCESS) traffic is one 5-scalar
# psum. Reference value: the same plan on a process-LOCAL 2-device mesh.
from news_recommendation_project_v2_tpu.parallel.flat_eval import (
    ShardedFlatEvalPlan,
    ShardedMetricsPlan,
)

R = 8
hist_lens_e = rng.integers(1, 6, size=R)
hist_rev_e = rng.integers(0, N, size=int(hist_lens_e.sum())).astype(np.int32)
cand_row = np.sort(
    np.concatenate([np.arange(R), np.arange(R), rng.integers(0, R, size=R)])
).astype(np.int32)
cand_rev = rng.integers(0, N, size=len(cand_row)).astype(np.int32)
imp_lens = np.bincount(cand_row, minlength=R)
labels = rng.integers(0, 2, size=int(imp_lens.sum())).astype(np.float32)
offs = np.concatenate([[0], np.cumsum(imp_lens)])
labels[offs[:-1]] = 1.0
labels[offs[1:] - 1] = 0.0

def run_metrics(mesh_):
    plan = ShardedFlatEvalPlan(
        mesh_, hist_rev_e, hist_lens_e, cand_rev, cand_row,
        chunk_tokens=8, cand_chunk=8,
    )
    mplan = ShardedMetricsPlan(
        plan, imp_lens, labels, hist_slots=np.arange(len(cand_rev)), row_chunk=4
    )
    return plan.metrics(tower.apply, params, jnp.asarray(table), mplan)

metrics_global = run_metrics(mesh)  # 4 devices across 2 processes
local_mesh = build_mesh(
    MeshConfig(data_size=2, model_size=1), devices=jax.local_devices()
)
metrics_local = run_metrics(local_mesh)  # this process only

# --- FULL training run across the process-spanning mesh ------------------
# TowerTrainer(mesh=<cross-process>, device_metrics=True): every step feeds
# global arrays (each host commits its addressable shards), every eval
# fetches five replicated scalars. Identical seeds -> identical host
# sampling on both processes; the run must match the mesh=None run.
from news_recommendation_project_v2_tpu.data import compile_behaviors
from news_recommendation_project_v2_tpu.data.synthetic import (
    align_embeddings,
    synthetic_learnable_behaviors,
)
from news_recommendation_project_v2_tpu.train.trainer import TowerTrainer

imps, hist, emb_syn = synthetic_learnable_behaviors(
    num_news=80, num_rows=96, dim=D, noise=0.05
)
c = compile_behaviors(imps, hist).with_history_view()
emb_aligned = align_embeddings(c.news_ids, emb_syn)


def make_trainer(mesh_):
    t_params = jax.jit(
        lambda: tower.init(jax.random.key(3), jnp.zeros((1, 8, D)), jnp.ones((1, 8)))
    )()
    return TowerTrainer(
        tower.apply,
        t_params,
        c,
        jnp.asarray(emb_aligned),
        compiled_val=c,
        news_emb_val=jnp.asarray(emb_aligned),
        cfg=TrainConfig(learning_rate=3e-4, num_epochs=2, batch_size=16, seed=0),
        mesh=mesh_,
        flat_eval=True,
        device_metrics=True,
    )


t_mp = make_trainer(mesh)
hist_mp = t_mp.train()
t_single = make_trainer(None)
hist_single = t_single.train()

# --- Checkpoint/resume across processes ----------------------------------
# save_training_state barriers internally (Orbax save + sidecar + explicit
# sync), so the immediate restore on every process is safe with no
# caller-side coordination.
import os

ckpt_path = os.path.join(os.path.dirname(os.path.abspath(out_path)), "shared_ckpt")
t_mp.save_training_state(ckpt_path)
t_resume = make_trainer(mesh)
resumed_epochs = t_resume.restore_training_state(ckpt_path)
resume_loss = t_resume.train_one_epoch()
resume_loss_single = t_single.train_one_epoch()

# --- Joint (blend) trainer across processes ------------------------------
# One epoch of the alpha-blend joint step with the same placement discipline
# (baseline columns shard over the pair axis).
from news_recommendation_project_v2_tpu.models import WeightedSumModel
from news_recommendation_project_v2_tpu.train.trainer import JointTowerTrainer

base_scores = np.random.default_rng(7).random(c.num_news).astype(np.float32)


def make_joint(mesh_):
    t_params = jax.jit(
        lambda: tower.init(jax.random.key(6), jnp.zeros((1, 8, D)), jnp.ones((1, 8)))
    )()
    blend = WeightedSumModel()
    blend_params = jax.jit(
        lambda: blend.init(jax.random.key(1), jnp.zeros(2), jnp.zeros(2))
    )()
    return JointTowerTrainer(
        tower.apply,
        t_params,
        c,
        jnp.asarray(emb_aligned),
        blend_apply=blend.apply,
        blend_params=blend_params,
        baseline_train=base_scores,
        baseline_val=base_scores,
        compiled_val=c,
        news_emb_val=jnp.asarray(emb_aligned),
        cfg=TrainConfig(learning_rate=3e-4, num_epochs=1, batch_size=16, seed=0),
        mesh=mesh_,
        flat_eval=True,
        device_metrics=True,
    )


joint_mp = make_joint(mesh).train()
joint_single = make_joint(None).train()

# --- Sharded corpus encode across the process boundary -------------------
# (config[4]'s "sharded encode -> dump" stage on a multi-host pod.)
from news_recommendation_project_v2_tpu.config import EncoderConfig
from news_recommendation_project_v2_tpu.models.news_encoder import (
    HashTokenizer,
    NewsEncoder,
)
from news_recommendation_project_v2_tpu.parallel.sharding import (
    make_sharded_encode_fn,
    put_global,
    replicated,
)

enc_cfg = EncoderConfig(
    vocab_size=96, hidden_dim=32, num_layers=1, num_heads=2,
    intermediate_dim=64, max_position=20, compute_dtype="float32",
)
enc = NewsEncoder(enc_cfg)
tok = HashTokenizer(vocab_size=96, max_length=12)
ids, emask = tok([f"doc number {i}" for i in range(8)])
enc_params = jax.jit(
    lambda: enc.init(jax.random.key(4), jnp.asarray(ids), jnp.asarray(emask))
)()
encode = make_sharded_encode_fn(mesh, lambda p, i, m: enc.apply(p, i, m))
dat2s = NamedSharding(mesh, P("data", None))
emb_g = encode(
    jax.tree.map(lambda l: put_global(l, replicated(mesh)), enc_params),
    put_global(ids, dat2s),
    put_global(emask, dat2s),
)
plain = np.asarray(jax.jit(enc.apply)(enc_params, jnp.asarray(ids), jnp.asarray(emask)))
for s in emb_g.addressable_shards:
    np.testing.assert_allclose(np.asarray(s.data), plain[s.index], atol=1e-5)
encode_rows_checked = sum(s.data.shape[0] for s in emb_g.addressable_shards)
# --- End-to-end trainer across processes (VERDICT r2 item 5) -------------
# Token batches fed via put_global; eval = process-local materialization of
# the learned news embeddings (identical on both processes) -> zero-fetch
# sharded flat metrics (5-scalar psum).
from news_recommendation_project_v2_tpu.models import TokenAttentionPool
from news_recommendation_project_v2_tpu.ops.encode import TokenStore
from news_recommendation_project_v2_tpu.train.trainer import (
    ClassificationTrainer,
    EndToEndTrainer,
)

tok_rng = np.random.default_rng(11)
tok_arrays = [
    emb_aligned[i][None, :]
    + tok_rng.standard_normal((int(tok_rng.integers(2, 5)), D)).astype(np.float32)
    * 0.05
    for i in range(c.num_news)
]
token_store = TokenStore.from_ragged(tok_arrays)
tok_model = TokenAttentionPool(hidden_size=D, num_layers=1)


def make_e2e(mesh_, device_store, shard_store=None):
    tok_params = jax.jit(
        lambda: tok_model.init(
            jax.random.key(5), jnp.zeros((1, 8, D)), jnp.ones((1, 8))
        )
    )()
    t_params = jax.jit(
        lambda: tower.init(jax.random.key(3), jnp.zeros((1, 8, D)), jnp.ones((1, 8)))
    )()
    return EndToEndTrainer(
        tok_model.apply,
        tok_params,
        tower.apply,
        t_params,
        c,
        token_store,
        cfg=TrainConfig(learning_rate=1e-4, num_epochs=1, batch_size=16, seed=0),
        max_token_len=8,
        compiled_val=c,
        val_token_store=token_store,
        eval_each_epoch=True,
        mesh=mesh_,
        flat_eval=True,
        device_metrics=True,
        device_store=device_store,
        shard_store=shard_store,
    )


# All three cross-process input paths: streaming (per-batch put_global of the
# [M, T, D] block), device-resident store (ONE global replicated upload,
# per-batch index grids), and the row-SHARDED device store (each process's
# devices hold their row shards; the in-program gather rides collectives —
# the aggregate-HBM path for stores bigger than one chip).
e2e_mp = make_e2e(mesh, device_store=False).train()
e2e_mp_dev = make_e2e(mesh, device_store=True).train()
e2e_shard_trainer = make_e2e(mesh, device_store=True, shard_store=True)
assert e2e_shard_trainer.store_sharded
e2e_mp_shard = e2e_shard_trainer.train()
e2e_single = make_e2e(None, device_store=True).train()


# --- Classification trainer across processes ------------------------------
def make_cls(mesh_):
    from news_recommendation_project_v2_tpu.models import ClassificationHead

    head = ClassificationHead(in_dim=D, hidden_dim=D)
    h_params = jax.jit(lambda: head.init(jax.random.key(0), jnp.zeros((1, D))))()
    return ClassificationTrainer(
        head.apply,
        h_params,
        c,
        jnp.asarray(emb_aligned),
        compiled_val=c,
        news_emb_val=jnp.asarray(emb_aligned),
        cfg=TrainConfig(learning_rate=1e-3, num_epochs=1, batch_size=16, seed=0),
        mesh=mesh_,
    )


cls_mp = make_cls(mesh).train()
cls_single = make_cls(None).train()

train_run = {
    "e2e_mp_loss": e2e_mp[-1]["loss"],
    "e2e_mp_dev_loss": e2e_mp_dev[-1]["loss"],
    "e2e_mp_shard_loss": e2e_mp_shard[-1]["loss"],
    "e2e_single_loss": e2e_single[-1]["loss"],
    "e2e_mp_val": e2e_mp[-1]["val"],
    "e2e_mp_dev_val": e2e_mp_dev[-1]["val"],
    "e2e_mp_shard_val": e2e_mp_shard[-1]["val"],
    "e2e_single_val": e2e_single[-1]["val"],
    "cls_mp_loss": cls_mp[-1]["loss"],
    "cls_single_loss": cls_single[-1]["loss"],
    "cls_mp_val": cls_mp[-1]["val"],
    "cls_single_val": cls_single[-1]["val"],
    "mp_losses": [r["loss"] for r in hist_mp],
    "single_losses": [r["loss"] for r in hist_single],
    "mp_final_val": hist_mp[-1]["val"],
    "single_final_val": hist_single[-1]["val"],
    "resumed_epochs": resumed_epochs,
    "resume_loss": resume_loss,
    "resume_loss_single": resume_loss_single,
    "joint_mp_loss": joint_mp[-1]["loss"],
    "joint_single_loss": joint_single[-1]["loss"],
    "joint_mp_val_auc": joint_mp[-1]["val"]["auc"],
    "joint_single_val_auc": joint_single[-1]["val"]["auc"],
}

with open(out_path, "w") as f:
    json.dump(
        {
            "pid": pid,
            "devices": len(jax.devices()),
            "processes": jax.process_count(),
            "loss": loss,
            "loss_ref": loss_ref,
            "leaf_norm": leaf_norm,
            "metrics": {k: float(v) for k, v in metrics_global.items()},
            "metrics_local": {k: float(v) for k, v in metrics_local.items()},
            "train_run": train_run,
            "encode_rows_checked": encode_rows_checked,
        },
        f,
    )
print(f"proc {pid}: loss={loss:.6f} ref={loss_ref:.6f}", flush=True)
