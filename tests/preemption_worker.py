"""Worker for tests/test_preemption_kill.py: trains a TowerTrainer, saving
training state after every epoch; in ``crash`` mode it hard-exits (os._exit,
no cleanup — a preemption) partway through epoch 2's steps. A fresh invocation
in ``resume`` mode restores the last epoch-1 state and finishes the run.

Usage: preemption_worker.py MODE STATE_DIR OUT_JSON   (MODE: crash | resume | straight)
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
from news_recommendation_project_v2_tpu.data import compile_behaviors
from news_recommendation_project_v2_tpu.data.synthetic import (
    align_embeddings,
    synthetic_learnable_behaviors,
)
from news_recommendation_project_v2_tpu.models import build_tower
from news_recommendation_project_v2_tpu.train import TowerTrainer

mode, state_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]

D = 32
imps, hist, emb = synthetic_learnable_behaviors(num_news=80, num_rows=96, dim=D)
c = compile_behaviors(imps, hist).with_history_view()
emb_j = jnp.asarray(align_embeddings(c.news_ids, emb))
tower = build_tower(
    TowerConfig(kind="latent", reduced_dim=D, num_latents=4, latent_dim_head=8)
)
params = jax.jit(
    lambda: tower.init(jax.random.key(0), jnp.zeros((1, 8, D)), jnp.ones((1, 8)))
)()
trainer = TowerTrainer(
    tower.apply,
    params,
    c,
    emb_j,
    compiled_val=c,
    news_emb_val=emb_j,
    cfg=TrainConfig(learning_rate=3e-4, num_epochs=3, batch_size=32, seed=0),
)

state_path = os.path.join(state_dir, "state")

if mode == "straight":
    hist_out = trainer.train(3)
elif mode == "crash":
    hist_out = trainer.train(1)
    trainer.save_training_state(state_path)
    # Preemption mid-epoch-2: a few steps in, hard-exit with no cleanup.
    for i, batch in enumerate(trainer._epoch_batches()):
        trainer.key, sub = jax.random.split(trainer.key)
        trainer.params, trainer.opt_state, _ = trainer._train_step(
            trainer.params, trainer.opt_state, trainer.news_emb_train,
            trainer.query_train, *map(jnp.asarray, batch), sub,
        )
        if i == 1:
            os._exit(17)  # simulated preemption — no atexit, no flushes
elif mode == "resume":
    done = trainer.restore_training_state(state_path)
    assert done == 1, done
    hist_out = trainer.train(2)  # epochs 2 and 3
else:
    raise SystemExit(f"unknown mode {mode}")

leaves = jax.tree.leaves(trainer.params)
with open(out_path, "w") as f:
    json.dump(
        {
            "epochs": [h["epoch"] for h in trainer.history],
            "losses": [h["loss"] for h in trainer.history],
            "final_val_auc": trainer.history[-1]["val"]["auc"],
            "param_digest": float(
                sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
            ),
        },
        f,
    )
