"""End-to-end (config[2]) trainer step benchmark: host-streaming vs
device-resident token store.

The e2e step's inputs are dominated by the batch's unique-news token block
[M, T, D] (M=2048, T=64, D=1024 f32 = 512MB). The host path re-uploads that
block every step (the reference's sqlite-collate does the same,
``data_utils.py:893-915``); the device-store path uploads the flat store ONCE
and gathers the block inside the jitted step from HBM, so the per-step
transfer drops to index grids (~1MB). This benchmark measures both steps on
identical batch content, plus the corpus materialization pass both ways.

    python benchmarks/e2e_bench.py [steps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from news_recommendation_project_v2_tpu.config import TrainConfig
from news_recommendation_project_v2_tpu.models import FinalAttention, TokenAttentionPool
from news_recommendation_project_v2_tpu.ops.encode import (
    TokenStore,
    materialize_from_token_store,
)
from news_recommendation_project_v2_tpu.train.step import (
    make_end2end_train_step,
    make_end2end_train_step_gathered,
)
from news_recommendation_project_v2_tpu.train.trainer import make_optimizer

NUM_NEWS, DIM = 8192, 1024
M, T = 2048, 64  # unique-news bucket x token bucket (title-only MIND stats)
B, L = 1024, 64  # pairs x history bucket


def build_store(rng) -> TokenStore:
    lens = np.clip(rng.geometric(1 / 24.0, size=NUM_NEWS), 2, T).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    states = rng.standard_normal((int(offsets[-1]), DIM)).astype(np.float32) * 0.3
    return TokenStore(states=states, offsets=offsets)


def main(steps: int = 8):
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    rng = np.random.default_rng(0)
    store = build_store(rng)
    total_tokens = int(store.offsets[-1])
    print(
        f"store: {NUM_NEWS} news, {total_tokens:,} tokens "
        f"({store.states.nbytes / 1e9:.2f} GB f32)",
        file=sys.stderr,
    )

    tok_model = TokenAttentionPool(hidden_size=DIM, num_layers=1)
    tower = FinalAttention()
    tok_params = jax.jit(
        lambda: tok_model.init(jax.random.key(0), jnp.zeros((1, T, DIM)), jnp.ones((1, T)))
    )()
    tower_params = jax.jit(
        lambda: tower.init(jax.random.key(1), jnp.zeros((1, L, DIM)), jnp.ones((1, L)))
    )()
    params = {"token_encoder": tok_params, "tower": tower_params}
    cfg = TrainConfig()
    optimizer = make_optimizer(cfg)

    # One batch's logical content, shared by both paths.
    uniq = np.sort(rng.choice(NUM_NEWS, size=M, replace=False)).astype(np.int64)
    hist_idx = rng.integers(0, M, (B, L)).astype(np.int32)
    hist_mask = (rng.random((B, L)) < 0.5).astype(np.float32)
    hist_mask[:, 0] = 1.0
    hist_rev = np.arange(B, dtype=np.int32)
    pos = rng.integers(0, M, B).astype(np.int32)
    neg = rng.integers(0, M, B).astype(np.int32)
    pmask = np.ones(B, np.float32)
    key = jax.random.key(2)
    tail = (hist_idx, hist_mask, hist_rev, pos, neg, pmask)

    # --- host-streaming path: the [M, T, D] block is re-uploaded per step ---
    tok_states, tok_mask = store.gather_padded(uniq, max_len=T)
    tok_states = np.pad(tok_states, ((0, 0), (0, T - tok_states.shape[1]), (0, 0)))
    tok_mask = np.pad(tok_mask, ((0, 0), (0, T - tok_mask.shape[1])))
    step_host = jax.jit(
        make_end2end_train_step(tok_model.apply, tower.apply, optimizer, cfg.margin),
        donate_argnums=(0, 1),
    )
    p = jax.tree.map(jnp.copy, params)
    o = jax.jit(optimizer.init)(p)
    p, o, loss = step_host(p, o, tok_states, tok_mask, *tail, key)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        # jnp.asarray inside the loop: the upload is part of the step cost.
        p, o, loss = step_host(
            p, o, jnp.asarray(tok_states), jnp.asarray(tok_mask), *tail, key
        )
        final = float(loss)
    dt_host = (time.perf_counter() - t0) / steps
    mb = (tok_states.nbytes + tok_mask.nbytes) / 1e6
    print(
        f"host-path step ({mb:.0f} MB/step H2D): {dt_host * 1e3:.1f} ms/step "
        f"-> {B / dt_host:,.0f} pairs/s (loss {final:.4f})"
    )

    # --- device-store path: states uploaded once, gathered in-program ---
    t0 = time.perf_counter()
    dev_states = jnp.asarray(store.states)
    dev_states.block_until_ready()
    np.asarray(dev_states[0, 0])  # force through the tunnel
    up = time.perf_counter() - t0
    print(f"one-time store upload: {up:.2f}s ({store.states.nbytes / 1e6:.0f} MB)")
    tok_idx, g_mask = store.padded_index_batch(uniq, T, max_len=T)
    step_dev = jax.jit(
        make_end2end_train_step_gathered(
            tok_model.apply, tower.apply, optimizer, cfg.margin
        ),
        donate_argnums=(0, 1),
    )
    p = jax.tree.map(jnp.copy, params)
    o = jax.jit(optimizer.init)(p)
    p, o, loss = step_dev(p, o, dev_states, tok_idx, g_mask, *tail, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, o, loss = step_dev(
            p, o, dev_states, jnp.asarray(tok_idx), jnp.asarray(g_mask), *tail, key
        )
        final = float(loss)
    dt_dev = (time.perf_counter() - t0) / steps
    kb = (tok_idx.nbytes + g_mask.nbytes) / 1e3
    print(
        f"device-store step ({kb:.0f} KB/step H2D): {dt_dev * 1e3:.1f} ms/step "
        f"-> {B / dt_dev:,.0f} pairs/s (loss {final:.4f}) "
        f"-> {dt_host / dt_dev:.2f}x over host path"
    )

    # --- corpus materialization, both ways ---
    for name, dev in (("host", None), ("device", dev_states)):
        t0 = time.perf_counter()
        emb = materialize_from_token_store(
            tok_model.apply, tok_params, store,
            batch_size=256, max_token_len=T, dev_states=dev,
        )
        dt = time.perf_counter() - t0
        print(
            f"materialize[{name}]: {NUM_NEWS / dt:,.0f} news/s ({dt:.2f}s, "
            f"norm {float(np.linalg.norm(emb)):.1f})"
        )


def main_quality(epochs: int = 4):
    """Margin vs InfoNCE for the e2e family (VERDICT r4 #6) on the learnable
    synthetic fixture: same split, same seeds, same token store — only the
    objective differs. Prints per-epoch losses and the best val AUC of each.

        python benchmarks/e2e_bench.py quality [epochs]
    """
    from news_recommendation_project_v2_tpu.config import TowerConfig
    from news_recommendation_project_v2_tpu.data.compiler import compile_behaviors
    from news_recommendation_project_v2_tpu.data.synthetic import (
        align_embeddings,
        synthetic_learnable_behaviors,
    )
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.train.trainer import EndToEndTrainer
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    d = 64
    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=200, num_rows=800, dim=d, noise=0.05, seed=7
    )
    ct = compile_behaviors(imps[:600], hist[:600]).with_history_view()
    cv = compile_behaviors(imps[600:], hist[600:]).with_history_view()
    rng = np.random.default_rng(3)
    emb_np = align_embeddings(ct.news_ids, emb)
    store_t = TokenStore.from_ragged(
        [
            emb_np[i][None, :]
            + rng.standard_normal((int(rng.integers(2, 7)), d)).astype(np.float32)
            * 0.05
            for i in range(ct.num_news)
        ]
    )
    emb_v = align_embeddings(cv.news_ids, emb)
    store_v = TokenStore.from_ragged(
        [
            emb_v[i][None, :]
            + rng.standard_normal((int(rng.integers(2, 7)), d)).astype(np.float32)
            * 0.05
            for i in range(cv.num_news)
        ]
    )

    results = {}
    for loss in ("margin", "infonce"):
        tower = build_tower(
            TowerConfig(kind="latent", reduced_dim=d, num_latents=8,
                        latent_dim_head=16)
        )
        t_params = jax.jit(
            lambda: tower.init(
                jax.random.key(0), jnp.zeros((1, 8, d)), jnp.ones((1, 8))
            )
        )()
        tok_model = TokenAttentionPool(hidden_size=d, num_layers=1)
        tok_params = jax.jit(
            lambda: tok_model.init(
                jax.random.key(3), jnp.zeros((1, 8, d)), jnp.ones((1, 8))
            )
        )()
        trainer = EndToEndTrainer(
            tok_model.apply, tok_params, tower.apply, t_params, ct, store_t,
            cfg=TrainConfig(
                loss=loss, num_neg_per_pos=5, learning_rate=3e-4,
                num_epochs=epochs, batch_size=128, seed=0,
            ),
            max_token_len=8,
            compiled_val=cv,
            val_token_store=store_v,
            eval_each_epoch=True,
            flat_eval=True,
        )
        histy = trainer.train()
        best = max(h["val"]["auc"] for h in histy)
        results[loss] = best
        print(
            f"e2e[{loss}]: losses "
            f"{[round(h['loss'], 4) for h in histy]} best val AUC {best:.3f}"
        )
    print(f"quality verdict: {results}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "quality":
        main_quality(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
