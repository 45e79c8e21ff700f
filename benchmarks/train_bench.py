"""Training-step throughput benchmark (supplementary to the driver-facing
bench.py): pairs/second through the jitted margin-ranking step with the
full-size latent tower on the available accelerator.

    python benchmarks/train_bench.py [bfloat16|float32]         # padded step
    python benchmarks/train_bench.py flat [B ...]               # flat-token step sweep
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
from news_recommendation_project_v2_tpu.models import build_tower
from news_recommendation_project_v2_tpu.train.step import make_tower_train_step
from news_recommendation_project_v2_tpu.train.trainer import make_optimizer

NUM_NEWS, DIM = 65_238, 1024
B, L = 512, 64  # pairs per step, history bucket


def main():
    compute = sys.argv[1] if len(sys.argv) > 1 else "float32"
    print(f"backend: {jax.default_backend()}, compute={compute}", file=sys.stderr)
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    tower = build_tower(TowerConfig(kind="latent", compute_dtype=compute))
    cfg = TrainConfig()
    params = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, L, DIM)), jnp.ones((1, L)))
    )()
    optimizer = make_optimizer(cfg)
    opt_state = jax.jit(optimizer.init)(params)
    step = jax.jit(
        make_tower_train_step(tower.apply, optimizer, cfg.margin),
        donate_argnums=(0, 1),
    )

    emb = jax.jit(lambda k: jax.random.normal(k, (NUM_NEWS, DIM)))(jax.random.key(0))
    rng = np.random.default_rng(0)
    hist_idx = jnp.asarray(rng.integers(0, NUM_NEWS, (B, L)).astype(np.int32))
    hist_mask = jnp.asarray((rng.random((B, L)) < 0.6).astype(np.float32))
    hist_rev = jnp.asarray(rng.integers(0, B, B).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, NUM_NEWS, B).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, NUM_NEWS, B).astype(np.int32))
    pmask = jnp.ones(B, jnp.float32)
    key = jax.random.key(1)

    # Warmup/compile.
    params, opt_state, loss = step(
        params, opt_state, emb, emb, hist_idx, hist_mask, hist_rev, pos, neg, pmask, key
    )
    steps = 30
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step(
            params, opt_state, emb, emb, hist_idx, hist_mask, hist_rev, pos, neg, pmask, key
        )
        final = float(loss)  # per-step sync: deep async queues behave badly
        # on tunneled links, and real training reads the loss anyway
    dt = time.perf_counter() - t0
    print(
        f"{steps} steps of {B} pairs x {L} history: {dt:.2f}s "
        f"-> {steps / dt:.1f} steps/s, {steps * B / dt:,.0f} pairs/s "
        f"(loss {final:.4f})"
    )


def main_flat(batches=(512, 1024, 2048)):
    """Flat-token step (zero-padding trick applied to training) at MIND-like
    geometric history lengths, swept over pair-batch sizes."""
    print(f"backend: {jax.default_backend()}, mode=flat", file=sys.stderr)
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    from news_recommendation_project_v2_tpu.train.step import (
        make_tower_train_step_flat,
    )

    tower = build_tower(TowerConfig(kind="latent"))
    cfg = TrainConfig()
    params0 = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, L, DIM)), jnp.ones((1, L)))
    )()
    optimizer = make_optimizer(cfg)
    step = jax.jit(
        make_tower_train_step_flat(tower.apply, optimizer, cfg.margin),
        donate_argnums=(0, 1),
    )
    emb = jax.jit(lambda k: jax.random.normal(k, (NUM_NEWS, DIM)))(jax.random.key(0))
    rng = np.random.default_rng(0)

    for B in batches:
        # MIND-like geometric history lengths (mean ~29, capped at 600) on
        # deduped rows (U = B here: worst case, no dedup win).
        lens = np.clip(rng.geometric(1 / 29.0, size=B), 1, 600).astype(np.int64)
        total = int(lens.sum())
        T = max(1024, 1 << int(np.ceil(np.log2(total))))
        tok_idx = np.zeros(T, np.int32)
        tok_idx[:total] = rng.integers(0, NUM_NEWS, total)
        tok_rows = np.full(T, B, np.int32)
        tok_rows[:total] = np.repeat(np.arange(B, dtype=np.int32), lens)
        args = tuple(
            map(
                jnp.asarray,
                (
                    tok_idx,
                    tok_rows,
                    lens.astype(np.float32),
                    rng.integers(0, B, B).astype(np.int32),
                    rng.integers(0, NUM_NEWS, B).astype(np.int32),
                    rng.integers(0, NUM_NEWS, B).astype(np.int32),
                    np.ones(B, np.float32),
                ),
            )
        )
        params = jax.tree.map(jnp.copy, params0)
        opt_state = jax.jit(optimizer.init)(params)
        key = jax.random.key(1)
        params, opt_state, loss = step(params, opt_state, emb, emb, *args, key)
        float(loss)  # compile + sync
        steps = 30
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, emb, emb, *args, key)
            final = float(loss)
        dt = time.perf_counter() - t0
        print(
            f"flat B={B} ({total} live tokens, padded {T}): "
            f"{dt / steps * 1e3:.1f} ms/step -> {steps * B / dt:,.0f} pairs/s "
            f"(loss {final:.4f})"
        )


def main_epoch(num_rows=60_000, batch_size=2048, loss_sync_every=64,
               num_news=NUM_NEWS):
    """END-TO-END training-epoch wall clock at MIND-like statistics: the full
    `TowerTrainer.train_one_epoch` — vectorized epoch sampling, host batch
    building (dedup, flat token packing) overlapped by the prefetcher, jitted
    flat-token steps, bounded loss syncs. This is the number a production
    training run sees, not just the isolated step time.

    Behaviors are synthesized directly as CompiledBehaviors arrays at MIND
    shape statistics (impression lengths ~lognormal mean ~37 with 1 positive,
    geometric histories mean ~33 capped 600, 65k-news corpus).
    """
    print(
        f"backend: {jax.default_backend()}, mode=epoch rows={num_rows} "
        f"news={num_news}",
        file=sys.stderr,
    )
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    from news_recommendation_project_v2_tpu.data.compiler import CompiledBehaviors
    from news_recommendation_project_v2_tpu.train.trainer import TowerTrainer

    rng = np.random.default_rng(0)
    imp_lens = np.clip(
        rng.lognormal(np.log(30.0), 0.7, size=num_rows), 2, 300
    ).astype(np.int32)
    total_imp = int(imp_lens.sum())
    imp_rev = rng.integers(0, num_news, total_imp).astype(np.int32)
    labels = np.zeros(total_imp, np.int8)
    offs = np.concatenate([[0], np.cumsum(imp_lens)])
    labels[offs[:-1]] = 1  # exactly one positive per impression (MIND-typical)
    hist_lens = np.clip(rng.geometric(1 / 33.0, size=num_rows), 1, 600).astype(
        np.int32
    )
    hist_rev = rng.integers(0, num_news, int(hist_lens.sum())).astype(np.int32)
    compiled = CompiledBehaviors(
        news_ids=np.arange(num_news).astype(str),
        imp_rev=imp_rev,
        imp_row=np.repeat(np.arange(num_rows, dtype=np.int32), imp_lens),
        imp_lens=imp_lens,
        hist_rev=hist_rev,
        hist_row=np.repeat(np.arange(num_rows, dtype=np.int32), hist_lens),
        hist_lens=hist_lens,
        hist_row_index=np.arange(num_rows, dtype=np.int32),
        labels_flat=labels,
        label_present=True,
    )
    emb = jax.jit(lambda k: jax.random.normal(k, (num_news, DIM)))(jax.random.key(0))
    tower = build_tower(TowerConfig(kind="latent"))
    params = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, L, DIM)), jnp.ones((1, L)))
    )()
    trainer = TowerTrainer(
        tower.apply,
        params,
        compiled,
        emb,
        cfg=TrainConfig(
            batch_size=batch_size,
            loss_sync_every=loss_sync_every,
            num_epochs=2,
        ),
        flat_train=True,
    )
    total_pairs = total_imp - num_rows  # max(1 pos, L-1 neg) per impression
    # Epoch 1 pays the per-T-bucket compiles; epoch 2 is the measurement.
    t0 = time.perf_counter()
    loss1 = trainer.train_one_epoch()
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    loss2 = trainer.train_one_epoch()
    dt = time.perf_counter() - t0
    # $/epoch at the v5e-1 on-demand list price (us-central, $1.20/chip-hour):
    # the BASELINE configs[3..4] planning number.
    dollars = dt / 3600.0 * 1.20
    print(
        f"epoch at MIND stats: {num_rows} rows, {total_pairs:,} pairs, "
        f"B={batch_size}, sync={loss_sync_every}: "
        f"warm-epoch {dt:.1f}s -> {total_pairs / dt:,.0f} pairs/s END-TO-END "
        f"(first epoch incl. compiles {warm:.1f}s; losses {loss1:.4f} -> "
        f"{loss2:.4f}; ~${dollars:.4f}/epoch at $1.20/chip-hour)"
    )


def main_epoch_large():
    """MIND-LARGE-scale epoch (VERDICT r3 #9): >=200k impressions over a
    >=104k-news corpus — the scale BASELINE configs[3..4] target. Also prints
    the memory model's path verdicts at this scale (device store vs
    streaming), so the auto-selection claims are checked where they matter."""
    from news_recommendation_project_v2_tpu.utils.memory import (
        fits_device_token_store,
    )

    num_news = 104_151
    for label, tokens_per_news in (("title-only (T~24)", 24), ("full-text (T=512)", 512)):
        total = num_news * tokens_per_news
        fits = fits_device_token_store(total_tokens=total, dim=DIM)
        fits8 = fits_device_token_store(total_tokens=total, dim=DIM, num_shards=8)
        verdict = (
            "fits ONE chip (replicated device path)"
            if fits
            else (
                "exceeds one chip but fits SHARDED over 8 devices "
                "(row-sharded device path, shard_token_store_states)"
                if fits8
                else "exceeds even 8-device aggregate HBM (streaming path)"
            )
        )
        print(
            f"memory model at MIND-large, {label}: device token store {verdict}",
            file=sys.stderr,
        )
    main_epoch(num_rows=200_000, num_news=num_news)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "flat":
        main_flat(tuple(int(b) for b in sys.argv[2:]) or (512, 1024, 2048))
    elif len(sys.argv) > 1 and sys.argv[1] == "epoch":
        main_epoch(*(int(x) for x in sys.argv[2:]))
    elif len(sys.argv) > 1 and sys.argv[1] == "epoch-large":
        main_epoch_large()
    else:
        main()
