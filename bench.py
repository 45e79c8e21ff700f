"""Headline benchmark: impressions/second at eval scoring (BASELINE.json north
star) on a MIND-small-scale synthetic workload.

Measured pipeline (ours, on the available accelerator): the FLAT zero-padding
eval — the latent tower is token-local (each history token cross-attends only
to the 64 shared latents), so the whole tower pass runs over the flat token
stream with no padding and no length buckets, pools via sorted segment-add,
and fuses with the cosine pass into ONE compiled program / one dispatch
(``ops.scoring.FlatEvalPlan``). Index grids are per-dataset constants and are
uploaded once, as in production epoch evals.

Baseline (reference algorithm on the same host): the per-impression scoring loop
of ``data_model_helper.py:174-239`` — torch tower forward over pad-to-batch-max
history batches, then one ``F.cosine_similarity`` call per impression — measured
on a subsample and extrapolated. The reference never measured throughput
(SURVEY.md §6); this self-established baseline is its algorithm run on this
machine's hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# ----------------------------------------------------------------------------
# Workload: MIND-small-scale synthetic eval scoring.
# ----------------------------------------------------------------------------

NUM_NEWS = 65_238  # MIND-small news count
NUM_ROWS = 50_000  # with-history impression rows scored
DIM = 1024
MEAN_HIST = 33
MEAN_CANDS = 37
SEED = 0


def build_workload(rng):
    hist_lens = np.minimum(
        rng.geometric(1.0 / MEAN_HIST, size=NUM_ROWS), 600
    ).astype(np.int32)
    imp_lens = np.clip(
        rng.poisson(MEAN_CANDS, size=NUM_ROWS), 2, 300
    ).astype(np.int32)
    hist_rev = rng.integers(0, NUM_NEWS, size=int(hist_lens.sum())).astype(np.int32)
    cand_rev = rng.integers(0, NUM_NEWS, size=int(imp_lens.sum())).astype(np.int32)
    cand_row = np.repeat(np.arange(NUM_ROWS, dtype=np.int32), imp_lens)
    # Click labels (>=1 positive and >=1 negative per impression) for the
    # fused eval->metrics variant.
    labels = (rng.random(len(cand_rev)) < 0.2).astype(np.float32)
    offsets = np.concatenate([[0], np.cumsum(imp_lens)])
    labels[offsets[:-1]] = 1.0
    labels[offsets[1:] - 1] = 0.0
    return hist_lens, imp_lens, hist_rev, cand_rev, cand_row, labels


# ----------------------------------------------------------------------------
# Ours: jitted bucketed tower + fused cosine scoring.
# ----------------------------------------------------------------------------


def bench_ours(hist_lens, imp_lens, hist_rev, cand_rev, cand_row, labels):
    import jax

    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from news_recommendation_project_v2_tpu.config import TowerConfig
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.ops.scoring import FlatEvalPlan
    from news_recommendation_project_v2_tpu.utils.memory import estimate_flat_chunk

    log(f"jax backend: {jax.default_backend()}, devices: {jax.devices()}")
    tower_cfg = TowerConfig(kind="latent", compute_dtype="bfloat16")
    tower = build_tower(tower_cfg)
    params = jax.jit(
        lambda: tower.init(
            jax.random.key(0), jnp.zeros((1, 16, DIM)), jnp.ones((1, 16))
        )
    )()
    # bf16 for the tower (MXU native); the final cosine pass stays f32.
    params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    # Generate the table on device (in production save_emb computes it there);
    # uploading 267MB through a tunneled link would dominate the benchmark.
    @jax.jit
    def make_table(key):
        e = jax.random.normal(key, (NUM_NEWS, DIM), dtype=jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    emb_dev = make_table(jax.random.key(SEED))
    emb_bf16 = jax.jit(lambda e: e.astype(jnp.bfloat16))(emb_dev)

    def apply(p, e, m):
        return tower.apply(p, e, m).astype(jnp.float32)

    # Index grids are constant per eval dataset — build + upload once, like
    # production epoch evals (plan reuse hits the same compiled program).
    # Chunk size from the analytic memory model, not a hand-tuned constant.
    chunk_tokens = estimate_flat_chunk(tower_cfg)
    log(f"flat chunk from memory model: {chunk_tokens} tokens")
    plan = FlatEvalPlan(
        hist_rev, hist_lens, cand_rev, cand_row, chunk_tokens=chunk_tokens
    )

    def run():
        return plan.score(apply, params_bf16, emb_dev, query_news_emb=emb_bf16)

    log("warmup (compiles the fused flat-eval program)...")
    t0 = time.perf_counter()
    scores = run()
    log(f"warmup took {time.perf_counter() - t0:.1f}s; {len(scores)} slots scored")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        scores = run()
        times.append(time.perf_counter() - t0)
        log(f"run {i}: {times[-1]:.3f}s")
    best = min(times)
    assert np.isfinite(scores).all()

    # Fused eval->metrics variant: the SAME tower+cosine pass plus on-device
    # score composition and the full MIND metric suite, fetching five scalars
    # instead of the 7.4MB score vector (eval/device_metrics.py). Strictly
    # more work per impression; usually faster end to end because the fetch
    # and per-call dispatch dominate the tail.
    from news_recommendation_project_v2_tpu.eval.device_metrics import (
        DeviceMetricsPlan,
    )

    mplan = DeviceMetricsPlan(
        imp_lens, labels, hist_slots=np.arange(len(cand_rev), dtype=np.int64)
    )

    def run_metrics():
        return plan.metrics(
            apply, params_bf16, emb_dev, mplan, query_news_emb=emb_bf16
        )

    log("warmup (compiles the fused eval->metrics program)...")
    t0 = time.perf_counter()
    m = run_metrics()
    log(f"warmup took {time.perf_counter() - t0:.1f}s; metrics: {m}")
    mtimes = []
    for i in range(3):
        t0 = time.perf_counter()
        m = run_metrics()
        mtimes.append(time.perf_counter() - t0)
        log(f"metrics run {i}: {mtimes[-1]:.3f}s")
    mbest = min(mtimes)
    log(
        f"score-fetch eval: {NUM_ROWS / best:,.0f} imp/s ({best:.3f}s); "
        f"fused metrics eval: {NUM_ROWS / mbest:,.0f} imp/s ({mbest:.3f}s)"
    )
    best = min(best, mbest)
    return NUM_ROWS / best, best


# ----------------------------------------------------------------------------
# Frontier tracking: training throughput + a trained-fixture metric pass.
# The driver's headline metric (eval imp/s) is at its documented
# speed-of-light; these extra fields make the train-side frontier visible in
# the same artifact round-over-round (VERDICT r3 weak #1 / next #3).
# ----------------------------------------------------------------------------


def bench_train_flat(B=2048, steps=20):
    """Flat-token train step, worst case (no dedup): pairs/s. The workload
    construction is IMPORTED from benchmarks/train_profile.py (one source of
    truth), so the compiled program is shared with the roofline run via the
    persistent compile cache."""
    import jax
    import jax.numpy as jnp

    from benchmarks.train_profile import flat_inputs
    from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.train.step import (
        make_tower_train_step_flat,
    )
    from news_recommendation_project_v2_tpu.train.trainer import make_optimizer

    cfg = TrainConfig()
    tower = build_tower(TowerConfig(kind="latent"))
    params = jax.jit(
        lambda: tower.init(
            jax.random.key(0), jnp.zeros((1, 64, DIM)), jnp.ones((1, 64))
        )
    )()
    optimizer = make_optimizer(cfg)
    opt_state = jax.jit(optimizer.init)(params)
    step = jax.jit(
        make_tower_train_step_flat(tower.apply, optimizer, cfg.margin),
        donate_argnums=(0, 1),
    )
    emb = jax.jit(lambda k: jax.random.normal(k, (NUM_NEWS, DIM)))(jax.random.key(0))
    T, total, args = flat_inputs(B, np.random.default_rng(0))
    key = jax.random.key(1)
    params, opt_state, loss = step(params, opt_state, emb, emb, *args, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, emb, emb, *args, key)
        float(loss)
    dt = time.perf_counter() - t0
    pps = steps * B / dt
    log(f"train flat step: {dt / steps * 1e3:.1f} ms/step -> {pps:,.0f} pairs/s "
        f"({total} live tokens, worst-case no dedup, per-step loss sync)")
    return pps


def bench_train_e2e(steps=8):
    """Gathered end-to-end step (device-resident token store), e2e_bench
    geometry: pairs/s. Store construction imported from
    benchmarks/train_profile.py (one source of truth; shared compile cache)."""
    import jax
    import jax.numpy as jnp

    from benchmarks.train_profile import _e2e_store
    from news_recommendation_project_v2_tpu.config import TrainConfig
    from news_recommendation_project_v2_tpu.models import (
        FinalAttention,
        TokenAttentionPool,
    )
    from news_recommendation_project_v2_tpu.train.step import (
        make_end2end_train_step_gathered,
    )
    from news_recommendation_project_v2_tpu.train.trainer import make_optimizer

    num_news, M, T, B, L = 8192, 2048, 64, 1024, 64
    rng = np.random.default_rng(0)
    store = _e2e_store(rng, num_news, T)
    dev_states = jnp.asarray(store.states)
    dev_states.block_until_ready()

    tok_model = TokenAttentionPool(hidden_size=DIM, num_layers=1)
    tower = FinalAttention()
    params = {
        "token_encoder": jax.jit(
            lambda: tok_model.init(
                jax.random.key(0), jnp.zeros((1, T, DIM)), jnp.ones((1, T))
            )
        )(),
        "tower": jax.jit(
            lambda: tower.init(
                jax.random.key(1), jnp.zeros((1, L, DIM)), jnp.ones((1, L))
            )
        )(),
    }
    cfg = TrainConfig()
    optimizer = make_optimizer(cfg)
    uniq = np.sort(rng.choice(num_news, size=M, replace=False)).astype(np.int64)
    tok_idx, g_mask = store.padded_index_batch(uniq, T, max_len=T)
    hist_idx = rng.integers(0, M, (B, L)).astype(np.int32)
    hist_mask = (rng.random((B, L)) < 0.5).astype(np.float32)
    hist_mask[:, 0] = 1.0
    tail = (
        jnp.asarray(hist_idx),
        jnp.asarray(hist_mask),
        jnp.asarray(np.arange(B, dtype=np.int32)),
        jnp.asarray(rng.integers(0, M, B).astype(np.int32)),
        jnp.asarray(rng.integers(0, M, B).astype(np.int32)),
        jnp.ones(B, jnp.float32),
    )
    key = jax.random.key(2)
    step = jax.jit(
        make_end2end_train_step_gathered(
            tok_model.apply, tower.apply, optimizer, cfg.margin
        ),
        donate_argnums=(0, 1),
    )
    p = jax.tree.map(jnp.copy, params)
    o = jax.jit(optimizer.init)(p)
    p, o, loss = step(p, o, dev_states, jnp.asarray(tok_idx), jnp.asarray(g_mask), *tail, key)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, o, loss = step(
            p, o, dev_states, jnp.asarray(tok_idx), jnp.asarray(g_mask), *tail, key
        )
        float(loss)
    dt = (time.perf_counter() - t0) / steps
    pps = B / dt
    log(f"train e2e gathered step: {dt * 1e3:.1f} ms/step -> {pps:,.0f} pairs/s "
        f"(M={M} unique news x T={T} tokens, device-resident store)")
    return pps


def bench_trained_metrics(epochs=3):
    """Few-epoch training on the learnable synthetic fixture, then the val
    metric pass — proves the metrics MOVE (AUC > 0.5) in the driver artifact,
    not just that the throughput is high."""
    import jax
    import jax.numpy as jnp

    from news_recommendation_project_v2_tpu.config import TowerConfig, TrainConfig
    from news_recommendation_project_v2_tpu.data.compiler import compile_behaviors
    from news_recommendation_project_v2_tpu.data.synthetic import (
        align_embeddings,
        synthetic_learnable_behaviors,
    )
    from news_recommendation_project_v2_tpu.models import build_tower
    from news_recommendation_project_v2_tpu.train.trainer import TowerTrainer

    d = 64
    # One generated dataset, row-split into train/val: both splits' labels
    # derive from the SAME embedding table the tower scores against.
    imps, hist, emb = synthetic_learnable_behaviors(
        num_news=200, num_rows=800, dim=d, noise=0.05, seed=7
    )
    ct = compile_behaviors(imps[:600], hist[:600]).with_history_view()
    cv = compile_behaviors(imps[600:], hist[600:]).with_history_view()
    emb_t = jnp.asarray(align_embeddings(ct.news_ids, emb))
    emb_v = jnp.asarray(align_embeddings(cv.news_ids, emb))
    tower = build_tower(
        TowerConfig(kind="latent", reduced_dim=d, num_latents=8, latent_dim_head=16)
    )
    params = jax.jit(
        lambda: tower.init(
            jax.random.key(0), jnp.zeros((1, 8, d)), jnp.ones((1, 8))
        )
    )()
    trainer = TowerTrainer(
        tower.apply,
        params,
        ct,
        emb_t,
        compiled_val=cv,
        news_emb_val=emb_v,
        cfg=TrainConfig(
            learning_rate=3e-4, num_epochs=epochs, batch_size=128, seed=0
        ),
        # Flat token paths: power-of-two padded shapes keep the compiled
        # program count low (the padded bucket paths compile one program per
        # bucket — tens of minutes through a remote-compile tunnel).
        flat_train=True,
        flat_eval=True,
    )
    history = trainer.train()
    auc = max(h["val"]["auc"] for h in history)
    log(f"trained-fixture metric pass: val AUC {auc:.3f} after {epochs} epochs "
        f"(untrained would be ~0.5)")
    return auc


# ----------------------------------------------------------------------------
# Baseline: reference-style torch per-impression loop (subsampled).
# ----------------------------------------------------------------------------


def bench_reference_style(hist_lens, imp_lens, hist_rev, cand_rev, cand_row):
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)

    class TorchLatentTower(torch.nn.Module):
        """Reference latent_attention.py:77-171 behavior (torch, CPU)."""

        def __init__(self, dim=DIM, num_latents=64, heads=8, dim_head=512):
            super().__init__()
            inner = heads * dim_head
            self.heads = heads
            self.scale = dim_head**-0.5
            self.norm_x = torch.nn.LayerNorm(dim)
            self.norm_ctx = torch.nn.LayerNorm(dim)
            self.to_q = torch.nn.Linear(dim, inner, bias=False)
            self.to_kv = torch.nn.Linear(dim, inner * 2, bias=False)
            self.to_out = torch.nn.Linear(inner, dim, bias=False)
            self.ff_norm = torch.nn.LayerNorm(dim)
            self.ff1 = torch.nn.Linear(dim, dim * 8)
            self.ff2 = torch.nn.Linear(dim * 4, dim)
            self.latents = torch.nn.Parameter(torch.randn(num_latents, dim))

        def forward(self, x, mask):
            b = x.shape[0]
            ctx = self.norm_ctx(self.latents).expand(b, -1, -1)
            q = self.to_q(self.norm_x(x))
            k, v = self.to_kv(ctx).chunk(2, dim=-1)

            def split(t):
                return t.view(b, t.shape[1], self.heads, -1).transpose(1, 2)

            attn = torch.softmax(
                split(q) @ split(k).transpose(-1, -2) * self.scale, dim=-1
            )
            out = (attn @ split(v)).transpose(1, 2).reshape(b, x.shape[1], -1)
            x = self.to_out(out) + x
            h = self.ff1(self.ff_norm(x))
            h, gates = h.chunk(2, dim=-1)
            x = self.ff2(h * F.gelu(gates)) + x
            m = mask.unsqueeze(-1)
            pooled = (x * m).sum(1) / mask.sum(1, keepdim=True)
            return F.normalize(pooled, p=2, dim=-1)

    sample_rows = 150
    tower = TorchLatentTower().eval()
    emb_np = np.random.default_rng(SEED).standard_normal((NUM_NEWS, DIM)).astype(
        np.float32
    )
    emb_np /= np.linalg.norm(emb_np, axis=1, keepdims=True)
    emb_t = torch.from_numpy(emb_np)
    hist_offsets = np.concatenate([[0], np.cumsum(hist_lens)])
    cand_offsets = np.concatenate([[0], np.cumsum(imp_lens)])

    t0 = time.perf_counter()
    with torch.no_grad():
        # Tower forward over pad-to-batch-max batches (reference
        # data_utils.py:784-791, batch via get_attention_inference_batch_size).
        B = 64
        users = []
        for s in range(0, sample_rows, B):
            rows = range(s, min(s + B, sample_rows))
            hs = [
                emb_t[hist_rev[hist_offsets[r] : hist_offsets[r + 1]]] for r in rows
            ]
            L = max(h.shape[0] for h in hs)
            batch = torch.zeros(len(hs), L, DIM)
            mask = torch.zeros(len(hs), L)
            for j, h in enumerate(hs):
                batch[j, : h.shape[0]] = h
                mask[j, : h.shape[0]] = 1.0
            users.append(tower(batch, mask))
        users = torch.cat(users)
        # Per-impression cosine loop (reference data_model_helper.py:197-239).
        outs = []
        for r in range(sample_rows):
            cands = emb_t[cand_rev[cand_offsets[r] : cand_offsets[r + 1]]]
            outs.append(F.cosine_similarity(users[r].unsqueeze(0), cands))
    elapsed = time.perf_counter() - t0
    log(f"reference-style loop: {sample_rows} rows in {elapsed:.1f}s")
    return sample_rows / elapsed


def main():
    rng = np.random.default_rng(SEED)
    hist_lens, imp_lens, hist_rev, cand_rev, cand_row, labels = build_workload(rng)
    log(
        f"workload: {NUM_ROWS} impressions, {NUM_NEWS} news, "
        f"{len(cand_rev)} candidate slots, {len(hist_rev)} history slots"
    )
    ours_ips, ours_time = bench_ours(
        hist_lens, imp_lens, hist_rev, cand_rev, cand_row, labels
    )
    log(f"ours: {ours_ips:,.0f} impressions/s ({ours_time:.3f}s for {NUM_ROWS})")
    extras = {}
    for field, fn in (
        ("train_flat_pairs_per_s", bench_train_flat),
        ("train_e2e_pairs_per_s", bench_train_e2e),
        ("trained_fixture_val_auc", bench_trained_metrics),
    ):
        try:
            extras[field] = round(float(fn()), 3)
        except Exception as e:  # keep the driver metric line alive regardless
            log(f"{field} failed: {type(e).__name__}: {e}")
    base_ips = bench_reference_style(
        hist_lens, imp_lens, hist_rev, cand_rev, cand_row
    )
    log(f"reference-style baseline: {base_ips:,.0f} impressions/s")
    print(
        json.dumps(
            {
                "metric": "eval_scoring_impressions_per_s",
                "value": round(ours_ips, 1),
                "unit": "impressions/s",
                "vs_baseline": round(ours_ips / base_ips, 2),
                **extras,
            }
        )
    )
    # Quality gate: the trained-fixture metric pass must LEARN (val AUC well
    # above chance — historically ~0.63 on this fixture), so a silent learning
    # regression fails the driver bench instead of shipping a green artifact.
    # Printed first so the JSON line survives for forensics either way.
    auc = extras.get("trained_fixture_val_auc")
    assert auc is not None, "trained-fixture metric pass did not run"
    assert auc > 0.58, f"learning regression: trained-fixture val AUC {auc}"


if __name__ == "__main__":
    main()
