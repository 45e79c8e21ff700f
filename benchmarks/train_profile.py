"""Training-path roofline decomposition (the training counterpart of
``benchmarks/flat_profile.py``): splits each hot training program into its
components, compares against analytic FLOP/bandwidth ideals, and reports an
MXU-utilization verdict per piece — so the gap between measured and
speed-of-light is ACCOUNTED FOR, not unknown (VERDICT r3 weak #2).

    python benchmarks/train_profile.py flat [B]    # flat tower train step
    python benchmarks/train_profile.py e2e         # gathered end-to-end step
    python benchmarks/train_profile.py mat         # token-store materialization

Reference hot loops being matched: ``trainer.py:569-636`` (attention step),
``trainer.py:1030-1117`` (end-to-end step), ``data_model_helper.py:374-413``
(token-attention offline apply).

Results land in BASELINE.md's training-roofline section.
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
from news_recommendation_project_v2_tpu.train.step import (
    _flat_user_vectors,
    make_tower_train_step_flat,
    safe_cosine,
)
from news_recommendation_project_v2_tpu.train.losses import margin_ranking_loss
from news_recommendation_project_v2_tpu.train.trainer import make_optimizer

NUM_NEWS, DIM = 65_238, 1024

# v5e peak numbers (per chip). bf16 matmul peak; XLA routes f32 matmuls
# through the same MXU pass by default on TPU.
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def latent_flops_per_token(cfg: TowerConfig) -> float:
    """Matmul FLOPs per history token for one latent-tower forward (the
    64-latent k/v projections are per-batch, not per-token: negligible)."""
    d = DIM
    inner = cfg.num_heads * cfg.latent_dim_head
    qk_av = 2 * 2 * inner * cfg.num_latents  # q@k^T and attn@v
    return (
        2 * d * inner  # to_q
        + qk_av
        + 2 * inner * d  # to_out
        + 2 * d * 8 * d  # ff1 (gated: D -> 8D)
        + 2 * 4 * d * d  # ff2 (4D -> D)
    )


def n_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def timed(fn, sync, steps=20, warmup=2):
    """Median + min seconds per call; ``sync(result)`` forces completion."""
    for _ in range(warmup):
        sync(fn())
    ts = []
    for _ in range(steps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[0]


def rtt_floor():
    """Per-dispatch floor: a trivial program round trip."""
    one = jnp.zeros(())
    f = jax.jit(lambda x: x + 1.0)
    float(f(one))
    med, best = timed(lambda: f(one), lambda r: float(r), steps=10)
    return med, best


def flat_inputs(B, rng):
    """Worst-case flat batch (no dedup, U=B) at MIND geometric histories —
    the same construction as ``train_bench.py flat``."""
    lens = np.clip(rng.geometric(1 / 29.0, size=B), 1, 600).astype(np.int64)
    total = int(lens.sum())
    T = max(1024, 1 << int(np.ceil(np.log2(total))))
    tok_idx = np.zeros(T, np.int32)
    tok_idx[:total] = rng.integers(0, NUM_NEWS, total)
    tok_rows = np.full(T, B, np.int32)
    tok_rows[:total] = np.repeat(np.arange(B, dtype=np.int32), lens)
    return T, total, tuple(
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


def profile_flat(B=2048):
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    log(f"backend: {jax.default_backend()}, flat step, B={B}")
    rtt_med, rtt_best = rtt_floor()
    log(f"dispatch floor (scalar round trip): {rtt_med * 1e3:.1f} ms median, "
        f"{rtt_best * 1e3:.1f} ms best")

    cfg = TrainConfig()
    tower_cfg = TowerConfig(kind="latent")
    tower = build_tower(tower_cfg)
    params0 = jax.jit(
        lambda: tower.init(
            jax.random.key(0), jnp.zeros((1, 64, DIM)), jnp.ones((1, 64))
        )
    )()
    optimizer = make_optimizer(cfg)
    emb = jax.jit(lambda k: jax.random.normal(k, (NUM_NEWS, DIM)))(jax.random.key(0))
    rng = np.random.default_rng(0)
    T, total, args = flat_inputs(B, rng)
    key = jax.random.key(1)
    P = n_params(params0)

    fpt = latent_flops_per_token(tower_cfg)
    ideal_fwd = T * fpt / PEAK_FLOPS
    ideal_fwdbwd = 3 * ideal_fwd
    adam_bytes = 7 * P * 4  # read g,p,m,v; write p,m,v (f32)
    ideal_opt = adam_bytes / PEAK_HBM
    log(
        f"geometry: {total} live tokens padded to T={T}; {P / 1e6:.1f}M params; "
        f"{fpt / 1e6:.1f} MFLOP/token fwd -> ideals: fwd {ideal_fwd * 1e3:.1f} ms, "
        f"fwd+bwd {ideal_fwdbwd * 1e3:.1f} ms, adam {ideal_opt * 1e3:.2f} ms"
    )

    results = {}

    def report(name, med, best, ideal=None):
        line = f"{name:14s} {med * 1e3:8.1f} ms med  {best * 1e3:8.1f} ms best"
        dev_best = best - rtt_best
        if ideal is not None and dev_best > 0:
            line += (
                f"   ideal {ideal * 1e3:7.1f} ms -> {ideal / dev_best * 100:5.1f}%"
                " of peak (RTT-floor-corrected)"
            )
        log(line)
        results[name] = (med, best)

    # --- full step (the production program) ---------------------------------
    step = jax.jit(
        make_tower_train_step_flat(tower.apply, optimizer, cfg.margin),
        donate_argnums=(0, 1),
    )
    params = jax.tree.map(jnp.copy, params0)
    opt_state = jax.jit(optimizer.init)(params)
    state = [params, opt_state]

    def run_full():
        p, o, loss = step(state[0], state[1], emb, emb, *args, key)
        state[0], state[1] = p, o
        return loss

    med, best = timed(run_full, lambda r: float(r))
    report("full", med, best, ideal_fwdbwd + ideal_opt)

    # --- forward-only loss ---------------------------------------------------
    def loss_fn(p, dkey):
        user = _flat_user_vectors(
            tower.apply, p, emb, args[0], args[1], args[2], True, dkey
        )
        u = user[args[3]]
        cos_p = safe_cosine(u, emb[args[4]])
        cos_n = safe_cosine(u, emb[args[5]])
        return margin_ranking_loss(cos_p, cos_n, cfg.margin, args[6])

    fwd = jax.jit(loss_fn)
    med, best = timed(lambda: fwd(params0, key), lambda r: float(r))
    report("fwd", med, best, ideal_fwd)

    # --- forward+backward (no optimizer) -------------------------------------
    import optax

    def fwdbwd(p, dkey):
        loss, grads = jax.value_and_grad(loss_fn)(p, dkey)
        return loss + 0.0 * optax.global_norm(grads)

    fb = jax.jit(fwdbwd)
    med, best = timed(lambda: fb(params0, key), lambda r: float(r))
    report("fwd+bwd", med, best, ideal_fwdbwd)

    # --- optimizer-only at captured grads ------------------------------------
    grads = jax.jit(jax.grad(loss_fn))(params0, key)
    grads = jax.block_until_ready(grads)

    opt_step2 = jax.jit(
        lambda p, o, g: optax.apply_updates(p, optimizer.update(g, o, p)[0])
    )
    p3 = jax.tree.map(jnp.copy, params0)
    o3 = jax.jit(optimizer.init)(p3)
    med, best = timed(
        lambda: opt_step2(p3, o3, grads),
        lambda r: float(jax.tree.leaves(r)[0].ravel()[0]),
    )
    report("optimizer", med, best, ideal_opt)

    # --- gather + scatter-pool + loss, tower removed --------------------------
    def gatherpool_loss(dummy, dkey):
        tokens = emb[args[0]]  # [T, D] gather
        num_rows = args[2].shape[0]
        acc = jnp.zeros((num_rows, DIM), jnp.float32).at[args[1]].add(
            tokens.astype(jnp.float32), mode="drop", indices_are_sorted=True
        )
        user = acc / jnp.maximum(args[2], 1.0)[:, None]
        user = user / jnp.sqrt((user * user).sum(-1, keepdims=True) + 1e-12)
        u = user[args[3]]
        cos_p = safe_cosine(u, emb[args[4]])
        cos_n = safe_cosine(u, emb[args[5]])
        return margin_ranking_loss(cos_p, cos_n, cfg.margin, args[6]) + 0.0 * dummy

    gp = jax.jit(gatherpool_loss)
    gather_bytes = (T + 3 * B) * DIM * 4 * 2  # gathered reads + writes
    med, best = timed(lambda: gp(0.0, key), lambda r: float(r))
    report("gather+pool", med, best, gather_bytes / PEAK_HBM)

    # --- pure tower forward on resident tokens --------------------------------
    tokens_res = jax.jit(lambda e: e[args[0]][None])(emb)
    tokens_res = jax.block_until_ready(tokens_res)
    tf = jax.jit(lambda p, t: tower.apply(p, t, None).mean())
    med, best = timed(lambda: tf(params0, tokens_res), lambda r: float(r))
    report("tower fwd", med, best, ideal_fwd)

    # --- ablation: dropout off -------------------------------------------------
    def loss_det(p):
        tokens = emb[args[0]]
        h = tower.apply(p, tokens[None], None, deterministic=True)[0]
        num_rows = args[2].shape[0]
        acc = jnp.zeros((num_rows, h.shape[-1]), jnp.float32).at[args[1]].add(
            h.astype(jnp.float32), mode="drop", indices_are_sorted=True
        )
        user = acc / jnp.maximum(args[2], 1.0)[:, None]
        user = user / jnp.sqrt((user * user).sum(-1, keepdims=True) + 1e-12)
        u = user[args[3]]
        cos_p = safe_cosine(u, emb[args[4]])
        cos_n = safe_cosine(u, emb[args[5]])
        return margin_ranking_loss(cos_p, cos_n, cfg.margin, args[6])

    def fwdbwd_det(p):
        loss, grads = jax.value_and_grad(loss_det)(p)
        return loss + 0.0 * optax.global_norm(grads)

    fbd = jax.jit(fwdbwd_det)
    med, best = timed(lambda: fbd(params0), lambda r: float(r))
    report("fwd+bwd nodrop", med, best, ideal_fwdbwd)

    # --- ablation: bf16 compute ------------------------------------------------
    tower16 = build_tower(TowerConfig(kind="latent", compute_dtype="bfloat16"))
    step16 = jax.jit(
        make_tower_train_step_flat(tower16.apply, optimizer, cfg.margin),
        donate_argnums=(0, 1),
    )
    p16 = jax.tree.map(jnp.copy, params0)
    o16 = jax.jit(optimizer.init)(p16)
    st16 = [p16, o16]

    def run16():
        p, o, loss = step16(st16[0], st16[1], emb, emb, *args, key)
        st16[0], st16[1] = p, o
        return loss

    med, best = timed(run16, lambda r: float(r))
    report("full bf16", med, best, ideal_fwdbwd + ideal_opt)

    log("")
    log(f"pairs/s at best full step: {B / results['full'][1]:,.0f} "
        f"({B / results['full'][0]:,.0f} at median)")
    return results


def _e2e_store(rng, num_news, T):
    """Same store construction as ``e2e_bench.build_store``."""
    from news_recommendation_project_v2_tpu.ops.encode import TokenStore

    lens = np.clip(rng.geometric(1 / 24.0, size=num_news), 2, T).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    states = rng.standard_normal((int(offsets[-1]), DIM)).astype(np.float32) * 0.3
    return TokenStore(states=states, offsets=offsets)


def profile_e2e(M=2048, T=64, B=1024):
    """Decompose the gathered end-to-end step (device-resident token store,
    ``make_end2end_train_step_gathered``) at e2e_bench's exact geometry
    (FinalAttention tower + 1-layer TokenAttentionPool; 373 ms/step measured
    round 3)."""
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    from news_recommendation_project_v2_tpu.models import (
        FinalAttention,
        TokenAttentionPool,
    )
    from news_recommendation_project_v2_tpu.train.step import (
        make_end2end_train_step_gathered,
    )

    num_news = 8192
    U, L = B, 64
    log(f"backend: {jax.default_backend()}, e2e gathered step, "
        f"M={M} T={T} B={B} U={U} L={L}")
    rtt_med, rtt_best = rtt_floor()
    log(f"dispatch floor: {rtt_med * 1e3:.1f} ms median, {rtt_best * 1e3:.1f} ms best")

    cfg = TrainConfig()
    tower = FinalAttention()
    tok_enc = TokenAttentionPool(hidden_size=DIM, num_layers=1)
    rng = np.random.default_rng(0)
    store = _e2e_store(rng, num_news, T)
    flat_states = jax.block_until_ready(jnp.asarray(store.states))

    uniq = np.sort(rng.choice(num_news, size=M, replace=False)).astype(np.int64)
    tok_idx_np, tok_mask_np = store.padded_index_batch(uniq, T, max_len=T)
    tok_idx = jnp.asarray(tok_idx_np)
    tok_mask = jnp.asarray(tok_mask_np)
    hist_idx = jnp.asarray(rng.integers(0, M, (U, L)).astype(np.int32))
    hm = (rng.random((U, L)) < 0.5).astype(np.float32)
    hm[:, 0] = 1.0
    hist_mask = jnp.asarray(hm)
    hist_rev = jnp.asarray(np.arange(B, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, M, B).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, M, B).astype(np.int32))
    pmask = jnp.ones(B, jnp.float32)
    key = jax.random.key(1)

    params0 = {
        "token_encoder": jax.jit(
            lambda: tok_enc.init(
                jax.random.key(0), jnp.zeros((1, T, DIM)), jnp.ones((1, T))
            )
        )(),
        "tower": jax.jit(
            lambda: tower.init(
                jax.random.key(1), jnp.zeros((1, L, DIM)), jnp.ones((1, L))
            )
        )(),
    }
    optimizer = make_optimizer(cfg)
    P = n_params(params0)

    # Ideals. Token encoder = 1-layer transformer at width D over [M, T]
    # tokens: qkv+out (4 * 2*D*D) + mlp (2 * 2*D*4D) + attn (2 * 2*T*D).
    # FinalAttention per history slot: D->H, H->H, H->D, D->H, H->D.
    d, H = DIM, 4096
    enc_fpt = 4 * 2 * d * d + 2 * 2 * d * 4 * d + 2 * 2 * T * d
    twr_fps = 2 * d * H + 2 * H * H + 2 * H * d + 2 * d * H + 2 * H * d
    enc_fwd = M * T * enc_fpt / PEAK_FLOPS
    twr_fwd = U * L * twr_fps / PEAK_FLOPS
    gather_bytes = 2 * M * T * d * 4  # read + write the [M, T, D] block
    adam_bytes = 7 * P * 4
    log(
        f"{P / 1e6:.1f}M params; ideals: enc fwd {enc_fwd * 1e3:.1f} ms, "
        f"tower fwd {twr_fwd * 1e3:.1f} ms, token gather "
        f"{gather_bytes / PEAK_HBM * 1e3:.1f} ms, adam {adam_bytes / PEAK_HBM * 1e3:.2f} ms"
    )

    results = {}

    def report(name, med, best, ideal=None):
        line = f"{name:16s} {med * 1e3:8.1f} ms med  {best * 1e3:8.1f} ms best"
        dev_best = best - rtt_best
        if ideal is not None and dev_best > 0:
            line += f"   ideal {ideal * 1e3:7.1f} ms -> {ideal / dev_best * 100:5.1f}% of peak"
        log(line)
        results[name] = (med, best)

    step = jax.jit(
        make_end2end_train_step_gathered(
            tok_enc.apply, tower.apply, optimizer, cfg.margin
        ),
        donate_argnums=(0, 1),
    )
    params = jax.tree.map(jnp.copy, params0)
    opt_state = jax.jit(optimizer.init)(params)
    st = [params, opt_state]

    def run_full():
        p, o, loss = step(
            st[0], st[1], flat_states, tok_idx, tok_mask, hist_idx, hist_mask,
            hist_rev, pos, neg, pmask, key,
        )
        st[0], st[1] = p, o
        return loss

    ideal_full = 3 * (enc_fwd + twr_fwd) + gather_bytes / PEAK_HBM + adam_bytes / PEAK_HBM
    med, best = timed(run_full, lambda r: float(r), steps=12)
    report("full", med, best, ideal_full)

    # token gather only
    g = jax.jit(lambda f, i, m: (f[i].astype(jnp.float32) * m[..., None]).sum())
    med, best = timed(lambda: g(flat_states, tok_idx, tok_mask), lambda r: float(r), steps=12)
    report("token gather", med, best, gather_bytes / PEAK_HBM)

    # token encoder fwd only (gather fused in, matching the step)
    ef = jax.jit(
        lambda p, f, i, m: tok_enc.apply(
            p, f[i].astype(jnp.float32) * m[..., None], m
        ).mean()
    )
    med, best = timed(
        lambda: ef(params0["token_encoder"], flat_states, tok_idx, tok_mask),
        lambda r: float(r), steps=12,
    )
    report("enc fwd(+gather)", med, best, enc_fwd + gather_bytes / PEAK_HBM)

    # tower fwd only on resident news vecs
    news_vecs = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (M, DIM)))(jax.random.key(2))
    )
    tw = jax.jit(
        lambda p, nv: tower.apply(
            p, nv[hist_idx] * hist_mask[..., None], hist_mask
        ).mean()
    )
    med, best = timed(lambda: tw(params0["tower"], news_vecs), lambda r: float(r), steps=12)
    report("tower fwd", med, best, twr_fwd)

    log("")
    log(f"pairs/s at best full step: {B / results['full'][1]:,.0f}")
    return results


def profile_e2e_sweep(M=2048, T=64):
    """Attention-layout sweep for the e2e token encoder AT ITS OWN GEOMETRY
    (VERDICT r4 #5): the corpus-encode sweep that earned that path's
    under-fill retirement (BASELINE.md round-2 table) ran at [4096, 32] x 24
    layers FWD-only; the e2e step runs a 1-layer TokenAttentionPool at
    [M=2048, T=64, D=1024] FWD+BWD. Variants share identical weights; each
    times value+grad of a scalar readout of the full layer (attention +
    GatedMLP + norms + last-token pool), so only the attention layout
    differs.

        python benchmarks/train_profile.py e2e-sweep [M] [T]
    """
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    d, heads = DIM, 8
    hd = d // heads
    inter = 3072
    log(f"backend: {jax.default_backend()}, e2e token-encoder sweep, "
        f"[M={M}, T={T}, D={d}] fwd+bwd, heads={heads}")
    rtt_med, rtt_best = rtt_floor()
    log(f"dispatch floor: {rtt_med * 1e3:.1f} ms median, {rtt_best * 1e3:.1f} ms best")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, T, d)).astype(np.float32) * 0.3)
    lens = np.clip(rng.geometric(1 / 24.0, size=M), 2, T)
    mask_np = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    mask = jnp.asarray(mask_np)

    p = {
        "qkv": jnp.asarray(rng.standard_normal((d, 3 * d)).astype(np.float32) / d**0.5),
        "qkv_b": jnp.zeros((3 * d,), jnp.float32),
        "o": jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) / d**0.5),
        "o_b": jnp.zeros((d,), jnp.float32),
        "m1": jnp.asarray(
            rng.standard_normal((d, 2 * inter)).astype(np.float32) / d**0.5
        ),
        "m1_b": jnp.zeros((2 * inter,), jnp.float32),
        "m2": jnp.asarray(
            rng.standard_normal((inter, d)).astype(np.float32) / inter**0.5
        ),
        "m2_b": jnp.zeros((d,), jnp.float32),
    }

    def ln(h):
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-12)

    def rest_of_layer(pp, attn_out, h, m):
        a = ln(attn_out + h)
        g = a @ pp["m1"] + pp["m1_b"]
        g1, g2 = jnp.split(g, 2, axis=-1)
        mlp = (jax.nn.gelu(g1) * g2) @ pp["m2"] + pp["m2_b"]
        out = ln(mlp + a)
        # last-token pool (TokenAttentionPool epilogue)
        idx = jnp.maximum(m.sum(-1).astype(jnp.int32) - 1, 0)
        pooled = out[jnp.arange(out.shape[0]), idx]
        return (pooled * pooled).sum()

    # Everything big travels as a jit ARGUMENT — closure constants embed in
    # the uploaded HLO as literals and blow the remote-compile service's
    # request-size limit (HTTP 413; same lesson as the metric grids,
    # CLAUDE.md).
    bias = jnp.asarray(
        (1.0 - mask_np[:, None, None, :]) * np.finfo(np.float32).min
    )

    def attn_baseline(pp, h, bias_):
        b, l, _ = h.shape
        qkv = h @ pp["qkv"] + pp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd**-0.5
        probs = jax.nn.softmax(logits.astype(jnp.float32) + bias_, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        return ctx @ pp["o"] + pp["o_b"]

    def attn_no_transpose(pp, h, bias_):
        b, l, _ = h.shape
        qkv = h @ pp["qkv"] + pp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, heads, hd)
        k = k.reshape(b, l, heads, hd)
        v = v.reshape(b, l, heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
        probs = jax.nn.softmax(logits.astype(jnp.float32) + bias_, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        return ctx.reshape(b, l, d) @ pp["o"] + pp["o_b"]

    def attn_lowp_probs(pp, h, bias_):
        b, l, _ = h.shape
        qkv = h @ pp["qkv"] + pp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd**-0.5
        probs = jax.nn.softmax(logits + bias_.astype(logits.dtype), axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        return ctx @ pp["o"] + pp["o_b"]

    def attn_sdpa(pp, h, bias_):
        b, l, _ = h.shape
        qkv = h @ pp["qkv"] + pp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, heads, hd)
        k = k.reshape(b, l, heads, hd)
        v = v.reshape(b, l, heads, hd)
        ctx = jax.nn.dot_product_attention(q, k, v, bias=bias_)
        return ctx.reshape(b, l, d) @ pp["o"] + pp["o_b"]

    variants = {
        "baseline": (attn_baseline, bias),
        "no-transpose": (attn_no_transpose, bias),
        "lowp-probs": (attn_lowp_probs, bias),
        "sdpa": (attn_sdpa, bias),
    }

    # Block-packing: g news rows share one attention of length g*T with a
    # block-diagonal mask (fills the 128-wide MXU tile at g=2) — measured
    # bit-identical for corpus encode; here timed fwd+bwd.
    def make_packed(g):
        Mp = M // g
        block = np.kron(np.eye(g, dtype=np.float32), np.ones((T, T), np.float32))
        pmask_np = mask_np.reshape(Mp, g * T)
        pb = (
            (1.0 - pmask_np[:, None, None, :] * block[None, None])
        ) * np.finfo(np.float32).min
        pbias = jnp.asarray(pb)

        def attn_packed(pp, h, bias_):
            hp = h.reshape(Mp, g * T, d)
            b, l, _ = hp.shape
            qkv = hp @ pp["qkv"] + pp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd**-0.5
            probs = jax.nn.softmax(logits.astype(jnp.float32) + bias_, axis=-1)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
            out = ctx @ pp["o"] + pp["o_b"]
            return out.reshape(M, T, d)

        return attn_packed, pbias

    for g in (2, 4):
        if M % g == 0:
            variants[f"packed-g{g}"] = make_packed(g)

    # Matmul-only floor: attention einsums+softmax replaced by the o-proj of
    # v alone (keeps every dense matmul, drops the attention math).
    def attn_removed(pp, h, bias_):
        qkv = h @ pp["qkv"] + pp["qkv_b"]
        _, _, v = jnp.split(qkv, 3, axis=-1)
        return v @ pp["o"] + pp["o_b"]

    variants["attn-removed"] = (attn_removed, bias)

    results = {}
    for name, (attn, bias_arg) in variants.items():
        def loss_fn(pp, h, m, bias_, attn=attn):
            return rest_of_layer(pp, attn(pp, h, bias_), h, m)

        vg = jax.jit(jax.value_and_grad(loss_fn))
        med, best = timed(
            lambda: vg(p, x, mask, bias_arg), lambda r: float(r[0]), steps=10
        )
        results[name] = best
        log(f"{name:14s} fwd+bwd {med * 1e3:8.1f} ms med  {best * 1e3:8.1f} ms best")

    base = results["baseline"]
    log("")
    for name, best in results.items():
        log(f"{name:14s} {base / best:5.2f}x vs baseline")
    return results


def profile_mat(num_news=8192, T=64):
    """Decompose ``materialize_from_token_store`` (653 news/s warm in
    e2e_bench at batch 256): per-chunk synchronous dispatch vs the dispatch
    floor, swept over batch sizes, device-store and host paths."""
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    from news_recommendation_project_v2_tpu.models import TokenAttentionPool
    from news_recommendation_project_v2_tpu.ops.encode import (
        materialize_from_token_store,
    )

    log(f"backend: {jax.default_backend()}, materialization, "
        f"{num_news} news, T<={T}")
    rtt_med, rtt_best = rtt_floor()
    log(f"dispatch floor: {rtt_med * 1e3:.1f} ms median, {rtt_best * 1e3:.1f} ms best")

    rng = np.random.default_rng(0)
    store = _e2e_store(rng, num_news, T)
    tok_enc = TokenAttentionPool(hidden_size=DIM, num_layers=1)
    params = jax.jit(
        lambda: tok_enc.init(
            jax.random.key(0), jnp.zeros((1, T, DIM)), jnp.ones((1, T))
        )
    )()
    dev_states = jax.block_until_ready(jnp.asarray(store.states))

    for name, dev in (("device", dev_states), ("host", None)):
        for bs in (64, 256, 1024):
            materialize_from_token_store(  # warm: compiles the bucket
                tok_enc.apply, params, store, batch_size=bs, max_token_len=T,
                dev_states=dev,
            )
            t0 = time.perf_counter()
            out = materialize_from_token_store(
                tok_enc.apply, params, store, batch_size=bs, max_token_len=T,
                dev_states=dev,
            )
            dt = time.perf_counter() - t0
            chunks = (num_news + bs - 1) // bs
            log(
                f"{name} batch={bs:5d}: {dt:.2f}s = {num_news / dt:,.0f} news/s "
                f"({chunks} chunks -> {dt / chunks * 1e3:.0f} ms/chunk vs "
                f"{rtt_med * 1e3:.0f} ms dispatch floor; out {out.shape})"
            )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "flat"
    if mode == "flat":
        profile_flat(*(int(x) for x in sys.argv[2:]))
    elif mode == "e2e":
        profile_e2e(*(int(x) for x in sys.argv[2:]))
    elif mode == "mat":
        profile_mat(*(int(x) for x in sys.argv[2:]))
    elif mode == "e2e-sweep":
        profile_e2e_sweep(*(int(x) for x in sys.argv[2:]))
    else:
        raise SystemExit(f"unknown mode {mode}")
