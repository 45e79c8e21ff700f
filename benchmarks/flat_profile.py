"""Decompose the flat eval-scoring path's time on the real TPU: pure tower
compute vs table gather vs segment scatter-add vs dispatch/transfer overhead."""

from __future__ import annotations

import sys
import time

import numpy as np

import jax

from news_recommendation_project_v2_tpu.utils.compile_cache import (
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import DIM, NUM_NEWS, SEED, build_workload, log

from news_recommendation_project_v2_tpu.config import TowerConfig
from news_recommendation_project_v2_tpu.models import build_tower

CHUNK = 131072


def timeit(name, fn, n=3):
    fn()  # warmup/compile
    best = min(
        (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(n)
    )
    log(f"{name}: {best * 1000:.1f} ms")
    return best


def main():
    rng = np.random.default_rng(SEED)
    hist_lens, _, hist_rev, _, _, _ = build_workload(rng)
    tower = build_tower(TowerConfig(kind="latent"))
    params = jax.jit(
        lambda: tower.init(
            jax.random.key(0), jnp.zeros((1, 16, DIM)), jnp.ones((1, 16))
        )
    )()
    params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def make_table(key):
        e = jax.random.normal(key, (NUM_NEWS, DIM), dtype=jnp.bfloat16)
        return e

    table = make_table(jax.random.key(SEED))
    num_rows = len(hist_lens)
    rows_np = np.repeat(np.arange(num_rows, dtype=np.int32), hist_lens)[:CHUNK]
    idx_np = np.asarray(hist_rev[:CHUNK], np.int32)
    idx = jax.device_put(jnp.asarray(idx_np))
    rows = jax.device_put(jnp.asarray(rows_np))
    n_chunks = len(hist_rev) // CHUNK  # ~12 full chunks

    def apply(p, e, m):
        return tower.apply(p, e, m).astype(jnp.float32)

    # 1. Pure tower compute on a pre-gathered resident chunk.
    gathered = jax.jit(lambda t, i: t[i])(table, idx)
    gathered.block_until_ready()

    @jax.jit
    def tower_only(p, g):
        h = apply(p, g[None], None)[0]
        return h.sum()

    def run_tower():
        outs = [tower_only(params_bf16, gathered) for _ in range(n_chunks)]
        return float(outs[-1]) + float(outs[0])

    timeit(f"tower x{n_chunks} (pure compute)", run_tower)

    # 2. Gather only.
    @jax.jit
    def gather_only(t, i):
        return t[i].sum()

    def run_gather():
        outs = [gather_only(table, idx) for _ in range(n_chunks)]
        return float(outs[-1])

    timeit(f"gather x{n_chunks}", run_gather)

    # 3. Scatter-add only (precomputed h).
    h_pre = jax.jit(lambda t, i: t[i].astype(jnp.float32))(table, idx)
    h_pre.block_until_ready()

    @jax.jit
    def scatter_only(acc, h, r):
        return acc.at[r].add(h, mode="drop", indices_are_sorted=True)

    def run_scatter():
        acc = jnp.zeros((num_rows, DIM), jnp.float32)
        for _ in range(n_chunks):
            acc = scatter_only(acc, h_pre, rows)
        return float(acc[0, 0])

    timeit(f"scatter-add x{n_chunks}", run_scatter)

    # 4. Fused chunk update, device-resident indices (no per-chunk upload).
    @jax.jit
    def chunk_fused(acc, p, t, i, r):
        h = apply(p, t[i][None], None)[0]
        return acc.at[r].add(h.astype(acc.dtype), mode="drop", indices_are_sorted=True)

    def run_fused():
        acc = jnp.zeros((num_rows, DIM), jnp.float32)
        for _ in range(n_chunks):
            acc = chunk_fused(acc, params_bf16, table, idx, rows)
        return float(acc[0, 0])

    timeit(f"fused chunk x{n_chunks} (resident idx)", run_fused)

    # 5. Same but uploading idx/rows per chunk (what user_vectors_flat does).
    def run_fused_upload():
        acc = jnp.zeros((num_rows, DIM), jnp.float32)
        for _ in range(n_chunks):
            acc = chunk_fused(
                acc, params_bf16, table, jnp.asarray(idx_np), jnp.asarray(rows_np)
            )
        return float(acc[0, 0])

    timeit(f"fused chunk x{n_chunks} (per-chunk upload)", run_fused_upload)


if __name__ == "__main__":
    main()
