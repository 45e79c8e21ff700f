"""MIND-large-scale eval on the real TPU: 200k impressions / ~104k news,
score-fetch flat eval vs the fused eval->metrics program. The round-1
measurement (41.8k imp/s) was dominated by the 30MB score fetch through the
tunneled link; the metrics variant fetches five scalars instead.

    python benchmarks/large_eval_bench.py
"""

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
from bench import DIM, MEAN_CANDS, MEAN_HIST, SEED, log

from news_recommendation_project_v2_tpu.config import TowerConfig
from news_recommendation_project_v2_tpu.eval.device_metrics import (
    DeviceMetricsPlan,
)
from news_recommendation_project_v2_tpu.models import build_tower
from news_recommendation_project_v2_tpu.ops.scoring import FlatEvalPlan
from news_recommendation_project_v2_tpu.utils.memory import estimate_flat_chunk

NUM_NEWS = 104_151  # MIND-large news count
NUM_ROWS = 200_000  # with-history dev impressions at MIND-large scale


def main():
    rng = np.random.default_rng(SEED)
    hist_lens = np.minimum(
        rng.geometric(1.0 / MEAN_HIST, size=NUM_ROWS), 600
    ).astype(np.int32)
    imp_lens = np.clip(rng.poisson(MEAN_CANDS, size=NUM_ROWS), 2, 300).astype(
        np.int32
    )
    hist_rev = rng.integers(0, NUM_NEWS, size=int(hist_lens.sum())).astype(
        np.int32
    )
    cand_rev = rng.integers(0, NUM_NEWS, size=int(imp_lens.sum())).astype(
        np.int32
    )
    cand_row = np.repeat(np.arange(NUM_ROWS, dtype=np.int32), imp_lens)
    labels = (rng.random(len(cand_rev)) < 0.2).astype(np.float32)
    offsets = np.concatenate([[0], np.cumsum(imp_lens)])
    labels[offsets[:-1]] = 1.0
    labels[offsets[1:] - 1] = 0.0
    log(
        f"workload: {NUM_ROWS} impressions, {NUM_NEWS} news, "
        f"{len(cand_rev)} slots, {len(hist_rev)} history tokens"
    )

    tower_cfg = TowerConfig(kind="latent", compute_dtype="bfloat16")
    tower = build_tower(tower_cfg)
    params = jax.jit(
        lambda: tower.init(
            jax.random.key(0), jnp.zeros((1, 16, DIM)), jnp.ones((1, 16))
        )
    )()
    params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def make_table(key):
        e = jax.random.normal(key, (NUM_NEWS, DIM), dtype=jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    emb_dev = make_table(jax.random.key(SEED))
    emb_bf16 = jax.jit(lambda e: e.astype(jnp.bfloat16))(emb_dev)

    def apply(p, e, m):
        return tower.apply(p, e, m).astype(jnp.float32)

    chunk_tokens = estimate_flat_chunk(tower_cfg)
    plan = FlatEvalPlan(
        hist_rev, hist_lens, cand_rev, cand_row, chunk_tokens=chunk_tokens
    )
    mplan = DeviceMetricsPlan(
        imp_lens, labels, hist_slots=np.arange(len(cand_rev), dtype=np.int64)
    )

    for name, run in (
        (
            "score-fetch",
            lambda: plan.score(
                apply, params_bf16, emb_dev, query_news_emb=emb_bf16
            ),
        ),
        (
            "fused-metrics",
            lambda: plan.metrics(
                apply, params_bf16, emb_dev, mplan, query_news_emb=emb_bf16
            ),
        ),
    ):
        log(f"--- {name}: warmup (compiling)...")
        t0 = time.perf_counter()
        out = run()
        log(f"warmup {time.perf_counter() - t0:.1f}s")
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = run()
            times.append(time.perf_counter() - t0)
            log(f"run {i}: {times[-1]:.3f}s")
        best = min(times)
        log(
            f"{name}: best {best:.3f}s = {NUM_ROWS / best:,.0f} impressions/s"
            + (f"; metrics {out}" if isinstance(out, dict) else "")
        )


if __name__ == "__main__":
    main()
