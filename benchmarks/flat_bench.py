"""Measure the flat (zero-padding) eval-scoring path on the real TPU at the
bench.py workload scale, vs the bucketed path. Usage:

    python benchmarks/flat_bench.py [chunk_tokens ...]
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
from bench import DIM, NUM_NEWS, NUM_ROWS, SEED, build_workload, log

from news_recommendation_project_v2_tpu.config import TowerConfig
from news_recommendation_project_v2_tpu.models import build_tower
from news_recommendation_project_v2_tpu.ops import score_all_impressions
from news_recommendation_project_v2_tpu.ops.scoring import (
    score_all_impressions_flat,
)


def main():
    chunks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [131072]
    rng = np.random.default_rng(SEED)
    hist_lens, imp_lens, hist_rev, cand_rev, cand_row, _ = build_workload(rng)
    log(
        f"workload: {NUM_ROWS} rows, {len(hist_rev)} history tokens, "
        f"{len(cand_rev)} candidate slots"
    )
    tower = build_tower(TowerConfig(kind="latent"))
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

    single = "--single" in sys.argv
    plan_mode = "--plan" in sys.argv
    for chunk in chunks:
        if plan_mode:
            from news_recommendation_project_v2_tpu.ops.scoring import FlatEvalPlan

            plan = FlatEvalPlan(
                hist_rev, hist_lens, cand_rev, cand_row, chunk_tokens=chunk
            )

        def run():
            if plan_mode:
                return plan.score(
                    apply, params_bf16, emb_dev, query_news_emb=emb_bf16
                )
            if single:
                return score_all_impressions_flat(
                    apply,
                    params_bf16,
                    emb_dev,
                    hist_rev,
                    hist_lens,
                    cand_rev,
                    cand_row,
                    query_news_emb=emb_bf16,
                    chunk_tokens=chunk,
                )
            return score_all_impressions(
                apply,
                params_bf16,
                emb_dev,
                hist_rev,
                hist_lens,
                cand_rev,
                cand_row,
                query_news_emb=emb_bf16,
                tokens_per_batch=chunk,
                flat_tokens=True,
            )

        log(f"--- flat chunk={chunk}: warmup (compiling)...")
        t0 = time.perf_counter()
        scores = run()
        log(f"warmup {time.perf_counter() - t0:.1f}s, {len(scores)} slots")
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            scores = run()
            times.append(time.perf_counter() - t0)
            log(f"run {i}: {times[-1]:.3f}s")
        best = min(times)
        assert np.isfinite(scores).all()
        log(
            f"flat chunk={chunk}: best {best:.3f}s = "
            f"{NUM_ROWS / best:,.0f} impressions/s"
        )


if __name__ == "__main__":
    main()
