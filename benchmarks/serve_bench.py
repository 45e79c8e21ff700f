"""Serving throughput benchmark: requests/s through Ranker.rank_batch (the
production batch path) and single-request rank/retrieve latency, full-size
latent tower over a MIND-small-scale corpus.

    python benchmarks/serve_bench.py [NUM_REQUESTS]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from news_recommendation_project_v2_tpu.config import TowerConfig
from news_recommendation_project_v2_tpu.models import build_tower
from news_recommendation_project_v2_tpu.serve import Ranker

NUM_NEWS, DIM = 65_238, 1024


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    log(f"backend: {jax.default_backend()}, requests={n_req}")

    tower = build_tower(TowerConfig(kind="latent"))
    params = jax.jit(
        lambda: tower.init(jax.random.key(0), jnp.zeros((1, 16, DIM)), jnp.ones((1, 16)))
    )()
    emb = np.asarray(
        jax.jit(
            lambda k: jax.random.normal(k, (NUM_NEWS, DIM)) * 0.05
        )(jax.random.key(1))
    )
    ids = [f"N{i}" for i in range(NUM_NEWS)]
    ranker = Ranker(lambda p, e, m: tower.apply(p, e, m), params, emb, ids)

    rng = np.random.default_rng(0)
    # MIND-like: geometric histories (mean ~29, capped 600), ~50 candidates.
    requests = []
    for _ in range(n_req):
        h = int(np.clip(rng.geometric(1 / 29.0), 1, 600))
        c = int(rng.integers(10, 90))
        requests.append(
            (
                [ids[j] for j in rng.integers(0, NUM_NEWS, h)],
                [ids[j] for j in rng.integers(0, NUM_NEWS, c)],
            )
        )

    log("warmup (compiles one program per (history,candidate)-bucket pair)...")
    t0 = time.perf_counter()
    ranker.rank_batch(requests)
    log(f"warmup {time.perf_counter() - t0:.1f}s")
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = ranker.rank_batch(requests)
        times.append(time.perf_counter() - t0)
        log(f"rank_batch run {i}: {times[-1]:.3f}s")
    assert len(out) == n_req and all(len(r) for r in out)
    batch_rps = n_req / min(times)
    log(f"rank_batch: {batch_rps:,.0f} requests/s")

    t0 = time.perf_counter()
    for req in requests[:20]:
        ranker.rank(*req)
    single_ms = (time.perf_counter() - t0) / 20 * 1e3
    log(f"single rank: {single_ms:.1f} ms/request")
    t0 = time.perf_counter()
    for req in requests[:10]:
        ranker.retrieve(req[0], k=10)
    retrieve_ms = (time.perf_counter() - t0) / 10 * 1e3
    log(f"full-corpus top-10 retrieve: {retrieve_ms:.1f} ms/request")

    print(
        json.dumps(
            {
                "metric": "serve_rank_batch_requests_per_s",
                "value": round(batch_rps),
                "unit": "requests/s",
                "single_rank_ms": round(single_ms, 1),
                "retrieve_ms": round(retrieve_ms, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
