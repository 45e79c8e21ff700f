"""Measure the fused GEGLU Pallas kernel vs XLA's unfused FFN on the real TPU
at the flat-path chunk shape ([131072, 1024] bf16, F=4096)."""

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
from bench import log

from news_recommendation_project_v2_tpu.ops.pallas_geglu import (
    fused_geglu,
    reference_geglu,
)

C, D, F = 131072, 1024, 4096
REPS = 12  # one flat eval's worth of chunks


def timeit(name, fn, n=3):
    out = fn()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    log(f"{name}: {best * 1000:.1f} ms")
    return best, out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, D)) * 0.1, dtype=jnp.bfloat16)
    w_in = jnp.asarray(rng.standard_normal((D, 2 * F)) * 0.02, dtype=jnp.bfloat16)
    b_in = jnp.asarray(rng.standard_normal(2 * F) * 0.02, dtype=jnp.bfloat16)
    w_out = jnp.asarray(rng.standard_normal((F, D)) * 0.02, dtype=jnp.bfloat16)
    b_out = jnp.asarray(rng.standard_normal(D) * 0.02, dtype=jnp.bfloat16)
    for leaf in (x, w_in, b_in, w_out, b_out):
        leaf.block_until_ready()

    xla = jax.jit(lambda *a: reference_geglu(*a).sum())
    def run_xla():
        outs = [xla(x, w_in, b_in, w_out, b_out) for _ in range(REPS)]
        return float(outs[-1])

    t_xla, _ = timeit(f"XLA FFN x{REPS}", run_xla)

    blocks = [(512, 512), (1024, 512), (256, 1024)]
    if len(sys.argv) > 1:
        blocks = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
    for bc, bk in blocks:
        try:
            fused = jax.jit(
                lambda *a, bc=bc, bk=bk: fused_geglu(
                    *a, block_c=bc, block_k=bk
                ).sum()
            )
            def run_fused():
                outs = [fused(x, w_in, b_in, w_out, b_out) for _ in range(REPS)]
                return float(outs[-1])

            # Correctness on device first.
            got = jax.jit(
                lambda *a, bc=bc, bk=bk: fused_geglu(*a, block_c=bc, block_k=bk)
            )(x[:8192], w_in, b_in, w_out, b_out)
            exp = jax.jit(lambda *a: reference_geglu(*a))(
                x[:8192], w_in, b_in, w_out, b_out
            )
            err = float(jnp.abs(got - exp).max())
            log(f"pallas bc={bc} bk={bk}: max|diff| vs XLA = {err:.4f}")
            t_f, _ = timeit(f"pallas GEGLU bc={bc} bk={bk} x{REPS}", run_fused)
            log(f"  -> speedup vs XLA: {t_xla / t_f:.3f}x")
        except Exception as e:
            log(f"pallas bc={bc} bk={bk} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
