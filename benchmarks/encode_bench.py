"""News-encoder (save_emb) throughput benchmark: news/s through the frozen
e5-large-geometry encoder at a MIND-like title-length distribution.

Three arms:
  fixed512   — every row padded to NEWS_TEXT_MAXLEN=512 (the reference's cap,
               `/root/reference/src/news_rec_utils/config.py:27`); what a naive
               static-shape port pays.
  fixed128   — the previous CLI default width.
  bucketed   — `ops.encode.encode_corpus_bucketed` (32/64/128/256/512 static
               length buckets, per-bucket analytic batch sizes): the TPU
               answer to the reference's pad-to-batch-max tokenization
               (`data_utils.py:471-482`).

    python benchmarks/encode_bench.py [N] [arm,arm,...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from news_recommendation_project_v2_tpu.config import EncoderConfig
from news_recommendation_project_v2_tpu.models.news_encoder import NewsEncoder
from news_recommendation_project_v2_tpu.ops.encode import (
    encode_corpus,
    encode_corpus_bucketed,
)

E5_LARGE = EncoderConfig(
    vocab_size=250_002,
    hidden_dim=1024,
    num_layers=24,
    num_heads=16,
    intermediate_dim=4096,
    max_position=514,
    compute_dtype="bfloat16",
)
BUCKETS = (32, 64, 128, 256, 512)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def mind_like_lengths(rng, n):
    """Token counts for 'Title: {title}' texts: MIND titles average ~11 words;
    XLM-R subword fan-out ~1.6x + bos/eos lands the mass at 15-35 tokens with
    a long-ish tail (clipped to the 512 cap)."""
    lens = np.exp(rng.normal(np.log(22.0), 0.45, size=n))
    return np.clip(lens.round().astype(np.int64), 6, 512)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    from news_recommendation_project_v2_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    log(f"backend: {jax.default_backend()}, n={n}")

    enc = NewsEncoder(E5_LARGE)
    params = jax.jit(
        lambda: enc.init(
            jax.random.key(0),
            jnp.zeros((1, 16), jnp.int32),
            jnp.ones((1, 16), jnp.int32),
        )
    )()

    rng = np.random.default_rng(0)
    lens = mind_like_lengths(rng, n)
    ids = np.zeros((n, 512), np.int32)
    mask = np.zeros((n, 512), np.int32)
    for i, ln in enumerate(lens):
        ids[i, :ln] = rng.integers(3, E5_LARGE.vocab_size, ln)
        mask[i, :ln] = 1
    log(
        f"lengths: mean {lens.mean():.1f}, p50 {np.percentile(lens, 50):.0f}, "
        f"p99 {np.percentile(lens, 99):.0f}, max {lens.max()}"
    )

    def apply(p, i, m):
        return enc.apply(p, i, m)

    arms = {
        "fixed512": lambda: encode_corpus(
            apply, params, ids, mask, batch_size=None, encoder_config=E5_LARGE
        ),
        "fixed128": lambda: encode_corpus(
            apply,
            params,
            ids[:, :128],
            mask[:, :128],  # NOTE: truncates the >128-token tail (what the old CLI default did)
            batch_size=None,
            encoder_config=E5_LARGE,
        ),
        "bucketed": lambda: encode_corpus_bucketed(
            apply, params, ids, mask, buckets=BUCKETS, encoder_config=E5_LARGE
        ),
    }

    if len(sys.argv) > 2:
        keep = sys.argv[2].split(",")
        unknown = [k for k in keep if k not in arms]
        if unknown:
            sys.exit(f"unknown arm(s) {unknown}; choose from {sorted(arms)}")
        arms = {k: v for k, v in arms.items() if k in keep}

    results = {}
    for name, run in arms.items():
        log(f"[{name}] warmup/compile...")
        t0 = time.perf_counter()
        out = np.asarray(run())
        log(f"[{name}] warmup {time.perf_counter() - t0:.1f}s")
        assert np.isfinite(out).all() and out.shape == (n, 1024)
        times = []
        for i in range(2):
            t0 = time.perf_counter()
            out = np.asarray(run())
            times.append(time.perf_counter() - t0)
            log(f"[{name}] run {i}: {times[-1]:.2f}s")
        best = min(times)
        results[name] = best
        log(f"[{name}] {n / best:,.0f} news/s ({lens.sum() / best / 1e6:.2f}M live tokens/s)")

    import json

    main_arm = "bucketed" if "bucketed" in results else next(iter(results))
    line = {
        "metric": "encode_news_per_s",
        "value": round(n / results[main_arm]),
        "unit": "news/s",
        "vs_fixed512": (
            round(results["fixed512"] / results[main_arm], 2)
            if "fixed512" in results
            else None
        ),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
