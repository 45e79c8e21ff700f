"""Persistent XLA compilation cache for production entry points.

Remote/TPU compiles are the dominant cold-start cost of every CLI run (30-500s
per program through a tunneled device; the first training epoch at MIND
statistics pays 46s of compiles vs a 34.6s warm epoch — BASELINE.md). JAX's
persistent compilation cache removes that cost for every invocation after the
first, keyed on program + compiler version, so `nrtpu-train` / `nrtpu-eval` /
`nrtpu-serve` restarts skip straight to warm throughput. The benchmarks under
``benchmarks/`` have always used this; this module gives the production CLIs
the same behavior by default.

The reference has no analogue (torch eager re-JITs nothing, so cold start is
not a cost there); for a compiled framework it is table stakes.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_DEFAULT_DIR = "~/.cache/nrtpu/jax_cache"


def enable_persistent_compile_cache(
    cache_dir: Optional[os.PathLike | str] = None,
) -> Optional[Path]:
    """Point JAX's persistent compilation cache at a durable directory.

    Resolution order: explicit ``cache_dir`` argument, then the
    ``NRTPU_COMPILE_CACHE`` environment variable, then ``~/.cache/nrtpu/
    jax_cache``. Setting ``NRTPU_COMPILE_CACHE=0`` (or empty) disables the
    cache entirely — INCLUDING when a ``cache_dir`` argument is passed, so
    the user/test kill switch (tests/conftest.py pins it off for hermeticity)
    always wins over library/CLI defaults. Returns the directory in use, or
    None when disabled.

    Safe to call more than once and before or after device initialization;
    only compilations AFTER the call are cached. Programs cheaper than 1s to
    compile are not persisted (they would bloat the cache for no win).
    """
    env = os.environ.get("NRTPU_COMPILE_CACHE")
    if env is not None and env.strip() in ("", "0"):
        return None  # the env kill switch beats any explicit cache_dir
    if cache_dir is None:
        cache_dir = env or _DEFAULT_DIR
    path = Path(cache_dir).expanduser()
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError:
        return None  # unwritable cache location: run uncached, don't crash
    import jax

    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
