"""Test harness: force a virtual 8-device CPU mesh so sharding code paths run
without TPU hardware (the standard JAX fake-backend technique; SURVEY.md §4)."""

import os

# NOTE: this environment overrides the JAX_PLATFORMS env var (an `axon` TPU
# plugin re-registers itself), so the CPU pin must go through jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Hermetic tests: the CLI entry points enable the persistent compile cache by
# default (utils/compile_cache.py); don't let test invocations write to the
# user's real cache — even when the developer has NRTPU_COMPILE_CACHE exported
# (so no setdefault). Individual tests monkeypatch this to cover the feature.
os.environ["NRTPU_COMPILE_CACHE"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
