"""The production CLIs' persistent XLA compile cache (utils/compile_cache.py):
resolution order, the disable switch, and the unwritable-location fallback."""

import jax
import pytest

from news_recommendation_project_v2_tpu.utils.compile_cache import (
    enable_persistent_compile_cache,
)


@pytest.fixture
def restore_jax_cache_config():
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_explicit_dir_wins_and_configures_jax(
    tmp_path, monkeypatch, restore_jax_cache_config
):
    monkeypatch.setenv("NRTPU_COMPILE_CACHE", str(tmp_path / "ignored"))
    got = enable_persistent_compile_cache(tmp_path / "cache")
    assert got == tmp_path / "cache" and got.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(got)
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0


def test_env_var_used_when_no_arg(tmp_path, monkeypatch, restore_jax_cache_config):
    monkeypatch.setenv("NRTPU_COMPILE_CACHE", str(tmp_path / "env_cache"))
    got = enable_persistent_compile_cache()
    assert got == tmp_path / "env_cache"
    assert jax.config.jax_compilation_cache_dir == str(got)


@pytest.mark.parametrize("val", ["0", "", "  "])
def test_env_disable_switch(val, monkeypatch, restore_jax_cache_config):
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("NRTPU_COMPILE_CACHE", val)
    assert enable_persistent_compile_cache() is None
    assert jax.config.jax_compilation_cache_dir == prev  # untouched


def test_env_disable_beats_explicit_dir(
    tmp_path, monkeypatch, restore_jax_cache_config
):
    """ADVICE r4: the user/test kill switch must win even when a caller wires
    an explicit default path (conftest hermeticity depends on it)."""
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("NRTPU_COMPILE_CACHE", "0")
    assert enable_persistent_compile_cache(tmp_path / "cache") is None
    assert jax.config.jax_compilation_cache_dir == prev
    assert not (tmp_path / "cache").exists()


def test_unwritable_location_runs_uncached(monkeypatch, restore_jax_cache_config):
    prev = jax.config.jax_compilation_cache_dir
    got = enable_persistent_compile_cache("/proc/nope/cache")
    assert got is None
    assert jax.config.jax_compilation_cache_dir == prev
