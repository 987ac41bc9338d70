"""The PGO-analog compilation cache: gating logic (pure env/host, no device).

The cache itself only activates for TPU-backed processes; these tests pin
the gating so a CPU CI process can never reload machine-feature-brittle
XLA:CPU AOT artifacts (see utils/compile_cache.py)."""

import os

from radix_sorting_tpu.utils import compile_cache


def _with_env(monkeypatch, **env):
    for k, v in env.items():
        if v is None:
            monkeypatch.delenv(k, raising=False)
        else:
            monkeypatch.setenv(k, v)


def test_disabled_by_env(monkeypatch):
    _with_env(monkeypatch, RST_COMPILE_CACHE="0")
    assert compile_cache.enable_compilation_cache() is None
    _with_env(monkeypatch, RST_COMPILE_CACHE="")
    assert compile_cache.enable_compilation_cache() is None


def test_cpu_process_skips(monkeypatch):
    # explicit cpu platform (what tests/workers set): no cache, no dir
    _with_env(monkeypatch, RST_COMPILE_CACHE=None, JAX_PLATFORMS="cpu")
    assert compile_cache.enable_compilation_cache() is None


def test_tpu_process_enables(monkeypatch, tmp_path):
    _with_env(monkeypatch, RST_COMPILE_CACHE=str(tmp_path / "cache"),
              JAX_PLATFORMS="cpu,axon")
    path = compile_cache.enable_compilation_cache()
    try:
        assert path == str(tmp_path / "cache")
        assert os.path.isdir(path)
        import jax
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        # leave the test process cache-free (tmp_path dies with the test)
        import jax
        jax.config.update("jax_compilation_cache_dir", None)
