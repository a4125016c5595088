"""Persistent XLA compilation cache (utils/compile_cache.py).

Serving restarts re-pay 4-16 s of XLA compilation per program signature;
the cache makes restarts warm. The reference's warm state is its
process-resident torch/ONNX sessions (pkg/nemo-asr/src/transcribe.py:18-34)
-- this is the TPU-native equivalent, so the contract under test is ours:
opt-in, env-var fallback, entries actually written and reusable.
"""

import jax
import jax.numpy as jnp

from reazonspeech_tpu.utils.compile_cache import ENV_VAR, enable_compile_cache


def _entries(d):
    return [p for p in d.rglob("*") if p.is_file()]


def test_disabled_without_path(monkeypatch):
    monkeypatch.delenv(ENV_VAR, raising=False)
    assert enable_compile_cache() is None


def test_env_var_fallback(tmp_path, monkeypatch):
    d = tmp_path / "cc_env"
    monkeypatch.setenv(ENV_VAR, str(d))
    try:
        assert enable_compile_cache() == str(d)
        assert d.is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_cache_entries_written_and_survive_cache_clear(tmp_path):
    d = tmp_path / "cc"
    try:
        assert enable_compile_cache(str(d), min_compile_secs=0.0) == str(d)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        x = jnp.ones((64, 64))
        first = float(f(x))
        n = len(_entries(d))
        assert n > 0, "no persistent cache entries written"

        # a fresh trace of the same program loads from the persistent
        # cache (same executable bytes -> same result, no new entries
        # beyond what the retrace itself contributes)
        jax.clear_caches()
        assert float(f(x)) == first
        assert len(_entries(d)) >= n
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
