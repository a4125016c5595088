"""Persistent XLA compilation cache: warm serving restarts.

Every serving program signature (flavor x batch bucket x decode strategy)
costs 4-16 s of XLA compilation on first use (BENCH_FLAVORS.json
``compile_s``); a server restart pays all of it again before the first
request completes. JAX's persistent compilation cache keys compiled
executables by HLO fingerprint + backend, so a restart on the same
software stack reloads each program in milliseconds instead.

The reference keeps warm state process-resident (torch modules / ONNX
sessions, ``pkg/nemo-asr/src/transcribe.py:18-34``) and has no restart
story beyond reloading weights; on TPU the equivalent — and stronger —
warm-start mechanism is caching the compiled executables themselves.

Opt-in: pass ``reazonspeech-serve --compile-cache DIR`` or set
``$REAZONSPEECH_TPU_COMPILE_CACHE``. Safe to share between flavors and
processes (entries are content-addressed; concurrent writers race
benignly on identical bytes).
"""

import os

__all__ = ["ENV_VAR", "enable_compile_cache"]

ENV_VAR = "REAZONSPEECH_TPU_COMPILE_CACHE"


def enable_compile_cache(path=None, min_compile_secs=1.0):
    """Point JAX's persistent compilation cache at ``path``.

    ``path`` defaults to ``$REAZONSPEECH_TPU_COMPILE_CACHE``; when both
    are unset this is a no-op returning None (the cache stays off).
    ``min_compile_secs`` skips caching trivial programs — serving
    executables all compile well above 1 s, while the tiny host-side
    jits (padding, normalization) aren't worth the disk I/O.

    Returns the cache directory in use, or None when disabled.
    """
    path = path or os.environ.get(ENV_VAR)
    if not path:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
