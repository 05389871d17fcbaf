"""Persistent XLA compilation cache.

The dominant cold-start cost of the pipeline is XLA compilation of the stage
programs (the BigVGAN vocoder alone compiles for >60s per mel bucket on a
v5e). JAX's persistent compilation cache serializes compiled executables to
disk keyed by HLO fingerprint, so every process after the first starts with
warm buckets. This is the TPU-native counterpart of the reference preloading
its prebuilt CUDA kernels at init (reference indextts/infer_v2.py:110-119).

Enabled by default from the pipeline constructors; disable with
``INDEXTTS_XLA_CACHE=0`` or point at a different directory by setting it to a
path.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently turn on the JAX persistent compilation cache.

    Returns the cache directory, or None if disabled via env.
    """
    global _enabled
    env = os.environ.get("INDEXTTS_XLA_CACHE", "")
    if env == "0":
        return None
    if _enabled:
        return path or env or _default_dir()

    import jax

    cache_dir = path or (env if env not in ("", "1") else None) or _default_dir()
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # the stage programs are exactly the expensive ones; cache everything
    # that takes longer than a second to compile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
    return cache_dir


def _default_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache", "indextts_tpu", "xla")
