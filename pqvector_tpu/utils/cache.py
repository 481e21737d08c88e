"""Persistent XLA compilation cache.

First compiles through the TPU stack cost tens of seconds; a disk cache makes
every process after the first start warm. Enabled at package import unless
``PQVECTOR_TPU_NO_COMPILE_CACHE`` is set or the user already configured a
cache dir.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "pqvector_tpu",
    "jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("PQVECTOR_TPU_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured one via env
    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            return
        target = cache_dir or _DEFAULT_DIR
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        # Cache is an optimization only; never block import on it.
        pass
