"""Persistent XLA compilation cache.

First compiles of the full model are 20-300s on this class of hardware; the
persistent cache makes every subsequent process start warm. Call early, before
the first jit execution.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "") -> None:
    import jax

    path = path or os.environ.get("VILBERT_TPU_CACHE", "/tmp/vilbert_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options
