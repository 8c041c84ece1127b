"""Persistent XLA compilation cache.

First compiles of the full model are 20-300s on this class of hardware; the
persistent cache makes every subsequent process start warm. Call early, before
the first jit execution.
"""

from __future__ import annotations

import os


def force_requested_platform() -> None:
    """Re-assert ``JAX_PLATFORMS=cpu`` programmatically.

    Some PJRT plugins register themselves irrespective of the JAX_PLATFORMS
    environment variable (only the programmatic config restricts them), so a
    CPU-forced run could still open — and block on — a remote TPU backend.
    Call before any backend init in EVERY CLI entry point (found the hard
    way: eval_tasks hung on a down TPU tunnel under JAX_PLATFORMS=cpu while
    the train CLIs, which re-assert, ran fine). Only the cpu case is
    rewritten: accelerator env values (e.g. a sitecustomize's "axon")
    already resolve through the plugin's own registration.
    """
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def enable_compilation_cache(path: str = "") -> None:
    """Enable the persistent cache — TPU platform only.

    XLA:CPU AOT artifacts are machine-feature-pinned; with a remote-compile
    TPU backend the host-side programs in the cache may have been compiled on
    a different machine, and reloading them from a pure-CPU process warns
    "could lead to execution errors such as SIGILL". CPU runs therefore skip
    the cache entirely.
    """
    # honor an explicit platform choice WITHOUT touching the backend:
    # jax.default_backend() initializes the device client, and on a remote
    # TPU backend that is a network round-trip that can hang a pure-CPU run
    # (e.g. JAX_PLATFORMS=cpu smoke tests on a box with a TPU tunnel)
    plats = os.environ.get("JAX_PLATFORMS", "").lower()
    if plats and "tpu" not in plats and "axon" not in plats:
        return

    import jax

    if jax.default_backend() != "tpu":
        return
    path = path or os.environ.get("VILBERT_TPU_CACHE", "/tmp/vilbert_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options


def setup_tpu_defaults() -> None:
    """Production TPU settings: persistent compile cache + hardware RBG PRNG.

    threefry dropout costs ~28% of the CC-pretraining step on v5e (measured:
    196.6 -> 141.8 ms/step when dropout is disabled; rbg recovers most of it
    at 166.4 ms/step). rbg is the standard production choice for TPU training
    where counter-exactness of threefry isn't required.
    """
    import jax

    force_requested_platform()
    enable_compilation_cache()
    try:
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
