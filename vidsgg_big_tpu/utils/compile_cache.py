"""Persistent XLA compilation cache.

Big jitted programs cost ~60-300 s per cold compile through the axon TPU
compile helper (and ~10-90 s on the single-core CPU backend).  The reference
has no equivalent concern (eager PyTorch); here the cache is what makes
repeat CLI invocations start in seconds instead of minutes.
"""
from __future__ import annotations

import os

DEFAULT_DIR = "/root/.cache/jax_comp"


def enable_compilation_cache(cache_dir: str | None = None) -> bool:
    """Point jax at a persistent on-disk compilation cache.

    Safe to call before or after backend init; returns False (and stays
    silent) if the running jax does not support it.  Honors
    ``JAX_COMPILATION_CACHE_DIR`` over the default.
    """
    try:
        import jax

        path = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or DEFAULT_DIR)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return True
    except Exception:
        return False
