"""JAX runtime configuration helpers."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache so repeated runs skip
    the multi-second TPU AOT compiles."""
    import jax

    cache_dir = path or os.path.join(
        os.path.expanduser("~"), ".cache", "bds3_tpu_xla"
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs
