"""Process-level JAX setup shared by CLI / bench entry points."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache. The bucketed update plan
    compiles one XLA program per (bucket width, chunk rows) shape; the
    cache makes those one-time costs per machine, not per process."""
    import jax
    cache_dir = cache_dir or os.environ.get(
        "CUMF_ALS_TPU_CACHE", os.path.expanduser("~/.cache/cumf_als_tpu"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass  # older jax without the flag: non-fatal
