"""Process-level JAX setup shared by CLI / bench entry points."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache. The bucketed update plan
    compiles one XLA program per (bucket width, chunk rows) shape; the
    cache makes those one-time costs per machine, not per process."""
    import jax
    # Re-assert the user's JAX_PLATFORMS choice through the config API:
    # TPU-tunnel plugins can register a platform override that wins
    # over the env var (observed: JAX_PLATFORMS=cpu in the environment
    # but default_backend() == "tpu"). The config update is honored as
    # long as no backend has initialized yet.
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        try:
            jax.config.update("jax_platforms", plats)
        except Exception:
            pass
    cache_dir = cache_dir or os.environ.get(
        "CUMF_ALS_TPU_CACHE", os.path.expanduser("~/.cache/cumf_als_tpu"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist EVERY compile, including sub-0.3s ones: through the
        # axon tunnel each remote compile is a liability (r5: the
        # remote compile helper wedged mid-session and even
        # fully-warmed benches hung on tiny uncached programs), and a
        # fast-compiling program is exactly the one whose cache entry
        # costs nothing to store.
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass  # older jax without the flag: non-fatal
