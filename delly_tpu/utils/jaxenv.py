"""JAX environment setup shared by the CLI, benchmarks and the harness
entry points.

- pin_platform(): honor JAX_PLATFORMS even when a PJRT plugin (e.g.
  the axon TPU tunnel) registers itself regardless of the env filter.
- enable_persistent_cache(): turn on JAX's persistent compilation
  cache (works for Pallas executables on the axon plugin too —
  measured 90s -> 3.5s cold-start for the Gotoh kernel across
  processes) so repeated invocations reuse compiled kernels.
"""

from __future__ import annotations

import os


def pin_platform() -> None:
    try:
        import jax
        plat = os.environ.get("JAX_PLATFORMS")
        if plat:
            jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def enable_persistent_cache() -> None:
    try:
        import jax
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.join(os.path.expanduser("~"),
                                        ".cache")),
            "delly_tpu", "jaxcache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def setup() -> None:
    pin_platform()
    enable_persistent_cache()
