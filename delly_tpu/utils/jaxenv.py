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
    from delly_tpu.utils import malloc_tuning
    malloc_tuning.apply()
    pin_platform()
    enable_persistent_cache()


class _DeferredJaxSetup:
    """Meta-path hook: run setup() right after the real `jax` module
    first executes.  Importing jax costs ~1s; small CLI runs that never
    touch a device kernel should not pay it up front, but the platform
    pin and cache config must still land before any backend/compile."""

    _installed = False

    def find_spec(self, name, path=None, target=None):
        if name != "jax":
            return None
        import importlib.util
        import sys
        sys.meta_path.remove(self)
        _DeferredJaxSetup._installed = False
        spec = importlib.util.find_spec("jax")
        if spec is None or spec.loader is None:
            return None
        loader = spec.loader
        orig_exec = loader.exec_module

        def exec_module(module):
            try:
                orig_exec(module)
            except BaseException:
                # a failed first import (e.g. transient plugin error)
                # must not disarm the setup for a later retry
                setup_deferred()
                raise
            setup()

        # per-spec override; the loader instance is spec-specific for
        # source loaders, but guard with a shallow copy to be safe
        import copy
        loader2 = copy.copy(loader)
        loader2.exec_module = exec_module
        spec.loader = loader2
        return spec


def setup_deferred() -> None:
    """setup() now if jax is already imported, else on first import."""
    import sys
    if "jax" in sys.modules:
        setup()
        return
    if not _DeferredJaxSetup._installed:
        _DeferredJaxSetup._installed = True
        sys.meta_path.insert(0, _DeferredJaxSetup())
