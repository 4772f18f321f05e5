"""Runtime profiling (role of the reference's optional gperftools
hook, Makefile:44-46 / delly.h:87-89 `#ifdef PROFILE`):

- ``DELLY_TPU_PROFILE=<path>`` wraps a CLI run, converts the pipeline's
  own stage banners into per-stage wall seconds via the log hook and
  writes a JSON profile to ``<path>`` on exit.
- ``DELLY_TPU_PROFILE_TRACE=<dir>`` additionally captures a JAX device
  profiler trace (viewable in TensorBoard / Perfetto) covering every
  kernel the run dispatched.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


@contextlib.contextmanager
def profile_run(path: str):
    from delly_tpu.utils import log as _log

    marks: list = []
    old_hook = _log.hook

    def hook(msg: str) -> None:
        if old_hook is not None:
            old_hook(msg)
        marks.append((time.time(), msg))

    _log.hook = hook
    trace_dir = os.environ.get("DELLY_TPU_PROFILE_TRACE")
    tracing = False
    if trace_dir:
        try:
            import jax
            jax.profiler.start_trace(trace_dir)
            tracing = True
        except Exception:
            pass
    t0 = time.time()
    try:
        yield
    finally:
        t1 = time.time()
        _log.hook = old_hook
        if tracing:
            try:
                import jax
                jax.profiler.stop_trace()
            except Exception:
                pass
        stages: dict = {}
        pts = [(t0, "startup")] + marks + [(t1, None)]
        for (ts, msg), (te, _next) in zip(pts, pts[1:]):
            if msg is not None:
                key = msg.split(",")[0][:60]
                stages[key] = round(stages.get(key, 0.0) + (te - ts), 4)
        try:
            with open(path, "w") as fh:
                json.dump({"wall_s": round(t1 - t0, 4),
                           "stages": stages}, fh, indent=1)
                fh.write("\n")
        except OSError:
            pass
