"""Multi-process (host-axis) distribution layer.

The reference is a single-node tool whose only concurrency is one
ThreadPool (threadpool.h:15-77). The TPU-native replacement scales the
host plane across OS processes / pod hosts (SURVEY.md §7.7): every
process owns a deterministic subset of the chromosome plan, decodes
and scans ONLY its owned intervals, and the per-interval products
(candidate records, junction tapes, tallies) are exchanged through the
device collective plane (all-gather over the global mesh — ICI within
a slice, DCN across hosts) before the order-sensitive merge replays
them identically on every process. Process 0 alone writes output
files.

Design rules that keep multi-process runs byte-identical to
single-process runs (asserted by tests/test_hostaxis.py):

- ownership is a pure function of (plan position, process count);
- exchanged products are per-(file, chromosome) and the consumer
  replays them in the serial (file, chromosome, row) order;
- every process executes the same device dispatches with the same
  global data (collectives are collective — a divergent dispatch
  would deadlock, so drivers exchange BEFORE any data-dependent
  device work).

Bring-up: `jax.distributed.initialize()` (auto-detected on TPU pods)
or the env triplet DELLY_TPU_COORD / DELLY_TPU_NPROC /
DELLY_TPU_PROC_ID for explicit clusters; `maybe_init()` consumes
either. Without initialization every helper degrades to the
single-process identity, so drivers call them unconditionally.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

_INITIALIZED = False


def maybe_init() -> bool:
    """Initialize jax.distributed from the environment, once.

    Returns True when a multi-process world is (already) up. Reads:
    - DELLY_TPU_DIST=auto  -> jax.distributed.initialize() (pods)
    - DELLY_TPU_COORD=host:port + DELLY_TPU_NPROC + DELLY_TPU_PROC_ID
      -> explicit local/cluster bring-up (CPU meshes use gloo).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return process_count() > 1
    mode = os.environ.get("DELLY_TPU_DIST", "").strip().lower()
    coord = os.environ.get("DELLY_TPU_COORD", "").strip()
    if not mode and not coord:
        # no distributed request: stay jax-free (backend init is
        # deferred until a kernel actually dispatches)
        return _external_world()
    import jax

    try:
        if mode == "auto":
            jax.distributed.initialize()
            _INITIALIZED = True
        elif coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["DELLY_TPU_NPROC"]),
                process_id=int(os.environ["DELLY_TPU_PROC_ID"]))
            _INITIALIZED = True
    except (KeyError, ValueError, RuntimeError) as exc:
        import sys
        print(f"warning: multi-process bring-up failed ({exc}); "
              f"running single-process", file=sys.stderr)
    return process_count() > 1


def _external_world() -> bool:
    """True when jax.distributed was brought up OUTSIDE this module
    (e.g. the DEPLOY.md pod snippet calls jax.distributed.initialize()
    itself). Never imports jax — a cold process cannot be in a world."""
    import sys
    if "jax" not in sys.modules:
        return False
    try:
        from jax._src import distributed
        return distributed.global_state.client is not None
    except Exception:
        return False


def _in_world() -> bool:
    return _INITIALIZED or _external_world()


def process_index() -> int:
    if not _in_world():
        return 0
    import jax
    return int(jax.process_index())


def process_count() -> int:
    if not _in_world():
        return 1
    import jax
    return int(jax.process_count())


def is_writer() -> bool:
    """Only process 0 writes output files (BCF/covfile/stats)."""
    return process_index() == 0


def owner_of(k: int) -> int:
    """Owner process of plan slot k (round-robin: genome chromosome
    order is roughly size-sorted, so striding balances base counts)."""
    return k % process_count()


def owns(k: int) -> bool:
    return owner_of(k) == process_index()


def partition_plan(plan: list) -> list:
    """The subset of `plan` this process owns (plan-slot round-robin).

    Ownership is by PLAN POSITION, not by item value, so any driver
    work list (chromosome indices, files, SV blocks) partitions the
    same way."""
    me, n = process_index(), process_count()
    return [item for k, item in enumerate(plan) if k % n == me]


_EXCHANGE_CACHE = {}


def _gather_bytes(payload: bytes) -> list:
    """All-gather one bytes payload per process via the device
    collective plane; returns the per-process list in process order."""
    from jax.experimental import multihost_utils

    n = process_count()
    sizes = multihost_utils.process_allgather(
        np.array([len(payload)], dtype=np.int64))
    sizes = np.asarray(sizes).reshape(n)
    cap = int(sizes.max())
    # pad to a power-of-two bucket so the gather program re-compiles
    # only on bucket growth, not on every payload size
    bucket = 1 << max(10, int(np.ceil(np.log2(max(cap, 1)))))
    buf = np.zeros(bucket, dtype=np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(n, bucket)
    return [gathered[p, :sizes[p]].tobytes() for p in range(n)]


def allgather_obj(obj):
    """Exchange one picklable object per process; returns the list of
    all processes' objects in process order. Identity at 1 process."""
    if process_count() == 1:
        return [obj]
    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    return [pickle.loads(b) for b in _gather_bytes(payload)]


def exchange_owned(products: dict) -> dict:
    """Merge per-key products across processes.

    `products` maps work keys (e.g. chromosome index) owned by THIS
    process to their results; the return value maps every key produced
    by any process. Duplicate keys must not occur (ownership is a
    partition); the first producer in process order wins if they do.
    """
    merged: dict = {}
    for part in allgather_obj(products):
        for key, val in part.items():
            merged.setdefault(key, val)
    return merged


def barrier(tag: str = "delly") -> None:
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)
