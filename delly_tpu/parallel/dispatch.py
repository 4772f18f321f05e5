"""Active-mesh dispatch: the production kernels, sharded.

The genotyping/assembly hot loop is a data-parallel batch of integer
edit distances (reference coverage.h:412-454 batches exactly the same
jobs over its thread pool). Sharding that batch over a device mesh
cannot change any output bit, so the multi-chip path IS the production
kernel: ``ops.edist.batched_edit_distance`` consults the active mesh
and shard_maps the same per-device kernel (Myers Pallas pipeline on
TPU, dense row-scan on CPU meshes) over all devices, gathering the
(B,) distance vector. Every downstream decision — score transform,
``max_geno_read_count`` cap, REF-count halving — runs on the gathered
vector in job order, so an 8-device run is byte-identical to a
1-device run by construction (asserted in tests/test_multichip.py).

Mesh axes follow SURVEY.md §7: ``interval`` (chromosome-interval /
host-level, DCN) x ``batch`` (read-batch data parallel, ICI). Both act
data-parallel on the job batch, so specs flatten the two axes.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

_ACTIVE = None
_cache = {}


def set_mesh(mesh) -> None:
    """Install `mesh` as the active device mesh for the production
    batched kernels (None restores single-device dispatch)."""
    global _ACTIVE
    _ACTIVE = mesh


def get_mesh():
    return _ACTIVE


@contextmanager
def use_mesh(mesh):
    prev = _ACTIVE
    set_mesh(mesh)
    try:
        yield mesh
    finally:
        set_mesh(prev)


def _pow2(x: int, lo: int) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


def _flat_spec(mesh):
    from jax.sharding import PartitionSpec as P
    names = tuple(mesh.axis_names)
    return P(names if len(names) > 1 else names[0])


def _build_sharded(mesh, mode: int, use_pallas: bool, nalpha: int):
    """jit(shard_map(per-device kernel)) for one (mesh, mode) config."""
    import jax
    from jax.sharding import PartitionSpec

    spec = _flat_spec(mesh)
    rep = PartitionSpec()
    if use_pallas:
        from delly_tpu.ops import myers_pallas

        def body(q, t, ql, tl, letters):
            m = q.shape[1]
            n = t.shape[1]
            run = myers_pallas.make_runner(m, n, nalpha, mode)
            return run(q, t, ql, tl, letters)

        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(spec, spec, spec, spec, rep),
                           out_specs=spec)
    else:
        from delly_tpu.ops import edist

        core = edist._device_fns()

        def body(q, ql, t, tl):
            return core(q, ql, t, tl, mode)

        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(spec, spec, spec, spec),
                           out_specs=spec)
    return jax.jit(fn)


def sharded_batched_edit_distance(mesh, queries, qlens, targets, tlens,
                                  mode: int):
    """The production batched distance kernel executed across `mesh`.

    Pads the batch to (devices x per-device-bucket) rows — power-of-two
    bucketing bounds the compile cache — runs the per-device kernel
    under shard_map, and gathers the distances in job order."""
    import jax.numpy as jnp

    from delly_tpu.ops.myers import MAX_ALPHA
    from delly_tpu.ops.myers_pallas import TILE

    q = np.ascontiguousarray(np.asarray(queries), dtype=np.uint8)
    t = np.ascontiguousarray(np.asarray(targets), dtype=np.uint8)
    ql = np.asarray(qlens, dtype=np.int32)
    tl = np.asarray(tlens, dtype=np.int32)
    b, m = q.shape
    n = t.shape[1]
    ndev = int(mesh.devices.size)

    dev_platform = mesh.devices.flat[0].platform
    use_pallas = dev_platform == "tpu"
    letters = None
    nalpha = 0
    if use_pallas:
        from delly_tpu.ops.myers_pallas import pad_alphabet
        letters = np.union1d(np.unique(q), np.unique(t))
        if len(letters) > MAX_ALPHA:
            use_pallas = False
        else:
            letters = pad_alphabet(letters)
            nalpha = len(letters)

    unit = TILE if use_pallas else 16
    per = _pow2(max(1, -(-b // ndev)), unit)
    bp = per * ndev
    pad = bp - b
    if pad:
        q = np.pad(q, ((0, pad), (0, 0)))
        t = np.pad(t, ((0, pad), (0, 0)))
        ql = np.pad(ql, (0, pad), constant_values=1)
        tl = np.pad(tl, (0, pad))

    key = (id(mesh), mode, use_pallas, nalpha)
    fn = _cache.get(key)
    if fn is None:
        fn = _cache[key] = _build_sharded(mesh, mode, use_pallas, nalpha)
    if use_pallas:
        out = fn(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                 jnp.asarray(tl), jnp.asarray(letters))
    else:
        out = fn(jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
                 jnp.asarray(tl))
    return np.asarray(out)[:b]
