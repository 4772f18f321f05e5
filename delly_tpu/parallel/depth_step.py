"""Sharded read-depth windows: the multi-chip CNV compute plane.

The production CNV driver (models/coral.py::_write_windows) feeds its
REAL per-window accumulations through ``depth_windows_on_mesh`` when a
device mesh is active: the purity/ploidy-adjusted copy number and the
log2 ratio of every genome window (reference coral.h:296-414) are
computed elementwise over a window axis sharded across the full mesh,
and integer-exact callable/coverage tallies are combined with psum for
the run telemetry.

Design notes (byte-identity across device counts):

- every per-window output is ELEMENTWISE in the window axis, so
  sharding the axis over 1 vs N devices is bit-identical by
  construction (asserted via CLI-level covfile comparison in
  tests/test_multichip.py);
- the math runs in float64 on-device (the reference computes these in
  double); float64 is native on CPU meshes and supported on TPU;
- the psum'd tallies are integer-valued float64 (window counts and
  integer fragment-count sums), so the cross-device reduction is exact
  and order-independent — float psums of non-integer values would not
  be reproducible across device counts and are deliberately avoided;
- the PELT noise proxy (cnv.h:357-365) is a MEDIAN of window diffs —
  an order statistic, not a reduction — so it stays in the host
  segmentation plane (models/cnv.py:263-268) where it is exact.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from delly_tpu.ops.depth_math import window_depth
from delly_tpu.parallel import dispatch


def depth_windows_shard_fn(covsum, expcov, ok, expected_cn=2.0,
                           purity=1.0, ctrl_ploidy=2.0, chr_ploidy=2.0):
    """Per-shard window math + exact cross-mesh tallies.

    covsum: (W,) float64 fragment-count sum per window (integer-valued)
    expcov: (W,) float64 GC-expected coverage per window
    ok:     (W,) bool window passes the callable gates (coral.h naFlag)

    Returns (cn, logr) per window — chr_ploidy / logR 0 for windows
    that are not callable, exactly like the reference's NA fallthrough
    values — plus the psum'd (callable windows, total coverage).
    """
    import jax
    import jax.numpy as jnp

    cn, logr = window_depth(jnp, covsum, jnp.where(ok, expcov, 0.0),
                            expected_cn, purity, ctrl_ploidy, chr_ploidy)
    local = jnp.stack([jnp.sum(ok.astype(jnp.float64)),
                       jnp.sum(jnp.where(ok, covsum, 0.0))])
    tot = jax.lax.psum(local, axis_name="batch")
    tot = jax.lax.psum(tot, axis_name="interval")
    return cn, logr, tot


def make_depth_windows_step(mesh, expected_cn: float = 2.0,
                            purity: float = 1.0,
                            ctrl_ploidy: float = 2.0,
                            chr_ploidy: float = 2.0):
    """Builds the jitted multi-chip read-depth window step over `mesh`."""
    import jax
    from jax.sharding import PartitionSpec as P

    win = P(("interval", "batch"))
    inner = partial(depth_windows_shard_fn, expected_cn=expected_cn,
                    purity=purity, ctrl_ploidy=ctrl_ploidy,
                    chr_ploidy=chr_ploidy)
    if dispatch.spans_processes(mesh):
        # multi-process: every process must be able to read the full
        # window outputs, so gather them back to replicated form
        def body(covsum, expcov, ok):
            cn, logr, tot = inner(covsum, expcov, ok)
            names = ("interval", "batch")
            return (dispatch._gather_tiled(cn, names),
                    dispatch._gather_tiled(logr, names), tot)

        out_specs = (P(), P(), P())
    else:
        body = inner
        out_specs = (win, win, P())
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(win, win, win),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def depth_windows_on_mesh(mesh, covsum, expcov, ok, expected_cn: float,
                          purity: float, ctrl_ploidy: float,
                          chr_ploidy: float):
    """Run the production per-window depth math across `mesh`.

    Pads the window axis to a device multiple (pad windows are not-ok
    no-ops), executes the sharded step in float64, and returns host
    (cn, logr) float64 arrays in window order plus the psum'd
    (callable_windows, coverage_total) tallies.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    covsum = np.asarray(covsum, dtype=np.float64)
    expcov = np.asarray(expcov, dtype=np.float64)
    ok = np.asarray(ok, dtype=bool)
    w = len(covsum)
    ndev = int(mesh.devices.size)
    wp = dispatch.round_up(max(w, 1), ndev)
    if wp != w:
        covsum = np.pad(covsum, (0, wp - w))
        expcov = np.pad(expcov, (0, wp - w))
        ok = np.pad(ok, (0, wp - w))

    fn = dispatch._get_cached(
        mesh,
        ("cnv_depth", float(expected_cn), float(purity),
         float(ctrl_ploidy), float(chr_ploidy)),
        lambda: make_depth_windows_step(mesh, expected_cn, purity,
                                        ctrl_ploidy, chr_ploidy))
    sharding = NamedSharding(mesh, P(("interval", "batch")))
    if dispatch.spans_processes(mesh):
        spec = P(("interval", "batch"))
        put = lambda a: dispatch._as_global(mesh, spec, a)  # noqa: E731
    else:
        put = lambda a: jax.device_put(jnp.asarray(a), sharding)  # noqa: E731
    with jax.enable_x64():
        cn, logr, tot = fn(put(covsum), put(expcov), put(ok))
        cn = np.asarray(cn)[:w]
        logr = np.asarray(logr)[:w]
        tot = np.asarray(tot)
    dispatch.count_hit("cnv_depth")
    return cn, logr, (int(tot[0]), float(tot[1]))
