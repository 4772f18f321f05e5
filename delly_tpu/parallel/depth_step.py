"""Sharded read-depth step: the multi-chip CNV compute core.

One step runs the PRODUCTION per-window read-depth math
(ops/depth_math.py — the same functions models/coral.py uses for its
window logR/CN output and bolog.h CN likelihoods) over a window axis
sharded across the device mesh:

  1. (W,) per-window fragment-count sums + mean-GC + uniq fractions,
     sharded over the full mesh,
  2. expected coverage via GC-bias curve gather (101-bin curve is
     replicated; the gather stays on-device),
  3. purity/ploidy-adjusted CN + log2 ratio per window
     (coral.h:296-414),
  4. CN0..CN9 Gaussian log10-likelihoods per window (bolog.h:88-133),
  5. the global MAD-of-diffs noise proxy combined across the mesh with
     psum (replaces the host-side estimate feeding the PELT penalty,
     cnv.h:357-368).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from delly_tpu.ops.depth_math import cn_log10_likelihoods, window_depth

MAX_CN = 10


def depth_shard_fn(covsum, gcfrac, uniqfrac, valid, gc_curve,
                   expected_cn=2.0, purity=1.0, ctrl_ploidy=2.0,
                   chr_ploidy=2.0, sd_frac=0.15):
    """Per-shard window math + cross-mesh psum of the noise stats.

    covsum:  (W,) float32 fragment-count sum per window
    gcfrac:  (W,) float32 mean GC fraction per window (0..1)
    uniqfrac:(W,) float32 unique-coverage fraction per window
    valid:   (W,) bool callable-window mask
    gc_curve:(101,) float32 expected coverage per GC percent (replicated)
    """
    gc_bin = jnp.clip((gcfrac * 100.0).astype(jnp.int32), 0, 100)
    expcov = gc_curve[gc_bin]
    ok = valid & (expcov > 0) & (uniqfrac > 0.8)
    cn, logr = window_depth(jnp, covsum, jnp.where(ok, expcov, 0.0),
                            expected_cn, purity, ctrl_ploidy, chr_ploidy)
    sd = jnp.maximum(sd_frac * jnp.where(ok, cn, chr_ploidy), 0.025)
    cnl = cn_log10_likelihoods(
        jnp, jnp.where(ok, cn, chr_ploidy).astype(jnp.float32),
        sd.astype(jnp.float32), MAX_CN)
    best_cn = jnp.argmax(cnl, axis=1).astype(jnp.int32)

    # Mesh-wide noise proxy: sum |logr[i+1] - logr[i]| within the shard,
    # psum across devices (cnv.h:357-365 MAD-of-diffs estimate).
    d = jnp.abs(jnp.diff(jnp.where(ok, logr, 0.0)))
    pair_ok = ok[1:] & ok[:-1]
    local = jnp.stack([jnp.sum(jnp.where(pair_ok, d, 0.0)),
                       jnp.sum(pair_ok.astype(jnp.float32))])
    tot = jax.lax.psum(local, axis_name="batch")
    tot = jax.lax.psum(tot, axis_name="interval")
    noise = tot[0] / jnp.maximum(tot[1], 1.0)
    return logr, cn, cnl, best_cn, noise


def make_sharded_depth_step(mesh, expected_cn: float = 2.0,
                            purity: float = 1.0,
                            ctrl_ploidy: float = 2.0,
                            chr_ploidy: float = 2.0):
    """Builds the jitted multi-chip read-depth step over ``mesh``."""
    win = P(("interval", "batch"))
    fn = jax.shard_map(
        partial(depth_shard_fn, expected_cn=expected_cn, purity=purity,
                ctrl_ploidy=ctrl_ploidy, chr_ploidy=chr_ploidy),
        mesh=mesh,
        in_specs=(win, win, win, win, P()),
        out_specs=(win, win, win, win, P()),
    )
    return jax.jit(fn)


def sharded_depth_inputs(rng, mesh, per_device: int):
    """Synth window inputs with the right shapes/shardings."""
    n_dev = mesh.devices.size
    W = per_device * n_dev
    covsum = rng.gamma(20.0, 8.0, size=W).astype(np.float32)
    gcfrac = rng.uniform(0.3, 0.6, size=W).astype(np.float32)
    uniqfrac = rng.uniform(0.85, 1.0, size=W).astype(np.float32)
    valid = np.ones(W, dtype=bool)
    gc_curve = np.full(101, 160.0, dtype=np.float32)
    sharding = NamedSharding(mesh, P(("interval", "batch")))
    rep = NamedSharding(mesh, P())
    return (jax.device_put(covsum, sharding),
            jax.device_put(gcfrac, sharding),
            jax.device_put(uniqfrac, sharding),
            jax.device_put(valid, sharding),
            jax.device_put(gc_curve, rep))
