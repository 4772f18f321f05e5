"""Sharded genotyping step: the multi-chip compute core.

One "step" mirrors one batch of the reference's genotyping hot loop
(coverage.h:412-454) scaled across a device mesh:

  1. a (B, M) batch of probe pairs and (B, N) read windows, sharded over the
     full mesh (interval x batch axes both act data-parallel on reads),
  2. per-pair infix (HW) edit distances on each device,
  3. REF/ALT vote + phred-quality conversion,
  4. per-SV allele tallies combined across the whole mesh with psum
     (the ICI/DCN collective that replaces the reference's shared-memory
     count maps).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P



def _edist_hw_rows(queries, qlens, targets, tlens):
    """(B,M) x (B,N) -> (B,) HW edit distance. Same row-scan as
    ops.edist.batched_edit_distance, inlined for shard_map."""
    B, M = queries.shape
    N = targets.shape[1]
    BIG = jnp.int32(1 << 20)
    jpos = jnp.arange(1, N + 1, dtype=jnp.int32)
    col_valid = jpos[None, :] <= tlens[:, None]
    colmask = jnp.arange(N + 1)[None, :] <= tlens[:, None]
    row0 = jnp.where(colmask, 0, BIG).astype(jnp.int32)

    def step(prev, qi_i):
        qi, i = qi_i
        active = i <= qlens
        sub = (qi[:, None] != targets).astype(jnp.int32)
        cand = jnp.minimum(prev[:, :-1] + sub, prev[:, 1:] + 1)
        cand = jnp.where(col_valid, cand, BIG)
        head = jnp.broadcast_to(i[None].astype(jnp.int32), (B, 1))
        shifted = jnp.concatenate([head, cand - jpos[None, :]], axis=1)
        run = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
        body = jnp.minimum(cand, run[:, 1:] + jpos[None, :])
        newrow = jnp.concatenate(
            [jnp.full((B, 1), i, dtype=jnp.int32), body], axis=1)
        newrow = jnp.where(colmask, newrow, BIG)
        newrow = jnp.where(active[:, None], newrow, prev)
        return newrow, None

    rows = jnp.arange(1, M + 1, dtype=jnp.int32)
    final, _ = jax.lax.scan(step, row0, (queries.T, rows))
    return jnp.min(jnp.where(colmask, final, BIG), axis=1)


def genotype_shard_fn(cons_q, cons_l, ref_q, ref_l, reads, read_l, sv_ids,
                      quals, valid, n_svs, flank_quality=0.95):
    """Per-shard genotyping compute + cross-mesh psum of tallies."""
    d_alt = _edist_hw_rows(cons_q, cons_l, reads, read_l)
    d_ref = _edist_hw_rows(ref_q, ref_l, reads, read_l)
    k_alt = (2.0 * flank_quality * cons_l).astype(jnp.int32)
    k_ref = (2.0 * flank_quality * ref_l).astype(jnp.int32)
    score_alt = jnp.where(
        d_alt <= k_alt,
        ((1.0 - flank_quality) * cons_l) / (d_alt + 1.0), 0.0)
    score_ref = jnp.where(
        d_ref <= k_ref,
        ((1.0 - flank_quality) * ref_l) / (d_ref + 1.0), 0.0)
    informative = ((score_ref > 0.7) | (score_alt > 0.7)) & valid
    is_alt = informative & (score_alt >= score_ref)
    is_ref = informative & ~is_alt
    q_alt = jnp.minimum(jnp.minimum((score_alt * 35).astype(jnp.int32),
                                    quals), 255)
    q_ref = jnp.minimum(jnp.minimum((score_ref * 35).astype(jnp.int32),
                                    quals), 255)
    seg = partial(jax.ops.segment_sum, num_segments=n_svs)
    alt_count = seg(is_alt.astype(jnp.int32), sv_ids)
    ref_count = seg(is_ref.astype(jnp.int32), sv_ids)
    alt_qsum = seg(jnp.where(is_alt, q_alt, 0), sv_ids)
    ref_qsum = seg(jnp.where(is_ref, q_ref, 0), sv_ids)
    tallies = jnp.stack([ref_count, alt_count, ref_qsum, alt_qsum])
    # Combine across the full mesh (ICI collectives).
    tallies = jax.lax.psum(tallies, axis_name="batch")
    tallies = jax.lax.psum(tallies, axis_name="interval")
    return tallies


def make_sharded_genotype_step(mesh, n_svs: int, flank_quality: float = 0.95):
    """Builds the jitted multi-chip genotype step over ``mesh``."""
    data = P(("interval", "batch"))
    fn = jax.shard_map(
        partial(genotype_shard_fn, n_svs=n_svs, flank_quality=flank_quality),
        mesh=mesh,
        in_specs=(data, data, data, data, data, data, data, data, data),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_genotype_inputs(rng, mesh, per_device: int, m: int, n: int,
                            n_svs: int):
    """Synth inputs with the right shapes/shardings for the step."""
    n_dev = mesh.devices.size
    B = per_device * n_dev
    reads = rng.integers(65, 85, size=(B, n), dtype=np.uint8)
    cons = rng.integers(65, 85, size=(B, m), dtype=np.uint8)
    refq = rng.integers(65, 85, size=(B, m), dtype=np.uint8)
    cons_l = np.full(B, m, dtype=np.int32)
    ref_l = np.full(B, m, dtype=np.int32)
    read_l = np.full(B, n, dtype=np.int32)
    sv_ids = rng.integers(0, n_svs, size=B).astype(np.int32)
    quals = rng.integers(10, 60, size=B).astype(np.int32)
    valid = np.ones(B, dtype=bool)
    sharding = NamedSharding(mesh, P(("interval", "batch")))
    args = (cons, cons_l, refq, ref_l, reads, read_l, sv_ids, quals, valid)
    return tuple(jax.device_put(a, sharding) for a in args)
