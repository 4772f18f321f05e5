"""Pallas TPU kernel for batched Myers bit-parallel edit distance.

The whole column loop runs inside one kernel invocation: the Peq bit
planes, target codes and the Pv/Mv carry words stay resident in VMEM for
all N columns, and the batch occupies the (8, 128) VPU register tile so
each word update is a full-width vector op. Grid = batch tiles of 1024
pairs. See ops/myers.py for the algorithm and boundary conventions.
"""

from __future__ import annotations

import numpy as np

from delly_tpu.ops.myers import MAX_ALPHA

TILE = 1024  # 8 sublanes x 128 lanes


def pad_alphabet(letters):
    """Bucket the alphabet to 4/8/16 letters by repeating the first
    letter. nalpha is a static compile key, and data-derived alphabets
    (IUPAC codes appearing in some consensus probes but not others)
    would otherwise force a fresh pipeline compile per batch — ruinous
    on slow-compile links. Duplicate letters are harmless: queries and
    targets are coded by the same last-match loop, so a duplicate's
    plane is consistent between both sides."""
    import numpy as np
    for b in (4, 8, 16):
        if len(letters) <= b:
            if len(letters) < b:
                pad = np.full(b - len(letters), letters[0],
                              dtype=letters.dtype)
                letters = np.concatenate([letters, pad])
            return letters
    return letters


_cache = {}


def _make_pipeline(nalpha: int, w: int, m: int, n: int, mode: int,
                   interpret: bool):
    """Jitted device pipeline: code lookup -> Peq bit packing -> Myers
    Pallas kernel. The bit packing is a handful of vector compares and a
    weighted reduction, so it runs on-device next to the kernel instead
    of as a host preprocessing pass."""
    import jax
    import jax.numpy as jnp

    kern = _make_pallas(nalpha, w, n, mode, interpret)
    mpad = w * 32

    @jax.jit
    def run(q, t, ql, tl, letters):
        # q: (Gp, M) uint8 with Gp = g*TILE; t: (Gp, N) uint8
        # letters: (nalpha,) uint8. Compare-select beats a table gather
        # on the VPU.
        gp = q.shape[0]
        g = gp // TILE

        def codes_of(x):
            c = jnp.full(x.shape, nalpha, dtype=jnp.int32)
            for a in range(nalpha):
                c = jnp.where(x == letters[a], jnp.int32(a), c)
            return c

        qcodes = codes_of(q)  # (Gp, M)
        tcodes = codes_of(t)  # (Gp, N)
        valid = (jnp.arange(m, dtype=jnp.int32)[None, :]
                 < ql[:, None])  # (Gp, M)
        qc = jnp.where(valid, qcodes, jnp.int32(-1))
        qc = jnp.pad(qc, ((0, 0), (0, mpad - m)),
                     constant_values=-1)  # (Gp, mpad)
        qc = qc.reshape(gp, w, 32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        planes = []
        for a in range(nalpha):
            bits = (qc == a).astype(jnp.uint32)  # (Gp, w, 32)
            planes.append((bits * weights[None, None, :]).sum(
                axis=-1, dtype=jnp.uint32))  # (Gp, w)
        peq = jnp.stack(planes)  # (nalpha, Gp, w)
        peq5 = peq.transpose(0, 2, 1).reshape(nalpha, w, g, 8, 128)
        tc4 = tcodes.T.reshape(n, g, 8, 128)
        ql3 = ql.reshape(g, 8, 128)
        tl3 = tl.reshape(g, 8, 128)
        out = kern(peq5, tc4, ql3, tl3)
        return out.reshape(gp)

    return run


def batched_edit_distance_pallas(queries, qlens, targets, tlens,
                                 mode: int = 0, interpret: bool = False):
    """Batched Myers edit distance via the Pallas TPU kernel.
    Same contract as ops.edist.batched_edit_distance. Pads the batch to
    a multiple of 1024; the packing runs on-device."""
    import jax.numpy as jnp

    q = np.ascontiguousarray(np.asarray(queries), dtype=np.uint8)
    t = np.ascontiguousarray(np.asarray(targets), dtype=np.uint8)
    b, m = q.shape
    n = t.shape[1]
    letters = np.union1d(np.unique(q), np.unique(t))
    if len(letters) > MAX_ALPHA:
        from delly_tpu.ops import edist
        return edist.batched_edit_distance_rowscan(queries, qlens,
                                                   targets, tlens, mode)
    letters = pad_alphabet(letters)
    nalpha = len(letters)
    w = max(1, (m + 31) // 32)
    ql = np.asarray(qlens, dtype=np.int32)
    tl = np.asarray(tlens, dtype=np.int32)
    g = -(-b // TILE)
    # Bucket the tile count to a power of two: the pipeline is jitted,
    # so every distinct padded batch shape is a fresh XLA compile.
    # Power-of-two grids bound the traced shapes per pipeline to
    # log2(max_g) at a worst-case 2x row padding (cheap next to a
    # compile on slow links).
    g2 = 1
    while g2 < g:
        g2 *= 2
    pad = g2 * TILE - b
    if pad:
        q = np.pad(q, ((0, pad), (0, 0)))
        t = np.pad(t, ((0, pad), (0, 0)))
        ql = np.pad(ql, (0, pad), constant_values=1)
        tl = np.pad(tl, (0, pad))

    key = (nalpha, w, m, n, mode, interpret)
    if key not in _cache:
        _cache[key] = _make_pipeline(nalpha, w, m, n, mode, interpret)
    out = _cache[key](jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                      jnp.asarray(tl), jnp.asarray(letters))
    out = out[:b]
    # empty queries analytically (the kernel's qlen-1 readout assumes
    # qlen >= 1); NW = tlen, SHW/HW = 0 — matches the host core
    qla = np.asarray(qlens)[:b]
    if (qla == 0).any():
        out = np.asarray(out).copy()
        empty = qla == 0
        out[empty] = np.where(mode == 0,
                              np.asarray(tlens)[:b][empty], 0)
    return out


def make_runner(m: int, n: int, nalpha: int, mode: int,
                interpret: bool = False):
    """Jitted fixed-shape pipeline for device-resident inputs
    (benchmarks / streaming callers that pre-stage batches). The batch
    size must be a multiple of TILE. Call as
    run(q, t, qlens, tlens, letters)."""
    w = max(1, (m + 31) // 32)
    key = (nalpha, w, m, n, mode, interpret)
    if key not in _cache:
        _cache[key] = _make_pipeline(nalpha, w, m, n, mode, interpret)
    return _cache[key]


def _make_pallas(nalpha: int, w: int, n: int, mode: int,
                 interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hin0_pos = 0 if mode == 2 else 1
    big = np.int32(1 << 20)

    def kernel(peq_ref, tc_ref, qlens_ref, tlens_ref, out_ref,
               pv_ref, mv_ref):
        qlens = qlens_ref[0]
        tlens = tlens_ref[0]
        hi_word = (qlens - 1) // 32
        hi_bit = ((qlens - 1) % 32).astype(jnp.uint32)
        one = jnp.uint32(1)

        for wi in range(w):
            pv_ref[wi] = jnp.full((8, 128), 0xFFFFFFFF, dtype=jnp.uint32)
            mv_ref[wi] = jnp.zeros((8, 128), dtype=jnp.uint32)

        score0 = qlens
        if mode == 0:
            res0 = jnp.where(tlens == 0, score0, big)
        else:
            res0 = score0

        def column(j, carry):
            score, res = carry
            tc = tc_ref[j, 0]
            hin = jnp.full((8, 128), hin0_pos, dtype=jnp.int32)
            delta = jnp.zeros((8, 128), dtype=jnp.int32)
            for wi in range(w):
                e = jnp.where(tc == 0, peq_ref[0, wi, 0],
                              jnp.uint32(0))
                for a in range(1, nalpha):
                    e = jnp.where(tc == a, peq_ref[a, wi, 0], e)
                pv = pv_ref[wi]
                mv = mv_ref[wi]
                hin_neg = (hin < 0).astype(jnp.uint32)
                hin_pos = (hin > 0).astype(jnp.uint32)
                xv = e | mv
                eq2 = e | hin_neg
                xh = (((eq2 & pv) + pv) ^ pv) | eq2
                ph = mv | ~(xh | pv)
                mh = pv & xh
                hout = ((ph >> 31) & one).astype(jnp.int32) \
                    - ((mh >> 31) & one).astype(jnp.int32)
                d_here = ((ph >> hi_bit) & one).astype(jnp.int32) \
                    - ((mh >> hi_bit) & one).astype(jnp.int32)
                delta = jnp.where(hi_word == wi, d_here, delta)
                ph = (ph << 1) | hin_pos
                mh = (mh << 1) | hin_neg
                pv_ref[wi] = mh | ~(xv | ph)
                mv_ref[wi] = ph & xv
                hin = hout
            score = score + delta
            col = j + 1
            if mode == 0:
                res = jnp.where(col == tlens, score, res)
            else:
                res = jnp.where(col <= tlens, jnp.minimum(res, score),
                                res)
            return score, res

        _score, res = jax.lax.fori_loop(0, n, column, (score0, res0))
        out_ref[0] = res

    def call(peq, tcodes, qlens, tlens):
        g = peq.shape[2]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((g, 8, 128), jnp.int32),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((nalpha, w, 1, 8, 128),
                             lambda i: (0, 0, i, 0, 0)),
                pl.BlockSpec((n, 1, 8, 128), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((w, 8, 128), jnp.uint32),
                pltpu.VMEM((w, 8, 128), jnp.uint32),
            ],
            interpret=interpret,
        )(peq, tcodes, qlens, tlens)

    return call
