"""Pallas TPU kernel for batched Myers bit-parallel edit distance.

The whole column loop runs inside one kernel invocation: the Peq bit
planes, target codes and the Pv/Mv carry words stay resident in VMEM for
all N columns, and the batch occupies the (8, 128) VPU register tile so
each word update is a full-width vector op. Grid = batch tiles of 1024
pairs. See ops/myers.py for the algorithm and boundary conventions.
"""

from __future__ import annotations

import os

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


def _make_packed_pipeline(nalpha: int, w: int, m: int, n: int,
                          mode: int, interpret: bool):
    """Jitted pipeline over 2-bit-packed inputs: device-side unpack
    (shift+mask, fused ahead of the kernel) feeding the standard
    pipeline with identity letters — byte-identical distances, 4x
    less host->device transfer (tunnelled-link bound)."""
    import jax
    import jax.numpy as jnp

    inner = _make_pipeline(4, w, m, n, mode, interpret)
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8)

    @jax.jit
    def run(qp, tp, ql, tl):
        def unpack(xp):
            x = (xp[:, :, None] >> jnp.asarray(shifts)[None, None, :])
            return (x & 3).reshape(xp.shape[0], -1).astype(jnp.uint8)

        letters = jnp.arange(4, dtype=jnp.uint8)
        return inner(unpack(qp), unpack(tp), ql, tl, letters)

    return run


def _make_pipeline(nalpha: int, w: int, m: int, n: int, mode: int,
                   interpret: bool):
    """Jitted device pipeline: code lookup -> Peq bit packing -> Myers
    Pallas kernel. The bit packing is a handful of vector compares and a
    weighted reduction, so it runs on-device next to the kernel instead
    of as a host preprocessing pass."""
    import jax
    import jax.numpy as jnp

    kerns = {}
    mpad = w * 32

    @jax.jit
    def run(q, t, ql, tl, letters):
        # q: (Gp, M) uint8 with Gp = g*TILE; t: (Gp, N) uint8
        # letters: (nalpha,) uint8. Compare-select beats a table gather
        # on the VPU.
        gp = q.shape[0]
        g = gp // TILE
        # Interleave several independent tiles per grid step: the Myers
        # word recurrence is a serial dependency chain (ILP ~1 within a
        # tile), so independent chains hide VPU op latency — measured
        # 70 -> 115M pairs/s from T=1 to T=8 at the production batch
        # size. g is a power of two (caller bucketing), so T divides g.
        tiles = min(8, g)
        while g % tiles:  # non-bucketed callers (make_runner)
            tiles //= 2
        if tiles not in kerns:
            kerns[tiles] = _make_pallas(nalpha, w, n, mode, interpret,
                                        tiles)
        kern = kerns[tiles]

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
    # presence-mask alphabet scan: np.unique sorts (~0.3s on the
    # multi-megacell LR batches); a 256-slot scatter is ~10ms
    present = np.zeros(256, dtype=bool)
    present[q.reshape(-1)] = True
    present[t.reshape(-1)] = True
    letters = np.nonzero(present)[0].astype(np.uint8)
    if len(letters) > MAX_ALPHA:
        from delly_tpu.ops import edist
        return edist.batched_edit_distance_rowscan(queries, qlens,
                                                   targets, tlens, mode)
    letters = pad_alphabet(letters)
    nalpha = len(letters)
    w = max(1, (m + 31) // 32)
    ql = np.asarray(qlens, dtype=np.int32)
    tl = np.asarray(tlens, dtype=np.int32)

    # Large-DP regimes (LR genotyping probes: multi-kilobase m AND n)
    # at full flush batch sizes exceed what one pallas program can
    # hold — the compile helper rejects e.g. 16384 x 2048x2048 — so
    # cap per-dispatch cell volume and chunk the batch. ~8e9 cells per
    # dispatch compiles and keeps each dispatch in the multi-ms range.
    cap_cells = int(os.environ.get("DELLY_TPU_DEVICE_MAX_DISPATCH_CELLS",
                                   str(8 << 30)))
    per_pair = max(1, m * n)
    max_b = max(TILE, (cap_cells // per_pair) // TILE * TILE)
    if b > max_b:
        outs = [batched_edit_distance_pallas(
                    q[lo:lo + max_b], ql[lo:lo + max_b],
                    t[lo:lo + max_b], tl[lo:lo + max_b], mode,
                    interpret)
                for lo in range(0, b, max_b)]
        return np.concatenate([np.asarray(o) for o in outs])

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

    # Large-DP pairs move far more cells than bytes (L^2 cells per 2L
    # bytes), but a tunnelled link is H2D-bandwidth-bound — pack DNA
    # to 2 bits/base on the host (4x less transfer) and unpack on
    # device ahead of the kernel. Only engaged for megacell pairs with
    # a <=4-letter alphabet; the small-probe production path is
    # untouched.
    pack2 = nalpha <= 4 and (m * n) >= (1 << 20) and m % 4 == 0
    if pack2:
        lut = np.zeros(256, dtype=np.uint8)
        lut[letters] = np.arange(len(letters), dtype=np.uint8)
        qc = lut[q]
        tc = lut[t]

        def pack(x):
            return (x[:, 0::4] | (x[:, 1::4] << 2) | (x[:, 2::4] << 4)
                    | (x[:, 3::4] << 6))

        key = ("p2", nalpha, w, m, n, mode, interpret)
        if key not in _cache:
            _cache[key] = _make_packed_pipeline(nalpha, w, m, n, mode,
                                                interpret)
        out = _cache[key](jnp.asarray(pack(qc)), jnp.asarray(pack(tc)),
                          jnp.asarray(ql), jnp.asarray(tl))
        out = out[:b]
    else:
        key = (nalpha, w, m, n, mode, interpret)
        if key not in _cache:
            _cache[key] = _make_pipeline(nalpha, w, m, n, mode,
                                         interpret)
        out = _cache[key](jnp.asarray(q), jnp.asarray(t),
                          jnp.asarray(ql), jnp.asarray(tl),
                          jnp.asarray(letters))
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
                 interpret: bool, tiles: int = 1):
    """Each grid step processes `tiles` independent (8,128) pair tiles.
    One Myers chain has ILP ~1 (each word update feeds the next), so a
    single chain leaves the VPU latency-bound; interleaving T chains in
    program order gives the scheduler independent work to overlap."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hin0_pos = 0 if mode == 2 else 1
    big = np.int32(1 << 20)
    T = tiles

    def kernel(peq_ref, tc_ref, qlens_ref, tlens_ref, out_ref,
               pv_ref, mv_ref):
        qls = [qlens_ref[t] for t in range(T)]
        tls = [tlens_ref[t] for t in range(T)]
        hi_word = [(qls[t] - 1) // 32 for t in range(T)]
        hi_bit = [((qls[t] - 1) % 32).astype(jnp.uint32)
                  for t in range(T)]
        one = jnp.uint32(1)

        for t in range(T):
            for wi in range(w):
                pv_ref[t, wi] = jnp.full((8, 128), 0xFFFFFFFF,
                                         dtype=jnp.uint32)
                mv_ref[t, wi] = jnp.zeros((8, 128), dtype=jnp.uint32)

        score0 = tuple(qls)
        if mode == 0:
            res0 = tuple(jnp.where(tls[t] == 0, qls[t], big)
                         for t in range(T))
        else:
            res0 = score0

        def column(j, carry):
            scores, ress = carry
            tcs = [tc_ref[j, t] for t in range(T)]
            hins = [jnp.full((8, 128), hin0_pos, dtype=jnp.int32)
                    for _ in range(T)]
            deltas = [jnp.zeros((8, 128), dtype=jnp.int32)
                      for _ in range(T)]
            for wi in range(w):
                for t in range(T):
                    tc = tcs[t]
                    e = jnp.where(tc == 0, peq_ref[0, wi, t],
                                  jnp.uint32(0))
                    for a in range(1, nalpha):
                        e = jnp.where(tc == a, peq_ref[a, wi, t], e)
                    pv = pv_ref[t, wi]
                    mv = mv_ref[t, wi]
                    hin_neg = (hins[t] < 0).astype(jnp.uint32)
                    hin_pos = (hins[t] > 0).astype(jnp.uint32)
                    xv = e | mv
                    eq2 = e | hin_neg
                    xh = (((eq2 & pv) + pv) ^ pv) | eq2
                    ph = mv | ~(xh | pv)
                    mh = pv & xh
                    hout = ((ph >> 31) & one).astype(jnp.int32) \
                        - ((mh >> 31) & one).astype(jnp.int32)
                    d_here = ((ph >> hi_bit[t]) & one).astype(
                        jnp.int32) \
                        - ((mh >> hi_bit[t]) & one).astype(jnp.int32)
                    deltas[t] = jnp.where(hi_word[t] == wi, d_here,
                                          deltas[t])
                    ph = (ph << 1) | hin_pos
                    mh = (mh << 1) | hin_neg
                    pv_ref[t, wi] = mh | ~(xv | ph)
                    mv_ref[t, wi] = ph & xv
                    hins[t] = hout
            scores = tuple(scores[t] + deltas[t] for t in range(T))
            col = j + 1
            if mode == 0:
                ress = tuple(jnp.where(col == tls[t], scores[t],
                                       ress[t]) for t in range(T))
            else:
                ress = tuple(
                    jnp.where(col <= tls[t],
                              jnp.minimum(ress[t], scores[t]),
                              ress[t]) for t in range(T))
            return scores, ress

        _scores, ress = jax.lax.fori_loop(0, n, column, (score0, res0))
        for t in range(T):
            out_ref[t] = ress[t]

    def call(peq, tcodes, qlens, tlens):
        g = peq.shape[2]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((g, 8, 128), jnp.int32),
            grid=(g // T,),
            in_specs=[
                pl.BlockSpec((nalpha, w, T, 8, 128),
                             lambda i: (0, 0, i, 0, 0)),
                pl.BlockSpec((n, T, 8, 128), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((T, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((T, 8, 128), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((T, 8, 128), lambda i: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((T, w, 8, 128), jnp.uint32),
                pltpu.VMEM((T, w, 8, 128), jnp.uint32),
            ],
            interpret=interpret,
        )(peq, tcodes, qlens, tlens)

    return call
