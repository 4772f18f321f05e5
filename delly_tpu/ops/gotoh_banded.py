"""Banded (corridor) affine-gap Gotoh for long sequences, host + TPU.

SURVEY §5 "long-context banded device DP": the full-matrix Pallas
kernel (ops/gotoh_pallas.py) serves dimensions up to MAX_K=4096; very
long consensus/reference alignments need O(m·band) work instead of
O(m·n). This module defines a corridor DP whose semantics are shared
bit-for-bit between the numpy oracle and the Pallas kernel:

- corridor: DP row r covers columns [off(r), off(r)+B), with
  off(r) = floor128(max(0, r*n//m - B//2)) — the 128-lane
  quantization makes consecutive-row shifts delta(r) in {0, 128},
  which the kernel resolves with two static lane shifts and an
  elementwise select (no per-sublane dynamic slicing);
- cells outside the corridor are -INF (unreachable); when the band
  covers the whole matrix the result equals the full Gotoh exactly
  (asserted by tests);
- scoring/boundaries/traceback mirror ops/gotoh.py (reference
  gotoh.h:71-174, align.h:45-73) restricted to the corridor; the
  per-row equality windows are gathered host-side so the kernel
  streams an (m x B) int8 tile and never performs dynamic slicing.

Requires n <= m (the batch wrapper transposes, swapping h/v trace
codes and the merged row order) and band >= 256.
"""

from __future__ import annotations

import numpy as np

from delly_tpu.ops.gotoh import (
    DnaScore, GAP, INF, create_alignment_codes, to_align,
)

TILE_B = 8
ROWS_BLK = 32
ROWS_BLK_INTERP = 8
QUANT = 128
NINF = -INF


def corridor_offsets(m: int, n: int, band: int) -> np.ndarray:
    """off(r) for DP rows r = 0..m (host/kernel shared schedule)."""
    r = np.arange(m + 1, dtype=np.int64)
    raw = np.maximum(0, (r * n) // m - band // 2)
    return (raw - raw % QUANT).astype(np.int64)


def _seq_codes(a: np.ndarray) -> np.ndarray:
    return a[0]


def gotoh_banded_host(a1, a2, ac=(False, False),
                      sc: DnaScore | None = None, band: int = 512):
    """Corridor Gotoh on the host: O(m*band) memory/time. Single-row
    alignments only (sequence x sequence). Returns (score, merged)."""
    sc = sc or DnaScore()
    a1 = to_align(a1)
    a2 = to_align(a2)
    assert a1.shape[0] == 1 and a2.shape[0] == 1
    m, n = a1.shape[1], a2.shape[1]
    assert 1 <= n <= m and band >= 256
    s1, s2 = _seq_codes(a1), _seq_codes(a2)
    B = band
    off = corridor_offsets(m, n, B)
    GO, GE = sc.go, sc.ge
    hfree, vfree = bool(ac[0]), bool(ac[1])

    k = np.arange(B, dtype=np.int64)
    # rolling previous row for S/V (only r-1 is ever read); the bits
    # tile is the only O(m*band) state, as the traceback needs it
    bits = np.zeros((m + 1, B), dtype=np.uint8)

    col0 = off[0] + k            # off[0] == 0
    in0 = col0 <= n
    S_prev = np.where(in0, 0 if hfree else GO + col0 * GE,
                      np.int64(NINF))
    S_prev[0] = 0
    V_prev = np.full(B, NINF, dtype=np.int64)
    for r in range(1, m + 1):
        d = int(off[r] - off[r - 1])
        col = off[r] + k
        inb = col <= n
        # previous-row values shifted into this row's band coords
        def shift(prev, by):
            if by == 0:
                return prev
            out = np.full(B, NINF, dtype=np.int64)
            if by > 0:
                out[: B - by] = prev[by:]
            else:
                out[-by:] = prev[:by]
            return out
        S_up = shift(S_prev, d)        # (r-1, col)
        V_up = shift(V_prev, d)
        S_diag = shift(S_prev, d - 1)  # (r-1, col-1)

        if vfree:
            vg_open = np.where(col == n, 0, GO + GE)
            vg_ext = np.where(col == n, 0, GE)
        else:
            vg_open = np.full(B, GO + GE, dtype=np.int64)
            vg_ext = np.full(B, GE, dtype=np.int64)
        row_free = hfree and r == m
        O = 0 if row_free else GO + GE
        E = 0 if row_free else GE

        V_body = np.maximum(S_up + vg_open, V_up + vg_ext)
        score = np.where(s1[r - 1] == s2[np.clip(col - 1, 0, n - 1)],
                         sc.match, sc.mismatch)
        t = np.maximum(S_diag + score, V_body)
        s_col0 = 0 if vfree else GO + r * GE
        t_seed = np.where(col == 0, s_col0, t)
        zin = np.concatenate(([NINF], (t_seed - col * E)[:-1]))
        zmax = np.maximum.accumulate(zin)
        H_body = zmax + (col - 1) * E + O
        H_body = np.maximum(H_body, NINF)
        S_body = np.maximum(t, H_body)
        H_prev = np.concatenate(([NINF], H_body[:-1]))
        V_up_ext = V_up + vg_ext
        b = ((S_body == H_body).astype(np.uint8)
             | ((S_body == V_body).astype(np.uint8) << 1)
             | ((H_body != H_prev + E).astype(np.uint8) << 2)
             | ((V_body != V_up_ext).astype(np.uint8) << 3))
        # column-0 boundary (only while the corridor still covers it)
        S_body = np.where(col == 0, s_col0, S_body)
        V_body = np.where(col == 0, s_col0, V_body)
        S_body = np.where(inb, S_body, NINF)
        S_prev, V_prev = S_body, V_body
        bits[r] = b

    slot_n = n - int(off[m])
    best = int(S_prev[slot_n])
    codes = _walk_bits(bits, off, m, n)
    merged = create_alignment_codes(codes, a1, a2)
    return best, merged


def _walk_bits(bits: np.ndarray, off: np.ndarray, m: int, n: int):
    """Host traceback over band-coordinate bits (gotoh.h:134-174
    preference order). Returns forward-order int codes 0=s,1=h,2=v."""
    out = []
    row, col = m, n
    last = 0
    while row > 0 or col > 0:
        slot = col - int(off[row]) if row > 0 else col
        b = int(bits[row, slot]) if (row > 0 and 0 <= slot < bits.shape[1]) else 0
        bSH, bSV = b & 1, b & 2
        bHO, bVO = b & 4, b & 8
        if last == 0:
            if row == 0 and col > 0:
                last = 1
            elif col == 0 and row > 0:
                last = 2
            elif bSH:
                last = 1
            elif bSV:
                last = 2
            else:
                row -= 1
                col -= 1
                out.append(0)
        elif last == 1:
            opened = (col == 1) if row == 0 else bHO
            if opened:
                last = 0
            col -= 1
            out.append(1)
        else:
            opened = (row == 1) if col == 0 else bVO
            if opened:
                last = 0
            row -= 1
            out.append(2)
    return np.asarray(out[::-1], dtype=np.int64)


# --------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------

_cache = {}
_tb_cache = {}


def _bucket(x: int, base: int) -> int:
    b = base
    while b < x:
        b *= 2
    return b


def _build(M: int, B: int, hfree: bool, vfree: bool, sc: DnaScore,
           interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    GO, GE = int(sc.go), int(sc.ge)
    MATCH, MISMATCH = int(sc.match), int(sc.mismatch)
    RB = ROWS_BLK_INTERP if interpret else ROWS_BLK
    nblk = M // RB

    def kernel(eqw_ref, mlen_ref, nlen_ref, best_ref, bits_ref,
               sS_ref, sV_ref):
        r_blk = pl.program_id(1)
        slot = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, B), 1)
        mlen = mlen_ref[0][:, :1]
        nlen = nlen_ref[0][:, :1]

        def off_of(r):
            raw = jnp.maximum(0, (r * nlen) // mlen - B // 2)
            return raw - raw % QUANT          # (TILE_B, 1)

        @pl.when(r_blk == 0)
        def _():
            col0 = slot                        # off(0) == 0
            s0 = jnp.zeros((TILE_B, B), jnp.int32) if hfree \
                else jnp.int32(GO) + col0 * GE
            s0 = jnp.where(slot == 0, 0, s0)
            sS_ref[:] = jnp.where(col0 <= nlen, s0, NINF)
            sV_ref[:] = jnp.full((TILE_B, B), NINF, jnp.int32)
            best_ref[0] = jnp.full((TILE_B, 128), NINF, jnp.int32)

        packed = jnp.zeros((TILE_B, B), jnp.int32)
        base = r_blk * RB

        for rr in range(RB):
            r = base + rr + 1
            off_r = off_of(jnp.int32(r))
            d128 = off_r - off_of(jnp.int32(r - 1))   # 0 or 128
            col = off_r + slot

            S_prev = sS_ref[:]
            V_prev = sV_ref[:]

            def sh(arr, by):
                # static left-shift of band slots by `by` lanes
                if by == 0:
                    return arr
                pad = jnp.full((TILE_B, by), NINF, jnp.int32)
                return jnp.concatenate([arr[:, by:], pad], axis=1)

            def shr(arr):
                # right-shift by one lane (diag with delta == 0)
                pad = jnp.full((TILE_B, 1), NINF, jnp.int32)
                return jnp.concatenate([pad, arr[:, :-1]], axis=1)

            take128 = d128 > 0                # (TILE_B, 1) broadcast
            S_up = jnp.where(take128, sh(S_prev, QUANT), S_prev)
            V_up = jnp.where(take128, sh(V_prev, QUANT), V_prev)
            S_diag = jnp.where(take128, sh(S_prev, QUANT - 1),
                               shr(S_prev))

            if vfree:
                at_n = col == nlen
                vg_open = jnp.where(at_n, 0, GO + GE)
                vg_ext = jnp.where(at_n, 0, GE)
            else:
                vg_open = jnp.full((TILE_B, B), GO + GE, jnp.int32)
                vg_ext = jnp.full((TILE_B, B), GE, jnp.int32)
            if hfree:
                row_free = r == mlen
                O = jnp.where(row_free, 0, GO + GE)
                E = jnp.where(row_free, 0, GE)
            else:
                O = jnp.full((TILE_B, 1), GO + GE, jnp.int32)
                E = jnp.full((TILE_B, 1), GE, jnp.int32)

            V_body = jnp.maximum(S_up + vg_open, V_up + vg_ext)
            if rr % 8 == 0:
                eq8 = eqw_ref[0, rr // 8].astype(jnp.int32)
            score = jnp.where(((eq8 >> (rr % 8)) & 1) != 0,
                              MATCH, MISMATCH)
            t = jnp.maximum(S_diag + score, V_body)
            s_col0 = jnp.int32(0) if vfree else jnp.int32(GO) + r * GE
            t_seed = jnp.where(col == 0, s_col0, t)
            zin = jnp.concatenate(
                [jnp.full((TILE_B, 1), NINF, jnp.int32),
                 (t_seed - col * E)[:, :-1]], axis=1)
            s = 1
            while s < B:
                shp = jnp.concatenate(
                    [jnp.full((TILE_B, s), NINF, jnp.int32),
                     zin[:, :-s]], axis=1)
                zin = jnp.maximum(zin, shp)
                s *= 2
            H_body = jnp.maximum(zin + (col - 1) * E + O, NINF)
            S_body = jnp.maximum(t, H_body)
            H_prev = jnp.concatenate(
                [jnp.full((TILE_B, 1), NINF, jnp.int32),
                 H_body[:, :-1]], axis=1)
            b = ((S_body == H_body).astype(jnp.int32)
                 | (S_body == V_body).astype(jnp.int32) * 2
                 | (H_body != H_prev + E).astype(jnp.int32) * 4
                 | (V_body != V_up + vg_ext).astype(jnp.int32) * 8)
            packed = packed | (b << (8 * (rr % 4)))
            if rr % 4 == 3:
                bits_ref[0, rr // 4] = packed
                packed = jnp.zeros((TILE_B, B), jnp.int32)

            S_body = jnp.where(col == 0, s_col0, S_body)
            V_body = jnp.where(col == 0, s_col0, V_body)
            S_body = jnp.where(col <= nlen, S_body, NINF)

            at_end = jnp.max(jnp.where(col == nlen, S_body, NINF),
                             axis=1, keepdims=True)
            best_ref[0] = jnp.where(r == mlen, at_end, best_ref[0])
            sS_ref[:] = S_body
            sV_ref[:] = V_body

    def call(eqw, ml, nl):
        g = eqw.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((g, TILE_B, 128), jnp.int32),
                jax.ShapeDtypeStruct((g, M // 4, TILE_B, B), jnp.int32),
            ),
            grid=(g, nblk),
            in_specs=[
                pl.BlockSpec((1, RB // 8, TILE_B, B),
                             lambda i, r: (i, r, 0, 0)),
                pl.BlockSpec((1, TILE_B, 128), lambda i, r: (i, 0, 0)),
                pl.BlockSpec((1, TILE_B, 128), lambda i, r: (i, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, TILE_B, 128), lambda i, r: (i, 0, 0)),
                pl.BlockSpec((1, RB // 4, TILE_B, B),
                             lambda i, r: (i, r, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((TILE_B, B), jnp.int32),
                pltpu.VMEM((TILE_B, B), jnp.int32),
            ],
            interpret=interpret,
        )(eqw, ml, nl)

    return jax.jit(call)


def _build_tb(M: int, B: int):
    """On-device traceback over band-coordinate bits; the corridor
    offset is recomputed per step from (mlen, nlen)."""
    import jax
    import jax.numpy as jnp

    L = 2 * M + 2
    CAP = 4 * M + 8

    def tb_one(bits_p, m, n):
        def off_of(r):
            raw = jnp.maximum(0, (r * n) // jnp.maximum(m, 1) - B // 2)
            return raw - raw % QUANT

        def get_b(row, col):
            slot = jnp.clip(col - off_of(row), 0, B - 1)
            r = jnp.clip(row - 1, 0, M - 1)
            w = bits_p[r // 4, slot]
            return (w >> (8 * (r % 4))) & 0xFF

        def cond(st):
            row, col, last, i, it, codes = st
            return ((row > 0) | (col > 0)) & (it < CAP)

        def body(st):
            row, col, last, i, it, codes = st
            b = get_b(row, col)
            bSH = (b & 1) != 0
            bSV = (b & 2) != 0
            bHO = (b & 4) != 0
            bVO = (b & 8) != 0
            interior = (row > 0) & (col > 0)
            is_s = last == 0
            is_h = last == 1
            go_h = ((row == 0) & (col > 0)) | (interior & bSH)
            go_v = (~go_h) & (((col == 0) & (row > 0)) | (interior & bSV))
            s_move = is_s & ~go_h & ~go_v
            h_opened = jnp.where(row == 0, col == 1, bHO)
            v_opened = jnp.where(col == 0, row == 1, bVO)
            new_last = jnp.where(
                is_s,
                jnp.where(go_h, 1, jnp.where(go_v, 2, 0)),
                jnp.where(is_h,
                          jnp.where(h_opened, 0, 1),
                          jnp.where(v_opened, 0, 2))).astype(jnp.int32)
            emit = s_move | is_h | (last == 2)
            code = jnp.where(s_move, 0, jnp.where(is_h, 1, 2))
            dec_r = (s_move | (last == 2)).astype(jnp.int32)
            dec_c = (s_move | is_h).astype(jnp.int32)
            codes = codes.at[i].set(
                jnp.where(emit, code, codes[i]).astype(jnp.int8))
            return (jnp.maximum(row - dec_r, 0),
                    jnp.maximum(col - dec_c, 0), new_last,
                    i + emit.astype(jnp.int32), it + 1, codes)

        _, _, _, i, _, codes = jax.lax.while_loop(
            cond, body,
            (m, n, jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.zeros((L,), jnp.int8)))
        return codes, i

    import jax

    @jax.jit
    def run(bits, m_flat, n_flat):
        g = bits.shape[0]
        bp = jax.numpy.transpose(bits, (0, 2, 1, 3)).reshape(
            (g * TILE_B, M // 4, B))
        return jax.vmap(tb_one)(bp, m_flat, n_flat)

    return run


_ALLOWED = frozenset(b"ACGTN-")  # uppercase only: the host pure-pair path
# scores raw bytes, so case-folded device profiles would diverge on
# soft-masked (lowercase) input; those fall back to the host oracle


def gotoh_banded_batch(jobs, ac=(False, False),
                       sc: DnaScore | None = None, band: int = 512,
                       interpret: bool = False, max_m: int = 32768):
    """Batched corridor Gotoh on device — bit-identical to
    gotoh_banded_host per job. Sequence x sequence jobs only; a job
    with n > m is transposed (trace codes and merged rows swapped).
    Oversized/exotic jobs fall back to the host oracle."""
    sc = sc or DnaScore()
    prep = []
    for a1, a2 in jobs:
        a1, a2 = to_align(a1), to_align(a2)
        swap = a2.shape[1] > a1.shape[1]
        prep.append((a2, a1, True) if swap else (a1, a2, False))
    results = [None] * len(jobs)
    by_bucket = {}
    for idx, (a1, a2, swap) in enumerate(prep):
        m, n = a1.shape[1], a2.shape[1]
        eac = (ac[1], ac[0]) if swap else ac
        if a1.shape[0] != 1 or a2.shape[0] != 1 or n < 1:
            # shapes the corridor oracle does not serve (multi-row
            # profiles, empty sequence): exact full Gotoh
            from delly_tpu.ops.gotoh import gotoh as _gotoh_full
            best, merged = _gotoh_full(a1, a2, ac=eac, sc=sc)
            results[idx] = _unswap(best, merged, a1, a2, swap)
            continue
        if (m > max_m
                or not _ALLOWED.issuperset(a1.tobytes())
                or not _ALLOWED.issuperset(a2.tobytes())):
            best, merged = gotoh_banded_host(a1, a2, ac=eac, sc=sc,
                                             band=band)
            results[idx] = _unswap(best, merged, a1, a2, swap)
            continue
        M = _bucket(m, 256)
        by_bucket.setdefault((M, eac), []).append(idx)

    import jax.numpy as jnp

    from delly_tpu.parallel import dispatch
    mesh = dispatch.get_mesh()
    ndev = dispatch.active_devices()

    for (M, eac), idxs in sorted(by_bucket.items()):
        g = -(-len(idxs) // TILE_B)
        # power-of-two tile grids (see gotoh_pallas.gotoh_batch): the
        # jitted pipeline retraces per batch shape
        g2 = 1
        while g2 < g:
            g2 *= 2
        g = g2
        if mesh is not None:
            # multi-chip: tile grid sharded across the mesh (pad tiles
            # are ml=nl=1 no-ops), see gotoh_pallas.gotoh_batch
            g = dispatch.round_up(g, ndev)
        B = band
        # equality windows bit-packed 8 DP rows per byte (8x less
        # HBM/interconnect traffic than one byte per cell)
        eqw = np.zeros((g, M // 8, TILE_B, B), dtype=np.uint8)
        ml = np.ones((g, TILE_B, 128), dtype=np.int32)
        nl = np.ones((g, TILE_B, 128), dtype=np.int32)
        eqm = np.zeros((M, B), dtype=np.uint8)
        for slot_i, idx in enumerate(idxs):
            a1, a2, _swap = prep[idx]
            gi, b = divmod(slot_i, TILE_B)
            m, n = a1.shape[1], a2.shape[1]
            o = corridor_offsets(m, n, B)[1:m + 1]
            # s2 padded so window index j reads s2[clip(j-1, 0, n-1)]
            s2pad = np.empty(n + B + 1, dtype=np.uint8)
            s2pad[0] = a2[0][0]
            s2pad[1:n + 1] = a2[0]
            s2pad[n + 1:] = a2[0][-1]
            s1 = a1[0]
            eqm[:] = 0
            # constant-offset segments: contiguous window, one
            # broadcast compare per segment (no index matrices)
            starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
            bounds = np.append(starts, m)
            for si in range(len(bounds) - 1):
                r0, r1 = int(bounds[si]), int(bounds[si + 1])
                w0 = int(o[r0])
                eqm[r0:r1] = (s1[r0:r1, None]
                              == s2pad[w0:w0 + B][None, :])
            eqw[gi, :, b, :] = np.packbits(
                eqm.reshape(M // 8, 8, B), axis=1,
                bitorder="little").reshape(M // 8, B)
            ml[gi, b, :] = m
            nl[gi, b, :] = n
        key = (M, B, bool(eac[0]), bool(eac[1]),
               sc.match, sc.mismatch, sc.go, sc.ge, interpret)
        fn = _cache.get(key)
        if fn is None:
            fn = _cache[key] = _build(M, B, bool(eac[0]), bool(eac[1]),
                                      sc, interpret)
        # eq windows regrouped to (g, nblk*RB, TILE_B, B) row blocks
        kargs = (jnp.asarray(eqw), jnp.asarray(ml), jnp.asarray(nl))
        if mesh is not None:
            best, bits = dispatch.sharded_grid_call(
                mesh, fn, ("gotoh_banded", key), kargs, n_out=2)
            dispatch.count_hit("gotoh_banded")
        else:
            best, bits = fn(*kargs)
        mf = np.zeros((g * TILE_B,), dtype=np.int32)
        nf = np.zeros((g * TILE_B,), dtype=np.int32)
        for slot_i, idx in enumerate(idxs):
            a1, a2, _swap = prep[idx]
            mf[slot_i] = a1.shape[1]
            nf[slot_i] = a2.shape[1]
        tbk = (M, B)
        tb = _tb_cache.get(tbk)
        if tb is None:
            tb = _tb_cache[tbk] = _build_tb(M, B)
        if mesh is not None:
            codes, lens = dispatch.sharded_grid_call(
                mesh, tb, ("gotoh_banded_tb", tbk),
                (bits, jnp.asarray(mf), jnp.asarray(nf)), n_out=2)
        else:
            codes, lens = tb(bits, jnp.asarray(mf), jnp.asarray(nf))
        best = np.asarray(best)
        codes = np.asarray(codes)
        lens = np.asarray(lens)
        for slot_i, idx in enumerate(idxs):
            a1, a2, swap = prep[idx]
            gi, b = divmod(slot_i, TILE_B)
            fwd = codes[slot_i, :lens[slot_i]][::-1].astype(np.int64)
            merged = create_alignment_codes(fwd, a1, a2)
            results[idx] = _unswap(int(best[gi, b, 0]), merged, a1, a2,
                                   swap)
    return results


def _unswap(best: int, merged: np.ndarray, a1, a2, swap: bool):
    if not swap:
        return best, merged
    n1 = a1.shape[0]
    return best, np.concatenate([merged[n1:], merged[:n1]], axis=0)
