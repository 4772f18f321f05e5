"""Batched Pallas TPU kernel for the affine-gap profile Gotoh DP.

The progressive-MSA merges of MANY SVs run in lockstep on one device
(reference runs one `gotoh()` per ThreadPool task, msa.h:91-109 /
gotoh.h:71-174). TPU-first design rather than a port:

- 8 pairs ride the VPU sublanes; the DP row (all columns) rides the
  lanes, so every recurrence is a full (8, K) vector op;
- the in-row horizontal gap chain is a max-plus prefix scan done as
  log2(K) shift+max steps;
- the per-cell profile score is computed in-kernel from the column
  count profiles (5 broadcast FMAs per row) using the same exact
  integer-rational formulation as ops.gotoh.profile_score_matrix;
- rows stream through a (batch, row-block) grid with the S/V wavefront
  carried in VMEM scratch across row blocks; the packed direction bits
  (same 4-bit layout as ops/gotoh_device.py) are emitted 4 rows per
  int32 lane so the traceback tile transfers at 1 byte/cell.

Results are bit-identical to ops.gotoh.gotoh (the reference oracle).
The traceback is also on-device: a lockstep vmapped pointer walk over
the packed tile (_build_tb), so only O(m+n) trace codes per pair are
transferred back — the O(K^2) bit tile never leaves HBM.
"""

from __future__ import annotations

import numpy as np

from delly_tpu.ops.gotoh import (
    DnaScore, INF, create_alignment_codes, gotoh as gotoh_host,
    profile_counts, to_align,
)

TILE_B = 8      # pairs per kernel tile (VPU sublanes)
ROWS_BLK = 32   # DP rows per grid step (8 packed int32 bit rows);
                # measured ~1.25x over 8 rows/step on v5e (fewer grid
                # steps amortize block swaps)
ROWS_BLK_INTERP = 8  # interpret mode (tests): 4x smaller traced body,
                     # keeps CPU XLA compile time in check
MAX_K = 4096    # largest padded dimension served by the kernel

_cache = {}


def _bucket_k(x: int) -> int:
    b = 128
    while b < x:
        b *= 2
    return b


def _build(K: int, hfree: bool, vfree: bool, sc: DnaScore,
           interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    GO, GE = int(sc.go), int(sc.ge)
    ROWS_BLK = ROWS_BLK_INTERP if interpret else globals()["ROWS_BLK"]
    nblk = K // ROWS_BLK
    NINF = -INF

    def kernel(prof_ref, wc2_ref, d2_ref, mlen_ref, nlen_ref,
               best_ref, bits_ref, sS_ref, sV_ref):
        r_blk = pl.program_id(1)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_B, K), 1) + 1
        nlen = nlen_ref[0][:, :1]               # (TILE_B, 1)
        mlen = mlen_ref[0][:, :1]
        # per-pair vertical gap costs (column 0 is handled as a scalar
        # boundary; lanes are columns 1..K). Free at col == nlen when
        # vertical-free (align.h:45-73).
        if vfree:
            vfree_col = col == nlen
            vg_open = jnp.where(vfree_col, 0, GO + GE)
            vg_ext = jnp.where(vfree_col, 0, GE)
        else:
            vg_open = jnp.full((TILE_B, K), GO + GE, jnp.int32)
            vg_ext = jnp.full((TILE_B, K), GE, jnp.int32)

        @pl.when(r_blk == 0)
        def _():
            # DP row 0 (gotoh.h:112-116)
            if hfree:
                sS_ref[:] = jnp.zeros((TILE_B, K), jnp.int32)
            else:
                sS_ref[:] = GO + col * GE
            sV_ref[:] = jnp.full((TILE_B, K), NINF, jnp.int32)
            best_ref[0] = jnp.full((TILE_B, 128), NINF, jnp.int32)

        packed = jnp.zeros((TILE_B, K), jnp.int32)
        base = r_blk * ROWS_BLK

        for rr in range(ROWS_BLK):
            r = base + rr + 1                   # DP row 1..K
            # exact integer-rational profile score for this row: the
            # query profile rides the row axis pre-transposed (lanes
            # 0..4 = base counts, lane 5 = depth), so per-row scalars
            # are static single-lane slices — the old masked cross-lane
            # extraction (6 full-width reductions per DP row) cost
            # ~1000x the recurrence itself
            prow = prof_ref[0, rr]              # (TILE_B, 128)
            num = prow[:, 0:1] * wc2_ref[0, 0]
            for k in range(1, 5):
                num = num + prow[:, k:k + 1] * wc2_ref[0, k]
            den = jnp.maximum(prow[:, 5:6] * d2_ref[0], 1.0)
            q = jnp.floor(jnp.abs(num) / den)
            score = jnp.where(num < 0, -q, q).astype(jnp.int32)

            if hfree:
                row_free = r == mlen            # (TILE_B, 1)
                O = jnp.where(row_free, 0, GO + GE)
                E = jnp.where(row_free, 0, GE)
            else:
                O = jnp.full((TILE_B, 1), GO + GE, jnp.int32)
                E = jnp.full((TILE_B, 1), GE, jnp.int32)
            # column-0 boundary values (gotoh.h:117-123); S[0][0] is 0
            # in every config, so the r==1 diagonal seed is 0.
            s_r0 = jnp.int32(0) if vfree else jnp.int32(GO) + r * GE
            s_r0_prev = jnp.int32(0) if vfree \
                else jnp.where(r == 1, 0, jnp.int32(GO) + (r - 1) * GE)

            S_prev = sS_ref[:]
            V_prev = sV_ref[:]
            V_body = jnp.maximum(S_prev + vg_open, V_prev + vg_ext)
            S_diag = jnp.concatenate(
                [jnp.full((TILE_B, 1), s_r0_prev, jnp.int32),
                 S_prev[:, :-1]], axis=1)
            t = jnp.maximum(S_diag + score, V_body)
            # horizontal chain: max-plus prefix scan over the lanes
            zin = jnp.concatenate(
                [jnp.full((TILE_B, 1), s_r0, jnp.int32),
                 (t - col * E)[:, :-1]], axis=1)
            s = 1
            while s < K:
                sh = jnp.concatenate(
                    [jnp.full((TILE_B, s), NINF, jnp.int32),
                     zin[:, :-s]], axis=1)
                zin = jnp.maximum(zin, sh)
                s *= 2
            H_body = zin + (col - 1) * E + O
            S_body = jnp.maximum(t, H_body)
            H_prevcol = jnp.concatenate(
                [jnp.full((TILE_B, 1), NINF, jnp.int32),
                 H_body[:, :-1]], axis=1)
            bits = ((S_body == H_body).astype(jnp.int32)
                    | (S_body == V_body).astype(jnp.int32) * 2
                    | (H_body != H_prevcol + E).astype(jnp.int32) * 4
                    | (V_body != V_prev + vg_ext).astype(jnp.int32) * 8)
            packed = packed | (bits << (8 * (rr % 4)))
            if rr % 4 == 3:
                bits_ref[0, rr // 4] = packed
                packed = jnp.zeros((TILE_B, K), jnp.int32)

            # best score S[mlen][nlen] (gotoh.h final cell)
            at_n = jnp.max(jnp.where(col == nlen, S_body, NINF),
                           axis=1, keepdims=True)
            best_ref[0] = jnp.where(r == mlen, at_n, best_ref[0])
            sS_ref[:] = S_body
            sV_ref[:] = V_body

    def call(prof, wc2, d2, mlen, nlen):
        g = prof.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((g, TILE_B, 128), jnp.int32),
                jax.ShapeDtypeStruct((g, K // 4, TILE_B, K), jnp.int32),
            ),
            grid=(g, nblk),
            in_specs=[
                pl.BlockSpec((1, ROWS_BLK, TILE_B, 128),
                             lambda i, r: (i, r, 0, 0)),
                pl.BlockSpec((1, 5, TILE_B, K), lambda i, r: (i, 0, 0, 0)),
                pl.BlockSpec((1, TILE_B, K), lambda i, r: (i, 0, 0)),
                pl.BlockSpec((1, TILE_B, 128), lambda i, r: (i, 0, 0)),
                pl.BlockSpec((1, TILE_B, 128), lambda i, r: (i, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, TILE_B, 128), lambda i, r: (i, 0, 0)),
                pl.BlockSpec((1, ROWS_BLK // 4, TILE_B, K),
                             lambda i, r: (i, r, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((TILE_B, K), jnp.int32),
                pltpu.VMEM((TILE_B, K), jnp.int32),
            ],
            interpret=interpret,
        )(prof, wc2, d2, mlen, nlen)

    # run(prof, wc2, d2, mlen, nlen):
    # prof: (g, K, TILE_B, 128) f32 — the query profile packed
    # HOST-side onto the DP-row axis (lanes 0..4 = base counts, lane 5
    # = depth), so the kernel computes each row's score with 5
    # broadcast FMAs from static lane slices; wc2 is the score-weighted
    # target profile, also HOST-computed. Both stay off-device on
    # purpose: a device-side transpose of prof or the tiny (5,5) wc2
    # contraction each cost ~25-30 ms on this backend (pathological
    # small-matmul / lane-relayout paths) vs ~0 in the host packing
    # loop that already walks the jobs. Exactness: the eligibility
    # gate (gotoh_batch) bounds every count product below 2^24, where
    # f32 arithmetic is exact, matching the host oracle bit-for-bit.
    return jax.jit(call)


_tb_cache = {}


def _build_tb(K: int):
    """On-device traceback over the packed direction tile: a lockstep
    vmapped pointer walk (same preference order as gotoh.h:134-174 /
    gotoh_device._traceback) so only O(m+n) trace codes — not the
    O(K^2) bit tile — ever leave the device."""
    import jax
    import jax.numpy as jnp

    L = 2 * K + 2
    CAP = 4 * K + 8           # safety bound; valid walks need <= 2(m+n)

    def tb_one(bits_p, m, n):
        # bits_p: (K//4, K) int32 packed rows; m, n: int32 (0 = pad slot)
        def get_b(row, col):
            r = jnp.clip(row - 1, 0, K - 1)
            c = jnp.clip(col - 1, 0, K - 1)
            w = bits_p[r // 4, c]
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
            is_v = last == 2
            # 's' dispatch, same elif order as the host walk
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
            emit = s_move | is_h | is_v
            code = jnp.where(s_move, 0, jnp.where(is_h, 1, 2))
            dec_r = (s_move | is_v).astype(jnp.int32)
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

    @jax.jit
    def run(bits, m_flat, n_flat):
        # bits: (g, K//4, TILE_B, K); m_flat/n_flat: (g*TILE_B,) int32
        g = bits.shape[0]
        bp = jnp.transpose(bits, (0, 2, 1, 3)).reshape(
            (g * TILE_B, K // 4, K))
        return jax.vmap(tb_one)(bp, m_flat, n_flat)

    return run


_ALLOWED = frozenset(b"ACGTN-")  # uppercase only: the host pure-pair path
# scores raw bytes, so case-folded device profiles would diverge on
# soft-masked (lowercase) input; those fall back to the host oracle


def _eligible(a1: np.ndarray, a2: np.ndarray) -> bool:
    m, n = a1.shape[1], a2.shape[1]
    return (0 < m <= MAX_K and 0 < n <= MAX_K
            and a1.shape[0] * a2.shape[0] * 125 < (1 << 24)
            and _ALLOWED.issuperset(a1.tobytes())
            and _ALLOWED.issuperset(a2.tobytes()))


def gotoh_batch(jobs, ac=(False, False), sc: DnaScore | None = None,
                interpret: bool = False):
    """Batched gotoh() over a list of (a1, a2) jobs — same contract and
    bit-identical results as ops.gotoh.gotoh per job. Jobs the kernel
    cannot serve (exotic alphabet, count-product overflow, oversized)
    fall back to the host DP individually."""
    sc = sc or DnaScore()
    jobs = [(to_align(a1), to_align(a2)) for a1, a2 in jobs]
    results = [None] * len(jobs)
    by_bucket = {}
    for idx, (a1, a2) in enumerate(jobs):
        if not _eligible(a1, a2):
            results[idx] = gotoh_host(a1, a2, ac=ac, sc=sc)
            continue
        K = _bucket_k(max(a1.shape[1], a2.shape[1]))
        by_bucket.setdefault(K, []).append(idx)

    import jax.numpy as jnp

    from delly_tpu.parallel import dispatch
    mesh = dispatch.get_mesh()
    ndev = dispatch.active_devices()

    for K, idxs in sorted(by_bucket.items()):
        g = -(-len(idxs) // TILE_B)
        # power-of-two tile grids: the pipeline jit retraces per batch
        # shape, so unbucketed job counts would compile the (expensive)
        # scan kernel once per distinct MSA batch size
        g2 = 1
        while g2 < g:
            g2 *= 2
        g = g2
        if mesh is not None:
            # multi-chip: the tile grid is the sharded axis, so it must
            # split evenly across the mesh (pad tiles are ml=nl=1 no-ops)
            g = dispatch.round_up(g, ndev)
        # query profile packed onto the DP-row axis (lanes 0..4 counts,
        # lane 5 depth) — the layout the kernel reads row-sliced
        prof = np.zeros((g, K, TILE_B, 128), dtype=np.float32)
        c2 = np.zeros((g, 5, TILE_B, K), dtype=np.float32)
        d2 = np.zeros((g, TILE_B, K), dtype=np.float32)
        ml = np.ones((g, TILE_B, 128), dtype=np.int32)
        nl = np.ones((g, TILE_B, 128), dtype=np.int32)
        for slot, idx in enumerate(idxs):
            a1, a2 = jobs[idx]
            gi, b = divmod(slot, TILE_B)
            cc1, dd1 = profile_counts(a1)
            cc2, dd2 = profile_counts(a2)
            m, n = a1.shape[1], a2.shape[1]
            prof[gi, :m, b, 0:5] = cc1[:5].T
            prof[gi, :m, b, 5] = dd1
            c2[gi, :, b, :n] = cc2[:5]
            d2[gi, b, :n] = dd2
            ml[gi, b, :] = m
            nl[gi, b, :] = n
        key = (K, bool(ac[0]), bool(ac[1]),
               sc.match, sc.mismatch, sc.go, sc.ge, interpret)
        fn = _cache.get(key)
        if fn is None:
            fn = _cache[key] = _build(K, bool(ac[0]), bool(ac[1]), sc,
                                      interpret)
        w = np.full((5, 5), float(sc.mismatch), dtype=np.float32)
        np.fill_diagonal(w, float(sc.match))
        wc2 = np.einsum("ab,gbtk->gatk", w, c2).astype(np.float32)
        kargs = (jnp.asarray(prof), jnp.asarray(wc2),
                 jnp.asarray(d2), jnp.asarray(ml), jnp.asarray(nl))
        if mesh is not None:
            # production multi-chip: the same kernel, tile grid sharded
            # across the mesh (each tile is independent — bit-identical
            # to the single-device call by construction)
            best, bits = dispatch.sharded_grid_call(
                mesh, fn, ("gotoh_msa", key), kargs, n_out=2)
            dispatch.count_hit("gotoh_msa")
        else:
            best, bits = fn(*kargs)
        # on-device traceback: only O(m+n) codes per pair come back to
        # the host (pad slots get m=n=0 so their walk is empty)
        mf = np.zeros((g * TILE_B,), dtype=np.int32)
        nf = np.zeros((g * TILE_B,), dtype=np.int32)
        for slot, idx in enumerate(idxs):
            a1, a2 = jobs[idx]
            mf[slot] = a1.shape[1]
            nf[slot] = a2.shape[1]
        tb = _tb_cache.get(K)
        if tb is None:
            tb = _tb_cache[K] = _build_tb(K)
        if mesh is not None:
            # traceback sharded over the same grid axis (mf/nf carry
            # g*TILE_B rows; g is a multiple of the device count)
            codes, lens = dispatch.sharded_grid_call(
                mesh, tb, ("gotoh_msa_tb", K),
                (bits, jnp.asarray(mf), jnp.asarray(nf)), n_out=2)
        else:
            codes, lens = tb(bits, jnp.asarray(mf), jnp.asarray(nf))
        best = np.asarray(best)
        codes = np.asarray(codes)
        lens = np.asarray(lens)
        for slot, idx in enumerate(idxs):
            a1, a2 = jobs[idx]
            gi, b = divmod(slot, TILE_B)
            fwd = codes[slot, :lens[slot]][::-1]
            merged = create_alignment_codes(fwd, a1, a2)
            results[idx] = (int(best[gi, b, 0]), merged)
    return results
