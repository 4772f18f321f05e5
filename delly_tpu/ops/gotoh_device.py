"""Device Gotoh: affine-gap profile DP on the JAX device.

Reference gotoh.h:71-174 (DP + four bitset trace matrices) redesigned
TPU-style rather than translated:

- the profile-vs-profile score matrix is an integer contraction of the
  two column-count profiles (an MXU matmul on TPU);
- the DP runs as one lax.scan over query rows whose in-row horizontal
  chain is a max-plus prefix scan (jax.lax.associative_scan), so each
  row is full-width vector work;
- instead of four bitset matrices, the kernel emits one packed uint8
  direction tile (S==H, S==V, H-open, V-open bits) that the host walks
  in O(m+n) for the traceback.

All arithmetic is exact integer (counts stay below 2^24, so the f32
contraction is exact and the trunc-toward-zero division is provably
correctly rounded) — device and host results are bit-identical; see
ops/gotoh.py profile_score_matrix for the same formulation on host.
"""

from __future__ import annotations

import numpy as np

from delly_tpu.ops.gotoh import (
    DnaScore, INF, create_alignment, gotoh as gotoh_host, profile_counts,
    to_align,
)

_cache = {}

_BIT_SH, _BIT_SV, _BIT_HO, _BIT_VO = 1, 2, 4, 8


def _build(mpad: int, npad: int, hfree: bool, vfree: bool):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c1, d1, c2, d2, mlen, nlen, match, mismatch, go, ge):
        # c1: (5, mpad) f32 integer-valued counts, d1: (mpad,) f32;
        # likewise c2/(npad). Scalars are traced so one compile serves
        # any scoring scheme.
        eye = jnp.eye(5, dtype=jnp.float32)
        w = eye * match + (1.0 - eye) * mismatch
        num = c1.T @ (w @ c2)                       # (mpad, npad) exact
        den = jnp.maximum(d1[:, None] * d2[None, :], 1.0)
        q = jnp.floor(jnp.abs(num) / den)
        score = jnp.where(num < 0, -q, q).astype(jnp.int32)

        cols = jnp.arange(npad + 1, dtype=jnp.int32)
        ninf = jnp.int32(-INF)
        # vertical gap costs per column: free at col 0 / col nlen (TV)
        vfree_col = vfree & ((cols == 0) | (cols == nlen))
        vg_open = jnp.where(vfree_col, 0, go + ge).astype(jnp.int32)
        vg_ext = jnp.where(vfree_col, 0, ge).astype(jnp.int32)

        # row 0 (gotoh.h:112-116): horizontal charged unless hfree
        S0 = jnp.where(hfree, 0, go + cols * ge).astype(jnp.int32)
        S0 = S0.at[0].set(0)
        V0 = jnp.full(npad + 1, ninf, dtype=jnp.int32)

        def row_step(carry, inp):
            S_prev, V_prev, best = carry
            score_row, r = inp
            row_free = jnp.bool_(hfree) & (r == mlen)
            O = jnp.where(row_free, 0, go + ge).astype(jnp.int32)
            E = jnp.where(row_free, 0, ge).astype(jnp.int32)
            S_r0 = jnp.where(vfree, 0, go + r * ge).astype(jnp.int32)

            V_body = jnp.maximum(S_prev[1:] + vg_open[1:],
                                 V_prev[1:] + vg_ext[1:])
            t = jnp.maximum(S_prev[:-1] + score_row, V_body)
            t_full = jnp.concatenate([S_r0[None], t])
            z = t_full - cols * E
            zmax = jax.lax.associative_scan(jnp.maximum, z[:-1])
            H_body = zmax + (cols[1:] - 1) * E + O
            S_body = jnp.maximum(t, H_body)

            H_prevcol = jnp.concatenate(
                [jnp.full((1,), ninf, dtype=jnp.int32), H_body[:-1]])
            bits = ((S_body == H_body).astype(jnp.uint8) * _BIT_SH
                    | (S_body == V_body).astype(jnp.uint8) * _BIT_SV
                    | (H_body != H_prevcol + E).astype(jnp.uint8) * _BIT_HO
                    | (V_body != V_prev[1:] + vg_ext[1:]).astype(jnp.uint8)
                    * _BIT_VO)

            S_new = jnp.concatenate([S_r0[None], S_body])
            V_new = jnp.concatenate([S_r0[None], V_body])
            best = jnp.where(r == mlen, S_new[nlen], best)
            return (S_new, V_new, best), bits

        rows = jnp.arange(1, mpad + 1, dtype=jnp.int32)
        (_, _, best), bits = jax.lax.scan(
            row_step, (S0, V0, S0[nlen]), (score, rows))
        return best, bits

    return run


def _traceback(bits: np.ndarray, m: int, n: int) -> list:
    """Host pointer walk over the packed direction tile; identical
    preference order to gotoh.h:134-174 / ops.gotoh.gotoh."""
    trace = []
    row, col = m, n
    last = "s"
    while row > 0 or col > 0:
        if last == "s":
            if row == 0 and col > 0:
                last = "h"
            elif col == 0 and row > 0:
                last = "v"
            elif bits[row - 1, col - 1] & _BIT_SH:
                last = "h"
            elif bits[row - 1, col - 1] & _BIT_SV:
                last = "v"
            else:
                row -= 1
                col -= 1
                trace.append("s")
        elif last == "h":
            if row == 0:
                opened = col == 1
            else:
                opened = bool(bits[row - 1, col - 1] & _BIT_HO)
            if opened:
                last = "s"
            col -= 1
            trace.append("h")
        else:
            if col == 0:
                opened = row == 1
            else:
                opened = bool(bits[row - 1, col - 1] & _BIT_VO)
            if opened:
                last = "s"
            row -= 1
            trace.append("v")
    return trace


def _bucket(x: int) -> int:
    if x <= 512:
        return max(32, -(-x // 32) * 32)
    b = 1024
    while b < x:
        b *= 2
    return b


_ALLOWED = frozenset(b"ACGTN-")  # uppercase only: the host pure-pair path
# scores raw bytes, so case-folded device profiles would diverge on
# soft-masked (lowercase) input; those fall back to the host oracle


def gotoh_device(a1, a2, ac=(False, False), sc: DnaScore | None = None):
    """Device-executed gotoh() — same contract and bit-identical
    results as ops.gotoh.gotoh. Falls back to the host implementation
    for exotic alphabets or count products that would break integer
    exactness."""
    sc = sc or DnaScore()
    a1 = to_align(a1)
    a2 = to_align(a2)
    m, n = a1.shape[1], a2.shape[1]
    if m == 0 or n == 0 or m * n > (1 << 26) \
            or a1.shape[0] * a2.shape[0] * 125 >= (1 << 24) \
            or not (_ALLOWED.issuperset(a1.tobytes())
                    and _ALLOWED.issuperset(a2.tobytes())):
        return gotoh_host(a1, a2, ac=ac, sc=sc)
    # 1-row "profiles" must reproduce the raw-byte equality scoring of
    # the host's pure-pair path; over ACGTN- the count contraction does.
    c1, d1 = profile_counts(a1)
    c2, d2 = profile_counts(a2)
    mpad, npad = _bucket(m), _bucket(n)
    key = (mpad, npad, bool(ac[0]), bool(ac[1]))
    fn = _cache.get(key)
    if fn is None:
        fn = _cache[key] = _build(mpad, npad, bool(ac[0]), bool(ac[1]))
    c1p = np.zeros((5, mpad), dtype=np.float32)
    c1p[:, :m] = c1[:5]
    c2p = np.zeros((5, npad), dtype=np.float32)
    c2p[:, :n] = c2[:5]
    d1p = np.zeros(mpad, dtype=np.float32)
    d1p[:m] = d1
    d2p = np.zeros(npad, dtype=np.float32)
    d2p[:n] = d2
    best, bits = fn(c1p, d1p, c2p, d2p, np.int32(m), np.int32(n),
                    np.int32(sc.match), np.int32(sc.mismatch),
                    np.int32(sc.go), np.int32(sc.ge))
    bits = np.asarray(bits)[:m, :n]
    trace = _traceback(bits, m, n)
    merged = create_alignment(trace, a1, a2)
    return int(best), merged
