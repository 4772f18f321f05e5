"""Myers bit-parallel edit distance, batched for the TPU.

The reference's genotyping hot loops (coverage.h:412-454 batched HW
jobs, genotype.h:248-296 NW probe scoring) all reduce to edit distance
between ~100bp-3kb sequence pairs. The vendored edlib computes this with
Myers' bit-vector algorithm on one CPU core; here the same algorithm is
reformulated for the VPU:

- 32 query rows are packed per uint32 machine word; the carry chain of
  the word-wise addition performs Myers' column update in hardware.
- The batch lives in the trailing (8, 128) = VPU-register dimensions,
  so every word update is one full-width vector op.
- Words couple only through the +-1 horizontal delta (hin/hout), so a
  column costs W sequential word updates of ~15 elementwise ops —
  ~32x less work than a dense DP row sweep and with no min-plus scans.

Boundary handling (NW / SHW / HW) follows edlib.h:41-62: NW and SHW
charge the target prefix (hin=+1 into word 0), HW does not; SHW/HW take
the column minimum, NW the score at column tlen. Per-pair query lengths
are handled by reading the horizontal delta at bit (qlen-1) instead of
the word's top bit, so one padded batch serves ragged inputs.

Two backends share the packing: a pure-JAX lax.scan (runs everywhere)
and a Pallas TPU kernel that keeps Pv/Mv and the Peq planes resident in
VMEM for the whole column loop.
"""

from __future__ import annotations

from functools import partial

import numpy as np

# Maximum distinct bytes (alphabet letters) supported per batch; DNA
# data is ACGT(+N, lowercase, IUPAC) so this is generous. Larger
# alphabets fall back to the dense row-scan kernel.
MAX_ALPHA = 16


def encode_batch(queries: np.ndarray, qlens, targets: np.ndarray, tlens):
    """Host-side packing: Peq planes + target codes.

    queries: (B, M) uint8, targets: (B, N) uint8. The alphabet is the
    set of distinct bytes actually present (exact byte equality, edlib
    semantics). Returns (peq (A, W, B) uint32, tcodes (N, B) int32,
    qlens, tlens) or None when the alphabet exceeds MAX_ALPHA.
    """
    queries = np.ascontiguousarray(queries, dtype=np.uint8)
    targets = np.ascontiguousarray(targets, dtype=np.uint8)
    b, m = queries.shape
    qlens = np.asarray(qlens, dtype=np.int32)
    tlens = np.asarray(tlens, dtype=np.int32)
    letters = np.union1d(np.unique(queries), np.unique(targets))
    if len(letters) > MAX_ALPHA:
        return None
    code = np.full(256, len(letters), dtype=np.int32)
    code[letters] = np.arange(len(letters), dtype=np.int32)
    nalpha = len(letters)
    w = max(1, (m + 31) // 32)
    qcodes = code[queries]  # (B, M)
    valid = np.arange(m)[None, :] < qlens[:, None]
    weights32 = (1 << np.arange(32, dtype=np.uint64))
    peq = np.zeros((nalpha, w, b), dtype=np.uint32)
    for a in range(nalpha):
        match = ((qcodes == a) & valid).astype(np.uint64)  # (B, M)
        for wi in range(w):
            lo = wi * 32
            hi = min(lo + 32, m)
            peq[a, wi] = (match[:, lo:hi]
                          * weights32[None, :hi - lo]).sum(axis=1) \
                .astype(np.uint32)
    tcodes = code[targets].T.copy()  # (N, B)
    return peq, tcodes, qlens, tlens


def _delta_at_qlen(peq_c, pv, mv, hin, w, hi_word, hi_bit):
    """Horizontal delta of D[qlen][.] for this column: the pre-shift
    Ph/Mh bit (qlen-1), evaluated per word with a predicate on the
    word index."""
    import jax.numpy as jnp

    one = jnp.uint32(1)
    delta = jnp.zeros(hin.shape, dtype=jnp.int32)
    pv_out = []
    mv_out = []
    for wi in range(w):
        eq = peq_c[wi]
        hin_neg = (hin < 0).astype(jnp.uint32)
        hin_pos = (hin > 0).astype(jnp.uint32)
        xv = eq | mv[wi]
        eq2 = eq | hin_neg
        xh = (((eq2 & pv[wi]) + pv[wi]) ^ pv[wi]) | eq2
        ph = mv[wi] | ~(xh | pv[wi])
        mh = pv[wi] & xh
        hout = ((ph >> 31) & one).astype(jnp.int32) \
            - ((mh >> 31) & one).astype(jnp.int32)
        sel = hi_word == wi
        d_here = ((ph >> hi_bit) & one).astype(jnp.int32) \
            - ((mh >> hi_bit) & one).astype(jnp.int32)
        delta = jnp.where(sel, d_here, delta)
        ph = (ph << 1) | hin_pos
        mh = (mh << 1) | hin_neg
        pv_out.append(mh | ~(xv | ph))
        mv_out.append(ph & xv)
        hin = hout
    return pv_out, mv_out, delta


def _device_myers():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("w", "mode"))
    def run(peq, tcodes, qlens, tlens, w, mode):
        """peq: (NALPHA, w, B) uint32; tcodes: (N, B) int32.
        mode: 0=NW 1=SHW 2=HW. Returns (B,) int32 distances."""
        n, b = tcodes.shape
        hi_word = (qlens - 1) // 32  # (B,)
        hi_bit = ((qlens - 1) % 32).astype(jnp.uint32)
        hin0 = jnp.int32(0) if mode == 2 else jnp.int32(1)

        pv0 = [jnp.full((b,), 0xFFFFFFFF, dtype=jnp.uint32)
               for _ in range(w)]
        mv0 = [jnp.zeros((b,), dtype=jnp.uint32) for _ in range(w)]
        score0 = qlens.astype(jnp.int32)
        big = jnp.int32(1 << 20)
        if mode == 0:
            res0 = jnp.where(tlens == 0, score0, big)
        else:
            res0 = score0  # column 0 counts for the min

        def step(carry, tc_j_and_j):
            pv, mv, score, res = carry
            tc_j, j = tc_j_and_j  # (B,), scalar
            # Eq per word via an A-way select on the target code
            nalpha = peq.shape[0]
            peq_c = []
            for wi in range(w):
                e = jnp.where(tc_j == 0, peq[0, wi], jnp.uint32(0))
                for a in range(1, nalpha):
                    e = jnp.where(tc_j == a, peq[a, wi], e)
                peq_c.append(e)
            hin = jnp.full((b,), hin0, dtype=jnp.int32)
            pv, mv, delta = _delta_at_qlen(peq_c, pv, mv, hin, w,
                                           hi_word, hi_bit)
            score = score + delta
            col = j + 1
            active = col <= tlens
            if mode == 0:
                res = jnp.where(col == tlens, score, res)
            else:
                res = jnp.where(active, jnp.minimum(res, score), res)
            return (pv, mv, score, res), None

        js = jnp.arange(n, dtype=jnp.int32)
        (pv, mv, score, res), _ = jax.lax.scan(
            step, (pv0, mv0, score0, res0), (tcodes, js))
        return res

    return run


_run = None


def batched_edit_distance_myers(queries, qlens, targets, tlens,
                                mode: int = 0):
    """Batched Myers edit distance on the default JAX device.
    Same contract as ops.edist.batched_edit_distance."""
    global _run
    if _run is None:
        _run = _device_myers()
    import jax.numpy as jnp

    enc = encode_batch(np.asarray(queries), qlens, np.asarray(targets),
                       tlens)
    if enc is None:
        from delly_tpu.ops import edist
        return edist.batched_edit_distance_rowscan(queries, qlens,
                                                   targets, tlens, mode)
    peq, tcodes, ql, tl = enc
    w = peq.shape[1]
    out = _run(jnp.asarray(peq), jnp.asarray(tcodes), jnp.asarray(ql),
               jnp.asarray(tl), w, mode)
    # empty queries analytically: hi_word = -1 never fires in the
    # kernel, so NW would return 0 instead of tlen (the native host
    # core returns tlen; backends must agree)
    qla = np.asarray(qlens)
    if (qla == 0).any():
        out = np.asarray(out).copy()
        empty = qla == 0
        out[empty] = np.asarray(tlens)[empty] if mode == 0 else 0
    return out
