"""Linear-gap NW, banded homology scan and split aligner (longNeedle).

Reference: src/needle.h. The split aligner joins a forward and a
reverse-complement NW alignment at the best split point to align a consensus
across an SV junction. Row DPs are numpy-vectorized with max-plus prefix
scans for the in-row dependency.
"""

from __future__ import annotations

import numpy as np

from delly_tpu.ops.gotoh import GAP, DnaScore, create_alignment
from delly_tpu.utils.tags import revcomp

_COMP = np.zeros(256, dtype=np.uint8)
for _a, _b in zip(b"ACGTN-", b"TGCAN-"):
    _COMP[_a] = _b


def longest_homology(s1: str, s2: str, score_threshold: int = -1) -> int:
    """Banded +-k edit-distance scan (needle.h:13-42)."""
    m, n = len(s1), len(s2)
    k = abs(score_threshold)
    mat = np.zeros((m + 1, n + 1), dtype=np.int32)
    for col in range(1, min(k, n) + 1):
        mat[0][col] = mat[0][col - 1] - 1
    for row in range(1, min(k, m) + 1):
        mat[row][0] = mat[row - 1][0] - 1
    for row in range(1, m + 1):
        best_col = score_threshold - 1
        for h in range(-k, k + 1):
            col = row + h
            if 1 <= col <= n:
                v = mat[row - 1][col - 1] + (0 if s1[row - 1] == s2[col - 1] else -1)
                if -k <= row - 1 - col <= k:
                    v = max(v, mat[row - 1][col] - 1)
                if -k <= row - col + 1 <= k:
                    v = max(v, mat[row][col - 1] - 1)
                mat[row][col] = v
                if v > best_col:
                    best_col = v
        if best_col < score_threshold:
            return row - 1
    return 0


def _nw_matrix(s1: np.ndarray, s2: np.ndarray, match: int, mismatch: int,
               ge: int, horizontal_free: bool) -> np.ndarray:
    """Linear-gap NW score matrix (needle.h:59-66), AlignConfig<TH, false>.

    Prefers the native C++ kernel (hostio.cpp nw_matrix); the numpy
    max-plus prefix-scan formulation is the fallback."""
    try:
        from delly_tpu import native
        mat = native.nw_matrix(s1.tobytes(), s2.tobytes(), match,
                               mismatch, ge, horizontal_free)
        if mat is not None:
            return mat
    except Exception:
        pass
    m, n = len(s1), len(s2)
    mat = np.empty((m + 1, n + 1), dtype=np.int64)
    cols = np.arange(n + 1, dtype=np.int64)
    hg_row0 = 0 if horizontal_free else ge
    mat[0] = cols * hg_row0
    sub = np.where(s1[:, None] == s2[None, :], match, mismatch).astype(np.int64)
    for row in range(1, m + 1):
        hg = 0 if (horizontal_free and (row == 0 or row == m)) else ge
        cand = np.maximum(mat[row - 1, :-1] + sub[row - 1], mat[row - 1, 1:] + ge)
        base = mat[row - 1, 0] + ge  # mat[row][0]
        z = np.concatenate(([base], cand)) - cols * hg
        zmax = np.maximum.accumulate(z[:-1])
        mat[row, 0] = base
        mat[row, 1:] = np.maximum(cand, zmax + (cols[1:] - 1) * hg + hg)
    return mat


def _nw_traceback(mat: np.ndarray, s1: np.ndarray, s2: np.ndarray,
                  rr: int, cc: int, ge: int, horizontal_free: bool) -> list:
    """needle.h:154-171 preference: vertical, then horizontal, then diag."""
    m, n = len(s1), len(s2)
    trace = []
    while rr > 0 or cc > 0:
        vg = ge  # vertical gaps never free in AlignConfig<TH,false>
        hg = 0 if (horizontal_free and (rr == 0 or rr == m)) else ge
        if rr > 0 and mat[rr][cc] == mat[rr - 1][cc] + vg:
            rr -= 1
            trace.append("v")
        elif cc > 0 and mat[rr][cc] == mat[rr][cc - 1] + hg:
            cc -= 1
            trace.append("h")
        else:
            rr -= 1
            cc -= 1
            trace.append("s")
    return trace


def long_needle(s1: str, s2: str, sc: DnaScore | None = None,
                horizontal_free: bool = True):
    """Split aligner (needle.h:45-222).

    Aligns s1 (consensus) across an SV junction in s2 (reference probe) by
    joining a forward and a reverse-complement alignment at the best split.
    Returns 2xL uint8 alignment or None if no split improves the score.
    """
    sc = sc or DnaScore(1, -1, -1, -1)
    a1 = np.frombuffer(s1.encode(), dtype=np.uint8)
    a2 = np.frombuffer(s2.encode(), dtype=np.uint8)
    m, n = len(a1), len(a2)
    r1 = np.frombuffer(revcomp(s1).encode(), dtype=np.uint8)
    r2 = np.frombuffer(revcomp(s2).encode(), dtype=np.uint8)
    fused = None
    try:
        from delly_tpu import native
        fused = native.long_needle_scores(
            a1.tobytes(), a2.tobytes(), r1.tobytes(), r2.tobytes(),
            sc.match, sc.mismatch, sc.ge, horizontal_free)
    except Exception:
        fused = None
    if fused is not None:
        mat, rev, flat, best_score = fused
    else:
        mat = _nw_matrix(a1, a2, sc.match, sc.mismatch, sc.ge,
                         horizontal_free)
        rev = _nw_matrix(r1, r2, sc.match, sc.mismatch, sc.ge,
                         horizontal_free)
        best_mat = np.maximum.accumulate(mat, axis=1)
        best_rev = np.maximum.accumulate(rev, axis=1)
        total = best_mat + best_rev[::-1, ::-1]
        flat = int(np.argmax(total))
        best_score = int(total.flat[flat])
    if mat[m][n] != rev[m][n]:
        return None
    if best_score <= mat[m][n]:
        return None
    cons_left, ref_left = divmod(flat, n + 1)
    cons_right = m - cons_left
    target = best_score - mat[cons_left][ref_left]
    hits = np.nonzero(
        rev[cons_right, : n - ref_left + 1] == target)[0]
    ref_right = int(hits[-1]) if hits.size else 0
    # Forward traceback from (cons_left, ref_left)
    trace = _nw_traceback(mat, a1, a2, cons_left, ref_left, sc.ge,
                          horizontal_free)
    fwd = create_alignment(trace, a1[None, :cons_left], a2[None, :ref_left])
    rtrace = _nw_traceback(rev, r1, r2, cons_right, ref_right, sc.ge,
                           horizontal_free)
    rvs = create_alignment(rtrace, r1[None, :cons_right], r2[None, :ref_right])
    # Concat: fwd + reference-only gap + complement-reversed rvs
    gapref = (n - ref_right) - ref_left
    L = fwd.shape[1] + gapref + rvs.shape[1]
    out = np.full((2, L), GAP, dtype=np.uint8)
    out[:, : fwd.shape[1]] = fwd
    out[1, fwd.shape[1] : fwd.shape[1] + gapref] = a2[ref_left : n - ref_right]
    tail = _COMP[rvs[:, ::-1]]
    out[:, fwd.shape[1] + gapref :] = tail
    return out
