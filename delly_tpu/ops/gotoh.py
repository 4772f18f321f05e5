"""Affine-gap Gotoh DP with profile scoring and end-free configs.

Reference: src/gotoh.h + src/align.h. Alignments are 2D uint8 arrays
(rows x columns, ASCII; gap = '-'). Scoring matches the reference exactly:
integer DP, profile scores computed in float32 and truncated to int, the
same four AlignConfig boundary variants, and the same traceback preference
(horizontal > vertical > diagonal with open/extend bits).

The DP is row-vectorized numpy: the in-row horizontal dependency is solved
as a max-plus prefix scan, so each row is O(n) vector work. The same
formulation is what the batched device kernel uses.
"""

from __future__ import annotations

import numpy as np

GAP = ord("-")
INF = 1000000  # DnaScore.inf (align.h:21)


class DnaScore:
    """align.h:11-25."""

    def __init__(self, match=5, mismatch=-4, go=-10, ge=-1):
        self.match = match
        self.mismatch = mismatch
        self.go = go
        self.ge = ge
        self.inf = INF


def to_align(seq) -> np.ndarray:
    """String or 2D array -> 2D uint8 alignment array."""
    if isinstance(seq, str):
        return np.frombuffer(seq.encode(), dtype=np.uint8)[None, :].copy()
    a = np.asarray(seq, dtype=np.uint8)
    return a[None, :] if a.ndim == 1 else a


def align_to_strings(a: np.ndarray) -> list:
    return [row.tobytes().decode() for row in a]


def create_profile(a: np.ndarray) -> np.ndarray:
    """6 x n profile over A,C,G,T,N,'-' (align.h:114-171).

    Multi-row profiles ignore leading/trailing gaps per row and normalize by
    the per-column count of recognized characters (float32 like the C++).
    """
    nrows, ncols = a.shape
    codes = np.full(256, -1, dtype=np.int8)
    for i, chars in enumerate("ACGTN-"):
        codes[ord(chars)] = i
        codes[ord(chars.lower())] = i
    cls = codes[a]  # (rows, cols), -1 for unrecognized
    p = np.zeros((6, ncols), dtype=np.float32)
    if nrows == 1:
        for k in range(6):
            p[k] = (cls[0] == k).astype(np.float32)
        return p
    nongap = a != GAP
    first = np.where(nongap.any(axis=1), nongap.argmax(axis=1), -1)
    rev_last = nongap[:, ::-1].argmax(axis=1)
    last = np.where(nongap.any(axis=1), ncols - 1 - rev_last, ncols)
    # Rows with no aligned char: first=-1, last=ncols per reference init.
    first = np.where(nongap.any(axis=1), first, -1)
    col = np.arange(ncols)
    covered = (first[:, None] <= col[None, :]) & (col[None, :] <= last[:, None])
    valid = covered & (cls >= 0)
    denom = valid.sum(axis=0).astype(np.float32)
    for k in range(6):
        p[k] = ((cls == k) & covered).sum(axis=0).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        p /= denom[None, :]
    return p


def profile_counts(a: np.ndarray):
    """Integer profile: per-column counts over A,C,G,T,N,'-' plus the
    per-column denominator (recognized chars within each row's aligned
    span). create_profile == counts/denom exactly."""
    nrows, ncols = a.shape
    codes = np.full(256, -1, dtype=np.int8)
    for i, chars in enumerate("ACGTN-"):
        codes[ord(chars)] = i
        codes[ord(chars.lower())] = i
    cls = codes[a]
    if nrows == 1:
        cnt = np.zeros((6, ncols), dtype=np.int32)
        for k in range(6):
            cnt[k] = (cls[0] == k)
        return cnt, np.maximum(cnt.sum(axis=0), 0).astype(np.int32)
    nongap = a != GAP
    first = np.where(nongap.any(axis=1), nongap.argmax(axis=1), -1)
    rev_last = nongap[:, ::-1].argmax(axis=1)
    last = np.where(nongap.any(axis=1), ncols - 1 - rev_last, ncols)
    first = np.where(nongap.any(axis=1), first, -1)
    col = np.arange(ncols)
    covered = (first[:, None] <= col[None, :]) & (col[None, :] <= last[:, None])
    valid = covered & (cls >= 0)
    denom = valid.sum(axis=0).astype(np.int32)
    cnt = np.zeros((6, ncols), dtype=np.int32)
    for k in range(6):
        cnt[k] = ((cls == k) & covered).sum(axis=0)
    return cnt, denom


def profile_score_matrix(a1: np.ndarray, a2: np.ndarray, sc: DnaScore) -> np.ndarray:
    """Pairwise column scores, (m x n) int32 (align.h:89-111).

    Evaluated as an exact integer rational — score = trunc(num /
    (denom1*denom2)) with num an integer contraction — instead of the
    C++'s float32 accumulation. Results are identical except when the
    float path's rounding error crosses an integer boundary (ties), and
    being order-independent it is bit-identical between host numpy and
    the XLA device kernel (ops/gotoh_device.py)."""
    m, n = a1.shape[1], a2.shape[1]
    if a1.shape[0] == 1 and a2.shape[0] == 1:
        eq = a1[0][:, None] == a2[0][None, :]
        return np.where(eq, sc.match, sc.mismatch).astype(np.int32)
    c1, d1 = profile_counts(a1)
    c2, d2 = profile_counts(a2)
    # gap row excluded from scoring (align.h:106)
    w = np.full((5, 5), sc.mismatch, dtype=np.int64)
    np.fill_diagonal(w, sc.match)
    num = c1[:5].T.astype(np.int64) @ w @ c2[:5].astype(np.int64)
    den = d1.astype(np.int64)[:, None] * d2.astype(np.int64)[None, :]
    den = np.maximum(den, 1)
    # C float->int conversion truncates toward zero
    q = np.abs(num) // den
    return np.where(num < 0, -q, q).astype(np.int32)


def _gap_cost(free: bool, idx: np.ndarray, end: int, cost: np.ndarray):
    """AlignConfig boundary zeroing (align.h:45-73)."""
    if not free:
        return cost
    boundary = (idx == 0) | (idx == end)
    return np.where(boundary, 0, cost)


def _dp(a1: np.ndarray, a2: np.ndarray, sc: DnaScore,
        horizontal_free: bool, vertical_free: bool):
    """Compute S, H, V matrices ((m+1) x (n+1) int32)."""
    assert sc.go <= 0 and sc.ge <= 0
    m, n = a1.shape[1], a2.shape[1]
    score = profile_score_matrix(a1, a2, sc)
    cols = np.arange(n + 1, dtype=np.int64)
    rows = np.arange(m + 1, dtype=np.int64)

    # Per-column vertical gap costs: free when col==0 or col==n (TV).
    vg_open = _gap_cost(vertical_free, cols, n,
                        np.full(n + 1, sc.go + sc.ge, dtype=np.int64))
    vg_ext = _gap_cost(vertical_free, cols, n,
                       np.full(n + 1, sc.ge, dtype=np.int64))

    from delly_tpu import native
    if native.get_lib() is not None:
        # Native fill with the direct Gotoh recurrence (opening H from
        # S rather than from t is equivalent: when S=H>t at c-1,
        # S+go+ge <= H+ge since go <= 0, so the extend term dominates
        # either way).
        out = native.gotoh_core(score, vg_open, vg_ext,
                                horizontal_free, vertical_free,
                                sc.go, sc.ge)
        if out is not None:
            S, H, V = out
            return S, H, V, score

    S = np.empty((m + 1, n + 1), dtype=np.int64)
    H = np.empty((m + 1, n + 1), dtype=np.int64)
    V = np.empty((m + 1, n + 1), dtype=np.int64)

    # Row 0 (gotoh.h:112-116)
    hrow0 = _gap_cost(horizontal_free, np.zeros(1, np.int64), m,
                      np.array([1], np.int64))[0]  # 1 if charged, 0 if free
    S[0] = (sc.go + cols * sc.ge) * hrow0
    S[0, 0] = 0
    H[0] = S[0]
    H[0, 0] = -INF
    V[0] = -INF

    # Column 0 (gotoh.h:117-123)
    vcol0 = _gap_cost(vertical_free, np.zeros(1, np.int64), n,
                      np.array([1], np.int64))[0]
    S[:, 0] = (sc.go + rows * sc.ge) * vcol0
    S[0, 0] = 0
    V[:, 0] = S[:, 0]
    V[0, 0] = -INF
    H[1:, 0] = -INF

    for r in range(1, m + 1):
        # hgap costs for this row: free when row==0 or row==m (TH).
        row_free = horizontal_free and (r == 0 or r == m)
        O = 0 if row_free else sc.go + sc.ge
        E = 0 if row_free else sc.ge
        V[r, 1:] = np.maximum(S[r - 1, 1:] + vg_open[1:],
                              V[r - 1, 1:] + vg_ext[1:])
        t = np.maximum(S[r - 1, :-1] + score[r - 1], V[r, 1:])
        # H chain: H[c] = max(t'[c-1] + O, H[c-1] + E) with t' including the
        # col-0 boundary S[r][0] (a horizontal open from column 0).
        t_full = np.concatenate(([S[r, 0]], t))  # index = column
        z = t_full - cols * E
        zmax = np.maximum.accumulate(z[:-1])  # max over k <= c-1
        H[r, 1:] = zmax + (cols[1:] - 1) * E + O
        # Clamp: the C++ keeps -inf flowing through (prevhoz=-inf at col 1
        # only competes via max, and t_full dominates), so chain is exact.
        S[r, 1:] = np.maximum(t, H[r, 1:])
    return S, H, V, score


def gotoh_score(a1, a2, ac=(False, False), sc: DnaScore | None = None) -> int:
    """gotoh.h:12-68."""
    sc = sc or DnaScore()
    a1 = to_align(a1)
    a2 = to_align(a2)
    S, _, _, _ = _dp(a1, a2, sc, ac[0], ac[1])
    return int(S[-1, -1])


def gotoh(a1, a2, ac=(False, False), sc: DnaScore | None = None):
    """gotoh.h:71-174. Returns (score, merged alignment 2D uint8)."""
    sc = sc or DnaScore()
    a1 = to_align(a1)
    a2 = to_align(a2)
    m, n = a1.shape[1], a2.shape[1]
    S, H, V, _ = _dp(a1, a2, sc, ac[0], ac[1])

    # Trace bits, mirroring gotoh.h:134-138 with identical tie preference.
    vg_ext = _gap_cost(ac[1], np.arange(n + 1, dtype=np.int64), n,
                       np.full(n + 1, sc.ge, dtype=np.int64))

    def hg_ext(r):
        return 0 if (ac[0] and (r == 0 or r == m)) else sc.ge

    trace = []
    row, col = m, n
    last = "s"
    while row > 0 or col > 0:
        if last == "s":
            if row == 0 and col > 0:
                last = "h"
            elif col == 0 and row > 0:
                last = "v"
            elif S[row, col] == H[row, col]:
                last = "h"
            elif S[row, col] == V[row, col]:
                last = "v"
            else:
                row -= 1
                col -= 1
                trace.append("s")
        elif last == "h":
            # bit1: gap-open (H != H[col-1] + ext)
            if row == 0:
                opened = col == 1  # row-0 H chain ends at (0,0)
            else:
                opened = H[row, col] != H[row, col - 1] + hg_ext(row)
            if opened:
                last = "s"
            col -= 1
            trace.append("h")
        else:  # 'v'
            if col == 0:
                opened = row == 1
            else:
                opened = V[row, col] != V[row - 1, col] + vg_ext[col]
            if opened:
                last = "s"
            row -= 1
            trace.append("v")
    merged = create_alignment(trace, a1, a2)
    return int(S[-1, -1]), merged


def create_alignment_codes(codes: np.ndarray, a1: np.ndarray,
                           a2: np.ndarray) -> np.ndarray:
    """Vectorized create_alignment over int trace codes in FORWARD
    order (0=s, 1=h, 2=v) — same output as create_alignment on the
    equivalent char list."""
    n1, n2 = a1.shape[0], a2.shape[0]
    L = len(codes)
    out = np.full((n1 + n2, L), GAP, dtype=np.uint8)
    adv1 = codes != 1          # s/v consume a column of a1
    adv2 = codes != 2          # s/h consume a column of a2
    row = np.cumsum(adv1) - adv1
    col = np.cumsum(adv2) - adv2
    out[:n1, adv1] = a1[:, row[adv1]]
    out[n1:, adv2] = a2[:, col[adv2]]
    return out


def create_alignment(trace: list, a1: np.ndarray, a2: np.ndarray) -> np.ndarray:
    """align.h:202-229. trace is in traceback order (reversed here)."""
    n1, n2 = a1.shape[0], a2.shape[0]
    L = len(trace)
    out = np.full((n1 + n2, L), GAP, dtype=np.uint8)
    row = col = 0
    for ai, t in enumerate(reversed(trace)):
        if t == "s":
            out[:n1, ai] = a1[:, row]
            out[n1:, ai] = a2[:, col]
            row += 1
            col += 1
        elif t == "h":
            out[n1:, ai] = a2[:, col]
            col += 1
        else:
            out[:n1, ai] = a1[:, row]
            row += 1
    return out
