"""Vectorized mate-pair automaton shared by every scanning pass.

The reference pairs reads with a per-key dict in file order
(store/overwrite on the first mate, pop on the second;
shortpe.h:411-445, scan.h:131-166, gcbias.h:258-300, coral.h:214-253,
coverage.h:550-600) plus the same-position seen-set of _firstPairObs
(tags.h:269-274). Both replay exactly as numpy passes over
position-sorted rows:

- first-ness: a same-position row is "first" iff no earlier first row
  at that position inserted a value equal to its probe value — with
  probe == insert value (the common case) that is a group-min over
  (pos, value); with differing hash functions (shortpe/coral insert
  hash_sr but probe hash_string) insert/probe collisions are checked
  explicitly and the rare colliding groups fall back to a scalar
  replay.
- matching: a second row pairs with the latest first since the
  previous second of its key — a segmented cummax over rows sorted by
  (key, file order), which is precisely the dict-with-overwrite
  automaton including F,F,S (second takes the overwriting first) and
  F,S,S (second second finds nothing).
"""

from __future__ import annotations

import numpy as np


def first_obs_mask(pos, uncond, eqm, check_vals, add_vals=None):
    """Boolean first-mate mask over paired rows in file order (pos
    non-decreasing). `uncond` rows are unconditionally first and insert
    into the seen-set; `eqm` rows (same-position mates) probe the set
    and are first only if unseen. `check_vals` is what the set is
    probed with; `add_vals` what first rows insert (defaults to
    `check_vals`)."""
    P = len(pos)
    lt = uncond
    first = lt.copy()
    if not eqm.any():
        return first
    try:
        from delly_tpu import native
        got = native.pair_first_obs(
            pos, lt, eqm, check_vals,
            check_vals if add_vals is None else add_vals)
        if got is not None:
            return got
    except Exception:
        pass
    if add_vals is None or add_vals is check_vals:
        # group-min over (pos, value) among inserting/probing rows
        cond = np.nonzero(lt | eqm)[0]
        so = np.lexsort((cond, check_vals[cond].astype(np.int64),
                         pos[cond].astype(np.int64)))
        cs = cond[so]
        newg = np.ones(len(cs), dtype=bool)
        if len(cs) > 1:
            newg[1:] = ((pos[cs[1:]] != pos[cs[:-1]])
                        | (check_vals[cs[1:]] != check_vals[cs[:-1]]))
        gstart = np.maximum.accumulate(
            np.where(newg, np.arange(len(cs)), 0))
        eq_first = np.zeros(P, dtype=bool)
        eq_first[cs] = cs == cs[gstart]
        first |= eqm & eq_first
        return first
    # differing insert/probe hashes: a same-pos row is blocked only by
    # an insert/probe collision at its position — vanishingly rare, so
    # detect colliding values (superset across positions) and replay
    # just the rows carrying them
    add64 = add_vals.astype(np.uint64)
    chk64 = check_vals.astype(np.uint64)
    colliding = np.intersect1d(add64[lt | eqm], chk64[eqm])
    first |= eqm
    if len(colliding):
        hot = np.isin(chk64, colliding) | np.isin(add64, colliding)
        rows = np.nonzero(hot & (lt | eqm))[0]
        seen = set()
        last_pos = -1
        for r in rows.tolist():
            p = int(pos[r])
            if p != last_pos:
                seen.clear()
                last_pos = p
            if eqm[r]:
                first[r] = int(check_vals[r]) not in seen
            if first[r]:
                seen.add(int(add_vals[r]))
    return first


def match_store_pop(keys, first_mask):
    """Match second rows to firsts with exact dict semantics. `keys` is
    the per-row store key for first rows / pop key for second rows
    (equal for a true pair). Returns (S_rows, F_rows) in file order."""
    P = len(keys)
    if P == 0:
        return (np.zeros(0, dtype=np.int64),) * 2
    try:
        from delly_tpu import native
        got = native.pair_match(keys, first_mask)
        if got is not None:
            return got
    except Exception:
        pass
    idx = np.arange(P, dtype=np.int64)
    so = np.lexsort((idx, keys))
    k_s = keys[so]
    r_s = idx[so]
    isF = first_mask[so]
    newg = np.ones(P, dtype=bool)
    if P > 1:
        newg[1:] = k_s[1:] != k_s[:-1]
    gid = np.cumsum(newg).astype(np.int64)
    L = np.int64(P + 1)
    fv = np.where(isF, r_s, np.int64(-1)) + gid * L
    lastF = np.maximum.accumulate(fv) - gid * L
    sv = np.where(~isF, r_s, np.int64(-1)) + gid * L
    accS = np.maximum.accumulate(sv) - gid * L
    prevS = np.empty_like(accS)
    prevS[0] = -1
    prevS[1:] = accS[:-1]
    prevS = np.where(newg, np.int64(-1), prevS)
    matched = (~isF) & (lastF >= 0) & (lastF > prevS)
    S_rows = r_s[matched]
    F_rows = lastF[matched]
    order = np.argsort(S_rows, kind="stable")
    return S_rows[order], F_rows[order]


def saturating_midpoint_counts(midpoints, reflen: int,
                               cap: int = 65534) -> np.ndarray:
    """uint16 per-base fragment counts with the reference's saturation
    (increments stop at `cap`, equivalent to min(total, cap))."""
    m = midpoints[(midpoints >= 0) & (midpoints < reflen)]
    counts = np.bincount(m, minlength=reflen)
    np.minimum(counts, cap, out=counts)
    return counts.astype(np.uint16)
