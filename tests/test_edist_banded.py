"""Banded (Ukkonen-corridor) path alignment vs the full DP oracle.

The native `edist_path_banded` + `edist_scan` fast path must return
bit-identical (dist, end, ops) to the full-matrix `align` for every
mode (NW/SHW/HW), with and without IUPAC custom equality.
"""
import numpy as np
import pytest

import delly_tpu.ops.edist as ed

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def _mutate(rng, s, rate):
    out = []
    for c in s.tolist():
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append(int(rng.choice(ALPHA)))
        elif r < rate:
            out.append(c)
            out.append(int(rng.choice(ALPHA)))
        else:
            out.append(c)
    return np.array(out, dtype=np.uint8)


def _full_align(q, t, mode, eq=None):
    banded = ed._align_banded
    ed._align_banded = lambda *a: None
    try:
        return ed.align(q, t, mode, eq=eq)
    finally:
        ed._align_banded = banded


@pytest.mark.parametrize("mode", [ed.MODE_NW, ed.MODE_SHW, ed.MODE_HW])
def test_banded_matches_full(mode):
    rng = np.random.default_rng(mode + 11)
    for rate in (0.0, 0.02, 0.1, 0.4, 0.9):
        for _ in range(12):
            m = int(rng.integers(1, 300))
            q = rng.choice(ALPHA, m)
            if mode == ed.MODE_HW:
                t = np.concatenate([
                    rng.choice(ALPHA, int(rng.integers(0, 200))),
                    _mutate(rng, q, rate),
                    rng.choice(ALPHA, int(rng.integers(0, 200)))])
            else:
                t = _mutate(rng, q, rate)
            if len(t) == 0:
                t = rng.choice(ALPHA, 1)
            got = ed.align(q, t, mode)
            want = _full_align(q, t, mode)
            assert got[0] == want[0] and got[1] == want[1]
            np.testing.assert_array_equal(got[2], want[2])
            gd = ed.edit_distance(q, t, mode)
            assert gd == (want[0], want[1] if mode != ed.MODE_NW
                          else len(t) - 1)


@pytest.mark.parametrize("mode", [ed.MODE_NW, ed.MODE_SHW, ed.MODE_HW])
def test_banded_matches_full_iupac(mode):
    pairs = [("M", "A"), ("M", "C"), ("R", "A"), ("R", "G"),
             ("N", "A"), ("N", "C"), ("N", "G"), ("N", "T")]
    eqt = ed.equality_matrix(pairs)
    alpha = np.frombuffer(b"ACGTMRN", dtype=np.uint8)
    rng = np.random.default_rng(mode + 29)
    for rep in range(25):
        m = int(rng.integers(1, 250))
        q = rng.choice(alpha, m)
        t = rng.choice(alpha, int(rng.integers(1, 350)))
        if rep % 2 == 0 and m <= len(t):
            t[:m] = q
        got = ed.align(q, t, mode, eq=eqt)
        want = _full_align(q, t, mode, eq=eqt)
        assert got[0] == want[0] and got[1] == want[1]
        np.testing.assert_array_equal(got[2], want[2])


def test_banded_k_threshold():
    rng = np.random.default_rng(3)
    q = rng.choice(ALPHA, 100)
    t = _mutate(rng, q, 0.2)
    d, _, _ = ed.align(q, t, ed.MODE_NW)
    assert ed.align(q, t, ed.MODE_NW, k=d)[0] == d
    assert ed.align(q, t, ed.MODE_NW, k=d - 1)[0] == -1
