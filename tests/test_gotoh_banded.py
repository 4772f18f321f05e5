"""Corridor (banded) Gotoh: host oracle vs full DP, Pallas kernel
(interpret mode) vs host oracle, and the palign long-context route."""
import numpy as np
import pytest

from delly_tpu.ops.gotoh import DnaScore, gotoh
from delly_tpu.ops.gotoh_banded import (
    corridor_offsets, gotoh_banded_batch, gotoh_banded_host,
)

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


def test_corridor_offsets_quantized_monotone():
    off = corridor_offsets(5000, 4200, 512)
    assert off[0] == 0
    d = np.diff(off)
    assert set(np.unique(d)).issubset({0, 128})
    # end column covered at the last row
    assert off[-1] <= 4200 <= off[-1] + 511


@pytest.mark.parametrize("ac", [(False, False), (True, False),
                                (False, True), (True, True)])
def test_host_banded_equals_full_when_band_covers(ac):
    rng = np.random.default_rng(sum(ac) + 3)
    for _ in range(6):
        m = int(rng.integers(260, 520))
        s1 = rng.choice(ALPHA, m)
        s2 = _mutate(rng, s1, 0.15)[:m]
        if len(s2) == 0:
            s2 = s1[:9].copy()
        band = 256
        while band < 2 * (len(s2) + 2):
            band *= 2
        want = gotoh(s1[None], s2[None], ac=ac)
        got = gotoh_banded_host(s1[None], s2[None], ac=ac, band=band)
        assert want[0] == got[0]
        np.testing.assert_array_equal(want[1], got[1])


def test_host_banded_narrow_matches_full_on_similar():
    rng = np.random.default_rng(17)
    for _ in range(4):
        m = int(rng.integers(900, 1600))
        s1 = rng.choice(ALPHA, m)
        s2 = _mutate(rng, s1, 0.05)[:m]
        want = gotoh(s1[None], s2[None])
        got = gotoh_banded_host(s1[None], s2[None], band=512)
        assert want[0] == got[0]
        np.testing.assert_array_equal(want[1], got[1])


@pytest.mark.parametrize("ac", [(False, False), (True, False),
                                (False, True)])
def test_kernel_bit_identical_to_host(ac):
    rng = np.random.default_rng(sum(ac) + 31)
    jobs = []
    for rep in range(3):
        m = int(rng.integers(220, 460))
        s1 = rng.choice(ALPHA, m)
        s2 = _mutate(rng, s1, [0.0, 0.05, 0.2][rep % 3])
        if len(s2) == 0:
            s2 = s1[:7].copy()
        jobs.append((s1[None, :], s2[None, :]))
    got = gotoh_banded_batch(jobs, ac=ac, interpret=True)
    for i, (a1, a2) in enumerate(jobs):
        m, n = a1.shape[1], a2.shape[1]
        if n > m:
            w_best, w_merged = gotoh_banded_host(a2, a1,
                                                 ac=(ac[1], ac[0]))
            w_merged = np.concatenate([w_merged[1:], w_merged[:1]],
                                      axis=0)
        else:
            w_best, w_merged = gotoh_banded_host(a1, a2, ac=ac)
        assert got[i][0] == w_best, i
        np.testing.assert_array_equal(got[i][1], w_merged)


@pytest.mark.slow
def test_palign_dispatch_routes_long_pairs_to_banded():
    """The long-context dispatch (Myers-sized corridor + edge-touch
    validation) returns the EXACT full-DP result on a realistic pair
    at the production routing size (quick variant below runs the same
    dispatch logic at a lowered threshold by default)."""
    from delly_tpu.ops import msa as msamod
    rng = np.random.default_rng(5)
    s1 = rng.choice(ALPHA, 8300)
    s2 = _mutate(rng, s1, 0.01)[:8300]
    got = msamod._gotoh_dispatch(s1[None], s2[None], (True, True),
                                 DnaScore())
    want = gotoh(s1[None], s2[None], ac=(True, True))
    assert got[0] == want[0]
    np.testing.assert_array_equal(got[1], want[1])


@pytest.mark.slow
def test_palign_dispatch_falls_back_on_distant_pairs():
    """A pair whose edit distance implies a corridor wider than 4096
    routes to the exact full DP (no silent banding)."""
    from delly_tpu.ops import msa as msamod
    rng = np.random.default_rng(9)
    s1 = rng.choice(ALPHA, 8300)
    # a 3000-base insertion near the start pushes the optimal path far
    # off the diagonal
    s2 = np.concatenate([s1[:200], rng.choice(ALPHA, 3000), s1[200:]])
    got = msamod._gotoh_dispatch(s1[None], s2[None], (True, True),
                                 DnaScore())
    want = gotoh(s1[None], s2[None], ac=(True, True))
    assert got[0] == want[0]
    np.testing.assert_array_equal(got[1], want[1])


def test_palign_dispatch_banded_quick(monkeypatch):
    """Default-suite variant of the two slow dispatch tests: the same
    corridor routing + edge-touch validation + full-DP fallback logic,
    exercised at a lowered _BANDED_MIN_DIM so the exactness comparison
    stays cheap."""
    from delly_tpu.ops import msa as msamod
    monkeypatch.setattr(msamod, "_BANDED_MIN_DIM", 2048)
    rng = np.random.default_rng(5)
    # similar pair: corridor engages and must equal the full DP
    s1 = rng.choice(ALPHA, 2600)
    s2 = _mutate(rng, s1, 0.01)[:2600]
    got = msamod._gotoh_dispatch(s1[None], s2[None], (True, True),
                                 DnaScore())
    want = gotoh(s1[None], s2[None], ac=(True, True))
    assert got[0] == want[0]
    np.testing.assert_array_equal(got[1], want[1])
    # distant pair: corridor invalid, must fall back to the full DP
    s3 = np.concatenate([s1[:100], rng.choice(ALPHA, 1500), s1[100:]])
    got = msamod._gotoh_dispatch(s1[None], s3[None], (True, True),
                                 DnaScore())
    want = gotoh(s1[None], s3[None], ac=(True, True))
    assert got[0] == want[0]
    np.testing.assert_array_equal(got[1], want[1])
