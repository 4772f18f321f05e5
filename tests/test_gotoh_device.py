"""Device Gotoh parity: bit-identical to the host oracle.

Covers random pairs, multi-row profile merges (the progressive-MSA
shape), all four AlignConfig boundary variants, and non-default
scoring (reference gotoh.h:71-174 / align.h:30-73 semantics).
"""

import random

import numpy as np
import pytest

from delly_tpu.ops.gotoh import DnaScore, gotoh
from delly_tpu.ops.gotoh_device import gotoh_device


def _rand_seq(rng, lo, hi, alpha="ACGT"):
    return "".join(rng.choice(alpha) for _ in range(rng.randint(lo, hi)))


@pytest.mark.parametrize("ac", [(False, False), (True, False),
                                (False, True), (True, True)])
def test_pairwise_parity_all_configs(ac):
    rng = random.Random(hash(ac) & 0xFFFF)
    for _ in range(12):
        s1 = _rand_seq(rng, 5, 120)
        s2 = _rand_seq(rng, 5, 140)
        hs, hm = gotoh(s1, s2, ac=ac)
        ds, dm = gotoh_device(s1, s2, ac=ac)
        assert ds == hs
        np.testing.assert_array_equal(dm, hm)


def test_profile_merge_parity():
    """Progressive-MSA shape: merge two already-merged multi-row
    alignments (end-free both, msa.h:91-109)."""
    rng = random.Random(7)
    sc = DnaScore()
    base = _rand_seq(rng, 80, 120)

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.05:
                continue
            if r < 0.10:
                out.append(rng.choice("ACGT"))
            else:
                out.append(ch)
        return "".join(out)

    reads = [mutate(base) for _ in range(6)]
    _, m01 = gotoh(reads[0], reads[1], ac=(True, True), sc=sc)
    _, m23 = gotoh(reads[2], reads[3], ac=(True, True), sc=sc)
    _, m45 = gotoh(reads[4], reads[5], ac=(True, True), sc=sc)
    hs, hm = gotoh(m01, m23, ac=(True, True), sc=sc)
    ds, dm = gotoh_device(m01, m23, ac=(True, True), sc=sc)
    assert ds == hs
    np.testing.assert_array_equal(dm, hm)
    # deeper merge with gaps + N letters in the profiles
    hs2, hm2 = gotoh(hm, m45, ac=(True, True), sc=sc)
    ds2, dm2 = gotoh_device(dm, m45, ac=(True, True), sc=sc)
    assert ds2 == hs2
    np.testing.assert_array_equal(dm2, hm2)


def test_n_letters_and_scoring_variants():
    rng = random.Random(3)
    sc = DnaScore(match=3, mismatch=-2, go=-6, ge=-2)
    for _ in range(8):
        s1 = _rand_seq(rng, 10, 80, alpha="ACGTN")
        s2 = _rand_seq(rng, 10, 80, alpha="ACGTN")
        hs, hm = gotoh(s1, s2, ac=(True, True), sc=sc)
        ds, dm = gotoh_device(s1, s2, ac=(True, True), sc=sc)
        assert ds == hs
        np.testing.assert_array_equal(dm, hm)


def test_msa_consensus_identical_through_device():
    """msa() consensus is identical when palign's merges run on the
    device kernel."""
    import delly_tpu.ops.msa as msa_mod
    rng = random.Random(11)
    base = _rand_seq(rng, 100, 140)
    reads = []
    for _ in range(8):
        s = list(base)
        for _k in range(3):
            p = rng.randrange(len(s))
            s[p] = rng.choice("ACGT")
        reads.append("".join(s))
    sup_h, cons_h = msa_mod.msa(reads, 2)
    orig = msa_mod.gotoh
    msa_mod.gotoh = gotoh_device
    try:
        sup_d, cons_d = msa_mod.msa(reads, 2)
    finally:
        msa_mod.gotoh = orig
    assert (sup_d, cons_d) == (sup_h, cons_h)


def test_lcs_device_kernel_parity():
    """Batched device LCS == scalar host LCS (msa.h:10-30)."""
    import jax.numpy as jnp

    from delly_tpu.ops.msa import _lcs_device_fn, lcs
    rng = random.Random(19)
    pairs = []
    for _ in range(40):
        a = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 150)))
        b = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 170)))
        pairs.append((a, b))
    m = max(len(a) for a, _ in pairs)
    n = max(len(b) for _, b in pairs)
    qa = np.zeros((len(pairs), m), dtype=np.uint8)
    tb = np.zeros((len(pairs), n), dtype=np.uint8)
    al = np.zeros(len(pairs), dtype=np.int32)
    bl = np.zeros(len(pairs), dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        qa[i, :len(a)] = np.frombuffer(a.encode(), dtype=np.uint8)
        tb[i, :len(b)] = np.frombuffer(b.encode(), dtype=np.uint8)
        al[i], bl[i] = len(a), len(b)
    fn = _lcs_device_fn()
    out = np.asarray(fn(jnp.asarray(qa), jnp.asarray(al),
                        jnp.asarray(tb), jnp.asarray(bl)))
    for i, (a, b) in enumerate(pairs):
        assert int(out[i]) == lcs(a, b), (i, a, b)


def test_softmasked_input_matches_host():
    """Lowercase (soft-masked) bytes must not be case-folded by the
    device profile path: host gotoh scores raw bytes, so mixed-case
    pairs fall back to the host oracle."""
    from delly_tpu.ops.gotoh import gotoh
    from delly_tpu.ops.gotoh_device import gotoh_device
    for s1, s2 in [("acgt", "ACGT"), ("ACgtAC", "ACGTAC"),
                   ("acgt", "acgt")]:
        h_best, h_m = gotoh(s1, s2)
        d_best, d_m = gotoh_device(s1, s2)
        assert h_best == d_best, (s1, s2)
        assert np.array_equal(h_m, d_m)
