"""Batched Pallas Gotoh kernel: bit-identical parity with the host
oracle (ops.gotoh.gotoh) in interpret mode on CPU.

Covers all four AlignConfig variants, multi-row profile merges (the
progressive-MSA shape), multi-tile batches, mixed size buckets, and
the host-fallback paths.
"""

import random

import numpy as np
import pytest

from delly_tpu.ops.gotoh import DnaScore, gotoh
from delly_tpu.ops.gotoh_pallas import MAX_K, TILE_B, gotoh_batch


def _rand_seq(rng, lo, hi, alpha="ACGT"):
    return "".join(rng.choice(alpha) for _ in range(rng.randint(lo, hi)))


def _mutate(rng, s):
    out = []
    for ch in s:
        r = rng.random()
        if r < 0.05:
            continue
        out.append(rng.choice("ACGT") if r < 0.10 else ch)
        if rng.random() < 0.03:
            out.append(rng.choice("ACGT"))
    return "".join(out)


def _assert_jobs_match(jobs, ac, **kw):
    got = gotoh_batch(jobs, ac=ac, interpret=True, **kw)
    for (a1, a2), (ds, dm) in zip(jobs, got):
        hs, hm = gotoh(a1, a2, ac=ac, **kw)
        assert ds == hs
        np.testing.assert_array_equal(dm, hm)


@pytest.mark.parametrize("ac", [(False, False), (True, False),
                                (False, True), (True, True)])
def test_pairwise_parity_all_configs(ac):
    rng = random.Random(hash(ac) & 0xFFFF)
    jobs = [(_rand_seq(rng, 1, 120), _rand_seq(rng, 1, 140))
            for _ in range(12)]
    _assert_jobs_match(jobs, ac)


def test_small_fuzz_all_configs():
    rng = random.Random(11)
    for _ in range(60):
        ac = (rng.random() < 0.5, rng.random() < 0.5)
        jobs = [(_rand_seq(rng, 1, 12, "ACGTN"),
                 _rand_seq(rng, 1, 12, "ACGTN"))]
        _assert_jobs_match(jobs, ac)


def test_profile_merge_multi_tile():
    """20 multi-row profile merges (> 2 sublane tiles) in one call."""
    rng = random.Random(7)
    base = _rand_seq(rng, 150, 250)
    reads = [_mutate(rng, base) for _ in range(6)]
    m1 = gotoh(reads[0], reads[1], ac=(True, True))[1]
    m2 = gotoh(reads[2], reads[3], ac=(True, True))[1]
    m3 = gotoh(m1, m2, ac=(True, True))[1]
    jobs = [(m1, m2), (m3, reads[4]), (m3, m1),
            (reads[4], reads[5])] * 5
    assert len(jobs) > 2 * TILE_B
    _assert_jobs_match(jobs, (True, True))


def test_mixed_buckets_one_call():
    rng = random.Random(5)
    jobs = [(_rand_seq(rng, 50, 100), _rand_seq(rng, 50, 100)),
            (_rand_seq(rng, 300, 400), _rand_seq(rng, 300, 400)),
            (_rand_seq(rng, 520, 600), _rand_seq(rng, 520, 600))]
    _assert_jobs_match(jobs, (True, True))


def test_nondefault_scoring():
    rng = random.Random(13)
    jobs = [(_rand_seq(rng, 20, 80), _rand_seq(rng, 20, 80))
            for _ in range(4)]
    _assert_jobs_match(jobs, (False, False), sc=DnaScore(2, -3, -6, -2))


def test_fallback_paths():
    """Exotic alphabet and oversized jobs fall back to the host DP
    inside the same call, preserving order."""
    rng = random.Random(17)
    jobs = [(_rand_seq(rng, 10, 30), _rand_seq(rng, 10, 30)),
            ("ACXGT", "ACGT"),        # non-ACGTN- byte
            ("A" * (MAX_K + 1), "AC")]  # oversized
    got = gotoh_batch(jobs, ac=(True, True), interpret=True)
    for (a1, a2), (ds, dm) in zip(jobs, got):
        hs, hm = gotoh(a1, a2, ac=(True, True))
        assert ds == hs
        np.testing.assert_array_equal(dm, hm)


def test_msa_batch_parity_both_paths(monkeypatch):
    """Lockstep msa_batch == per-item msa(), on the host path and on
    the forced Pallas path."""
    import delly_tpu.ops.msa as M
    from delly_tpu.ops.msa import distance_matrix, msa, msa_batch
    rng = random.Random(5)
    items = []
    for _ in range(5):
        base = _rand_seq(rng, 120, 260)
        seqs = [_mutate(rng, base) for _ in range(rng.randint(2, 7))]
        items.append((seqs, distance_matrix(seqs)))
    want = [msa(s, 2, d=d.copy()) for s, d in items]
    monkeypatch.setenv("DELLY_TPU_GOTOH_PALLAS", "never")
    monkeypatch.setattr(M, "_pallas_pref", None)
    assert msa_batch(items, 2) == want
    monkeypatch.setenv("DELLY_TPU_GOTOH_PALLAS", "always")
    monkeypatch.setattr(M, "_pallas_pref", None)
    assert msa_batch(items, 2) == want
    monkeypatch.setattr(M, "_pallas_pref", None)


def test_sr_e2e_pallas_msa_identical(tmp_path, monkeypatch):
    """sr on the example data with the Pallas MSA path forced produces
    byte-identical output to the default path."""
    import subprocess
    import sys
    ref = "/root/reference/example"
    outs = []
    for mode in ("never", "always"):
        out = str(tmp_path / f"sr_{mode}.vcf")
        env = dict(__import__("os").environ,
                   DELLY_TPU_GOTOH_PALLAS=mode, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "delly_tpu.cli", "sr", "-g",
             f"{ref}/ref.fa", "-o", out, f"{ref}/sr.bam"],
            capture_output=True, text=True, timeout=590, env=env)
        assert r.returncode == 0, r.stderr[-1500:]
        outs.append(open(out).read())
    assert outs[0] == outs[1]
    assert len([l for l in outs[0].splitlines()
                if not l.startswith("#")]) == 1
