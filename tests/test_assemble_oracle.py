"""Differential oracle for the consensus assembly engine.

tests/assemble_probe.cpp compiles the reference's assemble.h AS-IS
(with the DP stack and edlib.cpp) and drives msaEdlib / msaWfa /
fillKmerTable+bestDiagonal over a line protocol; this module fuzzes
delly_tpu/models/assemble.py against the live reference: all-pairs NW
scoring, centroid seed selection, worst-20% drop, incremental
IUPAC-consensus alignment (assemble.h:385-473), coverage-gated
consensus + 5% end trim, and the msaWfa superstring path (7-mer
tables, best-diagonal overlap layout, superstring gluing, HW
re-alignment, prefix/suffix trim, assemble.h:501-728).
"""

import os
import random
import shutil
import subprocess
import types

import pytest

from delly_tpu.models.assemble import (
    best_diagonal, fill_kmer_table, msa_edlib, msa_wfa,
)

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "assemble_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "assemble.h"))):
        pytest.skip("g++ or reference assemble.h unavailable")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", SHIM_DIR, "-I", REF_SRC,
         PROBE_SRC, os.path.join(REF_SRC, "edlib.cpp")])

    def run(lines):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


def _seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _noisy(rng, s, rate):
    out = []
    for ch in s:
        r = rng.random()
        if r < rate / 4:
            continue
        if r < rate / 2:
            out.append(rng.choice("ACGT"))
        elif r < 0.75 * rate:
            out.append(ch)
            out.append(rng.choice("ACGT"))
        else:
            out.append(ch)
    return "".join(out) or "A"


def _read_stack(rng, n, lo=80, hi=400, err=None):
    """LR-style read windows over one haplotype (what seqStore feeds
    msaEdlib, assemble.h:806-830)."""
    base = _seq(rng, rng.randint(lo, hi))
    err = rng.choice([0.02, 0.05, 0.10]) if err is None else err
    reads = []
    for _ in range(n):
        s = base
        if rng.random() < 0.5:  # partial span
            a = rng.randint(0, len(s) // 4)
            b = rng.randint(3 * len(s) // 4, len(s))
            s = s[a:b]
        reads.append(_noisy(rng, s, err))
    return reads


def test_msa_edlib_matches_reference(oracle):
    rng = random.Random(909)
    cases = []
    for _ in range(70):
        n = rng.randint(1, 12)
        mcs = rng.randint(2, 5)
        cases.append((mcs, _read_stack(rng, n)))
    lines = [f"MSAEDLIB {mcs} {len(reads)} " + " ".join(reads)
             for mcs, reads in cases]
    for (mcs, reads), out in zip(cases, oracle(lines)):
        cfg = types.SimpleNamespace(min_clique_size=mcs)
        support, cs = msa_edlib(cfg, list(reads))
        parts = out.split()
        ref = (int(parts[0]), "" if parts[1] == "." else parts[1])
        assert (support, cs) == ref, (mcs, reads)


def test_msa_wfa_matches_reference(oracle):
    """INS-path consensus: overlapping read windows tiled across a long
    insertion haplotype, with the flank prefix/suffix trim."""
    rng = random.Random(919)
    cases = []
    for _ in range(50):
        hap = _seq(rng, rng.randint(200, 900))
        pre = _seq(rng, rng.randint(0, 60))
        suf = _seq(rng, rng.randint(0, 60))
        n = rng.randint(2, 8)
        reads = []
        for _ in range(n):
            a = rng.randint(0, max(0, len(hap) - 150))
            b = min(len(hap), a + rng.randint(120, 400))
            reads.append(_noisy(rng, hap[a:b], rng.choice([0.0, 0.03])))
        mcs = rng.randint(2, 4)
        cases.append((mcs, pre, suf, reads))
    lines = [f"MSAWFA {mcs} {pre or '.'} {suf or '.'} {len(reads)} "
             + " ".join(reads)
             for mcs, pre, suf, reads in cases]
    for (mcs, pre, suf, reads), out in zip(cases, oracle(lines)):
        cfg = types.SimpleNamespace(min_clique_size=mcs)
        support, cs = msa_wfa(cfg, list(reads), pre, suf)
        parts = out.split()
        ref = (int(parts[0]), "" if parts[1] == "." else parts[1])
        assert (support, cs) == ref, (mcs, pre, suf, reads)


def test_best_diagonal_matches_reference(oracle):
    rng = random.Random(929)
    cases = []
    for _ in range(200):
        if rng.random() < 0.6:  # genuine overlap
            base = _seq(rng, rng.randint(60, 400))
            cut = rng.randint(0, len(base) - 30)
            s1 = base[:rng.randint(cut + 30, len(base))]
            s2 = base[cut:]
        else:
            s1 = _seq(rng, rng.randint(8, 300))
            s2 = _seq(rng, rng.randint(8, 300))
        cases.append((s1, s2))
    lines = [f"KMERDIAG {s1} {s2}" for s1, s2 in cases]
    for (s1, s2), out in zip(cases, oracle(lines)):
        mine = best_diagonal(fill_kmer_table(s1), fill_kmer_table(s2),
                             len(s1), len(s2))
        assert int(mine) == int(out), (s1, s2)
