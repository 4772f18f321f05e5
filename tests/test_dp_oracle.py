"""Differential oracle for the pairwise/MSA DP stack.

The reference's gotoh.h / needle.h / align.h / msa.h are pure C++
containers-only headers (boost used only for multi_array /
dynamic_bitset), so tests/dp_probe.cpp compiles them AS-IS against the
minimal shims in tests/boost_shim/ and drives them over a line
protocol.  This fuzzes the repo's from-scratch equivalents
(delly_tpu/ops/{gotoh,needle,msa}.py) against the real reference code
actually executing — scores, tie-broken tracebacks, merged alignment
rows, split-alignment joins, micro-homology scans, and full progressive
MSA consensus (LCS matrix -> UPGMA -> end-free profile gotoh ->
coverage-gated consensus).

Oracle targets and their production call sites:
  gotoh (profile, end-free)   msa.h:107 palign          ops/gotoh.py
  gotohScore                  (uncalled in reference)   ops/gotoh.py
  needle                      (uncalled in reference)   score-only vs
                                                        gotoh go=0
  longNeedle (semiglobal,     split.h:555 refinement    ops/needle.py
              DnaScore 1,-1,-1,-1)
  longestHomology             split.h:266-278 homology  ops/needle.py
  msa                         shortpe.h:185,252 sr/tra  ops/msa.py
                              consensus
"""

import os
import random
import shutil
import subprocess

import numpy as np
import pytest

from delly_tpu.ops.gotoh import (
    DnaScore, align_to_strings, gotoh, gotoh_score,
)
from delly_tpu.ops.msa import msa
from delly_tpu.ops.needle import long_needle, longest_homology

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "dp_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "gotoh.h"))):
        pytest.skip("g++ or reference DP headers unavailable")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", SHIM_DIR, "-I", REF_SRC,
         PROBE_SRC])

    def run(lines):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


def _seq(rng, lo, hi, alphabet="ACGT"):
    n = rng.randint(lo, hi)
    return "".join(rng.choice(alphabet) for _ in range(n))


def _mutate(rng, s, rate=0.08):
    out = []
    for ch in s:
        r = rng.random()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append(rng.choice("ACGT"))  # substitution
        elif r < rate:
            out.append(ch)
            out.append(rng.choice("ACGT"))  # insertion
        else:
            out.append(ch)
    return "".join(out)


def _tok(s):
    return s if s else "."


CONFIGS = [(0, 0), (1, 0), (0, 1), (1, 1)]
SCORES = [(5, -4, -10, -1), (1, -1, -1, -1), (3, -2, -4, -2)]


def _pair_corpus(rng, n, lo=1, hi=120, alphabet="ACGTacgtN"):
    pairs = []
    for _ in range(n):
        if rng.random() < 0.5:
            s1 = _seq(rng, lo, hi, alphabet)
            s2 = _mutate(rng, s1)
            if not s2:
                s2 = "A"
        else:
            s1 = _seq(rng, lo, hi, alphabet)
            s2 = _seq(rng, lo, hi, alphabet)
        pairs.append((s1, s2))
    return pairs


def test_gotoh_matches_reference(oracle):
    """Score + tie-broken traceback rows vs reference gotoh
    (gotoh.h:71-174), all four AlignConfig variants."""
    rng = random.Random(101)
    cases = []
    for i, (s1, s2) in enumerate(_pair_corpus(rng, 240)):
        h, v = CONFIGS[i % 4]
        m, mm, go, ge = SCORES[i % 3]
        cases.append((h, v, m, mm, go, ge, s1, s2))
    lines = [f"GOTOH {h} {v} {m} {mm} {go} {ge} {_tok(s1)} {_tok(s2)}"
             for h, v, m, mm, go, ge, s1, s2 in cases]
    for case, out in zip(cases, oracle(lines)):
        h, v, m, mm, go, ge, s1, s2 = case
        parts = out.split()
        ref_score = int(parts[0])
        ref_rows = ["" if p == "." else p for p in parts[1:]]
        score, merged = gotoh(s1, s2, (bool(h), bool(v)),
                              DnaScore(m, mm, go, ge))
        assert score == ref_score, case
        assert align_to_strings(merged) == ref_rows, case


def test_gotoh_score_matches_reference(oracle):
    rng = random.Random(202)
    cases = []
    for i, (s1, s2) in enumerate(_pair_corpus(rng, 160)):
        h, v = CONFIGS[i % 4]
        m, mm, go, ge = SCORES[(i + 1) % 3]
        cases.append((h, v, m, mm, go, ge, s1, s2))
    lines = [f"GOTOHSCORE {h} {v} {m} {mm} {go} {ge} "
             f"{_tok(s1)} {_tok(s2)}"
             for h, v, m, mm, go, ge, s1, s2 in cases]
    for case, out in zip(cases, oracle(lines)):
        h, v, m, mm, go, ge, s1, s2 = case
        assert gotoh_score(s1, s2, (bool(h), bool(v)),
                           DnaScore(m, mm, go, ge)) == int(out), case


def test_needle_score_matches_gotoh_zero_open(oracle):
    """needle (needle.h:225-304) is uncalled in the reference; its
    linear-gap score equals gotoh with go=0, which is what the repo
    provides.  Traceback tie order differs by design, so only the
    score is pinned."""
    rng = random.Random(303)
    cases = []
    for i, (s1, s2) in enumerate(_pair_corpus(rng, 120)):
        h, v = CONFIGS[i % 4]
        m, mm, _go, ge = SCORES[i % 3]
        cases.append((h, v, m, mm, ge, s1, s2))
    lines = [f"NEEDLE {h} {v} {m} {mm} {ge} {_tok(s1)} {_tok(s2)}"
             for h, v, m, mm, ge, s1, s2 in cases]
    for case, out in zip(cases, oracle(lines)):
        h, v, m, mm, ge, s1, s2 = case
        ref_score = int(out.split()[0])
        assert gotoh_score(s1, s2, (bool(h), bool(v)),
                           DnaScore(m, mm, 0, ge)) == ref_score, case


def _junction_corpus(rng, n):
    """Consensus-across-an-SV cases: reference probe contains the
    junction flanks; consensus misses (DEL) or adds (INS) a middle
    segment — the shape split.h:555 feeds longNeedle."""
    cases = []
    for _ in range(n):
        left = _seq(rng, 20, 80)
        right = _seq(rng, 20, 80)
        mid = _seq(rng, 5, 60)
        if rng.random() < 0.5:
            cons = _mutate(rng, left + right, 0.04)
            ref = left + mid + right
        else:
            cons = _mutate(rng, left + mid + right, 0.04)
            ref = left + right
        if not cons:
            cons = "A"
        cases.append((cons, ref))
    # plus unrelated/identical pairs (no-split paths)
    for _ in range(n // 3):
        s1 = _seq(rng, 10, 100)
        cases.append((s1, s1 if rng.random() < 0.5
                      else _seq(rng, 10, 100)))
    return cases


def test_long_needle_matches_reference(oracle):
    """Split alignment vs reference longNeedle (needle.h:45-222) with
    split.h:541-554's exact config (semiglobal, DnaScore 1,-1,-1,-1)."""
    rng = random.Random(404)
    cases = _junction_corpus(rng, 200)
    lines = [f"LONGNEEDLE 1 0 1 -1 -1 {_tok(s1)} {_tok(s2)}"
             for s1, s2 in cases]
    n_splits = 0
    for case, out in zip(cases, oracle(lines)):
        s1, s2 = case
        mine = long_needle(s1, s2, DnaScore(1, -1, -1, -1))
        parts = out.split()
        if parts[0] == "0":
            assert mine is None, case
        else:
            n_splits += 1
            assert mine is not None, case
            ref_rows = ["" if p == "." else p for p in parts[1:]]
            assert align_to_strings(mine) == ref_rows, case
    assert n_splits >= 50  # corpus must actually exercise splits


def test_longest_homology_matches_reference(oracle):
    """Micro-homology scan vs needle.h:13-42 with split.h's
    scoreThreshold=-1 plus other thresholds."""
    rng = random.Random(505)
    cases = []
    for i in range(300):
        if rng.random() < 0.6:
            hom = _seq(rng, 0, 30)
            s1 = hom + _seq(rng, 0, 60)
            s2 = hom + _seq(rng, 0, 60)
        else:
            s1 = _seq(rng, 1, 80)
            s2 = _seq(rng, 1, 80)
        thr = -1 if i % 3 else -rng.randint(1, 4)
        cases.append((thr, s1, s2))
    lines = [f"LONGHOM {thr} {_tok(s1)} {_tok(s2)}"
             for thr, s1, s2 in cases]
    for case, out in zip(cases, oracle(lines)):
        thr, s1, s2 = case
        assert longest_homology(s1, s2, thr) == int(out), case


def _read_stack(rng, n_reads, base_lo=40, base_hi=150):
    """Reads over one locus: mutated, truncated copies of a base
    haplotype — what seqStore feeds msa (shortpe.h:185)."""
    base = _seq(rng, base_lo, base_hi)
    reads = []
    for _ in range(n_reads):
        r = rng.random()
        if r < 0.2:
            reads.append(base)
        else:
            s = _mutate(rng, base, 0.06)
            if rng.random() < 0.4:  # partial span
                a = rng.randint(0, len(s) // 3)
                b = rng.randint(2 * len(s) // 3, len(s))
                s = s[a:b]
            reads.append(s if s else "A")
    return reads


def test_msa_matches_reference(oracle):
    """Full progressive-MSA consensus vs reference msa()
    (msa.h:185-239): LCS similarity matrix, UPGMA guide tree incl. its
    tie-breaking, recursive end-free profile gotoh, coverage-gated
    column consensus."""
    rng = random.Random(606)
    cases = []
    for i in range(90):
        n_reads = rng.randint(1, 8)
        mcs = rng.randint(2, 5)
        m, mm, go, ge = SCORES[i % 3] if i % 4 else (5, -4, -10, -1)
        cases.append((mcs, m, mm, go, ge, _read_stack(rng, n_reads)))
    lines = [f"MSA {mcs} {m} {mm} {go} {ge} {len(reads)} "
             + " ".join(_tok(r) for r in reads)
             for mcs, m, mm, go, ge, reads in cases]
    for case, out in zip(cases, oracle(lines)):
        mcs, m, mm, go, ge, reads = case
        parts = out.split()
        ref_support = int(parts[0])
        ref_cs = "" if parts[1] == "." else parts[1]
        support, cs = msa(reads, mcs, DnaScore(m, mm, go, ge))
        assert (support, cs) == (ref_support, ref_cs), case
