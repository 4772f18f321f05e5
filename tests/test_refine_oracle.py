"""Differential oracle for the breakpoint-refinement engine.

tests/refine_probe.cpp compiles the reference's split.h AS-IS (with
tags.h, the gotoh/needle DP stack and edlib.cpp) and drives its
alignConsensus() entry over a line protocol; this module fuzzes
delly_tpu/models/refine.py against it across all SV types: reference
junction-probe construction (_getSVRef, split.h:70-163), the
longNeedle/splitAlign consensus alignment, largest-gap split detection
and percent-identity gating (split.h:319-375,282-316), micro-homology
(split.h:262-280), per-svt coordinate back-transform
(split.h:166-244), exact small-indel REF/ALT alleles and the final sv
field updates (split.h:560-642).
"""

import os
import random
import shutil
import subprocess
import types

import numpy as np
import pytest

from delly_tpu.models.refine import align_consensus
from delly_tpu.utils.tags import StructuralVariantRecord, revcomp

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "refine_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "split.h"))):
        pytest.skip("g++ or reference split.h unavailable")
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


def _mutate(rng, s, rate):
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
    return "".join(out)


CFGS = [  # (minFlank, flankQ, consWindow, indelsize) — sr & lr presets
    (13, 0.95, 100, 1000),
    (13, 0.9, 100, 250),
    (25, 0.95, 200, 1000),
    (100, 0.9, 1000, 10000),
]


def _case(rng, i):
    """One synthetic SV junction: (svt, realign, cfg, chr2, svStart,
    svEnd, insLen, cons, seq1, seq2)."""
    svt = rng.choice([0, 1, 2, 2, 2, 3, 4, 4, 5, 6, 7, 8])
    cfg = CFGS[i % len(CFGS)]
    L = rng.randint(2000, 3500)
    seq1 = _seq(rng, L)
    seq2 = ""
    w = rng.randint(80, 220)
    err = rng.choice([0.0, 0.01, 0.03])
    jit = lambda: rng.randint(-25, 25)
    ins_len = 0
    if svt == 2:  # deletion junction
        size = rng.choice([rng.randint(60, 240), rng.randint(300, 1200)])
        a = rng.randint(400, L - size - 400)
        b = a + size
        cons = seq1[a - w:a] + seq1[b:b + w]
        start, end = a + jit(), b + jit()
    elif svt == 4:  # insertion
        a = rng.randint(400, L - 400)
        ins = _seq(rng, rng.randint(30, 500))
        cons = seq1[a - w:a] + ins + seq1[a:a + w]
        start, end = a + jit(), a + jit() + 2
        ins_len = max(0, len(ins) + rng.randint(-10, 10))
    elif svt == 3:  # tandem-duplication junction
        size = rng.randint(200, 1200)
        a = rng.randint(400, L - size - 400)
        b = a + size
        cons = seq1[b - w:b] + seq1[a:a + w]
        start, end = a + jit(), b + jit()
    elif svt in (0, 1):  # inversion junctions
        size = rng.randint(300, 1200)
        a = rng.randint(400, L - size - 400)
        b = a + size
        if svt == 0:
            cons = seq1[a - w:a] + revcomp(seq1[b - w:b])
        else:
            cons = revcomp(seq1[a:a + w]) + seq1[b:b + w]
        start, end = a + jit(), b + jit()
    else:  # translocation junction onto a second chromosome
        seq2 = _seq(rng, rng.randint(1500, 2500))
        a = rng.randint(400, L - 400)
        b = rng.randint(400, len(seq2) - 400)
        ct = svt - 5
        if ct == 0:
            cons = seq1[a - w:a] + revcomp(seq2[b - w:b])
        elif ct == 1:
            cons = revcomp(seq1[a:a + w]) + seq2[b:b + w]
        elif ct == 2:
            cons = seq1[a - w:a] + seq2[b:b + w]
        else:
            cons = seq2[b - w:b] + seq1[a:a + w]
        start, end = a + jit(), b + jit()
    cons = _mutate(rng, cons, err) or "A"
    realign = 0
    if rng.random() < 0.25:
        realign = 1
        if rng.random() < 0.5:
            cons = revcomp(cons)
    # occasional garbage consensus exercises every rejection path
    if rng.random() < 0.12:
        cons = _seq(rng, len(cons))
    start = max(50, min(start, L - 50))
    if seq2:  # translocation: end lives on chr2, no ordering vs start
        end = max(50, min(end, len(seq2) - 50))
    else:
        end = max(start + 1, min(end, L - 50))
    return (svt, realign, cfg, 1 if seq2 else 0, start, end, ins_len,
            cons, seq1, seq2)


def _fields(sv):
    return (sv.svStart, sv.svEnd, sv.ciposlow, sv.ciposhigh,
            sv.ciendlow, sv.ciendhigh, sv.insLen, sv.homLen, sv.consBp,
            np.float32(sv.srAlignQuality), sv.alleles or ".",
            sv.consensus)


def test_refinement_matches_reference(oracle):
    rng = random.Random(777)
    cases = [_case(rng, i) for i in range(400)]
    lines = []
    for (svt, realign, cfg, chr2, start, end, ins_len, cons, seq1,
         seq2) in cases:
        mf, fq, cw, isz = cfg
        lines.append(
            f"REFINE {svt} {realign} {mf} {fq} {cw} {isz} 0 {chr2} "
            f"{start} {end} {ins_len} {cons} {seq1} {seq2 or '.'}")
    outs = oracle(lines)
    n_ok = 0
    for case, out in zip(cases, outs):
        (svt, realign, cfg, chr2, start, end, ins_len, cons, seq1,
         seq2) = case
        mf, fq, cw, isz = cfg
        mycfg = types.SimpleNamespace(
            min_flank_size=mf, flank_quality=fq, min_cons_window=cw,
            indelsize=isz)
        sv = StructuralVariantRecord()
        sv.chr, sv.chr2 = 0, chr2
        sv.svStart, sv.svEnd = start, end
        sv.svt, sv.insLen = svt, ins_len
        sv.consensus = cons
        ok = align_consensus(mycfg, [len(seq1), len(seq2)], seq1,
                             seq2 or None, sv, bool(realign))
        tag = (svt, realign, cfg, start, end, cons[:40])
        if out == "0":
            assert not ok, (tag, _fields(sv))
            continue
        n_ok += 1
        assert ok, (tag, out[:120])
        parts = out.split()
        ref = (int(parts[1]), int(parts[2]), int(parts[3]),
               int(parts[4]), int(parts[5]), int(parts[6]),
               int(parts[7]), int(parts[8]), int(parts[9]),
               np.float32(parts[10]), parts[11], parts[12])
        assert _fields(sv) == ref, tag
    # the corpus must exercise plenty of accepted refinements
    assert n_ok >= 150, n_ok
