"""Differential oracle for MEI/TR annotation, genotyping CIGAR helpers
and 5mC call building.

tests/anno_probe.cpp compiles the reference's svanno.h, methyl.h and
genotype.h AS-IS and drives them over a line protocol; this module
fuzzes delly_tpu/models/{svanno,genotype_lr,methyl}.py against the
live reference: autocorrelation tandem-repeat detection
(svanno.h:42-56), the full annotateSV (TSD/homology scans, INS
classification against the embedded MEI templates fwd+rev, TR
templating incl. reference-unit periods, svanno.h:58-237),
_findSeqBp/_readStart/_readEnd (genotype.h:31-91), and
buildMethylCalls MM/ML parsing with skip-status semantics
(methyl.h:121-215).
"""

import os
import random
import shutil
import subprocess
import types

import numpy as np
import pytest

from delly_tpu.models.genotype_lr import find_seq_bp
from delly_tpu.models.methyl import build_methyl_calls
from delly_tpu.models.svanno import (
    _MEI_TEMPLATES as MEI_TEMPLATES, annotate_sv, detect_tandem_repeat,
)
from delly_tpu.utils.tags import StructuralVariantRecord

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "anno_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")

OPS = "MIDNSHP=X"


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "svanno.h"))):
        pytest.skip("g++ or reference svanno.h unavailable")
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


def _seq(rng, lo, hi):
    return "".join(rng.choice("ACGT")
                   for _ in range(rng.randint(lo, hi)))


def _mut(rng, s, rate):
    return "".join(rng.choice("ACGT") if rng.random() < rate else ch
                   for ch in s)


def test_tandem_repeat_matches_reference(oracle):
    rng = random.Random(10101)
    cases = []
    for _ in range(200):
        if rng.random() < 0.6:
            unit = _seq(rng, 1, 30)
            s = _mut(rng, unit * rng.randint(2, 60), 0.03)[:600]
        else:
            s = _seq(rng, 5, 400)
        cases.append((rng.choice([100, 30]),
                      rng.choice([0.85, 0.95]), s or "A"))
    lines = [f"TRDET {mp} {np.float32(mf):.9g} {s}"
             for mp, mf, s in cases]
    for (mp, mf, s), out in zip(cases, oracle(lines)):
        p, c = out.split()
        period, copies = detect_tandem_repeat(s, mp,
                                              float(np.float32(mf)))
        assert (period, f"{np.float32(copies):.9g}") == (int(p), c), \
            (mp, mf, s)


def test_annotate_sv_matches_reference(oracle):
    rng = random.Random(10202)
    cases = []
    for i in range(120):
        L = rng.randint(4000, 9000)
        seq = list(_seq(rng, L, L))
        svt = rng.choice([2, 2, 3, 0, 4, 4, 4])
        if svt == 4:
            start = rng.randint(500, L - 500)
            end = start + 1
            kind = rng.random()
            if kind < 0.35:  # MEI-like insertion
                tmpl = rng.choice(list(MEI_TEMPLATES.values()))
                ins = _mut(rng, tmpl[:rng.randint(80, len(tmpl))], 0.05)
                if rng.random() < 0.4:
                    ins = ins[::-1].translate(
                        str.maketrans("ACGT", "TGCA"))
            elif kind < 0.7:  # TR insertion
                unit = _seq(rng, 2, 20)
                ins = _mut(rng, unit * rng.randint(3, 50), 0.03)
            else:
                ins = _seq(rng, 20, 600)
            if rng.random() < 0.3:  # TSD: insertion copies the flank
                ins = ins + "".join(seq[start - 1:start - 1
                                        + rng.randint(3, 25)])
            alleles = "A," + "A" + ins
        else:
            start = rng.randint(500, L - 3000)
            end = start + rng.randint(100, 2000)
            if rng.random() < 0.5:  # implant breakpoint homology
                h = rng.randint(3, 40)
                seq[end:end + h] = seq[start:start + h]
            if svt == 2 and rng.random() < 0.4:  # TR deletion
                unit = _seq(rng, 2, 15)
                body = (unit * 400)[:end - start + 100]
                seq[start - 50:start - 50 + len(body)] = list(body)
            alleles = ""
        cases.append((svt, start, end, alleles, "".join(seq)[:L]))
    lines = [f"ANNO 0.7 0.8 {len(seq)} {svt} {start} {end} "
             f"{alleles or '.'} {seq}"
             for svt, start, end, alleles, seq in cases]
    cfg = types.SimpleNamespace(mei_min_frac=float(np.float32(0.7)),
                                tr_min_frac=float(np.float32(0.8)))
    n_typed = 0
    for (svt, start, end, alleles, seq), out in zip(cases,
                                                    oracle(lines)):
        sv = StructuralVariantRecord()
        sv.chr = 0
        sv.svt = svt
        sv.svStart = start
        sv.svEnd = end
        sv.alleles = alleles
        annotate_sv(cfg, [len(seq)], seq, sv)
        rc, st, hl, tp, tc = out.split()
        mine = (int(sv.anno.isRC), sv.anno.seqType, sv.anno.homLen,
                sv.anno.trPeriod, f"{np.float32(sv.anno.trCopies):.9g}")
        assert mine == (int(rc), int(st), int(hl), int(tp), tc), \
            (svt, start, end, alleles[:60])
        n_typed += int(st) > 0
    assert n_typed >= 25


class _Rec:
    def __init__(self, pos, cigar):
        self.pos = pos
        self.cigar_ops = []
        self.cigar_lens = []
        n = 0
        for ch in cigar:
            if ch.isdigit():
                n = n * 10 + int(ch)
            else:
                self.cigar_ops.append(OPS.index(ch))
                self.cigar_lens.append(n)
                n = 0
        self.n_cigar = len(self.cigar_ops)


def test_find_seq_bp_matches_reference(oracle):
    rng = random.Random(10303)
    cases = []
    for _ in range(250):
        pos = rng.randint(0, 50000)
        parts = []
        if rng.random() < 0.6:
            parts.append(f"{rng.randint(1, 500)}{rng.choice('SH')}")
        parts.append(f"{rng.randint(10, 800)}M")
        for _ in range(rng.randint(0, 4)):
            parts.append(f"{rng.randint(1, 300)}{rng.choice('DIN')}")
            parts.append(f"{rng.randint(10, 500)}M")
        if rng.random() < 0.6:
            parts.append(f"{rng.randint(1, 500)}{rng.choice('SH')}")
        cig = "".join(parts)
        bp = pos + rng.randint(-200, 2500)
        cases.append((max(0, bp), pos, cig))
    lines = [f"SEQBP {bp} {pos} {cig}" for bp, pos, cig in cases]
    for (bp, pos, cig), out in zip(cases, oracle(lines)):
        sbp, rstart, rend = (int(x) for x in out.split())
        r = _Rec(pos, cig)
        assert find_seq_bp(r, bp) == sbp, (bp, pos, cig)
        # readStart/readEnd formulas (genotype.h:31-57), as vectorized
        # in genotype_lr.py's rs/re window computation
        lead = (r.cigar_lens[0]
                if r.cigar_ops[0] in (4, 5) else 0)
        trail = (r.cigar_lens[-1]
                 if r.cigar_ops[-1] in (4, 5) else 0)
        refspan = sum(l for o, l in zip(r.cigar_ops, r.cigar_lens)
                      if o in (0, 2, 3, 7, 8))
        assert max(0, pos - lead) == rstart, (pos, cig)
        assert pos + refspan + trail == rend, (pos, cig)


def test_build_methyl_calls_matches_reference(oracle):
    rng = random.Random(10404)
    cases = []
    for _ in range(200):
        seq = _seq(rng, 20, 300)
        flag = rng.choice([0, 16])
        fwd = seq
        if flag:  # MM refers to the forward strand
            fwd = seq[::-1].translate(str.maketrans("ACGT", "TGCA"))
        ncs = fwd.count("C")
        mode = rng.random()
        if mode < 0.15:
            mm = ""  # no tag
            ml = []
        else:
            skip = rng.choice(["", ".", "?"])
            nhits = rng.randint(0, max(0, min(ncs, 12)))
            deltas = []
            left = ncs
            for _ in range(nhits):
                if left <= 0:
                    break
                d = rng.randint(0, min(3, left - 1))
                deltas.append(d)
                left -= d + 1
            mm = ("C+m" + skip
                  + "".join(f",{d}" for d in deltas) + ";")
            if mode < 0.3:  # extra non-5mC modification block
                mm += "A+a,0;"
            ml = [rng.randint(0, 255) for _ in deltas]
            if mode < 0.25 and ml:
                ml = ml[:-1]  # short ML array
        cases.append((rng.choice([128, 200]), flag, seq, mm, ml))
    lines = [f"METHYL {th} {flag} {seq} {mm or '.'} "
             + (",".join(map(str, ml)) if ml else "-")
             for th, flag, seq, mm, ml in cases]
    n_called = 0
    for (th, flag, seq, mm, ml), out in zip(cases, oracle(lines)):
        has_s, calls_s = out.split()
        ref_calls = ([int(x) for x in calls_s.split(",")]
                     if calls_s != "-" else [])
        rec = types.SimpleNamespace(
            l_qseq=len(seq), flag=flag, seq=seq,
            aux=lambda tag, mm=mm, ml=ml: (
                (mm if mm else None) if tag == "MM"
                else (np.asarray(ml, dtype=np.uint8) if ml else None)))
        has, calls = build_methyl_calls(rec, th)
        assert int(has) == int(has_s), (th, flag, seq, mm, ml)
        assert list(calls) == ref_calls, (th, flag, seq, mm, ml)
        n_called += sum(1 for c in ref_calls if c == 1)
    assert n_called >= 50
