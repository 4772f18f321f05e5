"""Differential oracle for SR-genotyping probe construction.

tests/geno_probe.cpp compiles the reference's coverage.h AS-IS and
drives it over a line protocol; this module fuzzes
delly_tpu/models/genotype_sr.py against the live reference: the HW
alignment scorer with its 2*flankQuality*len k-cutoff and
(1-fq)*len/(ed+1) transform (coverage.h:107-116), the per-svt probe
window cut transforms (:117-162), and the full _generateProbes pass —
allele tagging (incl. BND bracket alleles), per-svt reference probes,
consensus re-alignment + split detection, homology-padded REF/ALT
probe windows and sorted BpRegion tracks (:164-263).
"""

import os
import random
import shutil
import subprocess
import types

import numpy as np
import pytest

from delly_tpu.models.genotype_sr import (
    cut_ref_end, cut_ref_start, generate_probes,
)
from delly_tpu.ops.edist import MODE_HW, edit_distance
from delly_tpu.utils.tags import StructuralVariantRecord, revcomp

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "geno_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "coverage.h"))):
        pytest.skip("g++ or reference coverage.h unavailable")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", SHIM_DIR, "-I", REF_SRC,
         PROBE_SRC, os.path.join(REF_SRC, "edlib.cpp"), "-pthread"])

    def run(lines):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


def _seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_hw_score_and_cuts_match_reference(oracle):
    rng = random.Random(12121)
    lines = []
    checks = []
    for _ in range(250):
        t = _seq(rng, rng.randint(30, 400))
        if rng.random() < 0.6:  # embedded query with noise
            a = rng.randint(0, max(0, len(t) - 25))
            q = "".join(rng.choice("ACGT") if rng.random() < 0.08 else ch
                        for ch in t[a:a + rng.randint(20, 80)])
        else:
            q = _seq(rng, rng.randint(20, 120))
        fq = rng.choice([0.95, 0.9, 0.8])
        lines.append(f"HWSCORE {np.float32(fq):.9g} {q or 'A'} {t}")
        checks.append(("HW", (fq, q or "A", t)))
    for _ in range(250):
        svt = rng.choice([0, 1, 2, 3, 4, 5, 6, 7, 8])
        rs = rng.randint(0, 2000)
        re_ = rs + rng.randint(0, 3000)
        offl, offr = rng.randint(0, 200), rng.randint(0, 200)
        bp = rng.randint(0, 1)
        lines.append(f"CUTREF {bp} {svt} {rs} {re_} {offl} {offr}")
        checks.append(("CUT", (bp, svt, rs, re_, offl, offr)))
    for (op, arg), out in zip(checks, oracle(lines)):
        if op == "HW":
            fq, q, t = arg
            fq32 = float(np.float32(fq))
            # product scorer (genotype_sr.py:225-236): truncate k,
            # score 0 on no-hit
            k = int(2 * fq32 * len(q))
            d, _end = edit_distance(q, t, mode=MODE_HW, k=k)
            score = 0.0 if d == -1 else ((1.0 - fq32) * len(q)) / (d + 1)
            assert f"{score:.17g}" == out, arg
        else:
            bp, svt, rs, re_, offl, offr = arg
            cs, ce = (int(x) for x in out.split())
            assert cut_ref_start(rs, re_, offl, bp, svt) == cs, arg
            assert cut_ref_end(rs, re_, offr, bp, svt) == ce, arg


class _Fasta:
    def __init__(self, seqs):
        self.seqs = seqs

    def fetch(self, name):
        return self.seqs[int(name)]


def test_generate_probes_matches_reference(oracle):
    rng = random.Random(12222)
    cases = []
    for _ in range(30):
        nchr = rng.randint(1, 2)
        seqs = [_seq(rng, rng.randint(5000, 9000)) for _ in range(nchr)]
        svs = []
        for i in range(rng.randint(1, 6)):
            svt = rng.choice([0, 1, 2, 2, 3, 4, 5, 6, 7, 8])
            chrom = 0
            chr2 = rng.randrange(nchr) if svt >= 5 else chrom
            L = len(seqs[chrom])
            w = rng.randint(80, 160)
            if svt == 4:
                a = rng.randint(800, L - 800)
                ins = _seq(rng, rng.randint(40, 300))
                cons = seqs[chrom][a - w:a] + ins + seqs[chrom][a:a + w]
                start, end = a, a + 2
                inslen = len(ins)
            elif svt >= 5:
                L2 = len(seqs[chr2])
                a = rng.randint(800, L - 800)
                b = rng.randint(800, L2 - 800)
                ct = svt - 5
                if ct == 0:
                    cons = (seqs[chrom][a - w:a]
                            + revcomp(seqs[chr2][b - w:b]))
                elif ct == 1:
                    cons = (revcomp(seqs[chrom][a:a + w])
                            + seqs[chr2][b:b + w])
                elif ct == 2:
                    cons = seqs[chrom][a - w:a] + seqs[chr2][b:b + w]
                else:
                    cons = seqs[chr2][b - w:b] + seqs[chrom][a:a + w]
                start, end = a, b
                inslen = 0
            else:
                size = rng.randint(300, 2500)
                a = rng.randint(800, L - size - 800)
                b = a + size
                if svt == 2:
                    cons = seqs[chrom][a - w:a] + seqs[chrom][b:b + w]
                elif svt == 3:
                    cons = seqs[chrom][b - w:b] + seqs[chrom][a:a + w]
                elif svt == 0:
                    cons = (seqs[chrom][a - w:a]
                            + revcomp(seqs[chrom][b - w:b]))
                else:
                    cons = (revcomp(seqs[chrom][a:a + w])
                            + seqs[chrom][b:b + w])
                start, end = a, b
                inslen = 0
            precise = rng.random() < 0.85
            svs.append((i, chrom, start, chr2, end, svt, inslen,
                        precise, cons))
        cases.append((seqs, svs))
    lines = []
    for seqs, svs in cases:
        toks = " ".join(
            f"{i},{c},{s},{c2},{e},{svt},{il},{1 if p else 0} "
            f"{cons or '.'} ." for i, c, s, c2, e, svt, il, p, cons
            in svs)
        lines.append(f"PROBES 13 0.95 100 1000 {len(seqs)} "
                     + ",".join(str(len(s)) for s in seqs) + " "
                     + " ".join(seqs) + f" {len(svs)} {toks}")
    n_probes = 0
    for (seqs, svs), out in zip(cases, oracle(lines)):
        cfg = types.SimpleNamespace(
            min_flank_size=13,
            flank_quality=float(np.float32(0.95)),
            min_cons_window=100, indelsize=1000)
        header = types.SimpleNamespace(
            n_targets=len(seqs),
            names=[str(t) for t in range(len(seqs))],
            lengths=[len(s) for s in seqs])
        mysvs = []
        for i, c, s, c2, e, svt, il, p, cons in svs:
            sv = StructuralVariantRecord()
            sv.id, sv.chr, sv.svStart, sv.chr2, sv.svEnd = i, c, s, c2, e
            sv.svt, sv.insLen, sv.precise = svt, il, p
            sv.consensus = cons
            mysvs.append(sv)
        ref_arr, cons_arr, bp_region, _on = generate_probes(
            cfg, header, _Fasta(seqs), mysvs)
        mine_sv = "|".join(
            f"{sv.id}:{sv.alleles or '.'}"
            + "".join(f":{cons_arr[bp][sv.id] or '.'}"
                      f":{ref_arr[bp][sv.id] or '.'}"
                      for bp in range(2))
            for sv in mysvs) or "-"
        mine_bp = "|".join(
            f"{t},{b.regionStart},{b.regionEnd},{b.bppos},{b.homLeft},"
            f"{b.homRight},{b.svt},{b.id},{b.bpPoint}"
            for t in range(len(seqs)) for b in bp_region[t]) or "-"
        assert f"{mine_sv} # {mine_bp}" == out, [s[:8] for s in svs]
        n_probes += sum(1 for bp in range(2)
                        for v in cons_arr[bp] if v)
    assert n_probes >= 40
