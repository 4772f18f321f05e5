"""Differential oracle for the statistics layer (popgen.h + bolog.h).

tests/stats_probe.cpp compiles the reference's popgen.h and bolog.h
AS-IS (boost::math supplied by minimal exact-semantics shims) and
drives them over a line protocol; this module fuzzes
delly_tpu/ops/popgen.py and ops/likelihood.py against the live
reference: HWE allele-frequency EM, genotype-frequency EM, inbreeding
coefficient FIC, imputation R², dosage R², HWE LRT p-value
(popgen.h:12-201), diploid GL/GQ/GT genotyping, and copy-number
likelihoods including bolog.h's float32 store-and-read-back semantics
(bolog.h:23-133).

All comparisons are EXACT (%.17g doubles / %.9g float32 round-trips):
the pipeline renders these values into VCF text, so byte parity
requires bit parity.
"""

import math
import os
import random
import shutil
import subprocess

import numpy as np
import pytest

from delly_tpu.ops.likelihood import compute_cnls, compute_gls
from delly_tpu.ops.popgen import (
    dosage_r2, est_biallelic_af, est_biallelic_fic,
    est_biallelic_gt_freq, est_biallelic_hwe_lrt, est_biallelic_rsq,
)

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "stats_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "popgen.h"))):
        pytest.skip("g++ or reference popgen.h unavailable")
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


def _gl_cohort(rng, n):
    """Linear-space GL triplets like popgen's callers produce
    (10**gl with gl in [-1000, 0], one entry 1.0 after rescale)."""
    out = []
    for _ in range(n):
        best = rng.randrange(3)
        tri = []
        for g in range(3):
            if g == best:
                tri.append(1.0)
            elif rng.random() < 0.1:
                tri.append(0.0)  # capped at SMALLEST_GL -> 1e-1000 == 0
            else:
                tri.append(10.0 ** -rng.uniform(0.1, 100))
        out.append(tri)
    return out


def test_popgen_matches_reference(oracle):
    rng = random.Random(4242)
    cases = []
    for i in range(120):
        n = rng.choice([1, 2, 3, 5, 8, 13, 50, 200])
        eps = rng.choice([1e-20, 1e-9])
        cases.append((eps, 500, _gl_cohort(rng, n)))
    lines = []
    for eps, maxiter, glv in cases:
        toks = " ".join(",".join(f"{x:.17g}" for x in tri)
                        for tri in glv)
        lines.append(f"POPGEN {eps} {maxiter} {len(glv)} {toks}")
    for (eps, maxiter, glv), out in zip(cases, oracle(lines)):
        r = [float(x) for x in out.split()]
        af = est_biallelic_af(glv, eps, maxiter)
        gtf = est_biallelic_gt_freq(glv, eps, maxiter)
        fic = est_biallelic_fic(glv, af)
        rsq = est_biallelic_rsq(glv, af)
        pval = est_biallelic_hwe_lrt(glv, af, gtf)
        mine = (*af, *gtf, fic, rsq, pval)
        assert mine == tuple(r), (len(glv), eps, mine, r)


def test_dosage_r2_matches_reference(oracle):
    rng = random.Random(4343)
    cases = []
    for _ in range(150):
        n = rng.randint(1, 300)
        m = rng.randint(1, 300)
        a = [rng.choice([-1.0, rng.uniform(0, 2)]) for _ in range(n)]
        b = [rng.choice([-1.0, rng.uniform(0, 2)]) for _ in range(m)]
        cases.append((rng.randint(1, 30), a, b))
    lines = [f"DOSR2 {ms} {len(a)} " + " ".join(f"{x:.17g}" for x in a)
             + f" {len(b)} " + " ".join(f"{x:.17g}" for x in b)
             for ms, a, b in cases]
    for (ms, a, b), out in zip(cases, oracle(lines)):
        assert dosage_r2(a, b, ms) == float(out), (ms, len(a), len(b))


def test_compute_gls_matches_reference(oracle):
    rng = random.Random(4444)
    cases = []
    for _ in range(250):
        nref = rng.randint(0, 40)
        nalt = rng.randint(0, 40)
        rq = [rng.randint(0, 60) for _ in range(nref)]
        aq = [rng.randint(0, 60) for _ in range(nalt)]
        cases.append((rq, aq))
    lines = [f"GLS {','.join(map(str, rq)) or '-'} "
             f"{','.join(map(str, aq)) or '-'}" for rq, aq in cases]
    for (rq, aq), out in zip(cases, oracle(lines)):
        gls, gq, gt, _pls = compute_gls(rq, aq)
        parts = out.split()
        if parts[0] == "MISSING":
            assert gls is None and gt is None and gq == int(parts[1])
            continue
        if gt is None:  # reads present but flat PLs -> missing GT
            assert (int(parts[4]), int(parts[5])) == (0, 0), (rq, aq)
            assert int(parts[3]) == gq == 0
            continue
        ref_gls = tuple(np.float32(p) for p in parts[:3])
        assert tuple(np.float32(g) for g in gls) == ref_gls, (rq, aq)
        assert gq == int(parts[3]), (rq, aq)
        enc = tuple((x + 1) << 1 for x in gt)  # bcf_gt_unphased
        assert enc == (int(parts[4]), int(parts[5])), (rq, aq)


def test_compute_cnls_matches_reference(oracle):
    rng = random.Random(4545)
    cases = []
    for _ in range(250):
        mean = rng.uniform(0, 9)
        sd = rng.uniform(0.01, 2.0)
        ploidy = rng.choice([1.0, 2.0, 2.0, 2.0])
        cases.append((ploidy, mean, sd))
    lines = [f"CNL {p} {m:.17g} {s:.17g}" for p, m, s in cases]
    for (p, m, s), out in zip(cases, oracle(lines)):
        gl, gq, varqual, _best = compute_cnls(m, s, p)
        parts = out.split()
        ref_gl = tuple(np.float32(x) for x in parts[:10])
        assert tuple(np.float32(g) for g in gl) == ref_gl, (p, m, s)
        assert (gq, varqual) == (int(parts[10]), int(parts[11])), \
            (p, m, s)
