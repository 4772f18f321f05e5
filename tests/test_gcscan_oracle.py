"""Differential oracle for RD-scan window selection + GC-bias curves.

tests/gcscan_probe.cpp compiles the reference's scan.h and gcbias.h
AS-IS and drives their pure functions over a line protocol; this
module fuzzes delly_tpu/models/{scan,gcbias}.py against the live
reference: estCountBounds median/MAD coverage bounds (scan.h:51-70),
selectWindows uniqueness + CN2 gating incl. the scan-file rescale
truncation (scan.h:234-281), gcBound percentile clipping
(gcbias.h:37-50), regCorrFactor binning (gcbias.h:53-61) and
smoothFillCurve hole-filling + 3-bin smoothing (gcbias.h:63-88, exact
%.17g doubles).
"""

import os
import random
import shutil
import subprocess
import types

import numpy as np
import pytest

from delly_tpu.models.gcbias import (
    GcBias, gc_bound, reg_corr_factor, smooth_fill_curve,
)
from delly_tpu.models.scan import ScanWindow, est_count_bounds, select_windows

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "gcscan_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "scan.h"))):
        pytest.skip("g++ or reference scan.h unavailable")
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


def _windows(rng, nchr=None):
    nchr = nchr or rng.randint(1, 3)
    sc = []
    for _ in range(nchr):
        n = rng.randint(0, 60)
        chrom = []
        pos = 0
        for _ in range(n):
            w = ScanWindow()
            w.start = pos
            w.end = pos + rng.choice([10000, 5000, 20000, 1])
            pos = w.end
            w.cov = rng.choice([0, rng.randint(1, 50),
                                rng.randint(100, 400)])
            w.uniqcov = rng.randint(0, w.cov) if w.cov else 0
            w.select = rng.random() < 0.7
            chrom.append(w)
        sc.append(chrom)
    return sc


def _enc(sc):
    toks = [str(len(sc))]
    for chrom in sc:
        toks.append(str(len(chrom)))
        for w in chrom:
            toks.append(f"{w.start},{w.end},{w.cov},{w.uniqcov},"
                        f"{1 if w.select else 0}")
    return " ".join(toks)


def test_est_count_bounds_matches_reference(oracle):
    rng = random.Random(7171)
    cases = [_windows(rng) for _ in range(120)]
    lines = [f"BOUNDS {_enc(sc)}" for sc in cases]
    for sc, out in zip(cases, oracle(lines)):
        lo, hi = (int(x) for x in out.split())
        assert est_count_bounds(sc) == (lo, hi)


def test_select_windows_matches_reference(oracle):
    rng = random.Random(7272)
    cases = []
    for _ in range(120):
        sc = _windows(rng)
        nosel = rng.random() < 0.2
        hasfile = rng.random() < 0.4
        ratio = rng.choice([0.8, 0.5, 0.97])
        cases.append((nosel, hasfile, ratio, sc))
    lines = [f"SELECT {1 if nosel else 0} {1 if hasfile else 0} "
             f"{np.float32(ratio):.9g} {_enc(sc)}"
             for nosel, hasfile, ratio, sc in cases]
    for (nosel, hasfile, ratio, sc), out in zip(cases, oracle(lines)):
        cfg = types.SimpleNamespace(
            no_scan_window_selection=nosel,
            scan_file="x" if hasfile else "",
            unique_to_total_cov_ratio=float(np.float32(ratio)))
        select_windows(cfg, sc)
        mine = "|".join(f"{1 if w.select else 0},{w.cov},{w.uniqcov}"
                        for chrom in sc for w in chrom) or "-"
        assert mine == out, (nosel, hasfile, ratio)


def test_gc_bound_matches_reference(oracle):
    rng = random.Random(7373)
    cases = []
    for _ in range(150):
        n = rng.randint(1, 102)
        pct = []
        c = 0.0
        for _ in range(n):
            c = min(1.0, c + rng.random() / n * 2)
            pct.append((c, min(1.0, c + rng.uniform(-0.05, 0.05))))
        excl = rng.choice([0.0005, 0.01, 0.25])
        cases.append((excl, pct))
    lines = [f"GCBOUND {np.float32(excl):.9g} {len(pct)} "
             + " ".join(f"{a:.17g},{b:.17g}" for a, b in pct)
             for excl, pct in cases]
    for (excl, pct), out in zip(cases, oracle(lines)):
        cfg = types.SimpleNamespace(exclgc=float(np.float32(excl)))
        gcb = [GcBias(percentileSample=a, percentileReference=b)
               for a, b in pct]
        lo, hi = (int(x) for x in out.split())
        assert gc_bound(cfg, gcb) == (lo, hi), (excl, len(pct))


def test_reg_corr_and_smooth_match_reference(oracle):
    rng = random.Random(7474)
    rc_cases = []
    sm_cases = []
    for _ in range(150):
        n = rng.randint(0, 101)
        rc = [rng.choice([0.0, rng.uniform(0.2, 3.0)])
              for _ in range(n)]
        rc_cases.append((rng.uniform(-0.1, 1.1), rc))
        m = rng.randint(0, 40)
        curve = [rng.choice([0.0, rng.uniform(0.1, 5.0)])
                 for _ in range(m)]
        weight = [rng.choice([0.0, 0.0, rng.uniform(0.5, 100.0)])
                  for _ in range(m)]
        sm_cases.append((curve, weight))
    lines = [f"REGCORR {g:.17g} "
             + (",".join(f"{v:.17g}" for v in rc) or "-")
             for g, rc in rc_cases]
    lines += [f"SMOOTH {','.join(f'{v:.17g}' for v in c) or '-'} "
              f"{','.join(f'{v:.17g}' for v in w) or '-'}"
              for c, w in sm_cases]
    outs = oracle(lines)
    for (g, rc), out in zip(rc_cases, outs[:len(rc_cases)]):
        assert f"{reg_corr_factor(rc, g):.17g}" == out, (g, rc)
    for (curve, weight), out in zip(sm_cases, outs[len(rc_cases):]):
        got = smooth_fill_curve(list(curve), weight)
        mine = ",".join(f"{v:.17g}" for v in got) or "-"
        assert mine == out, (curve, weight)
