"""Differential oracle for the read-depth segmentation plane.

tests/cnv_probe.cpp compiles the reference's cnv.h AS-IS and drives
cnvSegment / collectBreakpoints / segmentRD(+mergeAdjacentSameCN) over
a line protocol; this module fuzzes delly_tpu/models/cnv.py against
the live reference: the penalized-least-squares optimal-partition
segmentation with pruning (cnv.h:237-291), split-read breakpoint
clustering with the flank CN-shift z-test (cnv.h:64-135), and the full
per-chromosome segmentRD driver — window profile building, MAD sigma,
beta, breakpoint fusion, SE-scaled neighbor merging, CNV record output
(cnv.h:294-461) and same-CN merging (cnv.h:205-234) — with exact
(%.17g) double comparisons on cn/mappable.
"""

import os
import random
import shutil
import subprocess
import types

import numpy as np
import pytest

from delly_tpu.models.cnv import (
    cnv_segment, collect_breakpoints, merge_adjacent_same_cn,
    segment_rd,
)
from delly_tpu.models.gcbias import GcBias

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "cnv_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "cnv.h"))):
        pytest.skip("g++ or reference cnv.h unavailable")
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


def test_cnv_segment_matches_reference(oracle):
    """Raw optimal-partition segmentation on synthetic log2 profiles."""
    rng = random.Random(6161)
    cases = []
    for _ in range(120):
        n = rng.randint(1, 400)
        nseg = rng.randint(1, 5)
        y = []
        for _ in range(nseg):
            level = rng.uniform(-3, 2)
            y += [level + rng.gauss(0, rng.choice([0.05, 0.3]))
                  for _ in range(max(1, n // nseg))]
        beta = rng.choice([0.5, 2.0, 10.0, 80.0])
        kmin = rng.choice([2, 4, 8])
        cases.append((beta, kmin, y))
    lines = [f"SEGMENT {beta:.17g} {kmin} "
             + (",".join(f"{v:.17g}" for v in y) or "-")
             for beta, kmin, y in cases]
    for (beta, kmin, y), out in zip(cases, oracle(lines)):
        ref = [int(x) for x in out.split(",")] if out != "-" else []
        assert list(cnv_segment(np.asarray(y), beta, kmin)) == ref, \
            (beta, kmin, len(y))


def _chrom_case(rng, with_rd):
    """Synthetic chromosome with implanted CNV regions + clip clusters."""
    L = rng.randint(15000, 50000)
    gclo, gchi = 30, 70
    gc = np.asarray([rng.randint(20, 80) for _ in range(L)],
                    dtype=np.uint16)
    meanisize = 300
    uniq = np.asarray(
        [rng.choice([300, 298, 295, 100]) for _ in range(L)],
        dtype=np.uint16)
    gcbias = [0.2 + 0.005 * g + rng.uniform(0, 0.001) for g in range(102)]
    events = []
    for _ in range(rng.randint(0, 3)):
        s = rng.randint(2000, L - 6000)
        e = s + rng.randint(1500, 5000)
        events.append((s, e, rng.choice([0.0, 0.5, 1.5, 2.0])))
    cov = np.zeros(L, dtype=np.uint16)
    for p in range(L):
        mult = 1.0
        for s, e, m in events:
            if s <= p < e:
                mult = m
        v = gcbias[gc[p]] * 30 * mult + rng.uniform(-2, 2)
        cov[p] = max(0, int(round(v)))
    clips = []
    for s, e, _m in events:
        for edge in (s, e):
            for _ in range(rng.randint(0, 6)):
                clips.append(edge + rng.randint(-10, 10))
    for _ in range(rng.randint(0, 10)):  # noise clips
        clips.append(rng.randint(100, L - 100))
    clips.sort()
    cfg = types.SimpleNamespace(
        min_clip=rng.choice([25, 10]),
        target_exp_cov=rng.choice([0.0, 150.0]),
        fragment_unique=0.97, meanisize=meanisize,
        ploidy=2, min_bp_support=rng.choice([2, 3, 4]),
        penalty=rng.choice([1.0, 4.0]),
        cn_merge_tol=rng.choice([0.3, 0.1]),
        window_size=rng.choice([0, 500, 2000]) if with_rd else 0,
        min_cnv_size=1000)
    return L, (gclo, gchi), gc, uniq, gcbias, cov, clips, cfg


def _probe_line(op, L, gcb, gc, uniq, gcbias, cov, clips, cfg):
    def tok(a):
        return ",".join(str(x) for x in a) or "-"

    head = (f"{op} {cfg.min_clip} {cfg.target_exp_cov:.17g} "
            f"{np.float32(cfg.fragment_unique):.9g} {cfg.meanisize} "
            f"{cfg.ploidy} {cfg.min_bp_support}")
    if op == "RD":
        head += (f" {np.float32(cfg.penalty):.9g} "
                 f"{np.float32(cfg.cn_merge_tol):.9g} "
                 f"{cfg.window_size} {cfg.min_cnv_size}")
    return (f"{head} {gcb[0]} {gcb[1]} {L} {tok(gc)} {tok(uniq)} "
            f"{tok(cov)} " + ",".join(f"{v:.17g}" for v in gcbias)
            + f" {tok(clips)}")


def test_collect_breakpoints_matches_reference(oracle):
    rng = random.Random(6262)
    cases = [_chrom_case(rng, False) for _ in range(30)]
    lines = [_probe_line("BP", L, gcb, gc, uniq, gcbias, cov, clips,
                         cfg)
             for L, gcb, gc, uniq, gcbias, cov, clips, cfg in cases]
    n_bp = 0
    for case, out in zip(cases, oracle(lines)):
        L, gcb, gc, uniq, gcbias, cov, clips, cfg = case
        ref = ([tuple(int(x) for x in p.split(","))
                for p in out.split("|")] if out != "-" else [])
        gb = [GcBias(coverage=c) for c in gcbias]
        chrbp = collect_breakpoints(cfg, gcb, gc, uniq, gb, cov, L,
                                    clips)
        mine = [(b.pos, b.cilow, b.cihigh, b.qual, b.support)
                for b in chrbp]
        assert mine == ref, (L, cfg)
        n_bp += len(ref)
    assert n_bp >= 20


def test_genotype_cnvs_matches_reference(oracle):
    """genotypeCNVs (cnv.h:137-202) driven LIVE: CN from sequential
    covsum/expcov accumulation, mappable fraction, uniqfrac, and the
    chunked RDSD through the boost lazy-variance accumulator (the shim
    reproduces boost's sum/sum-of-squares extraction exactly) — %.17g
    on all four fields. Includes uniq values pinned to the float32
    uniqueness-gate boundary (0.97f*300 > 291 while 0.97*300 < 291)
    and tile-factor regional correction."""
    from delly_tpu.models.cnv import CNV, genotype_cnvs

    rng = random.Random(6464)
    lines, cases = [], []
    for _ in range(40):
        L = rng.randint(3000, 20000)
        meanisize = 300
        frag = rng.choice([0.97, 0.5])
        ploidy = rng.choice([2.0, 1.7, 3.0])
        gclo, gchi = rng.choice([(30, 70), (0, 101)])
        gc = np.asarray([rng.randint(20, 80) for _ in range(L)],
                        dtype=np.uint16)
        # 291 sits exactly on the f32/f64 boundary of 0.97*300
        uniq = np.asarray(
            [rng.choice([0, meanisize, 291, 150, 292]) for _ in
             range(L)], dtype=np.uint16)
        cov = np.asarray([rng.randint(0, 80) for _ in range(L)],
                         dtype=np.uint16)
        cuniq = np.asarray([rng.randint(0, 60) for _ in range(L)],
                           dtype=np.uint16)
        cmap = np.asarray([rng.randint(0, 60) for _ in range(L)],
                          dtype=np.uint16)
        gcbias = [0.2 + 0.005 * g + rng.uniform(0, 0.001)
                  for g in range(102)]
        reg_win = rng.choice([0, 1000])
        if reg_win:
            tile = [round(rng.uniform(0.5, 1.5), 4)
                    for _ in range(L // reg_win + 1)]
        else:
            tile = []
        reflen = L if rng.random() < 0.7 else rng.randint(L // 2, L)
        cnvs = []
        for _ in range(rng.randint(1, 6)):
            s = rng.randint(0, L - 20)
            e = s + rng.choice([rng.randint(3, 15),       # wsz<=1
                                rng.randint(200, 3000)])  # SD path
            cnvs.append((s, min(e, L + 50)))
        def tok(a):
            return ",".join(str(x) for x in a) or "-"
        lines.append(
            f"GT {np.float32(frag):.9g} {meanisize} "
            f"{np.float32(ploidy):.9g} {gclo} {gchi} {reflen} "
            f"{max(reg_win, 1)} {tok(gc)} {tok(uniq)} {tok(cov)} "
            f"{tok(cuniq)} {tok(cmap)} "
            + ",".join(f"{v:.17g}" for v in gcbias) + " "
            + (",".join(f"{np.float32(v):.9g}" for v in tile) or "-")
            + " " + (";".join(f"{s}:{e}" for s, e in cnvs) or "-"))
        cases.append((frag, meanisize, ploidy, (gclo, gchi), gc, uniq,
                      cov, cuniq, cmap, gcbias, tile, reg_win, reflen,
                      cnvs))
    n_sd = 0
    for case, out in zip(cases, oracle(lines)):
        (frag, meanisize, ploidy, gcb, gc, uniq, cov, cuniq, cmap,
         gcbias, tile, reg_win, reflen, spans) = case
        # the production config f32-rounds its C-float fields at
        # construction (coral.py __post_init__); mirror that here
        cfg = types.SimpleNamespace(fragment_unique=frag,
                                    meanisize=meanisize,
                                    ploidy=float(np.float32(ploidy)))
        gb = [GcBias(coverage=c) for c in gcbias]
        recs = [CNV(chr=0, start=s, end=e) for s, e in spans]
        genotype_cnvs(cfg, gcb, gc, uniq, gb,
                      np.asarray(tile, dtype=np.float32),
                      max(reg_win, 1), cov, cuniq, cmap, reflen, 0,
                      recs)
        mine = "|".join(
            f"{v.cn:.17g},{v.mappable:.17g},{v.uniqfrac:.17g},"
            f"{v.sd:.17g}" for v in recs) or "-"
        assert mine == out, (reflen, spans, frag, ploidy)
        n_sd += sum(1 for v in recs if v.cn >= 0 and v.sd > 0.025)
    assert n_sd >= 30  # the variance path is genuinely exercised


def test_segment_rd_matches_reference(oracle):
    rng = random.Random(6363)
    cases = [_chrom_case(rng, True) for _ in range(25)]
    lines = [_probe_line("RD", L, gcb, gc, uniq, gcbias, cov, clips,
                         cfg)
             for L, gcb, gc, uniq, gcbias, cov, clips, cfg in cases]
    n_cnv = 0
    for case, out in zip(cases, oracle(lines)):
        L, gcb, gc, uniq, gcbias, cov, clips, cfg = case
        gb = [GcBias(coverage=c) for c in gcbias]
        chrbp = collect_breakpoints(cfg, gcb, gc, uniq, gb, cov, L,
                                    clips)
        cnvs: list = []
        segment_rd(cfg, gcb, gc, uniq, gb,
                   np.zeros(0, dtype=np.float32), 0, cov, L, 0, chrbp,
                   cnvs)
        cnvs = merge_adjacent_same_cn(cnvs, cfg.cn_merge_tol)
        mine = "|".join(
            f"{v.chr},{v.start},{v.end},{v.ciposlow},{v.ciposhigh},"
            f"{v.ciendlow},{v.ciendhigh},{v.srleft},{v.srright},"
            f"{v.cn:.17g},{v.mappable:.17g}" for v in cnvs) or "-"
        assert mine == out, (L, cfg)
        n_cnv += 0 if out == "-" else out.count("|") + 1
    assert n_cnv >= 25
