"""Differential oracle for the SR-genotyping read loop.

tests/covann_probe.cpp compiles the reference's coverage.h AS-IS and
runs its real annotateCoverage over the functional htslib replay layer
+ in-memory faidx; this module writes the same randomized records into
a real BAM, runs OUR production annotate pass
(models/genotype_sr.py annotate_coverage) and compares end-to-end:
probe generation, the breakpoint-region junction genotyping with the
HW scorer, the maxGenoReadCount cap and the refAlignedReadCount %2
reference-bias subsampling (coverage.h:440-454, 506-536), the
clip/quality pair maps with first-pair-observation semantics
(:560-586), normal and abnormal spanning-pair counting (:600-667),
and covBases/covFragment with the per-SV leftRC/rc/rightRC sums
(:681-738) — exact quality sequences, exact counts.
"""

import os
import random
import shutil
import subprocess
import types

import numpy as np
import pytest

from delly_tpu.io.bam import BamFile
from delly_tpu.io.fasta import FastaFile
from delly_tpu.models.genotype_sr import annotate_coverage
from delly_tpu.utils.tags import revcomp
from delly_tpu.utils.stats import LibraryInfo
from delly_tpu.utils.tags import StructuralVariantRecord

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "covann_probe.cpp")
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


def _make_svs(rng, seqs):
    """Realistic SVs with junction-consistent consensus sequences
    (same construction the geno-probe oracle uses)."""
    nchr = len(seqs)
    svs = []
    for i in range(rng.randint(1, 4)):
        svt = rng.choice([0, 1, 2, 2, 2, 3, 4, 5, 6, 7, 8])
        chrom = rng.randrange(nchr)
        chr2 = rng.randrange(nchr) if svt >= 5 else chrom
        L = len(seqs[chrom])
        w = rng.randint(90, 150)
        if svt == 4:
            a = rng.randint(900, L - 900)
            ins = _seq(rng, rng.randint(40, 250))
            cons = seqs[chrom][a - w:a] + ins + seqs[chrom][a:a + w]
            start, end, inslen = a, a + 2, len(ins)
        elif svt >= 5:
            L2 = len(seqs[chr2])
            a = rng.randint(900, L - 900)
            b = rng.randint(900, L2 - 900)
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
            start, end, inslen = a, b, 0
        else:
            size = rng.randint(400, 2500)
            a = rng.randint(900, L - size - 900)
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
            start, end, inslen = a, b, 0
        svs.append((i, chrom, start, chr2, end, svt, inslen,
                    rng.random() < 0.85, rng.choice([0, 2, 5]), cons))
    return svs


def _make_reads(rng, seqs, svs, lib):
    """Junction reads (REF substrings + consensus windows, some
    soft-clipped), normal + abnormal spanning pairs, and noise."""
    recs = []  # (qn, tid, pos, flag, mapq, cig, mtid, mpos, isize, seq)
    rid = 0

    def read(tid, pos, cig, seq, flag=0, mapq=60, mtid=None, mpos=None,
             isize=0):
        nonlocal rid
        recs.append((f"r{rid}", tid, pos, flag, mapq, cig,
                     tid if mtid is None else mtid,
                     pos if mpos is None else mpos, isize, seq))
        rid += 1

    for (_i, chrom, start, chr2, end, _svt, _il, _p, pe,
         cons) in svs:
        for (c, p) in ((chrom, start), (chr2, end)):
            L = len(seqs[c])
            # REF-supporting junction reads across the breakpoint
            for _ in range(rng.randint(2, 6)):
                ln = 150
                s = min(max(0, p - rng.randint(40, 110)), L - ln)
                read(c, s, [("M", ln)], seqs[c][s:s + ln],
                     mapq=rng.choice([60, 60, 3]))
            # ALT-supporting: consensus windows, soft-clipped at bp
            for _ in range(rng.randint(1, 5)):
                j = rng.randint(0, max(0, len(cons) - 150))
                seq = cons[j:j + 150]
                m = rng.randint(40, len(seq) - 40)
                s = min(max(0, p - rng.randint(0, m)), L - 1)
                read(c, s, [("M", m), ("S", len(seq) - m)], seq)
            # hard-clipped + unpaired noise near the bp
            if rng.random() < 0.5:
                ln = rng.randint(40, 100)
                s = min(max(0, p - 20), L - ln)
                read(c, s, [("H", 10), ("M", ln)],
                     seqs[c][s:s + ln], mapq=rng.choice([60, 4]))
        if pe:
            # normal spanning pairs around svStart (FR, normal isize)
            for _ in range(rng.randint(1, 6)):
                isz = lib.median + rng.randint(-2 * lib.mad,
                                               2 * lib.mad)
                s = max(0, start - rng.randint(30, isz - 160))
                L = len(seqs[chrom])
                if s + isz + 10 >= L:
                    continue
                qn = f"r{rid}"
                rid += 1
                m2 = s + isz - 150
                recs.append((qn, chrom, s, 0x1 | 0x40 | 0x20,
                             rng.choice([60, 60, 3]), [("M", 150)],
                             chrom, m2, isz, seqs[chrom][s:s + 150]))
                recs.append((qn, chrom, m2, 0x1 | 0x80 | 0x10, 60,
                             [("M", 150)], chrom, s, -isz,
                             seqs[chrom][m2:m2 + 150]))
            # abnormal pairs matching the SV signature (FR DEL-like
            # and cross-chromosome for BND svts)
            for _ in range(rng.randint(1, 6)):
                s = max(0, start - rng.randint(50, 400))
                m2 = end + rng.randint(10, 300)
                if chr2 == chrom and m2 + 160 >= len(seqs[chrom]):
                    continue
                if s + 160 >= len(seqs[chrom]):
                    continue
                qn = f"r{rid}"
                rid += 1
                isz = (m2 + 150 - s) if chr2 == chrom else 0
                recs.append((qn, chrom, s, 0x1 | 0x40 | 0x20, 60,
                             [("M", 150)], chr2, m2, isz,
                             seqs[chrom][s:s + 150]))
                recs.append((qn, chr2, m2, 0x1 | 0x80 | 0x10, 60,
                             [("M", 150)], chrom, s, -isz,
                             seqs[chr2][m2:m2 + 150]))
    # pure noise pairs + filtered-flag reads
    for _ in range(rng.randint(5, 20)):
        tid = rng.randrange(len(seqs))
        L = len(seqs[tid])
        s = rng.randint(0, L - 800)
        isz = lib.median + rng.randint(-3 * lib.mad, 3 * lib.mad)
        qn = f"r{rid}"
        rid += 1
        flag_extra = rng.choice([0, 0, 0x400, 0x100, 0x800])
        recs.append((qn, tid, s, 0x1 | 0x40 | 0x20 | flag_extra,
                     rng.choice([0, 60]), [("M", 150)], tid,
                     s + isz - 150, isz, seqs[tid][s:s + 150]))
        recs.append((qn, tid, s + isz - 150, 0x1 | 0x80 | 0x10, 60,
                     [("M", 150)], tid, s, -isz,
                     seqs[tid][s + isz - 150:s + isz]))
    recs.sort(key=lambda r: (r[1], r[2]))
    return recs


def test_annotate_coverage_matches_reference(oracle, tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import encode_record, write_bam, write_fasta

    rng = random.Random(15151)
    cases = []
    for _ in range(12):
        nchr = rng.randint(1, 2)
        seqs = [_seq(rng, rng.randint(6000, 12000)) for _ in
                range(nchr)]
        rs, median, mad = 150, 450, 40
        lib = LibraryInfo(rs=rs, median=median, mad=mad,
                          minNormalISize=max(0, median - 5 * mad),
                          maxNormalISize=median + 5 * mad,
                          minISizeCutoff=max(0, median - 9 * mad),
                          maxISizeCutoff=median + 9 * mad)
        svs = _make_svs(rng, seqs)
        recs = _make_reads(rng, seqs, svs, lib)
        max_geno = rng.choice([250, 6, 2])
        cases.append((seqs, svs, recs, lib, max_geno))

    lines = []
    for seqs, svs, recs, lib, max_geno in cases:
        svtok = " ".join(
            f"{i},{c},{s},{c2},{e},{svt},{il},{1 if p else 0},{pe} "
            f"{cons or '.'}"
            for i, c, s, c2, e, svt, il, p, pe, cons in svs)
        rectok = " ".join(
            f"{qn} {tid},{pos},{flag},{mapq},{mtid},{mpos},{isize} "
            + "".join(f"{ln}{op}" for op, ln in cig) + " "
            + (seq or ".")
            for qn, tid, pos, flag, mapq, cig, mtid, mpos, isize, seq
            in recs)
        lines.append(
            f"COVANN 5 13 0.95 100 1000 {max_geno} "
            f"{lib.median},{lib.minNormalISize},{lib.maxNormalISize},"
            f"{lib.maxISizeCutoff} {len(seqs)} "
            + ",".join(str(len(s)) for s in seqs) + " "
            + " ".join(seqs) + f" {len(svs)} {svtok} {len(recs)} "
            + rectok)

    outs = oracle(lines)
    n_jref = n_jalt = n_salt = 0
    for idx, ((seqs, svs, recs, lib, max_geno), out) in enumerate(
            zip(cases, outs)):
        # reference side
        ref = []
        if out != "-":
            for tok in out.split(" | "):
                svid, jref, jalt, sref, salt, cov = tok.split(":")
                def qs(t):
                    return ([] if t == "." else
                            [int(x) for x in t.split(",")])
                ref.append((int(svid), qs(jref), qs(jalt), qs(sref),
                            qs(salt),
                            tuple(int(x) for x in cov.split(","))))
        # my side: real BAM + FASTA through the production annotate
        contigs = [(str(t), seqs[t]) for t in range(len(seqs))]
        encoded = [encode_record(qn, flag, tid, pos, mapq, cig, mtid,
                                 mpos, isize, seq)
                   for qn, tid, pos, flag, mapq, cig, mtid, mpos,
                   isize, seq in recs]
        bam = str(tmp_path / f"case{idx}.bam")
        fa = str(tmp_path / f"case{idx}.fa")
        write_bam(bam, contigs, encoded)
        write_fasta(fa, contigs)
        cfg = types.SimpleNamespace(
            min_geno_qual=5, min_flank_size=13,
            flank_quality=float(np.float32(0.95)),
            min_cons_window=100, indelsize=1000,
            max_geno_read_count=max_geno, max_threads=1,
            dumpfile="", files=[bam])
        mysvs = []
        for i, c, s, c2, e, svt, il, p, pe, cons in svs:
            sv = StructuralVariantRecord()
            sv.id, sv.chr, sv.svStart, sv.chr2, sv.svEnd = i, c, s, c2, e
            sv.svt, sv.insLen, sv.precise = svt, il, p
            sv.peSupport = pe
            sv.consensus = cons
            mysvs.append(sv)
        fasta = FastaFile(fa)
        with BamFile(bam) as bf:
            jct, rc, span = annotate_coverage(cfg, [bf], fasta, [lib],
                                              mysvs)
        mine = [(sv.id, list(jct[0][sv.id].ref), list(jct[0][sv.id].alt),
                 list(span[0][sv.id].ref), list(span[0][sv.id].alt),
                 (rc[0][sv.id].leftRC, rc[0][sv.id].rc,
                  rc[0][sv.id].rightRC))
                for sv in mysvs]
        assert mine == ref, (idx, max_geno)
        for _svid, jref, jalt, _sref, salt, _cov in ref:
            n_jref += len(jref)
            n_jalt += len(jalt)
            n_salt += len(salt)
    # the junction scorer, ALT path and spanning-ALT path all fire
    assert n_jref >= 30 and n_jalt >= 10 and n_salt >= 5, \
        (n_jref, n_jalt, n_salt)
