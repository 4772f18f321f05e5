"""Differential oracle for the FULL long-read genotyping loop.

tests/geno_lr_probe.cpp compiles the reference's genotype.h AS-IS (with
svanno.h + methyl.h) and runs the real genotypeLR over the functional
htslib replay layer; this module writes the same randomized long-read
records into a real BAM, runs OUR production
models/genotype_lr.genotype_lr and compares end-to-end: the breakpoint
overlap window and read caps, _findSeqBp + centered offsets, the NW
REF/ALT scoring with per-svt reverse-complement, the informative-read
gate and delta quality, HP/PS phasing tallies, MM/ML 5mC methylation
accumulation, the coverage track RC/RCL/RCR, and the on-the-fly
annotateSV MEI/TR results — exact quality sequences, exact counts.
"""

import os
import random
import shutil
import subprocess

import pytest

from delly_tpu.io.bam import BamFile
from delly_tpu.io.fasta import FastaFile
from delly_tpu.models.config import LrConfig
from delly_tpu.models.genotype_lr import genotype_lr
from delly_tpu.models.genotype_sr import JunctionCount, ReadCount
from delly_tpu.models.methyl import MethylInfo
from delly_tpu.utils.tags import StructuralVariantRecord, revcomp

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "geno_lr_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "genotype.h"))):
        pytest.skip("g++ or reference genotype.h unavailable")
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


def _make_svs(rng, seqs):
    """LR-scale SVs with junction-consistent consensus windows large
    enough for the minConsWindow=1000 offset gate."""
    nchr = len(seqs)
    svs = []
    for i in range(rng.randint(2, 5)):
        svt = rng.choice([0, 1, 2, 2, 2, 3, 4, 5, 6, 7, 8])
        chrom = rng.randrange(nchr)
        chr2 = rng.randrange(nchr) if svt >= 5 else chrom
        L = len(seqs[chrom])
        w = rng.randint(700, 1100)
        if svt == 4:
            a = rng.randint(3000, L - 3000)
            ins = _seq(rng, rng.randint(60, 700))
            cons = seqs[chrom][a - w:a] + ins + seqs[chrom][a:a + w]
            start, end, inslen = a, a + 2, len(ins)
        elif svt >= 5:
            L2 = len(seqs[chr2])
            a = rng.randint(3000, L - 3000)
            b = rng.randint(3000, L2 - 3000)
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
            size = rng.randint(800, 6000)
            a = rng.randint(3000, L - size - 3000)
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
                    rng.random() < 0.9, w, cons))
    return svs


def _mm_ml(rng, seq):
    """Plausible MM/ML base-modification tags for some reads."""
    cpos = [i for i, ch in enumerate(seq) if ch == "C"]
    if len(cpos) < 4:
        return b""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import aux_mm_ml
    picks = sorted(rng.sample(cpos, rng.randint(2, min(10, len(cpos)))))
    skips = []
    prev = -1
    for p in picks:
        ncs = sum(1 for q in cpos if prev < q < p)
        skips.append(ncs)
        prev = p
    mm = "C+m," + ",".join(str(s) for s in skips) + ";"
    ml = [rng.randint(0, 255) for _ in picks]
    return aux_mm_ml(mm, ml)


def _aux_int(tag, val):
    import struct
    return tag.encode() + b"i" + struct.pack("<i", val)


def _make_reads(rng, seqs, svs):
    """Long reads: REF windows across breakpoints, ALT consensus
    windows soft-clipped at the junction, plus tagged/flagged noise."""
    recs = []  # (qn,tid,pos,flag,mapq,cig,mtid,mpos,isize,seq,aux)
    rid = 0

    def read(tid, pos, cig, seq, flag=0, mapq=60, aux=b""):
        nonlocal rid
        recs.append((f"r{rid}", tid, pos, flag, mapq, cig, tid, pos, 0,
                     seq, aux))
        rid += 1

    for (_i, chrom, start, chr2, end, svt, _il, _p, w, cons) in svs:
        for (cidx, (ctg, p)) in enumerate(((chrom, start), (chr2, end))):
            L = len(seqs[ctg])
            # REF-supporting long reads across the breakpoint
            for _ in range(rng.randint(2, 5)):
                ln = rng.randint(1600, 3200)
                s = min(max(0, p - rng.randint(600, ln - 600)), L - ln)
                aux = b""
                if rng.random() < 0.5:
                    aux += _aux_int("HP", rng.choice([1, 2]))
                    aux += _aux_int("PS", rng.randint(1, 99999))
                if rng.random() < 0.5:
                    aux += _mm_ml(rng, seqs[ctg][s:s + ln])
                read(ctg, s, [("M", ln)], seqs[ctg][s:s + ln],
                     flag=rng.choice([0, 16]),
                     mapq=rng.choice([60, 60, 3]), aux=aux)
            # ALT-supporting: consensus windows soft-clipped at the bp
            bp_in_cons = w if cidx == 0 else w + _il if svt == 4 else w
            for _ in range(rng.randint(1, 4)):
                lo = rng.randint(0, max(0, bp_in_cons - 1400))
                hi = min(len(cons), bp_in_cons + rng.randint(700, 1400))
                seq = cons[lo:hi]
                if len(seq) < 1300:
                    continue
                m = bp_in_cons - lo
                if m < 200 or m >= len(seq) - 200:
                    continue
                s = max(0, p - m)
                aux = b""
                if rng.random() < 0.6:
                    aux += _aux_int("HP", rng.choice([1, 2]))
                    aux += _aux_int("PS", rng.randint(1, 99999))
                if rng.random() < 0.5:
                    aux += _mm_ml(rng, seq)
                read(ctg, s, [("M", m), ("S", len(seq) - m)], seq,
                     aux=aux)
            # flagged noise (supplementary counts only for coverage)
            if rng.random() < 0.5:
                ln = rng.randint(900, 1500)
                s = min(max(0, p - 300), L - ln)
                read(ctg, s, [("M", ln)], seqs[ctg][s:s + ln],
                     flag=rng.choice([0x800, 0x100, 0x400]),
                     mapq=rng.choice([60, 2]))
    recs.sort(key=lambda r: (r[1], r[2]))
    return recs


def test_genotype_lr_matches_reference(oracle, tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import encode_record, write_bam, write_fasta

    rng = random.Random(19191)
    cases = []
    for _ in range(8):
        nchr = rng.randint(1, 2)
        seqs = [_seq(rng, rng.randint(20000, 40000))
                for _ in range(nchr)]
        svs = _make_svs(rng, seqs)
        recs = _make_reads(rng, seqs, svs)
        max_geno = rng.choice([250, 4])
        cases.append((seqs, svs, recs, max_geno))

    lines = []
    for seqs, svs, recs, max_geno in cases:
        svtok = " ".join(
            f"{i},{c},{s},{c2},{e},{svt},{il},{1 if p else 0},{w} "
            f"{cons or '.'}"
            for i, c, s, c2, e, svt, il, p, w, cons in svs)
        rectok = " ".join(
            f"{qn} {tid},{pos},{flag},{mapq},{mtid},{mpos},{isize} "
            + "".join(f"{ln}{op}" for op, ln in cig) + " "
            + (seq or ".") + " " + (aux.hex() or ".")
            for qn, tid, pos, flag, mapq, cig, mtid, mpos, isize, seq,
            aux in recs)
        lines.append(
            f"GENOLR 1 100 0.9 1000 25 {max_geno} 128 5 0.8 0.85 "
            f"{len(seqs)} " + ",".join(str(len(s)) for s in seqs) + " "
            + " ".join(seqs) + f" {len(svs)} {svtok} {len(recs)} "
            + rectok)

    outs = oracle(lines)
    n_ref = n_alt = n_hp = n_meth = 0
    for idx, ((seqs, svs, recs, max_geno), out) in enumerate(
            zip(cases, outs)):
        ref = []
        if out != "-":
            for tok in out.split(" | "):
                parts = tok.split(":")
                def qs(t):
                    return ([] if t == "." else
                            [int(x) for x in t.split(",")])
                ref.append((int(parts[0]), qs(parts[1]), qs(parts[2]),
                            qs(parts[3]), qs(parts[4]), qs(parts[5]),
                            qs(parts[6]), int(parts[7]),
                            tuple(int(x) for x in parts[8].split(",")),
                            tuple(int(x) for x in parts[9].split(",")),
                            parts[10]))
        contigs = [(str(t), seqs[t]) for t in range(len(seqs))]
        encoded = [encode_record(qn, flag, tid, pos, mapq, cig, mtid,
                                 mpos, isize, seq, aux=aux)
                   for qn, tid, pos, flag, mapq, cig, mtid, mpos,
                   isize, seq, aux in recs]
        bam = str(tmp_path / f"case{idx}.bam")
        fa = str(tmp_path / f"case{idx}.fa")
        write_bam(bam, contigs, encoded)
        write_fasta(fa, contigs)
        cfg = LrConfig(genome=fa, files=[bam],
                       max_geno_read_count=max_geno, max_threads=1)
        mysvs = []
        for i, c, s, c2, e, svt, il, p, w, cons in svs:
            sv = StructuralVariantRecord()
            sv.id, sv.chr, sv.svStart, sv.chr2, sv.svEnd = i, c, s, c2, e
            sv.svt, sv.insLen, sv.precise = svt, il, p
            sv.consBp = w
            sv.consensus = cons
            mysvs.append(sv)
        jct = [[JunctionCount() for _ in mysvs]]
        rc = [[ReadCount() for _ in mysvs]]
        meth = [[MethylInfo() for _ in mysvs]]
        fasta = FastaFile(fa)
        with BamFile(bam) as bf:
            genotype_lr(cfg, [bf], fasta, mysvs, jct, rc, meth)
        mine = []
        for sv in mysvs:
            j = jct[0][sv.id]
            m = meth[0][sv.id]
            trc = f"{float(sv.anno.trCopies):g}" if sv.anno else "0"
            anno = (f"{sv.anno.homLen},{sv.anno.seqType},"
                    f"{1 if sv.anno.isRC else 0},{sv.anno.trPeriod},"
                    f"{trc}") if sv.anno else "0,0,0,0,0"
            mine.append((sv.id, list(j.ref), list(j.alt),
                         list(j.hp1ref), list(j.hp1alt),
                         list(j.hp2ref), list(j.hp2alt), j.ps,
                         (rc[0][sv.id].leftRC, rc[0][sv.id].rc,
                          rc[0][sv.id].rightRC),
                         (m.refSvStartL, m.refSvStartR, m.refSvRightL,
                          m.refSvRightR, m.altSvStartL, m.altSvStartR,
                          m.altSvRightL, m.altSvRightR, m.mncStartL,
                          m.mncStartR, m.mncRightL, m.mncRightR,
                          m.mdpStartL, m.mdpStartR, m.mdpRightL,
                          m.mdpRightR), anno))
        assert mine == ref, (idx, max_geno)
        for (_i, jr, ja, h1r, h1a, h2r, h2a, _ps, _cov, mth,
             _anno) in ref:
            n_ref += len(jr)
            n_alt += len(ja)
            n_hp += len(h1r) + len(h1a) + len(h2r) + len(h2a)
            n_meth += sum(1 for v in mth if v >= 0)
    # REF/ALT scoring, phasing and methylation paths all fire
    assert n_ref >= 20 and n_alt >= 10 and n_hp >= 8 and n_meth >= 8, \
        (n_ref, n_alt, n_hp, n_meth)
