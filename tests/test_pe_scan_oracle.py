"""Differential oracle for the short-read discovery scan.

tests/pe_probe.cpp compiles the reference's shortpe.h AS-IS and runs
its real scanPEandSR over the functional htslib replay layer; this
module writes the same randomized records into a real BAM, runs OUR
production scan plane (models/sr.py scan_pe_and_sr with its sharded
phase A / replayed phase B), and compares end-to-end discovery output:
the SR CIGAR walk (shortpe.h:360-389), hash-keyed mate maps with
first-pair-observation semantics (:392-445), per-svt PE candidate
gating (isize/orientation/quality/translocation rules), SR junction
pairing, SR + PE clique clustering, and the srStore read assignments
(:480-533).  Both sides group reads with the repo's documented 64-bit
hash recipe (utils/hashing.py); hash values are map keys only.
"""

import os
import random
import shutil
import subprocess
import types

import pytest

from delly_tpu.io.bam import BamFile
from delly_tpu.models.sr import scan_pe_and_sr
from delly_tpu.utils.stats import LibraryInfo
from delly_tpu.utils.tags import SVT_TRANS

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "pe_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "shortpe.h"))):
        pytest.skip("g++ or reference shortpe.h unavailable")
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


def _case(rng):
    """One sample: clustered abnormal pairs per svt + clipped split
    reads + normal/noise pairs, coordinate-sorted."""
    nchr = rng.randint(1, 2)
    chrlens = [rng.randint(80000, 200000) for _ in range(nchr)]
    rs, median, mad = 150, 500, 40
    maxnorm, maxcut = median + 5 * mad, median + 9 * mad
    recs = []  # (qname, tid, pos, flag, mapq, cigar[(op,len)], mtid, mpos, tlen)
    rid = 0

    def pair(tid, p1, f1, mtid, p2, f2, isize, mapq=60, cig=None):
        nonlocal rid
        qn = f"q{rid}"
        rid += 1
        c = cig or [("M", 150)]
        recs.append((qn, tid, p1, f1 | 0x1 | 0x40, mapq, c, mtid, p2,
                     isize))
        recs.append((qn, mtid, p2, f2 | 0x1 | 0x80, mapq, c, tid, p1,
                     -isize))

    for _ in range(rng.randint(1, 4)):  # DEL clusters (FR, big isize)
        tid = rng.randrange(nchr)
        a = rng.randint(3000, chrlens[tid] - 30000)
        span = rng.randint(2 * maxcut, 20000)
        for _ in range(rng.randint(1, 6)):
            j1, j2 = rng.randint(-150, 150), rng.randint(-150, 150)
            p1, p2 = a + j1, a + span + j2
            pair(tid, p1, 0x20, tid, p2, 0x10, p2 + rs - p1,
                 mapq=rng.choice([20, 60]))
    for _ in range(rng.randint(0, 2)):  # DUP clusters (RF)
        tid = rng.randrange(nchr)
        a = rng.randint(3000, chrlens[tid] - 30000)
        span = rng.randint(1500, 15000)
        for _ in range(rng.randint(1, 5)):
            p1 = a + rng.randint(-120, 120)
            p2 = a + span + rng.randint(-120, 120)
            pair(tid, p1, 0x10, tid, p2, 0x20, p2 + rs - p1)
    if nchr == 2 and rng.random() < 0.6:  # BND cluster
        a = rng.randint(3000, chrlens[0] - 20000)
        b = rng.randint(3000, chrlens[1] - 20000)
        for _ in range(rng.randint(1, 5)):
            pair(0, a + rng.randint(-100, 100), 0x20, 1,
                 b + rng.randint(-100, 100), 0x10, 0,
                 mapq=rng.choice([10, 60]))
    for _ in range(rng.randint(2, 10)):  # split reads at one junction
        tid = rng.randrange(nchr)
        a = rng.randint(3000, chrlens[tid] - 30000)
        d = rng.randint(400, 9000)
        for _ in range(rng.randint(1, 4)):
            qn = f"q{rid}"
            rid += 1
            m = rng.randint(60, 120)
            jit = rng.randint(-4, 4)
            # right-clipped at a, left-clipped mate alignment at a+d
            recs.append((qn, tid, a - m + jit, 0x1 | 0x40, 60,
                         [("M", m), ("S", 150 - m)], tid, a - m + jit,
                         0))
            # supplementary alignment of the SAME read (same seed)
            recs.append((qn, tid, a + d + jit, 0x1 | 0x40 | 0x800, 60,
                         [("S", m), ("M", 150 - m)], tid, a + d + jit,
                         0))
    for _ in range(rng.randint(5, 30)):  # normal pairs + junk
        tid = rng.randrange(nchr)
        p = rng.randint(1000, chrlens[tid] - 2000)
        isz = median + rng.randint(-3 * mad, 3 * mad)
        pair(tid, p, 0x20, tid, p + isz - rs, 0x10, isz,
             mapq=rng.choice([0, 60]))
    for _ in range(rng.randint(0, 4)):  # filtered flags
        tid = rng.randrange(nchr)
        p = rng.randint(1000, chrlens[tid] - 2000)
        qn = f"q{rid}"
        rid += 1
        recs.append((qn, tid, p, 0x1 | 0x40
                     | rng.choice([0x400, 0x200, 0x100, 0x800]), 60,
                     [("M", 150)], tid, p + 400, 550))
    recs.sort(key=lambda r: (r[1], r[2]))
    lib = LibraryInfo(rs=rs, median=median, mad=mad,
                      minNormalISize=median - 5 * mad,
                      maxNormalISize=maxnorm,
                      minISizeCutoff=median - 9 * mad,
                      maxISizeCutoff=maxcut)
    return chrlens, recs, lib


def _sv_key(s):
    return (s.chr, s.svStart, s.chr2, s.svEnd, s.ciposlow, s.ciposhigh,
            s.ciendlow, s.ciendhigh, s.peSupport, s.peMapQuality,
            s.srSupport, s.srMapQuality, s.mapq, s.insLen, s.svt, s.id)


def test_scan_pe_and_sr_matches_reference(oracle, tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import encode_record, random_contig, write_bam, \
        write_fasta

    rng = random.Random(11111)
    cases = [_case(rng) for _ in range(25)]
    lines = []
    for chrlens, recs, lib in cases:
        toks = " ".join(
            f"{qn} {tid},{pos},{flag},{mapq},{mtid},{mpos},{tlen} "
            + "".join(f"{l}{op}" for op, l in cig)
            for qn, tid, pos, flag, mapq, cig, mtid, mpos, tlen in recs)
        lines.append(
            f"SCANPE 1 25 25 20 40 2 1000 "
            f"{lib.rs},{lib.median},{lib.mad},{lib.maxNormalISize},"
            f"{lib.maxISizeCutoff} {len(chrlens)} "
            + ",".join(map(str, chrlens)) + f" {len(recs)} {toks}")
    outs = oracle(lines)
    n_pe = n_sr = 0
    for idx, ((chrlens, recs, lib), out) in enumerate(zip(cases, outs)):
        pe_s, sr_s, store_s = out.split(" # ")

        def parse(part):
            if part == "-":
                return []
            return [tuple(int(x) for x in tok.split(","))
                    for tok in part.split("|")]

        ref_pe, ref_sr, ref_store = (parse(pe_s), parse(sr_s),
                                     parse(store_s))
        # my side: real BAM through the production scan plane
        contigs = [(f"c{t}", random_contig(random.Random(t), L))
                   for t, L in enumerate(chrlens)]
        encoded = []
        for qn, tid, pos, flag, mapq, cig, mtid, mpos, tlen in recs:
            qlen = sum(l for op, l in cig if op in "MIS=X")
            encoded.append(encode_record(qn, flag, tid, pos, mapq, cig,
                                         mtid, mpos, tlen, "A" * qlen))
        bam = str(tmp_path / f"case{idx}.bam")
        write_bam(bam, contigs, encoded)
        cfg = types.SimpleNamespace(
            min_map_qual=1, min_clip=25, min_ref_sep=25,
            min_tra_qual=20, max_read_sep=40, min_clique_size=2,
            graph_pruning=1000, nchr=len(chrlens), max_threads=1,
            svtset=set(), exclude="", files=[bam])
        svs, sr_svs = [], []
        sr_store = [dict() for _ in chrlens]
        with BamFile(bam) as bf:
            scan_pe_and_sr(cfg, [bf], [[(0, L)] for L in chrlens],
                           svs, sr_svs, sr_store, [lib])
        assert [_sv_key(s) for s in svs] == ref_pe, idx
        assert [_sv_key(s) for s in sr_svs] == ref_sr, idx
        mine_store = [(c, rstart, rid_, svid)
                      for c, d in enumerate(sr_store)
                      for (rstart, rid_), svid in sorted(d.items())]
        assert mine_store == ref_store, idx
        n_pe += len(ref_pe)
        n_sr += len(ref_sr)
    assert n_pe >= 20 and n_sr >= 10, (n_pe, n_sr)
