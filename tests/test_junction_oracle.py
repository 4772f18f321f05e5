"""Differential oracle for the split-read junction plane.

tests/junction_probe.cpp compiles the reference's junction.h AS-IS and
runs its real findJunctions loop over a functional htslib replay shim;
this module fuzzes delly_tpu/models/junctions.py against the live
reference: the long-read CIGAR walk with indel-extension look-ahead
merging of split indels (junction.h:319-460), the per-read junction
sort (:452), and the pairwise junction matchers behind fetchSVs —
selectDeletions/Duplications/Inversions/Insertions, bridgeInsertions
and selectTranslocations (junction.h:60-316,463-475) — comparing every
emitted junction and every typed SRBamRecord.
"""

import os
import random
import shutil
import subprocess

import numpy as np
import pytest

from delly_tpu.io.bam import (
    CDEL, CHARD_CLIP, CINS, CMATCH, CSOFT_CLIP, FDUP, FQCFAIL, FREVERSE,
    FSECONDARY, FSUPPLEMENTARY, FUNMAP,
)
from delly_tpu.models.junctions import extract_junctions_lr, fetch_svs
from delly_tpu.utils.tags import SVT_TRANS

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "junction_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")

OPS = "MIDNSHP=X"
OPCODE = {ch: i for i, ch in enumerate(OPS)}


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "junction.h"))):
        pytest.skip("g++ or reference junction.h unavailable")
    gen = tmp_path_factory.mktemp("junction_oracle")
    lines_u = open(os.path.join(REF_SRC, "util.h")).read().splitlines(
        keepends=True)
    a = next(i for i, ln in enumerate(lines_u)
             if "getLibraryParams(TConfig" in ln) - 2
    b = next(i for i in range(a, len(lines_u))
             if "sam_close(samfile[file_c]);" in lines_u[i])
    while lines_u[b].rstrip() != "  }":
        b += 1
    (gen / "util_libparams_slice.h").write_text(
        "namespace torali {\n" + "".join(lines_u[a:b + 1]) + "\n}\n")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", str(gen), "-I", SHIM_DIR,
         "-I", REF_SRC, PROBE_SRC,
         os.path.join(REF_SRC, "edlib.cpp")])

    def run(lines):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


class _Rec:
    def __init__(self, seed, tid, pos, flag, mapq, cigar):
        self.seed = seed
        self.tid = tid
        self.pos = pos
        self.flag = flag
        self.mapq = mapq
        self.cigar = cigar  # string
        self.cigar_ops = []
        self.cigar_lens = []
        n = 0
        for ch in cigar:
            if ch.isdigit():
                n = n * 10 + int(ch)
            else:
                self.cigar_ops.append(OPCODE[ch])
                self.cigar_lens.append(n)
                n = 0

    def read_length(self):
        # l_qseq (query ops excl. hard clips) + hard clips
        # = all query-consuming ops + H (util.h:429-438)
        return sum(l for o, l in zip(self.cigar_ops, self.cigar_lens)
                   if o in (CMATCH, CINS, CSOFT_CLIP, CHARD_CLIP, 7, 8))


def _cigar(rng, min_ref_sep, chrlen, pos):
    """Random LR-style CIGAR: matches with embedded indels/clips, incl.
    split-indel runs that exercise the look-ahead merge."""
    parts = []
    if rng.random() < 0.5:
        parts.append((rng.choice("SH"),
                      rng.randint(1, 4 * min_ref_sep)))
    parts.append(("M", rng.randint(30, 500)))
    for _ in range(rng.randint(0, 6)):
        kind = rng.choice("DI")
        # sizes straddling minRefSep; short matches between indels
        # trigger the extension look-ahead
        parts.append((kind, rng.choice(
            [rng.randint(1, min_ref_sep),
             rng.randint(min_ref_sep + 1, 12 * min_ref_sep)])))
        parts.append(("M", rng.choice(
            [rng.randint(1, 30), rng.randint(50, 400)])))
    if rng.random() < 0.5:
        parts.append((rng.choice("SH"),
                      rng.randint(1, 6 * min_ref_sep)))
    # keep reference span inside the chromosome
    span = pos + sum(l for k, l in parts if k in "MD=XN")
    if span >= chrlen:
        return None
    return "".join(f"{l}{k}" for k, l in parts)


def test_lr_junctions_and_svs_match_reference(oracle):
    rng = random.Random(9191)
    cases = []
    for _ in range(60):
        min_ref_sep = rng.choice([25, 30, 50])
        min_clip = rng.choice([25, 50])
        indel_ext = rng.choice([0.5, 0.7])
        min_mapq = rng.choice([0, 10, 30])
        max_read_sep = rng.choice([50, 100])
        nchr = rng.randint(1, 2)
        chrlens = [rng.randint(40000, 120000) for _ in range(nchr)]
        recs = []
        seed = 0
        for _ in range(rng.randint(1, 25)):
            tid = rng.randrange(nchr)
            pos = rng.randint(0, chrlens[tid] - 15000)
            flag = rng.choice([0, 16, 0, 16, FSECONDARY,
                               16 | FSUPPLEMENTARY, FDUP, FUNMAP])
            mapq = rng.choice([0, 5, 20, 60])
            cig = _cigar(rng, min_ref_sep, chrlens[tid], pos)
            if cig is None:
                continue
            # split alignments of one read share a seed
            nseg = 1 if rng.random() < 0.7 else rng.randint(2, 3)
            for _ in range(nseg):
                recs.append(_Rec(seed, tid, pos, flag, mapq, cig))
                pos2 = rng.randint(0, chrlens[tid] - 15000)
                cig2 = _cigar(rng, min_ref_sep, chrlens[tid], pos2)
                pos = pos2
                if cig2 is None:
                    break
                cig = cig2
            seed += 1
        cases.append((min_ref_sep, min_clip, indel_ext, min_mapq,
                      max_read_sep, chrlens, recs))
    lines = []
    for (mrs, mc, ie, mq, mxs, chrlens, recs) in cases:
        toks = " ".join(
            f"{r.seed},{r.tid},{r.pos},{r.flag},{r.mapq} {r.cigar}"
            for r in recs)
        lines.append(f"LR {mrs} {mc} {np.float32(ie):.9g} {mq} {mxs} "
                     f"{len(chrlens)} "
                     + ",".join(map(str, chrlens))
                     + f" {len(recs)} {toks}")
    n_junc = n_sv = 0
    for case, out in zip(cases, oracle(lines)):
        mrs, mc, ie, mq, mxs, chrlens, recs = case
        jpart, spart = out.split(" # ")
        # reference side
        ref_j = []
        if jpart != "-":
            for tok in jpart.split("|"):
                sid, rest = tok.split(":")
                ref_j.append((int(sid),)
                             + tuple(int(x) for x in rest.split(",")))
        ref_sv = set()
        if spart != "-":
            for tok in spart.split("|"):
                svt, rest = tok.split(":")
                ref_sv.add((int(svt),)
                           + tuple(int(x) for x in rest.split(",")))
        # my side: same gating + per-tid iteration order as the loop
        read_bp: dict = {}
        for tid in range(len(chrlens)):
            for r in recs:
                if r.tid != tid:
                    continue
                if r.flag & (FQCFAIL | FDUP | FUNMAP):
                    continue
                if r.mapq < mq or r.tid < 0:
                    continue
                extract_junctions_lr(read_bp, r.seed, r, mrs, mc,
                                     float(np.float32(ie)))
        for jv in read_bp.values():
            jv.sort(key=lambda j: j.sort_key())
        mine_j = [(s, int(j.forward), int(j.scleft), j.refidx,
                   j.rstart, j.refpos, j.seqpos, j.qual)
                  for s in sorted(read_bp) for j in read_bp[s]]
        assert mine_j == ref_j, case[:5]
        br = [[] for _ in range(2 * SVT_TRANS)]
        fetch_svs(read_bp, br, set(), mxs, mrs)
        mine_sv = set()
        for svt, bucket in enumerate(br):
            for r in bucket:
                mine_sv.add((svt, r.chr, r.pos, r.chr2, r.pos2,
                             r.rstart, r.sstart, r.qual, r.inslen,
                             r.id))
        assert mine_sv == ref_sv, case[:5]
        n_junc += len(ref_j)
        n_sv += len(ref_sv)
    assert n_junc >= 300 and n_sv >= 60, (n_junc, n_sv)


def test_library_params_match_reference(oracle):
    """Insert-size library characterization (util.h:771-891): flag
    gating, sampling caps, median/MAD, orientation tally, cutoff
    floors — vs our vectorized get_library_params over the identical
    record stream."""
    import types

    from delly_tpu.utils.stats import get_library_params

    rng = random.Random(9393)
    cases = []
    for _ in range(12):
        nchr = rng.randint(1, 2)
        chrlens = [1000000] * nchr
        median = rng.choice([350, 500, 42, 120000])
        mad = rng.randint(10, 60)
        fr_frac = rng.choice([0.95, 0.95, 0.3])
        nrec = rng.randint(900, 2600)
        recs = []
        pos = 100
        for i in range(nrec):
            tid = rng.randrange(nchr)
            lq = rng.choice([150, 151, 250])
            isz = int(rng.gauss(median, 1.4826 * mad))
            flag = 0x1 | 0x2 | 0x40  # paired, proper, read1
            if rng.random() < fr_frac:
                flag |= 0x20  # mate reverse (FR layout, pos < mpos)
                mpos = pos + max(0, isz - lq)
            else:
                flag |= 0x10
                mpos = pos + max(0, isz - lq)
            r = rng.random()
            if r < 0.06:
                flag |= rng.choice([0x100, 0x400, 0x200, 0x800, 0x4])
            elif r < 0.10:
                flag = (flag & ~0x40) | 0x80  # READ2: screened out
            elif r < 0.13:
                flag |= 0x8  # mate unmapped
            recs.append((tid, pos, flag, 60, lq, tid, mpos, isz))
            pos += rng.randint(50, 400)
        cases.append((chrlens, recs))
    lines = []
    for chrlens, recs in cases:
        toks = " ".join(",".join(map(str, r)) for r in recs)
        lines.append(f"LIBPARAMS 5 9 {len(chrlens)} "
                     + ",".join(map(str, chrlens))
                     + f" {len(recs)} {toks}")
    outs = oracle(lines)
    for (chrlens, recs), out in zip(cases, outs):
        rs, med, mad_, mn, mx, mnc, mxc = (int(x) for x in out.split())

        class _SoaBam:
            class header:
                n_targets = len(chrlens)
                lengths = chrlens

            @staticmethod
            def iter_soa_chunks():
                import numpy as np
                order = sorted(range(len(recs)),
                               key=lambda i: (recs[i][0], recs[i][1]))
                cols = list(zip(*[recs[i] for i in order]))
                soa = {"tid": np.asarray(cols[0], dtype=np.int32),
                       "pos": np.asarray(cols[1], dtype=np.int64),
                       "flag": np.asarray(cols[2], dtype=np.int32),
                       "lqseq": np.asarray(cols[4], dtype=np.int32),
                       "mtid": np.asarray(cols[5], dtype=np.int32),
                       "mpos": np.asarray(cols[6], dtype=np.int64),
                       "tlen": np.asarray(cols[7], dtype=np.int64)}
                yield types.SimpleNamespace(soa=soa)

        vr = [[(0, L)] for L in chrlens]
        lib = get_library_params(_SoaBam, vr)
        assert (lib.rs, lib.median, lib.mad, lib.minNormalISize,
                lib.maxNormalISize, lib.minISizeCutoff,
                lib.maxISizeCutoff) == (rs, med, mad_, mn, mx, mnc,
                                        mxc), (len(recs),)
