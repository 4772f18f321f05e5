"""Junction pairing + methylation call tests."""

import numpy as np
import pytest

from delly_tpu.models.junctions import (
    bridge_insertions, select_deletions, select_duplications,
    select_insertions, select_inversions, select_translocations,
)
from delly_tpu.models.methyl import (
    accumulate_methyl, build_methyl_calls, collect_methyl_from_windows,
)
from delly_tpu.utils.tags import SVT_TRANS, Junction, is_translocation


def _junc(forward, scleft, refidx, refpos, seqpos, rstart=0, qual=60):
    return Junction(forward, scleft, refidx, rstart, refpos, seqpos, qual)


def _br():
    return [[] for _ in range(2 * SVT_TRANS)]


def test_select_deletions():
    # one read: right-clip at 1000, left-clip at 6000, small seq gap
    read_bp = {7: [_junc(True, False, 0, 1000, 100),
                   _junc(True, True, 0, 6000, 110)]}
    br = _br()
    select_deletions(read_bp, br, max_read_sep=40, min_ref_sep=25)
    assert len(br[2]) == 1
    r = br[2][0]
    assert (r.pos, r.pos2) == (1000, 6000)
    assert r.inslen == 10


def test_select_duplications():
    # duplication signature: left-clip at the low coord, right-clip high
    read_bp = {7: [_junc(True, True, 0, 1000, 100),
                   _junc(True, False, 0, 6000, 110)]}
    br = _br()
    select_duplications(read_bp, br, max_read_sep=40, min_ref_sep=25)
    assert len(br[3]) == 1
    assert (br[3][0].pos, br[3][0].pos2) == (1000, 6000)


def test_select_inversions_orientation():
    # same clip side + opposite strand -> inversion
    read_bp = {7: [_junc(True, False, 0, 1000, 100),
                   _junc(False, False, 0, 6000, 120)]}
    br = _br()
    select_inversions(read_bp, br, max_read_sep=40, min_ref_sep=25)
    assert len(br[0]) + len(br[1]) == 1


def test_select_insertions():
    # two junctions at nearly the same refpos with a big seq gap
    read_bp = {7: [_junc(True, False, 0, 1000, 100),
                   _junc(True, True, 0, 1005, 400)]}
    br = _br()
    select_insertions(read_bp, br, max_read_sep=500, min_ref_sep=25)
    assert len(br[4]) == 1
    assert br[4][0].inslen == 295  # seq gap minus ref gap (junction.h:181-222)


def test_select_translocations():
    read_bp = {7: [_junc(True, False, 0, 1000, 100),
                   _junc(True, True, 1, 5000, 110)]}
    br = _br()
    select_translocations(read_bp, br, max_read_sep=40)
    total = sum(len(br[s]) for s in range(SVT_TRANS, SVT_TRANS + 4))
    assert total == 1


class _Rec:
    """Minimal BamRecord stand-in for methylation calls."""

    def __init__(self, seq, cigar, pos=0, flag=0, aux=None):
        from delly_tpu.io.bam import CIGAR_CHARS
        self.l_qseq = len(seq)
        self._seq = seq
        self.pos = pos
        self.flag = flag
        self._aux = aux or {}
        ops = []
        lens = []
        num = ""
        for ch in cigar:
            if ch.isdigit():
                num += ch
            else:
                lens.append(int(num))
                ops.append(CIGAR_CHARS.index(ch))
                num = ""
        self.cigar_ops = np.asarray(ops)
        self.cigar_lens = np.asarray(lens)

    @property
    def seq(self):
        return self._seq

    def aux(self, tag):
        return self._aux.get(tag)


def test_build_methyl_calls_basic():
    # fwd read ACGCGT: C at 1,3; MM tag marks first C (skip 0) methylated
    rec = _Rec("ACGCGT", "6M",
               aux={"MM": "C+m,0;",
                    "ML": np.asarray([200], dtype=np.uint8)})
    ok, calls = build_methyl_calls(rec, prob_th=128)
    assert ok
    assert calls[1] == 1   # first C methylated (prob 200 >= 128)
    assert calls[3] == 0   # second C unmodified (implicit)
    assert calls[0] == -1  # A: no call


def test_build_methyl_calls_low_prob():
    rec = _Rec("ACGCGT", "6M",
               aux={"MM": "C+m,0;",
                    "ML": np.asarray([50], dtype=np.uint8)})
    ok, calls = build_methyl_calls(rec, prob_th=128)
    assert ok
    assert calls[1] == 0  # below threshold -> unmodified


def test_no_mm_tag():
    rec = _Rec("ACGT", "4M")
    ok, calls = build_methyl_calls(rec, prob_th=128)
    assert not ok
    assert (calls == -1).all()


def test_collect_methyl_windows():
    rec = _Rec("CCCC", "4M", pos=100,
               aux={"MM": "C+m,0,0;",
                    "ML": np.asarray([200, 200], dtype=np.uint8)})
    ok, calls = build_methyl_calls(rec, prob_th=128)
    meth, tot, cpg = collect_methyl_from_windows(rec, calls,
                                                 [(100, 102), (102, 104)])
    assert tot == [2, 2]
    assert meth[0] + meth[1] == 2  # two methylated calls overall
    assert set(cpg[0]) == {100, 101}


def test_lr_methylation_end_to_end(tmp_path):
    """Full lr run on a synthetic BAM carrying MM/ML tags: ALT reads
    fully 5mC-methylated, REF reads unmethylated — the called DEL's
    MR/MA/MNC/MDV FORMAT fields must reflect that split
    (methyl.h accumulation + modvcf.h:622-657 emission)."""
    import os
    import random
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import (aux_mm_ml, encode_record, random_contig,
                          write_bam, write_fasta)

    rng = random.Random(7)
    clen = 120_000
    ref = random_contig(rng, clen)
    contigs = [("chrM1", ref)]
    del_len = 1500
    posd = clen // 2
    read_len = 6000
    recs = []
    qid = 0

    def mm_for(seq, methylated):
        ncs = seq.upper().count("C")
        if ncs == 0:
            return b""
        mm = "C+m," + ",".join("0" * 1 for _ in range(ncs)) + ";"
        prob = 230 if methylated else 15
        return aux_mm_ml(mm, [prob] * ncs)

    # background REF reads across the DEL, unmethylated
    for _ in range(14):
        p = posd - rng.randint(3000, 4500)
        seq = ref[p:p + read_len]
        recs.append((p, encode_record(
            f"r{qid}", 0x0, 0, p, 60, [("M", read_len)], -1, -1, 0,
            seq, aux=mm_for(seq, False))))
        qid += 1
    # ALT reads spanning the DEL, fully methylated
    for _ in range(12):
        lo = rng.randint(1500, 2500)
        hi = rng.randint(1500, 2500)
        p = posd - lo
        seq = ref[p:posd] + ref[posd + del_len:posd + del_len + hi]
        recs.append((p, encode_record(
            f"a{qid}", 0x0, 0, p, 60,
            [("M", lo), ("D", del_len), ("M", hi)], -1, -1, 0, seq,
            aux=mm_for(seq, True))))
        qid += 1
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "meth.bam")
    fa = str(tmp_path / "meth.fa")
    write_bam(bam, contigs, [r[1] for r in recs])
    write_fasta(fa, contigs)

    out = str(tmp_path / "meth.vcf")
    r = subprocess.run([sys.executable, "-m", "delly_tpu.cli", "lr",
                        "-g", fa, "-o", out, bam],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    body = [ln.split("\t") for ln in open(out)
            if ln.strip() and not ln.startswith("#")]
    dels = [rec for rec in body if "SVTYPE=DEL" in rec[7]]
    assert dels, body
    rec = dels[0]
    fmt = dict(zip(rec[8].split(":"), rec[9].split(":")))
    assert {"MR", "MA", "MNC", "MDV"} <= set(fmt)
    # comma-joined per-breakpoint-side values; take populated ones
    mr = [int(x) for x in fmt["MR"].split(",") if x not in (".", "")]
    ma = [int(x) for x in fmt["MA"].split(",") if x not in (".", "")]
    assert ma and max(ma) >= 80, fmt
    assert mr and max(mr) <= 20, fmt
    mdv = [int(x) for x in fmt["MDV"].split(",") if x not in (".", "")]
    assert mdv and max(mdv) >= 5, fmt
