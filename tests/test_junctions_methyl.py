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
