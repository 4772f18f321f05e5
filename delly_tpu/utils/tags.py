"""Core SV records and svt-code algebra.

SV type encoding (reference tags.h:6-40, util.h:208-248):
  0 = INV 3to3, 1 = INV 5to5, 2 = DEL (3to5), 3 = DUP (5to3), 4 = INS,
  5..8 = BND with orientation ct = svt - 5, 9 = CNV.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SVT_TRANS = 5
MAX_CN = 10


def is_translocation(svt: int) -> bool:
    return SVT_TRANS <= svt < 9


def span_orientation(svt: int) -> int:
    return svt - SVT_TRANS if is_translocation(svt) else svt


def add_id(svt: int) -> str:
    """SV type name (util.h:239-248)."""
    if svt in (0, 1):
        return "INV"
    if svt == 2:
        return "DEL"
    if svt == 3:
        return "DUP"
    if svt == 4:
        return "INS"
    if svt == 9:
        return "CNV"
    return "BND"


def add_orientation(svt: int) -> str:
    """CT INFO string (util.h:275-283)."""
    ct = span_orientation(svt)
    return {0: "3to3", 1: "5to5", 2: "3to5", 3: "5to3"}.get(ct, "NtoN")


def decode_orientation(ct: str, svtype: str) -> int:
    """util.h:218-235."""
    m = {"3to3": 0, "5to5": 1, "3to5": 2, "5to3": 3}
    if svtype == "BND":
        return SVT_TRANS + m[ct] if ct in m else -1
    if svtype == "CNV":
        return 9
    return m.get(ct, 4)


def sv_size_check_sr(start: int, end: int, svt: int) -> bool:
    """Short-read size gates (tags.h:189-198)."""
    if svt in (0, 1, 2):
        return end - start >= 300
    if svt == 3:
        return end - start >= 100
    return True


def sv_size_check_lr(start: int, end: int, svt: int, inslen: int) -> bool:
    """Long-read size gates (tags.h:200-210)."""
    if svt in (0, 1, 2, 3):
        return end - start >= 15
    if svt == 4:
        return inslen >= 15
    return True


def get_sv_type(flag: int, pos: int, mpos: int) -> int:
    """Pair orientation code (tags.h:218-227)."""
    if not flag & 16:  # fwd
        if not flag & 32:
            return 0
        return 2 if pos < mpos else 3
    else:
        if not flag & 32:
            return 2 if pos > mpos else 3
        return 1


def isize_mapping_pos(flag: int, tid: int, pos: int, mtid: int, mpos: int,
                      isize_tlen: int, isize_cutoff: int) -> int:
    """Abnormal pair -> svt (tags.h:229-258); -1 means no SV signal."""
    if tid != mtid:
        orient = get_sv_type(flag, pos, mpos)
        if orient == 0:
            return SVT_TRANS + 0
        if orient == 1:
            return SVT_TRANS + 1
        if tid > mtid:
            return SVT_TRANS + 2 if not flag & 16 else SVT_TRANS + 3
        return SVT_TRANS + 3 if not flag & 16 else SVT_TRANS + 2
    if pos == mpos:
        return -1
    orient = get_sv_type(flag, pos, mpos)
    if orient == 0:
        return 0
    if orient == 1:
        return 1
    if orient == 2:
        return -1 if isize_cutoff > abs(isize_tlen) else 2
    if abs(pos - mpos) < 100:
        return -1
    return 3


def get_sv_type_batch(flag, pos, mpos):
    """Vectorized get_sv_type (tags.h:218-227) over numpy arrays."""
    import numpy as np

    f16 = (flag & 16) != 0
    f32 = (flag & 32) != 0
    return np.where(
        ~f16,
        np.where(~f32, 0, np.where(pos < mpos, 2, 3)),
        np.where(~f32, np.where(pos > mpos, 2, 3), 1)).astype(np.int64)


def isize_mapping_pos_batch(flag, tid, pos, mtid, mpos, tlen, cutoff):
    """Vectorized isize_mapping_pos (tags.h:229-258) over numpy arrays;
    -1 marks pairs with no SV signal. `cutoff` is the per-library
    maxISizeCutoff scalar."""
    import numpy as np

    from delly_tpu import native
    if native.get_lib() is not None:
        out = native.isize_svt_many(flag, tid, pos, mtid, mpos, tlen,
                                    float(cutoff), SVT_TRANS)
        if out is not None:
            return out

    f16 = (flag & 16) != 0
    f32 = (flag & 32) != 0
    # pair orientation (tags.h:218-227)
    orient = np.where(
        ~f16,
        np.where(~f32, 0, np.where(pos < mpos, 2, 3)),
        np.where(~f32, np.where(pos > mpos, 2, 3), 1))
    tra = np.where(
        orient == 0, SVT_TRANS + 0,
        np.where(
            orient == 1, SVT_TRANS + 1,
            np.where(tid > mtid,
                     np.where(~f16, SVT_TRANS + 2, SVT_TRANS + 3),
                     np.where(~f16, SVT_TRANS + 3, SVT_TRANS + 2))))
    intra = np.where(
        orient == 0, 0,
        np.where(
            orient == 1, 1,
            np.where(orient == 2,
                     np.where(cutoff > np.abs(tlen), -1, 2),
                     np.where(np.abs(pos - mpos) < 100, -1, 3))))
    intra = np.where(pos == mpos, -1, intra)
    return np.where(tid != mtid, tra, intra).astype(np.int64)


def min_coord(pos: int, mpos: int, svt: int) -> int:
    return pos if is_translocation(svt) else min(pos, mpos)


def max_coord(pos: int, mpos: int, svt: int) -> int:
    return mpos if is_translocation(svt) else max(pos, mpos)


@dataclass
class Junction:
    """One clip/indel breakpoint on one read (tags.h:43-57)."""
    forward: bool
    scleft: bool
    refidx: int
    rstart: int
    refpos: int
    seqpos: int
    qual: int

    def sort_key(self):
        return (self.seqpos, self.refidx, self.refpos, self.scleft)


@dataclass
class SRBamRecord:
    """One split-read junction pair (tags.h:62-80)."""
    chr: int
    pos: int
    chr2: int
    pos2: int
    rstart: int
    sstart: int
    qual: int
    inslen: int
    id: int
    svid: int = -1
    primaryChr: int = -1

    def sort_key(self):
        return (self.chr, self.pos, self.chr2, self.pos2)


@dataclass
class SVAnno:
    """MEI/TR annotation (tags.h:82-90)."""
    isRC: bool = False
    seqType: int = 0
    homLen: int = 0
    trPeriod: int = 0
    trCopies: float = 0.0


@dataclass
class StructuralVariantRecord:
    """tags.h:93-130."""
    chr: int = 0
    svStart: int = 0
    chr2: int = 0
    svEnd: int = 0
    ciposlow: int = 0
    ciposhigh: int = 0
    ciendlow: int = 0
    ciendhigh: int = 0
    srSupport: int = 0
    srMapQuality: int = 0
    mapq: int = 0
    insLen: int = 0
    svt: int = -1
    id: int = 0
    homLen: int = 0
    peSupport: int = 0
    peMapQuality: int = 0
    consBp: int = 0
    alleleid: int = -1
    nallele: int = 1
    srAlignQuality: float = 0.0
    precise: bool = False
    alleles: str = ""
    consensus: str = ""
    anno: SVAnno = field(default_factory=SVAnno)

    def sort_key(self):
        # tags.h:126-128: higher support sorts first on position ties.
        return (self.chr, self.svStart, self.chr2, self.svEnd,
                -self.peSupport, -self.srSupport)


@dataclass
class Breakpoint:
    """Per-SV breakpoint windows (tags.h:132-148)."""
    svStartBeg: int = 0
    svStartEnd: int = 0
    svEndBeg: int = 0
    svEndEnd: int = 0
    svStart: int = 0
    svEnd: int = 0
    peSupport: int = 0
    svt: int = -1
    chr: int = 0
    chr2: int = 0
    part1: str = ""

    @classmethod
    def from_sv(cls, sv: StructuralVariantRecord) -> "Breakpoint":
        return cls(svStartBeg=sv.svStart, svStartEnd=sv.svStart,
                   svEndBeg=sv.svEnd, svEndEnd=sv.svEnd,
                   svStart=sv.svStart, svEnd=sv.svEnd,
                   peSupport=sv.peSupport, svt=sv.svt,
                   chr=sv.chr, chr2=sv.chr2)


def init_breakpoint(bp: Breakpoint, target_lens: list, boundary: int, svt: int) -> None:
    """tags.h:151-172."""
    if is_translocation(svt) or svt == 4:
        bp.svStartBeg = max(0, bp.svStart - boundary)
        bp.svStartEnd = min(target_lens[bp.chr], bp.svStart + boundary)
        bp.svEndBeg = max(0, bp.svEnd - boundary)
        bp.svEndEnd = min(target_lens[bp.chr2], bp.svEnd + boundary)
    else:
        bp.svStartBeg = max(0, bp.svStart - boundary)
        bp.svStartEnd = min(bp.svStart + boundary, (bp.svStart + bp.svEnd) // 2)
        bp.svEndBeg = max((bp.svStart + bp.svEnd) // 2 + 1, bp.svEnd - boundary)
        bp.svEndEnd = min(target_lens[bp.chr2], bp.svEnd + boundary)


_RC = str.maketrans("ACGTNacgtn", "TGCANTGCAN")
_RC_LUT = None


def revcomp(seq: str) -> str:
    """Reverse complement with the reference's exact quirk
    (util.h:549-563): position i receives the complement of
    upper(seq[n-1-i]) when that is ACGTN; for any OTHER character
    (IUPAC codes, '-') the ORIGINAL character stays un-reversed at
    position i. Identical to a plain uppercased revcomp for pure
    ACGTN/acgtn input."""
    global _RC_LUT
    import numpy as np
    if _RC_LUT is None:
        lut = np.zeros(256, dtype=np.uint8)
        for src, dst in zip(b"ACGTNacgtn", b"TGCANTGCAN"):
            lut[src] = dst
        _RC_LUT = lut
    b = np.frombuffer(seq.encode(), dtype=np.uint8)
    mapped = _RC_LUT[b[::-1]]
    out = np.where(mapped != 0, mapped, b)
    return out.tobytes().decode()


def entropy(seq: str) -> float:
    """Shannon entropy over characters (util.h:565-579)."""
    import math
    if not seq:
        return 0.0
    ent = 0.0
    for c in set(seq):
        freq = seq.count(c) / len(seq)
        ent += freq * math.log2(freq)
    return -ent


def pairs_disagree(p1min, p1max, p1rlen, p1maxnisize,
                   p2min, p2max, p2rlen, p2maxnisize, svt) -> bool:
    """Pair-compatibility predicate (tags.h:277-346)."""
    if is_translocation(svt):
        ct = span_orientation(svt)
        if ct % 2 == 0:
            if (p2min + p2rlen - p1min) > p1maxnisize:
                return True
            if ct >= 2:
                if p2max < p1max:
                    if (p1max + p1rlen - p2max) > p1maxnisize:
                        return True
                else:
                    if (p2max + p2rlen - p1max) > p2maxnisize:
                        return True
            else:
                if p2max < p1max:
                    if (p1max + p1rlen - p2max) > p2maxnisize:
                        return True
                else:
                    if (p2max + p2rlen - p1max) > p1maxnisize:
                        return True
        else:
            if (p2min + p2rlen - p1min) > p2maxnisize:
                return True
            if ct >= 2:
                if p2max < p1max:
                    if (p1max + p1rlen - p2max) > p2maxnisize:
                        return True
                else:
                    if (p2max + p2rlen - p1max) > p1maxnisize:
                        return True
            else:
                if p2max < p1max:
                    if (p1max + p1rlen - p2max) > p1maxnisize:
                        return True
                else:
                    if (p2max + p2rlen - p1max) > p2maxnisize:
                        return True
        return False
    if svt < 2:
        if svt == 0:
            if (p2min + p2rlen - p1min) > p1maxnisize:
                return True
            if (p2max < p1max) and ((p1max + p1rlen - p2max) > p2maxnisize):
                return True
            if (p2max >= p1max) and ((p2max + p2rlen - p1max) > p1maxnisize):
                return True
        else:
            if (p2min + p2rlen - p1min) > p2maxnisize:
                return True
            if (p2max < p1max) and ((p1max + p1rlen - p2max) > p1maxnisize):
                return True
            if (p2max >= p1max) and ((p2max + p2rlen - p1max) > p2maxnisize):
                return True
        return False
    if svt == 2:
        if (p2min + p2rlen - p1min) > p1maxnisize:
            return True
        if (p2max < p1max) and ((p1max + p1rlen - p2max) > p1maxnisize):
            return True
        if (p2max >= p1max) and ((p2max + p2rlen - p1max) > p2maxnisize):
            return True
        if (p1max < p2min) or (p2max < p1min):
            return True
        return False
    if svt == 3:
        if (p2min + p2rlen - p1min) > p2maxnisize:
            return True
        if (p2max < p1max) and ((p1max + p1rlen - p2max) > p2maxnisize):
            return True
        if (p2max >= p1max) and ((p2max + p2rlen - p1max) > p1maxnisize):
            return True
        return False
    return False
