"""Consensus-to-reference breakpoint refinement.

Reference: src/split.h. Builds the per-SV reference junction probe, aligns
the consensus across the junction (longNeedle for most types, edlib-style
prefix/suffix split-and-glue for insertions), locates the largest internal
gap as the breakpoint, gates on flank percent identity, computes
micro-homology, and back-transforms coordinates per svt.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from delly_tpu.ops.edist import (
    EDOP_DELETE, EDOP_INSERT, MODE_HW, MODE_NW, MODE_SHW, align as ed_align,
    batched_pairs_distance, infix_start,
)
from delly_tpu.ops.gotoh import GAP, DnaScore
from delly_tpu.ops.needle import long_needle, longest_homology
from delly_tpu.utils.tags import (
    Breakpoint, StructuralVariantRecord, init_breakpoint, is_translocation,
    revcomp, span_orientation,
)


@dataclass
class AlignDescriptor:
    """split.h:15-25."""
    cStart: int = 0
    cEnd: int = 0
    rStart: int = 0
    rEnd: int = 0
    homLeft: int = 0
    homRight: int = 0
    percId: float = 0.0


def adjust_orientation(sequence: str, bp_point: bool, svt: int) -> str:
    """split.h:55-68."""
    if is_translocation(svt):
        ct = span_orientation(svt)
        if (ct == 0 and bp_point) or (ct == 1 and not bp_point):
            return revcomp(sequence)
        return sequence
    if svt == 0 and bp_point:
        return revcomp(sequence)
    if svt == 1 and not bp_point:
        return revcomp(sequence)
    return sequence


def get_sv_ref(ref: str, bp: Breakpoint, ref_index: int, svt: int,
               indelsize: int, min_cons_window: int) -> str:
    """Reference junction probe (split.h:70-163). ``ref`` is the chromosome
    sequence for ``ref_index``."""
    def up(a, b):
        return ref[a:b].upper()

    if is_translocation(svt):
        ct = span_orientation(svt)
        if bp.chr == ref_index:
            if ct in (0, 2):
                return up(bp.svStartBeg, bp.svStartEnd) + bp.part1
            if ct == 1:
                return revcomp(up(bp.svStartBeg, bp.svStartEnd)) + bp.part1
            return bp.part1 + up(bp.svStartBeg, bp.svStartEnd)
        else:  # chr2 part
            if ct == 0:
                return revcomp(up(bp.svEndBeg, bp.svEndEnd))
            return up(bp.svEndBeg, bp.svEndEnd)
    if svt == 2:
        if bp.svEnd - bp.svStart <= indelsize:
            return up(bp.svStartBeg, bp.svEndEnd)
        return up(bp.svStartBeg, bp.svStartEnd) + up(bp.svEndBeg, bp.svEndEnd)
    if svt == 4:
        return up(bp.svStartBeg, bp.svEndEnd)
    if svt == 3:
        return up(bp.svEndBeg, bp.svEndEnd) + up(bp.svStartBeg, bp.svStartEnd)
    if svt == 0:
        if (bp.svEnd - bp.svStart) > min_cons_window:
            str_end = up(bp.svEndBeg, bp.svEndEnd)
            return up(bp.svStartBeg, bp.svStartEnd) + revcomp(str_end)
        str_end = up(bp.svStart, bp.svEndEnd)
        return (up(bp.svStartBeg, bp.svStartEnd) + revcomp(str_end)
                + up(bp.svEnd, bp.svEndEnd))
    if svt == 1:
        if (bp.svEnd - bp.svStart) > min_cons_window:
            str_start = up(bp.svStartBeg, bp.svStartEnd)
            return revcomp(str_start) + up(bp.svEndBeg, bp.svEndEnd)
        str_start = up(bp.svStartBeg, bp.svEnd)
        return (up(bp.svStartBeg, bp.svStart) + revcomp(str_start)
                + up(bp.svEndBeg, bp.svEndEnd))
    return ""


def coord_transform(ref_len: int, bp: Breakpoint, ad: AlignDescriptor,
                    svt: int, indelsize: int, min_cons_window: int):
    """split.h:166-244. Returns (ok, gap_start, gap_end)."""
    if is_translocation(svt):
        ct = span_orientation(svt)
        if ct == 0:
            annealed = bp.svStartEnd - bp.svStartBeg
            if ad.rStart >= annealed or ad.rEnd < annealed:
                return False, 0, 0
            return True, bp.svStartBeg + ad.rStart, bp.svEndBeg + (ref_len - ad.rEnd) + 1
        if ct == 1:
            annealed = bp.svStartEnd - bp.svStartBeg
            if ad.rStart >= annealed or ad.rEnd < annealed:
                return False, 0, 0
            return True, bp.svStartBeg + (annealed - ad.rStart) + 1, bp.svEndBeg + (ad.rEnd - annealed)
        if ct == 2:
            annealed = bp.svStartEnd - bp.svStartBeg
            if ad.rStart >= annealed or ad.rEnd < annealed:
                return False, 0, 0
            return True, bp.svStartBeg + ad.rStart, bp.svEndBeg + (ad.rEnd - annealed)
        if ct == 3:
            annealed = bp.svEndEnd - bp.svEndBeg
            if ad.rStart >= annealed or ad.rEnd < annealed:
                return False, 0, 0
            return True, bp.svStartBeg + (ad.rEnd - annealed), bp.svEndBeg + ad.rStart
        return False, 0, 0
    if svt == 2:
        if bp.svEnd - bp.svStart > indelsize:
            annealed = bp.svStartEnd - bp.svStartBeg
            if ad.rStart >= annealed or ad.rEnd < annealed:
                return False, 0, 0
            return True, bp.svStartBeg + ad.rStart, bp.svEndBeg + (ad.rEnd - annealed)
        return True, bp.svStartBeg + ad.rStart, bp.svStartBeg + ad.rEnd
    if svt == 3:
        annealed = bp.svEndEnd - bp.svEndBeg
        if ad.rStart >= annealed or ad.rEnd < annealed:
            return False, 0, 0
        return True, bp.svStartBeg + (ad.rEnd - annealed), bp.svEndBeg + ad.rStart
    if svt == 0:
        annealed = bp.svStartEnd - bp.svStartBeg
        if ad.rStart >= annealed or ad.rEnd < annealed:
            return False, 0, 0
        if (bp.svEnd - bp.svStart) > min_cons_window:
            return True, bp.svStartBeg + ad.rStart, bp.svEndBeg + (ref_len - ad.rEnd) + 1
        return True, bp.svStartBeg + ad.rStart, bp.svEndEnd - (ad.rEnd - annealed)
    if svt == 1:
        if (bp.svEnd - bp.svStart) > min_cons_window:
            annealed = bp.svStartEnd - bp.svStartBeg
            if ad.rStart >= annealed or ad.rEnd < annealed:
                return False, 0, 0
            return True, bp.svStartBeg + (annealed - ad.rStart) + 1, bp.svEndBeg + (ad.rEnd - annealed)
        annealed = (bp.svStart - bp.svStartBeg) + (bp.svEnd - bp.svStartBeg)
        if ad.rStart >= annealed or ad.rEnd < annealed:
            return False, 0, 0
        return True, bp.svStartBeg + (annealed - ad.rStart) + 1, bp.svEndBeg + (ad.rEnd - annealed)
    if svt == 4:
        return True, bp.svStartBeg + ad.rStart, bp.svStartBeg + ad.rEnd
    return True, 0, 0


def _valid_sr_alignment(c_start, c_end, r_start, r_end, svt) -> bool:
    """split.h:247-253."""
    if svt == 4:
        return (r_end - r_start) < 5 and (c_end - c_start) > 15
    return (c_end - c_start) < 5 and (r_end - r_start) > 15


def _check_sv_gap(ref_gap, old_ref_gap, var_gap, old_var_gap, svt) -> bool:
    if svt == 4:
        return var_gap > old_var_gap
    return ref_gap > old_ref_gap


def find_homology(consensus: str, sv_ref: str, ad: AlignDescriptor, svt: int) -> None:
    """split.h:262-280."""
    if svt == 4:
        ad.homRight = longest_homology(consensus[ad.cStart:], sv_ref[ad.rEnd - 1:], -1)
        pre_c = consensus[: ad.cEnd - 1][::-1]
        pre_r = sv_ref[: ad.rStart][::-1]
        ad.homLeft = longest_homology(pre_c, pre_r, -1)
    else:
        ad.homRight = longest_homology(consensus[ad.cEnd - 1:], sv_ref[ad.rStart:], -1)
        pre_c = consensus[: ad.cStart][::-1]
        pre_r = sv_ref[: ad.rEnd - 1][::-1]
        ad.homLeft = longest_homology(pre_c, pre_r, -1)


def percent_identity(align: np.ndarray, gs: int, ge_: int) -> float:
    """split.h:282-316."""
    var_seen = False
    ref_seen = False
    gap_mm = 0
    mm = 0
    ma = 0
    in_gap = False
    for j in range(align.shape[1]):
        if j < gs or j > ge_:
            if align[0][j] != GAP:
                var_seen = True
            if align[1][j] != GAP:
                ref_seen = True
            if align[0][j] == GAP or align[1][j] == GAP:
                if ref_seen and var_seen:
                    if not in_gap:
                        in_gap = True
                        gap_mm = 0
                    gap_mm += 1
            else:
                if in_gap:
                    mm += gap_mm
                    in_gap = False
                if align[0][j] == align[1][j]:
                    ma += 1
                else:
                    mm += 1
    # 0/0 = NaN in the reference (split.h:315); the percId <
    # flankQuality gate is then false and the split proceeds
    return ma / (ma + mm) if (ma + mm) else float("nan")


def find_split(consensus: str, sv_ref: str, align: np.ndarray,
               ad: AlignDescriptor, svt: int, flank_quality: float,
               min_flank_size: int) -> bool:
    """split.h:319-375: largest internal gap = breakpoint."""
    gs = 0
    ge_ = 0
    ref_index = 0
    var_index = 0
    gap_start_ref = 0
    gap_start_var = 0
    a1 = 0
    in_gap = False
    for j in range(align.shape[1]):
        if align[0][j] != GAP:
            var_index += 1
        if align[1][j] != GAP:
            ref_index += 1
        if (align[0][j] == GAP or align[1][j] == GAP) and ref_index > 0 and var_index > 0:
            if not in_gap:
                gap_start_var = var_index - 1 if align[0][j] != GAP else var_index
                gap_start_ref = ref_index - 1 if align[1][j] != GAP else ref_index
                a1 = j
                in_gap = True
        else:
            if in_gap and _check_sv_gap(ref_index - gap_start_ref,
                                        ad.rEnd - ad.rStart,
                                        var_index - gap_start_var,
                                        ad.cEnd - ad.cStart, svt):
                ad.rStart = gap_start_ref
                ad.rEnd = ref_index
                ad.cStart = gap_start_var
                ad.cEnd = var_index
                gs = a1
                ge_ = j - 1
            in_gap = False
    if ad.rEnd <= ad.rStart:
        return False
    if not _valid_sr_alignment(ad.cStart, ad.cEnd, ad.rStart, ad.rEnd, svt):
        return False
    ad.percId = percent_identity(align, gs, ge_)
    if ad.percId < flank_quality:
        return False
    find_homology(consensus, sv_ref, ad, svt)
    if (ad.homLeft + min_flank_size > ad.cStart) or (var_index < ad.cEnd + ad.homRight + min_flank_size):
        return False
    if (ad.homLeft + min_flank_size > ad.rStart) or (ref_index < ad.rEnd + ad.homRight + min_flank_size):
        return False
    return True


def edit_distance_vec(seq_i: str, seq_j: str, ops: np.ndarray) -> np.ndarray:
    """split.h:378-406: per-query-position cumulative edit distance."""
    dist = np.zeros(len(seq_i), dtype=np.uint32)
    t_idx = -1
    q_idx = -1
    ed = 0
    for op in ops:
        if op == EDOP_DELETE:
            t_idx += 1
            ed += 1
        elif op == EDOP_INSERT:
            q_idx += 1
            ed += 1
            dist[q_idx] = ed
        else:
            t_idx += 1
            q_idx += 1
            if seq_i[q_idx] != seq_j[t_idx]:
                ed += 1
            dist[q_idx] = ed
    return dist


def glue_alignment(query: str, target: str, gaplen: int,
                   left_ops: np.ndarray, left_end: int,
                   right_ops: np.ndarray, right_end: int) -> np.ndarray:
    """split.h:408-477 (HW mode). Builds the 2xL gapped alignment."""
    missing_start = infix_start(left_ops, left_end)
    missing_end = right_end
    if missing_end < len(target):
        missing_end = len(target) - missing_end - 1
    L = missing_start + len(left_ops) + gaplen + len(right_ops) + missing_end
    out = np.full((2, L), GAP, dtype=np.uint8)
    tq = np.frombuffer(query.encode(), dtype=np.uint8)
    tt = np.frombuffer(target.encode(), dtype=np.uint8)
    t_idx = -1
    q_idx = -1
    # fix start
    for j in range(missing_start):
        out[1][j] = tt[j]
    t_idx = missing_start - 1
    pos = missing_start
    for op in left_ops:
        if op == EDOP_INSERT:
            out[1][pos] = GAP
        else:
            t_idx += 1
            out[1][pos] = tt[t_idx]
        if op == EDOP_DELETE:
            out[0][pos] = GAP
        else:
            q_idx += 1
            out[0][pos] = tq[q_idx]
        pos += 1
    for _ in range(gaplen):
        out[0][pos] = GAP
        t_idx += 1
        out[1][pos] = tt[t_idx]
        pos += 1
    for op in right_ops:
        if op == EDOP_INSERT:
            out[1][pos] = GAP
        else:
            t_idx += 1
            out[1][pos] = tt[t_idx]
        if op == EDOP_DELETE:
            out[0][pos] = GAP
        else:
            q_idx += 1
            out[0][pos] = tq[q_idx]
        pos += 1
    for _ in range(missing_end):
        t_idx += 1
        out[1][pos] = tt[t_idx]
        out[0][pos] = GAP
        pos += 1
    return out


def split_align(cons: str, sv_ref: str):
    """Insertion split-and-glue aligner (split.h:480-537)."""
    prefix = sv_ref[: len(sv_ref) // 3]
    _, e, ops = ed_align(prefix, cons, MODE_HW)
    cs_start = infix_start(ops, e)
    suffix = sv_ref[2 * len(sv_ref) // 3:]
    _, cs_end, _ops = ed_align(suffix, cons, MODE_HW)
    if cs_start >= cs_end:
        return None
    cs = cons[cs_start:cs_end]
    # Prefix alignment (SHW)
    _, _, ops_fwd = ed_align(sv_ref, cs, MODE_SHW)
    dist_fwd = edit_distance_vec(sv_ref, cs, ops_fwd)
    sv_ref_rev = revcomp(sv_ref)
    cs_rev = revcomp(cs)
    _, _, ops_rev = ed_align(sv_ref_rev, cs_rev, MODE_SHW)
    dist_rev = edit_distance_vec(sv_ref_rev, cs_rev, ops_rev)
    best_join = 0
    nfd = len(dist_fwd)
    for i in range(1, nfd - 1):
        if (dist_fwd[i] + dist_rev[nfd - i - 2]
                < dist_fwd[best_join] + dist_rev[nfd - best_join - 2]):
            best_join = i
    sv_ref_left = sv_ref[: best_join + 1]
    sv_ref_right = sv_ref[best_join + 1:]
    _, left_end, left_ops = ed_align(sv_ref_left, cons, MODE_HW)
    _, right_end, right_ops = ed_align(sv_ref_right, cons, MODE_HW)
    right_start = infix_start(right_ops, right_end)
    if left_end + 15 >= right_start:
        return None
    return glue_alignment(sv_ref, cons, right_start - left_end - 1,
                          left_ops, left_end, right_ops, right_end)


def cons_ref_alignment(cons: str, sv_ref: str, svt: int):
    """split.h:540-558. Returns 2xL alignment (row0=consensus) or None."""
    if svt == 4:
        aln = split_align(cons, sv_ref)
        if aln is None:
            return None
        return aln[::-1].copy()  # swap rows: query was svRef
    return long_needle(cons, sv_ref, DnaScore(1, -1, -1, -1),
                       horizontal_free=True)


def align_consensus_core(cons: str, sv_ref: str, sv: StructuralVariantRecord,
                         bp: Breakpoint, cfg, realign: bool) -> bool:
    """split.h:560-642 (_alignConsensus). Mutates sv in place on success."""
    if realign:
        revc = revcomp(cons)
        # Distance-only strand check (split.h:565-569): two-row batched DP
        # instead of two full (m+1)x(n+1) matrices.
        d_pair = batched_pairs_distance([(sv_ref, cons), (sv_ref, revc)],
                                        MODE_NW)
        d_fwd, d_rev = int(d_pair[0]), int(d_pair[1])
        if d_rev < d_fwd:
            cons = revc
            # The reference mutates sv.consensus in place here (split.h:569),
            # even if the later steps fail.
            sv.consensus = cons
    aln = cons_ref_alignment(cons, sv_ref, sv.svt)
    if aln is None:
        return False
    ad = AlignDescriptor()
    if not find_split(cons, sv_ref, aln, ad, sv.svt, cfg.flank_quality,
                      cfg.min_flank_size):
        return False
    ok, gap_start, gap_end = coord_transform(len(sv_ref), bp, ad, sv.svt,
                                             cfg.indelsize,
                                             cfg.min_cons_window)
    if not ok:
        return False
    if is_translocation(sv.svt) or gap_start < gap_end:
        if sv.svEnd - sv.svStart <= cfg.indelsize and sv.svt in (2, 4):
            ref_vcf = []
            alt_vcf = []
            cpos = 0
            in_sv = False
            for j in range(aln.shape[1]):
                if aln[0][j] != GAP:
                    cpos += 1
                    if cpos == ad.cStart:
                        in_sv = True
                    elif cpos == ad.cEnd:
                        in_sv = False
                if in_sv:
                    if aln[0][j] != GAP:
                        alt_vcf.append(chr(aln[0][j]))
                    if aln[1][j] != GAP:
                        ref_vcf.append(chr(aln[1][j]))
            sv.alleles = "".join(ref_vcf) + "," + "".join(alt_vcf)
        sv.precise = True
        sv.svStart = gap_start
        sv.svEnd = gap_end
        sv.srAlignQuality = ad.percId
        sv.insLen = ad.cEnd - ad.cStart - 1
        sv.consBp = ad.cStart
        sv.homLen = max(0, ad.homLeft + ad.homRight - 2)
        ci_wiggle = max(ad.homLeft, ad.homRight)
        sv.ciposlow = -ci_wiggle
        sv.ciposhigh = ci_wiggle
        sv.ciendlow = -ci_wiggle
        sv.ciendhigh = ci_wiggle
        return True
    return False


def align_consensus(cfg, target_lens: list, seq: str, snd_seq,
                    sv: StructuralVariantRecord, realign: bool = False) -> bool:
    """split.h:644-672. seq = chromosome of sv.chr, snd_seq = sv.chr2 or None."""
    if len(sv.consensus) < 2 * cfg.min_flank_size + sv.insLen:
        return False
    bp = Breakpoint.from_sv(sv)
    if sv.svt == 4:
        buffer_space = max((len(sv.consensus) - sv.insLen) // 3,
                           cfg.min_flank_size)
        init_breakpoint(bp, target_lens, buffer_space, sv.svt)
    else:
        init_breakpoint(bp, target_lens, len(sv.consensus), sv.svt)
    if bp.chr != bp.chr2:
        bp.part1 = get_sv_ref(snd_seq, bp, bp.chr2, sv.svt, cfg.indelsize,
                              cfg.min_cons_window)
    sv_ref = get_sv_ref(seq, bp, bp.chr, sv.svt, cfg.indelsize,
                        cfg.min_cons_window)
    return align_consensus_core(sv.consensus, sv_ref, sv, bp, cfg, realign)
