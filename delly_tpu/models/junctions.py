"""Per-read breakpoint (junction) extraction and typed junction pairing.

Reference: src/junction.h. CIGAR walks are branchy and irregular, so they
stay on the host CPU; the output is a compact set of SRBamRecord candidates
that feed the clustering engine and, later, device-batched alignment.
"""

from __future__ import annotations

from delly_tpu.io.bam import (
    CDEL, CDIFF, CEQUAL, CHARD_CLIP, CINS, CMATCH, CREF_SKIP, CSOFT_CLIP,
    FDUP, FQCFAIL, FREVERSE, FSECONDARY, FSUPPLEMENTARY, FUNMAP,
)
from delly_tpu.utils.tags import Junction, SRBamRecord, SVT_TRANS


def _insert_junction(read_bp: dict, seed: int, rec, rp: int, sp: int,
                     scleft: bool) -> None:
    """junction.h:22-41."""
    fw = not rec.flag & FREVERSE
    read_start = rec.pos
    if rec.flag & (FQCFAIL | FDUP | FUNMAP | FSECONDARY | FSUPPLEMENTARY):
        read_start = -1
    seqlen = rec.read_length()
    if sp <= seqlen:
        seqpos = seqlen - sp if rec.flag & FREVERSE else sp
        read_bp.setdefault(seed, []).append(
            Junction(fw, scleft, rec.tid, read_start, rp, seqpos, rec.mapq))


def extract_junctions_sr(read_bp: dict, seed: int, rec, min_ref_sep: int,
                         min_clip: int) -> None:
    """Short-read CIGAR walk (shortpe.h:360-389)."""
    rp = rec.pos
    sp = 0
    for op, ol in zip(rec.cigar_ops, rec.cigar_lens):
        ol = int(ol)
        if op in (CMATCH, CEQUAL, CDIFF):
            sp += ol
            rp += ol
        elif op == CDEL:
            if ol > min_ref_sep:
                _insert_junction(read_bp, seed, rec, rp, sp, False)
            rp += ol
            if ol > min_ref_sep:
                _insert_junction(read_bp, seed, rec, rp, sp, True)
        elif op == CINS:
            if ol > min_ref_sep:
                _insert_junction(read_bp, seed, rec, rp, sp, False)
            sp += ol
            if ol > min_ref_sep:
                _insert_junction(read_bp, seed, rec, rp, sp, True)
        elif op in (CSOFT_CLIP, CHARD_CLIP):
            finalsp = sp
            scleft = False
            if sp == 0:
                finalsp += ol
                scleft = True
            sp += ol
            if ol > min_clip:
                _insert_junction(read_bp, seed, rec, rp, finalsp, scleft)
        elif op == CREF_SKIP:
            rp += ol


def extract_junctions_lr(read_bp: dict, seed: int, rec, min_ref_sep: int,
                         min_clip: int, indel_extension: float) -> None:
    """Long-read CIGAR walk with indel-extension look-ahead
    (junction.h:359-443)."""
    rp = rec.pos
    sp = 0
    ops = rec.cigar_ops
    lens = rec.cigar_lens
    n = len(ops)
    i = 0
    while i < n:
        op = ops[i]
        ol = int(lens[i])
        if op in (CMATCH, CEQUAL, CDIFF):
            sp += ol
            rp += ol
        elif op == CDEL:
            if ol > min_ref_sep:
                _insert_junction(read_bp, seed, rec, rp, sp, False)
            rp += ol
            if ol > min_ref_sep:
                # Look-ahead: merge nearby deletions separated by short matches
                sp_orig = sp
                rp_tmp = rp
                sp_tmp = sp
                dlen = ol
                for j in range(i + 1, n):
                    jop = ops[j]
                    jol = int(lens[j])
                    if jop in (CMATCH, CEQUAL, CDIFF):
                        sp_tmp += jol
                        rp_tmp += jol
                        if (sp_tmp - sp) / (dlen + (rp_tmp - rp)) > indel_extension:
                            break
                    elif jop == CDEL:
                        rp_tmp += jol
                        if jol > min_ref_sep:
                            dlen += rp_tmp - rp
                            rp = rp_tmp
                            sp = sp_tmp
                            i = j
                    elif jop == CINS:
                        if jol > min_ref_sep:
                            break
                        sp_tmp += jol
                    else:
                        break
                _insert_junction(read_bp, seed, rec, rp, sp_orig, True)
        elif op == CINS:
            if ol > min_ref_sep:
                _insert_junction(read_bp, seed, rec, rp, sp, False)
            sp += ol
            if ol > min_ref_sep:
                rp_orig = rp
                rp_tmp = rp
                sp_tmp = sp
                ilen = ol
                for j in range(i + 1, n):
                    jop = ops[j]
                    jol = int(lens[j])
                    if jop in (CMATCH, CEQUAL, CDIFF):
                        sp_tmp += jol
                        rp_tmp += jol
                        if (rp_tmp - rp) / (ilen + (sp_tmp - sp)) > indel_extension:
                            break
                    elif jop == CDEL:
                        if jol > min_ref_sep:
                            break
                        rp_tmp += jol
                    elif jop == CINS:
                        sp_tmp += jol
                        if jol > min_ref_sep:
                            ilen += sp_tmp - sp
                            rp = rp_tmp
                            sp = sp_tmp
                            i = j
                    else:
                        break
                _insert_junction(read_bp, seed, rec, rp_orig, sp, True)
        elif op == CREF_SKIP:
            rp += ol
        elif op in (CSOFT_CLIP, CHARD_CLIP):
            finalsp = sp
            scleft = False
            if sp == 0:
                finalsp += ol
                scleft = True
            sp += ol
            if ol > min_clip:
                _insert_junction(read_bp, seed, rec, rp, finalsp, scleft)
        i += 1


def _select_read_start(jcvec) -> int:
    for j in jcvec:
        if j.rstart != -1:
            return j.rstart
    return -1


def _select_primary_chr(jcvec) -> int:
    for j in jcvec:
        if j.rstart != -1:
            return j.refidx
    return -1


def select_deletions(read_bp: dict, br: list, max_read_sep: int,
                     min_ref_sep: int) -> None:
    """junction.h:60-110."""
    for seed, jv in read_bp.items():
        if len(jv) <= 1:
            continue
        rst = _select_read_start(jv)
        for i in range(len(jv)):
            for j in range(i + 1, len(jv)):
                if (jv[j].seqpos - jv[i].seqpos) > max_read_sep:
                    break
                if (jv[j].refidx == jv[i].refidx
                        and jv[j].forward == jv[i].forward
                        and jv[i].scleft != jv[j].scleft):
                    dellen = 0
                    dsp = jv[j].seqpos - jv[i].seqpos
                    if jv[i].forward:
                        if not jv[i].scleft:
                            if jv[i].refpos <= jv[j].refpos:
                                dellen = (jv[j].refpos - jv[i].refpos) - dsp
                        else:
                            if jv[i].refpos > jv[j].refpos:
                                dellen = (jv[i].refpos - jv[j].refpos) + dsp
                    else:
                        if jv[i].scleft:
                            if jv[i].refpos > jv[j].refpos:
                                dellen = (jv[i].refpos - jv[j].refpos) - dsp
                        else:
                            if jv[i].refpos <= jv[j].refpos:
                                dellen = (jv[j].refpos - jv[i].refpos) + dsp
                    if dellen > min_ref_sep:
                        qval = (jv[i].qual + jv[j].qual) // 2
                        if jv[i].refpos <= jv[j].refpos:
                            if (not jv[i].scleft) and jv[j].scleft:
                                br[2].append(SRBamRecord(
                                    jv[i].refidx, jv[i].refpos, jv[j].refidx,
                                    jv[j].refpos, rst,
                                    min(jv[j].seqpos, jv[i].seqpos), qval,
                                    abs(dsp), seed))
                        else:
                            if jv[i].scleft and not jv[j].scleft:
                                br[2].append(SRBamRecord(
                                    jv[j].refidx, jv[j].refpos, jv[i].refidx,
                                    jv[i].refpos, rst,
                                    min(jv[j].seqpos, jv[i].seqpos), qval,
                                    abs(dsp), seed))
                        break  # only first SV split per junction i
            # (matches reference: inner break exits j-loop only)


def select_duplications(read_bp: dict, br: list, max_read_sep: int,
                        min_ref_sep: int) -> None:
    """junction.h:114-145."""
    for seed, jv in read_bp.items():
        if len(jv) <= 1:
            continue
        rst = _select_read_start(jv)
        for i in range(len(jv)):
            for j in range(i + 1, len(jv)):
                if (jv[j].seqpos - jv[i].seqpos) > max_read_sep:
                    break
                if (jv[j].refidx == jv[i].refidx
                        and jv[j].forward == jv[i].forward
                        and jv[i].scleft != jv[j].scleft):
                    if abs(jv[j].refpos - jv[i].refpos) > min_ref_sep:
                        qval = (jv[i].qual + jv[j].qual) // 2
                        dsp = abs(jv[j].seqpos - jv[i].seqpos)
                        if jv[i].refpos <= jv[j].refpos:
                            if jv[i].scleft and not jv[j].scleft:
                                br[3].append(SRBamRecord(
                                    jv[i].refidx, jv[i].refpos, jv[j].refidx,
                                    jv[j].refpos, rst,
                                    min(jv[j].seqpos, jv[i].seqpos), qval,
                                    dsp, seed))
                        else:
                            if (not jv[i].scleft) and jv[j].scleft:
                                br[3].append(SRBamRecord(
                                    jv[j].refidx, jv[j].refpos, jv[i].refidx,
                                    jv[i].refpos, rst,
                                    min(jv[j].seqpos, jv[i].seqpos), qval,
                                    dsp, seed))


def select_inversions(read_bp: dict, br: list, max_read_sep: int,
                      min_ref_sep: int) -> None:
    """junction.h:148-178."""
    for seed, jv in read_bp.items():
        if len(jv) <= 1:
            continue
        rst = _select_read_start(jv)
        for i in range(len(jv)):
            for j in range(i + 1, len(jv)):
                if (jv[j].seqpos - jv[i].seqpos) > max_read_sep:
                    break
                if (jv[j].refidx == jv[i].refidx
                        and jv[j].forward != jv[i].forward
                        and jv[i].scleft == jv[j].scleft):
                    if abs(jv[j].refpos - jv[i].refpos) > min_ref_sep:
                        qval = (jv[i].qual + jv[j].qual) // 2
                        dsp = abs(jv[j].seqpos - jv[i].seqpos)
                        svt = 1 if jv[i].scleft else 0
                        if jv[i].refpos <= jv[j].refpos:
                            br[svt].append(SRBamRecord(
                                jv[i].refidx, jv[i].refpos, jv[j].refidx,
                                jv[j].refpos, rst,
                                min(jv[j].seqpos, jv[i].seqpos), qval,
                                dsp, seed))
                        else:
                            br[svt].append(SRBamRecord(
                                jv[j].refidx, jv[j].refpos, jv[i].refidx,
                                jv[i].refpos, rst,
                                min(jv[j].seqpos, jv[i].seqpos), qval,
                                dsp, seed))


def select_insertions(read_bp: dict, br: list, max_read_sep: int,
                      min_ref_sep: int) -> None:
    """junction.h:181-222."""
    for seed, jv in read_bp.items():
        if len(jv) <= 1:
            continue
        rst = _select_read_start(jv)
        for i in range(len(jv)):
            # one insertion per junction i (the reference breaks only
            # the inner j loop, junction.h:214)
            for j in range(i + 1, len(jv)):
                if (jv[j].refidx == jv[i].refidx
                        and jv[j].forward == jv[i].forward
                        and jv[i].scleft != jv[j].scleft):
                    if abs(jv[j].refpos - jv[i].refpos) < max_read_sep:
                        isizelen = 0
                        if jv[i].forward:
                            if not jv[i].scleft:
                                if jv[i].refpos <= jv[j].refpos:
                                    isizelen = (jv[j].seqpos - jv[i].seqpos) - (jv[j].refpos - jv[i].refpos)
                                else:
                                    isizelen = (jv[j].seqpos - jv[i].seqpos) + (jv[i].refpos - jv[j].refpos)
                        else:
                            if jv[i].scleft:
                                if jv[i].refpos <= jv[j].refpos:
                                    isizelen = (jv[j].seqpos - jv[i].seqpos) + (jv[j].refpos - jv[i].refpos)
                                else:
                                    isizelen = (jv[j].seqpos - jv[i].seqpos) - (jv[i].refpos - jv[j].refpos)
                        if (isizelen > min_ref_sep
                                and isizelen <= max(jv[i].seqpos, jv[j].seqpos)):
                            qval = (jv[i].qual + jv[j].qual) // 2
                            if jv[i].refpos <= jv[j].refpos:
                                br[4].append(SRBamRecord(
                                    jv[i].refidx, jv[i].refpos, jv[j].refidx,
                                    jv[j].refpos, rst,
                                    min(jv[j].seqpos, jv[i].seqpos), qval,
                                    isizelen, seed))
                            else:
                                br[4].append(SRBamRecord(
                                    jv[j].refidx, jv[j].refpos, jv[i].refidx,
                                    jv[i].refpos, rst,
                                    min(jv[j].seqpos, jv[i].seqpos), qval,
                                    isizelen, seed))
                            break


def select_translocations(read_bp: dict, br: list, max_read_sep: int) -> None:
    """junction.h:226-278."""
    for seed, jv in read_bp.items():
        if len(jv) <= 1:
            continue
        rst = _select_read_start(jv)
        primary_chr = _select_primary_chr(jv)
        for i in range(len(jv)):
            for j in range(i + 1, len(jv)):
                if (jv[j].seqpos - jv[i].seqpos) > max_read_sep:
                    break
                if jv[j].refidx != jv[i].refidx:
                    c1, c2 = (i, j) if jv[i].refidx < jv[j].refidx else (j, i)
                    qval = (jv[i].qual + jv[j].qual) // 2
                    rec = SRBamRecord(
                        jv[c2].refidx, jv[c2].refpos, jv[c1].refidx,
                        jv[c1].refpos, rst,
                        min(jv[j].seqpos, jv[i].seqpos), qval,
                        abs(jv[j].seqpos - jv[i].seqpos), seed)
                    rec.primaryChr = primary_chr
                    if jv[c1].forward == jv[c2].forward:
                        if jv[c1].scleft != jv[c2].scleft:
                            br[SVT_TRANS + (2 if jv[c1].scleft else 3)].append(rec)
                    else:
                        if jv[c1].scleft == jv[c2].scleft:
                            br[SVT_TRANS + (1 if jv[c1].scleft else 0)].append(rec)


def bridge_insertions(read_bp: dict, br: list) -> None:
    """junction.h:282-316."""
    read_ids = set()
    pins: dict = {}
    for r in br[4]:
        read_ids.add(r.id)
        for k in range(r.pos, r.pos2 + 1):
            rc = (r.chr, k)
            if rc not in pins:
                pins[rc] = r.inslen
            else:
                pins[rc] = (pins[rc] + r.inslen) // 2
    if not pins:
        return
    for seed, jv in read_bp.items():
        if seed in read_ids:
            continue
        for j in jv:
            rc = (j.refidx, j.refpos)
            if rc in pins:
                rst = _select_read_start(jv)
                br[4].append(SRBamRecord(
                    j.refidx, j.refpos, j.refidx, j.refpos + 1, rst,
                    j.seqpos, j.qual, pins[rc], seed))


def fetch_svs(read_bp: dict, br: list, svtset: set, max_read_sep: int,
              min_ref_sep: int) -> None:
    """junction.h:463-475."""
    if not svtset or 2 in svtset:
        select_deletions(read_bp, br, max_read_sep, min_ref_sep)
    if not svtset or 3 in svtset:
        select_duplications(read_bp, br, max_read_sep, min_ref_sep)
    if not svtset or 0 in svtset or 1 in svtset:
        select_inversions(read_bp, br, max_read_sep, min_ref_sep)
    if not svtset or 4 in svtset:
        select_insertions(read_bp, br, max_read_sep, min_ref_sep)
        bridge_insertions(read_bp, br)
    if not svtset or any(s in svtset for s in range(SVT_TRANS, SVT_TRANS + 4)):
        select_translocations(read_bp, br, max_read_sep)
