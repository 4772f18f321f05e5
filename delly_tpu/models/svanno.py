"""MEI / tandem-repeat annotation of SVs.

Reference: src/svanno.h — breakpoint homology scans, insertion
classification against embedded mobile-element consensus templates
(ALU/LINE1/SVA/NUMT/soloLTR/HERVK + polyA tail), autocorrelation tandem
repeat detection, and reference-unit TR templating. Output feeds the
SUBTYPE / INSSTRAND / TRPERIOD / TRCOPIES INFO fields (modvcf.h).
"""

from __future__ import annotations

import numpy as np

from delly_tpu.data import mei
from delly_tpu.ops.edist import MODE_HW, edit_distance
from delly_tpu.utils.tags import revcomp

# seqType codes (tags.h SVAnno): 1=ALU 2=LINE1 3=SVA 4=NUMT 5=soloLTR
# 6=HERVK 7=TR
SEQTYPE_NAMES = {
    1: "INS:ME:ALU", 2: "INS:ME:LINE1", 3: "INS:ME:SVA", 4: "INS:NUMT",
    5: "INS:LTR", 6: "INS:HERVK",
}

_MEI_TEMPLATES = {
    1: mei.ALU, 2: mei.LINE1, 3: mei.SVA, 4: mei.NUMT, 5: mei.SOLO_LTR,
    6: mei.HERVK,
}
# Min insertion length per template type (svanno.h:126 meiMinInsLen,
# indexed 1..6).
_MEI_MIN_INS_LEN = {1: 100, 2: 150, 3: 1000, 4: 100, 5: 300, 6: 300}


def detect_tandem_repeat(seq: str, max_period: int = 100,
                         min_fraction: float = 0.85):
    """Autocorrelation TR detector (svanno.h:42-56). Returns
    (period, copies) with period 0 when no repeat is found."""
    n = len(seq)
    if n < 10:
        return 0, 0.0
    b = np.frombuffer(seq.encode(), dtype=np.uint8)
    pmax = min(max_period, n // 2)
    # The reference does the ratio test and the copy count in float32
    # ((float)matches/(float)(n-p) >= minFraction, svanno.h:50-51); at
    # exact-threshold cases (e.g. 17/20 vs f32(0.85)) float64 decides
    # differently, so mirror the precision.
    frac32 = np.float32(min_fraction)
    for p in range(1, pmax + 1):
        matches = int(np.count_nonzero(b[p:] == b[:-p]))
        if np.float32(matches) / np.float32(n - p) >= frac32:
            return p, float(np.float32(n) / np.float32(p))
    return 0, 0.0


def _hw_identity(query: str, target: str) -> float:
    d, _ = edit_distance(query, target, MODE_HW)
    if d < 0:
        return 0.0
    return 1.0 - d / len(query)


def annotate_sv(cfg, target_lens: list, seq: str, sv) -> None:
    """svanno.h:58-237. Mutates sv.anno (homLen, seqType, isRC, trPeriod,
    trCopies). `seq` is the chromosome of sv.chr."""
    chr_len = target_lens[sv.chr]
    max_edits = 2

    alt_str = ""
    ins_seq = ""
    if sv.svt == 4 and sv.alleles:
        comma = sv.alleles.find(",")
        if comma != -1:
            alt = sv.alleles[comma + 1:]
            if len(alt) > 1 and alt[0] != "<":
                alt_str = alt.upper()
                ins_seq = alt_str[1:]
                if len(ins_seq) > 15000:
                    ins_seq = ins_seq[:15000]

    # --- Breakpoint homology ---
    if sv.svt == 4:
        if alt_str:
            limit = min(100, len(alt_str), chr_len - (sv.svStart - 1))
            edits = 0
            for h in range(1, limit + 1):
                if alt_str[h - 1].upper() != seq[sv.svStart - 1 + h - 1].upper():
                    edits += 1
                    if edits > max_edits:
                        break
                sv.anno.homLen = h
    elif sv.svEnd > sv.svStart:
        max_h_del = 10000
        min_identity = 0.90
        stop_identity = 0.75
        early_stop_gap = 100
        half = (sv.svEnd - sv.svStart) // 2
        bwd_limit = min(max_h_del, half, sv.svStart)
        if bwd_limit > 0:
            edits = 0
            last_good = 0
            for h in range(1, bwd_limit + 1):
                if seq[sv.svStart - h].upper() != seq[sv.svEnd - h].upper():
                    edits += 1
                ident = 1.0 - edits / h
                if ident >= min_identity:
                    sv.anno.homLen = h
                    last_good = h
                elif h - last_good > early_stop_gap and ident < stop_identity:
                    break
        fwd_limit = max(0, min(max_h_del, half, chr_len - sv.svEnd - 1))
        if fwd_limit > 0:
            edits = 0
            last_good = 0
            for h in range(1, fwd_limit + 1):
                if seq[sv.svStart + h].upper() != seq[sv.svEnd + h].upper():
                    edits += 1
                ident = 1.0 - edits / h
                if ident >= min_identity:
                    if h > sv.anno.homLen:
                        sv.anno.homLen = h
                    last_good = h
                elif h - last_good > early_stop_gap and ident < stop_identity:
                    break

    # --- Insertion classification ---
    if ins_seq:
        best_id = cfg.mei_min_frac
        best_type = 0
        best_fwd = 0.0
        best_rev = 0.0
        for seqtype in range(1, 7):
            if len(ins_seq) < _MEI_MIN_INS_LEN[seqtype]:
                continue
            tmpl = _MEI_TEMPLATES[seqtype]
            if seqtype < 4:
                tmpl = tmpl + mei.POLYA
            tmpl_rc = revcomp(tmpl)
            long_ins = len(ins_seq) > len(tmpl)
            if long_ins:
                fwd_id = _hw_identity(tmpl, ins_seq)
                rev_id = _hw_identity(tmpl_rc, ins_seq)
                coverage = len(tmpl) / len(ins_seq)
            else:
                fwd_id = _hw_identity(ins_seq, tmpl)
                rev_id = _hw_identity(ins_seq, tmpl_rc)
                coverage = 1.0
            effective = min(max(fwd_id, rev_id), coverage)
            if effective > best_id:
                best_id = effective
                best_type = seqtype
                best_fwd = fwd_id
                best_rev = rev_id
        if best_type > 0:
            sv.anno.seqType = best_type
            sv.anno.isRC = best_rev > best_fwd
        elif len(ins_seq) >= 10:
            period = 0
            copies = 0.0
            p1, c1 = detect_tandem_repeat(ins_seq, 100, cfg.tr_min_frac)
            if p1 > 0:
                period, copies = p1, c1
            else:
                # Reference-unit templating: TR unit adjacent to the
                # insertion site (svanno.h:185-214)
                flank = 200
                for side in range(2):
                    if period:
                        break
                    if side == 0:
                        rbeg = max(0, sv.svStart - flank)
                        if sv.svStart - rbeg < 40:
                            continue
                        ref_win = seq[rbeg:sv.svStart].upper()
                    else:
                        rend = min(chr_len, sv.svStart + flank)
                        if rend - sv.svStart < 40:
                            continue
                        ref_win = seq[sv.svStart:rend].upper()
                    pr, _cr = detect_tandem_repeat(ref_win, 100,
                                                   cfg.tr_min_frac)
                    if pr <= 0 or len(ref_win) < pr:
                        continue
                    unit = (ref_win[-pr:] if side == 0 else ref_win[:pr])
                    templ = ""
                    while len(templ) < len(ins_seq) + pr:
                        templ += unit
                    ident = _hw_identity(ins_seq, templ)
                    if ident >= 0.70:
                        period = pr
                        copies = len(ins_seq) / pr
            if period > 0:
                sv.anno.seqType = 7
                sv.anno.trPeriod = period
                sv.anno.trCopies = copies
    elif sv.svt == 2:
        del_len = sv.svEnd - sv.svStart
        if 10 <= del_len <= 50000:
            del_seq = seq[sv.svStart:sv.svEnd].upper()
            period, copies = detect_tandem_repeat(del_seq, 100,
                                                  cfg.tr_min_frac)
            if period > 0:
                sv.anno.seqType = 7
                sv.anno.trPeriod = period
                sv.anno.trCopies = copies
