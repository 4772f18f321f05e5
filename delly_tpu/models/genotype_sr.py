"""SR/PE genotyping: junction re-alignment, spanning pairs, coverage.

Reference: src/coverage.h. The junction genotyping jobs (two infix edit
distances per read x SV) are exactly the reference's threaded batch
(coverage.h:412-454); here they are collected per chromosome and executed
as ONE batched device kernel call (delly_tpu.ops.edist.batched_edit_distance)
-- the TPU-native equivalent of the reference's thread pool.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from delly_tpu.io.bam import (
    CDEL, CHARD_CLIP, CMATCH, CREF_SKIP, CSOFT_CLIP, FDUP, FMUNMAP, FPAIRED,
    FQCFAIL, FREVERSE, FSECONDARY, FSUPPLEMENTARY, FUNMAP,
)
from delly_tpu.models.refine import (
    AlignDescriptor, adjust_orientation, cons_ref_alignment, find_split,
    get_sv_ref,
)
from delly_tpu.ops.dna import encode_batch
from delly_tpu.ops.edist import MODE_HW, batched_edit_distance, edit_distance
from delly_tpu.utils.hashing import hash_pair, hash_pair_mate, hash_string
from delly_tpu.utils.tags import (
    Breakpoint, SVT_TRANS, get_sv_type, init_breakpoint, is_translocation,
    isize_mapping_pos, span_orientation,
)


@dataclass
class JunctionCount:
    """coverage.h:75-85."""
    ref: list = field(default_factory=list)
    alt: list = field(default_factory=list)
    hp1ref: list = field(default_factory=list)
    hp1alt: list = field(default_factory=list)
    hp2ref: list = field(default_factory=list)
    hp2alt: list = field(default_factory=list)
    ps: int = -1


@dataclass
class SpanningCount:
    ref: list = field(default_factory=list)
    alt: list = field(default_factory=list)


@dataclass
class ReadCount:
    leftRC: int = 0
    rc: int = 0
    rightRC: int = 0


def cut_ref_start(r_start, r_end, offset, bp_point, svt):
    """coverage.h:117-138."""
    ct = span_orientation(svt)
    if (is_translocation(svt) and ct == 3) or (not is_translocation(svt) and svt == 3):
        return (r_end - offset) if not bp_point else (r_start - offset)
    return (r_end - offset) if bp_point else (r_start - offset)


def cut_ref_end(r_start, r_end, offset, bp_point, svt):
    """coverage.h:140-161."""
    ct = span_orientation(svt)
    if (is_translocation(svt) and ct == 3) or (not is_translocation(svt) and svt == 3):
        return (r_end + offset) if not bp_point else (r_start + offset)
    return (r_end + offset) if bp_point else (r_start + offset)


@dataclass
class BpRegion:
    """coverage.h:50-67."""
    regionStart: int
    regionEnd: int
    bppos: int
    homLeft: int
    homRight: int
    svt: int
    id: int
    bpPoint: int


@dataclass
class SpanPoint:
    bppos: int
    svt: int = 0
    id: int = 0
    chr2: int = 0
    otherBppos: int = 0


def generate_probes(cfg, header, fasta, svs):
    """coverage.h:164-263."""
    n_targets = header.n_targets
    ref_probes = [""] * len(svs)
    ref_probe_arr = [[""] * len(svs) for _ in range(2)]
    cons_probe_arr = [[""] * len(svs) for _ in range(2)]
    bp_region = [[] for _ in range(n_targets)]
    sv_on_chr = [False] * n_targets
    for ref_index in range(n_targets):
        seq = None
        for sv in svs:
            if sv.chr != ref_index and sv.chr2 != ref_index:
                continue
            sv_on_chr[ref_index] = True
            if seq is None:
                seq = fasta.fetch(header.names[ref_index])
            if sv.chr == ref_index and not sv.alleles:
                ref_base = seq[sv.svStart - 1: sv.svStart].upper()
                sv.alleles = _add_alleles(ref_base, header.names[sv.chr2],
                                          sv)
            if not sv.precise:
                continue
            if sv.chr != sv.chr2 and sv.chr2 == ref_index:
                bp = Breakpoint.from_sv(sv)
                init_breakpoint(bp, header.lengths, len(sv.consensus), sv.svt)
                ref_probes[sv.id] = get_sv_ref(seq, bp, ref_index, sv.svt,
                                               cfg.indelsize,
                                               cfg.min_cons_window)
            if sv.chr == ref_index:
                bp = Breakpoint.from_sv(sv)
                if is_translocation(sv.svt):
                    bp.part1 = ref_probes[sv.id]
                if sv.svt == 4:
                    buffer_space = max((len(sv.consensus) - sv.insLen) // 3,
                                       cfg.min_flank_size)
                    init_breakpoint(bp, header.lengths, buffer_space, sv.svt)
                else:
                    init_breakpoint(bp, header.lengths, len(sv.consensus),
                                    sv.svt)
                sv_ref = get_sv_ref(seq, bp, ref_index, sv.svt, cfg.indelsize,
                                    cfg.min_cons_window)
                aln = cons_ref_alignment(sv.consensus, sv_ref, sv.svt)
                if aln is None:
                    continue
                ad = AlignDescriptor()
                if not find_split(sv.consensus, sv_ref, aln, ad, sv.svt,
                                  cfg.flank_quality, cfg.min_flank_size):
                    continue
                for bp_point in range(2):
                    if bp_point:
                        region_chr = sv.chr2
                        region_start = max(0, sv.svEnd - cfg.min_flank_size)
                        region_end = min(sv.svEnd + cfg.min_flank_size,
                                         header.lengths[sv.chr2])
                        cut_cons_s = ad.cEnd - ad.homLeft - cfg.min_flank_size
                        cut_cons_e = ad.cEnd + ad.homRight + cfg.min_flank_size
                        bppos = sv.svEnd
                    else:
                        region_chr = sv.chr
                        region_start = max(0, sv.svStart - cfg.min_flank_size)
                        region_end = min(sv.svStart + cfg.min_flank_size,
                                         header.lengths[sv.chr])
                        cut_cons_s = ad.cStart - ad.homLeft - cfg.min_flank_size
                        cut_cons_e = ad.cStart + ad.homRight + cfg.min_flank_size
                        bppos = sv.svStart
                    cut_ref_s = cut_ref_start(ad.rStart, ad.rEnd,
                                              ad.homLeft + cfg.min_flank_size,
                                              bp_point, sv.svt)
                    cut_ref_e = cut_ref_end(ad.rStart, ad.rEnd,
                                            ad.homRight + cfg.min_flank_size,
                                            bp_point, sv.svt)
                    cons_probe_arr[bp_point][sv.id] = _substr(
                        sv.consensus, cut_cons_s, cut_cons_e)
                    ref_probe_arr[bp_point][sv.id] = _substr(
                        sv_ref, cut_ref_s, cut_ref_e)
                    bp_region[region_chr].append(BpRegion(
                        region_start, region_end, bppos, ad.homLeft,
                        ad.homRight, sv.svt, sv.id, bp_point))
    for ref_index in range(n_targets):
        bp_region[ref_index].sort(key=lambda b: b.bppos)
    return ref_probe_arr, cons_probe_arr, bp_region, sv_on_chr


def _substr(s: str, a: int, b: int) -> str:
    """C++ substr(pos, count) semantics with potentially negative a."""
    if a < 0:
        # std::string::substr with pos > size throws; negative becomes huge
        # size_t -> undefined. Clamp like a safe implementation.
        a = 0
    return s[a:b]


def _add_alleles(ref: str, chr2_name: str, sv) -> str:
    """util.h:255-271."""
    from delly_tpu.utils.tags import add_id
    if is_translocation(sv.svt):
        ct = span_orientation(sv.svt)
        if ct == 0:
            return f"{ref},{ref}]{chr2_name}:{sv.svEnd}]"
        if ct == 1:
            return f"{ref},[{chr2_name}:{sv.svEnd}[{ref}"
        if ct == 2:
            return f"{ref},{ref}[{chr2_name}:{sv.svEnd}["
        if ct == 3:
            return f"{ref},]{chr2_name}:{sv.svEnd}]{ref}"
    return f"{ref},<{add_id(sv.svt)}>"


def _process_jobs_device(jobs, count_map, ref_aligned_count, cfg,
                         dump_entries):
    """Run one chromosome's junction-alignment jobs as a batched kernel.

    jobs: list of (cons_probe, ref_probe, sequence, file_c, sv_id, qual,
    dumpinfo). Equivalent to coverage.h process_batch (:412-454).
    """
    if not jobs:
        return
    queries = []
    targets = []
    for cons_probe, ref_probe, sequence, *_rest in jobs:
        queries.append(cons_probe)
        queries.append(ref_probe)
        targets.append(sequence)
        targets.append(sequence)
    qarr, qlens = encode_batch(queries)
    tarr, tlens = encode_batch(targets)
    dists = np.asarray(batched_edit_distance(qarr, qlens, tarr, tlens,
                                             MODE_HW))
    # k-cap and score transform (coverage.h:109-114)
    for i, job in enumerate(jobs):
        cons_probe, ref_probe, sequence, file_c, sv_id, qual, dumpinfo = job
        d_alt, d_ref = int(dists[2 * i]), int(dists[2 * i + 1])
        k_alt = int(2 * cfg.flank_quality * len(cons_probe))
        k_ref = int(2 * cfg.flank_quality * len(ref_probe))
        score_alt = 0.0
        score_ref = 0.0
        if d_alt <= k_alt:
            score_alt = ((1.0 - cfg.flank_quality) * len(cons_probe)) / (d_alt + 1)
        if d_ref <= k_ref:
            score_ref = ((1.0 - cfg.flank_quality) * len(ref_probe)) / (d_ref + 1)
        if score_ref > 0.7 or score_alt > 0.7:
            cm = count_map[file_c][sv_id]
            if len(cm.ref) + len(cm.alt) >= cfg.max_geno_read_count:
                continue
            if score_ref > score_alt:
                ref_aligned_count[file_c][sv_id] += 1
                if ref_aligned_count[file_c][sv_id] % 2:
                    cm.ref.append(min(255, min(int(score_ref * 35), qual)))
            else:
                cm.alt.append(min(255, min(int(score_alt * 35), qual)))
                if dump_entries is not None:
                    dump_entries.append((sv_id, dumpinfo))


def annotate_coverage(cfg, bams, fasta, libs, svs):
    """coverage.h:265-743. Returns (jct_map, rc_map, span_map) per sample."""
    header = bams[0].header
    nfiles = len(bams)
    cov_count = [[ReadCount() for _ in svs] for _ in range(nfiles)]
    count_map = [[JunctionCount() for _ in svs] for _ in range(nfiles)]
    span_map = [[SpanningCount() for _ in svs] for _ in range(nfiles)]

    print("Generate REF and ALT probes", file=sys.stderr)
    ref_probe_arr, cons_probe_arr, bp_region, sv_on_chr = generate_probes(
        cfg, header, fasta, svs)

    print("SV annotation", file=sys.stderr)
    ref_aligned_read_count = [[0] * len(svs) for _ in range(nfiles)]
    ref_aligned_span_count = [[0] * len(svs) for _ in range(nfiles)]

    for file_c, bam in enumerate(bams):
        cliptra = {}
        for ref_index in range(header.n_targets):
            clip = {}
            if not sv_on_chr[ref_index]:
                continue
            target_len = header.lengths[ref_index]
            cov_fragment = np.zeros(target_len, dtype=np.uint16)
            cov_bases = np.zeros(target_len, dtype=np.uint16)
            max_cov = np.iinfo(np.uint16).max

            bp_occupied = np.zeros(target_len, dtype=bool)
            for b in bp_region[ref_index]:
                bp_occupied[b.regionStart:b.regionEnd] = True

            span_point = []
            span_bp = np.zeros(target_len, dtype=bool)
            for sv in svs:
                if sv.peSupport == 0:
                    continue
                if sv.chr == ref_index and sv.svStart < target_len:
                    span_bp[sv.svStart] = True
                    span_point.append(SpanPoint(sv.svStart, sv.svt, sv.id,
                                                sv.chr2, sv.svEnd))
                if sv.chr2 == ref_index and sv.svEnd < target_len:
                    span_bp[sv.svEnd] = True
                    span_point.append(SpanPoint(sv.svEnd, sv.svt, sv.id,
                                                sv.chr, sv.svStart))
            span_point.sort(key=lambda s: s.bppos)
            span_bppos = [s.bppos for s in span_point]
            bp_pos_sorted = [b.bppos for b in bp_region[ref_index]]

            last_aligned_pos = 0
            last_aligned_reads = set()
            jobs = []
            import bisect as _bisect

            for rec in bam.records(tid=ref_index):
                if rec.flag & (FSECONDARY | FQCFAIL | FDUP | FSUPPLEMENTARY
                               | FUNMAP | FMUNMAP):
                    continue
                if rec.mapq < cfg.min_geno_qual:
                    continue
                # base coverage: only CMATCH ops (coverage.h:461-476)
                rp = 0
                for op, ol in zip(rec.cigar_ops, rec.cigar_lens):
                    ol = int(ol)
                    if op == CMATCH:
                        lo = rec.pos + rp
                        hi = min(rec.pos + rp + ol, target_len)
                        if lo < hi:
                            seg = cov_bases[lo:hi]
                            np.add(seg, 1, out=seg,
                                   where=seg < max_cov - 1)
                        rp += ol
                    elif op in (CDEL, CREF_SKIP):
                        rp += ol

                has_soft_clip = False
                has_clip = False
                leading_sc = 0
                for idx, (op, ol) in enumerate(zip(rec.cigar_ops,
                                                   rec.cigar_lens)):
                    if op == CSOFT_CLIP:
                        has_clip = True
                        has_soft_clip = True
                        if idx == 0:
                            leading_sc = int(ol)
                    elif op == CHARD_CLIP:
                        has_clip = True

                if rec.l_qseq >= 2 * cfg.min_flank_size:
                    rbegin = max(0, rec.pos - leading_sc)
                    rend_scan = min(rec.pos + rec.l_qseq, target_len)
                    bpvalid = bool(bp_occupied[rbegin:rend_scan].any())
                    if bpvalid:
                        it = _bisect.bisect_left(bp_pos_sorted, rbegin)
                        while (it < len(bp_region[ref_index])
                               and rec.pos + rec.l_qseq
                               >= bp_region[ref_index][it].bppos):
                            itbp = bp_region[ref_index][it]
                            it += 1
                            cm = count_map[file_c][itbp.id]
                            if (len(cm.ref) + len(cm.alt)
                                    >= cfg.max_geno_read_count):
                                continue
                            spans = (has_soft_clip or (
                                (not has_clip)
                                and rec.pos + cfg.min_flank_size + itbp.homLeft
                                <= itbp.bppos
                                and rec.pos + rec.l_qseq
                                >= itbp.bppos + cfg.min_flank_size
                                + itbp.homRight))
                            if spans:
                                sequence = adjust_orientation(
                                    rec.seq, bool(itbp.bpPoint), itbp.svt)
                                jobs.append((
                                    cons_probe_arr[itbp.bpPoint][itbp.id],
                                    ref_probe_arr[itbp.bpPoint][itbp.id],
                                    sequence, file_c, itbp.id, rec.mapq,
                                    (rec.qname, rec.tid, rec.pos, rec.mtid,
                                     rec.mpos, rec.mapq)))

                # Read-count and spanning annotation
                if (not rec.flag & FPAIRED) or not sv_on_chr[rec.mtid]:
                    continue
                if rec.pos > last_aligned_pos:
                    last_aligned_reads.clear()
                    last_aligned_pos = rec.pos
                from delly_tpu.models.sr import first_pair_obs
                if first_pair_obs(rec, last_aligned_reads):
                    last_aligned_reads.add(hash_string(rec.qname))
                    hv = hash_pair(rec.qname, rec.tid, rec.pos, rec.mtid,
                                   rec.mpos)
                    if rec.tid == rec.mtid:
                        clip[hv] = (has_soft_clip, rec.mapq)
                    else:
                        cliptra[hv] = (has_soft_clip, rec.mapq)
                else:
                    hv = hash_pair_mate(rec.qname, rec.tid, rec.pos, rec.mtid,
                                        rec.mpos)
                    store = clip if rec.tid == rec.mtid else cliptra
                    ent = store.pop(hv, None)
                    if ent is None:
                        continue
                    pair_quality = min(ent[1], rec.mapq)
                    pair_clip = ent[0] or has_soft_clip
                    if pair_quality < cfg.min_geno_qual:
                        continue
                    if rec.tid == rec.mtid:
                        mid = rec.pos + rec.half_alignment_length()
                        if mid < target_len and cov_fragment[mid] < max_cov - 1:
                            cov_fragment[mid] += 1
                    if rec.pos < rec.mpos:
                        outer = rec.mpos + rec.l_qseq - rec.pos
                    else:
                        outer = rec.pos + rec.l_qseq - rec.mpos
                    if libs[file_c].median == 0:
                        continue
                    svtype_pair = get_sv_type(rec.flag, rec.pos, rec.mpos)
                    # Normal spanning pair (coverage.h:604-626)
                    if (not pair_clip and svtype_pair == 2
                            and libs[file_c].minNormalISize <= outer
                            <= libs[file_c].maxNormalISize
                            and rec.tid == rec.mtid):
                        spanlen = int(0.8 * outer)
                        pbegin = min(rec.pos, rec.mpos)
                        st = pbegin + (outer - spanlen) // 2
                        hi = min(st + spanlen, target_len)
                        if st < hi and span_bp[max(0, st):hi].any():
                            it = _bisect.bisect_left(span_bppos, st)
                            while (it < len(span_point)
                                   and st + spanlen >= span_point[it].bppos):
                                sp = span_point[it]
                                it += 1
                                ref_aligned_span_count[file_c][sp.id] += 1
                                if ref_aligned_span_count[file_c][sp.id] % 2:
                                    span_map[file_c][sp.id].ref.append(
                                        pair_quality)
                    # Abnormal spanning (coverage.h:629-669)
                    if (svtype_pair != 2
                            or outer < libs[file_c].minNormalISize
                            or outer > libs[file_c].maxNormalISize
                            or rec.tid != rec.mtid):
                        svt = isize_mapping_pos(
                            rec.flag, rec.tid, rec.pos, rec.mtid, rec.mpos,
                            rec.tlen, libs[file_c].maxISizeCutoff)
                        if svt == -1:
                            continue
                        pbegin = rec.pos
                        pend = min(rec.pos + libs[file_c].maxNormalISize,
                                   target_len)
                        if rec.flag & FREVERSE:
                            pbegin = max(0, rec.pos + rec.l_qseq
                                         - libs[file_c].maxNormalISize)
                            pend = min(rec.pos + rec.l_qseq, target_len)
                        if pbegin < pend and span_bp[pbegin:pend].any():
                            it = _bisect.bisect_left(span_bppos, pbegin)
                            while (it < len(span_point)
                                   and pend >= span_point[it].bppos):
                                sp = span_point[it]
                                it += 1
                                if svt != sp.svt:
                                    continue
                                if rec.mtid != sp.chr2:
                                    continue
                                if (abs(rec.mpos - sp.otherBppos)
                                        < libs[file_c].maxNormalISize):
                                    span_map[file_c][sp.id].alt.append(
                                        pair_quality)

            _process_jobs_device(jobs, count_map, ref_aligned_read_count,
                                 cfg, None)
            clip.clear()

            # Assign fragment/base counts to SVs (coverage.h:684-733)
            cb_cum = np.concatenate(([0], np.cumsum(cov_bases,
                                                    dtype=np.int64)))
            cf_cum = np.concatenate(([0], np.cumsum(cov_fragment,
                                                    dtype=np.int64)))

            def _range_sum(cum, a, b):
                a = max(0, min(a, target_len))
                b = max(0, min(b, target_len))
                if a >= b:
                    return 0
                return int(cum[b] - cum[a])

            for sv in svs:
                if sv.chr != ref_index:
                    continue
                small_sv = False
                half = (sv.svEnd - sv.svStart) // 2
                if is_translocation(sv.svt) or sv.svt == 4:
                    half = 500
                    small_sv = True
                elif (sv.svEnd - sv.svStart) <= cfg.indelsize:
                    small_sv = True
                cum = cb_cum if small_sv else cf_cum
                lstart = max(sv.svStart - half, 0)
                cov_count[file_c][sv.id].leftRC = _range_sum(
                    cum, lstart, sv.svStart)
                mstart, mend = sv.svStart, sv.svEnd
                if is_translocation(sv.svt) or sv.svt == 4:
                    mstart = max(sv.svStart - half, 0)
                    mend = min(sv.svStart + half, target_len)
                cov_count[file_c][sv.id].rc = _range_sum(cum, mstart, mend)
                rstart = sv.svEnd
                rend = min(sv.svEnd + half, target_len)
                if is_translocation(sv.svt) or sv.svt == 4:
                    rstart = sv.svStart
                    rend = min(sv.svStart + half, target_len)
                cov_count[file_c][sv.id].rightRC = _range_sum(
                    cum, rstart, rend)
    return count_map, cov_count, span_map
