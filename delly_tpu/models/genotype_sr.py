"""SR/PE genotyping: junction re-alignment, spanning pairs, coverage.

Reference: src/coverage.h. The junction genotyping jobs (two infix edit
distances per read x SV) are exactly the reference's threaded batch
(coverage.h:412-454); here they are collected per chromosome and executed
as ONE batched device kernel call (delly_tpu.ops.edist.batched_edit_distance)
-- the TPU-native equivalent of the reference's thread pool.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass, field

import numpy as np

from delly_tpu.io.bam import (
    CDEL, CHARD_CLIP, CINS, CMATCH, CREF_SKIP, CSOFT_CLIP, FDUP, FMUNMAP,
    FPAIRED, FQCFAIL, FREVERSE, FSECONDARY, FSUPPLEMENTARY, FUNMAP,
)
from delly_tpu.models.refine import (
    AlignDescriptor, adjust_orientation, cons_ref_alignment, find_split,
    get_sv_ref,
)
from delly_tpu.ops.edist import MODE_HW, batched_pairs_distance
from delly_tpu.utils.hashing import (
    _fnv1a64, hash_pair_h_batch, hash_string,
)
from delly_tpu.utils.tags import (
    Breakpoint, get_sv_type_batch, init_breakpoint, is_translocation,
    isize_mapping_pos_batch, span_orientation,
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
    from concurrent.futures import ThreadPoolExecutor

    nworkers = max(1, int(getattr(cfg, "max_threads", 1) or 1))
    pool = ThreadPoolExecutor(nworkers) if nworkers > 1 else None

    def probe_task(sv, seq, sv_ref):
        """The per-SV consensus->junction-probe alignment
        (coverage.h:181-258): independent across SVs, so it fans out
        over the thread pool (the native DP cores release the GIL);
        results apply in SV order, so output order is serial-exact."""
        aln = cons_ref_alignment(sv.consensus, sv_ref, sv.svt)
        if aln is None:
            return None
        ad = AlignDescriptor()
        if not find_split(sv.consensus, sv_ref, aln, ad, sv.svt,
                          cfg.flank_quality, cfg.min_flank_size):
            return None
        out = []
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
            out.append((bp_point,
                        _substr(sv.consensus, cut_cons_s, cut_cons_e),
                        _substr(sv_ref, cut_ref_s, cut_ref_e),
                        region_chr,
                        BpRegion(region_start, region_end, bppos,
                                 ad.homLeft, ad.homRight, sv.svt,
                                 sv.id, bp_point)))
        return out

    try:
        for ref_index in range(n_targets):
            seq = None
            futs = []  # (sv, future-or-result) in SV order
            for sv in svs:
                if sv.chr != ref_index and sv.chr2 != ref_index:
                    continue
                sv_on_chr[ref_index] = True
                if seq is None:
                    seq = fasta.fetch(header.names[ref_index])
                if sv.chr == ref_index and not sv.alleles:
                    ref_base = seq[sv.svStart - 1: sv.svStart].upper()
                    sv.alleles = _add_alleles(ref_base,
                                              header.names[sv.chr2], sv)
                if not sv.precise:
                    continue
                if sv.chr != sv.chr2 and sv.chr2 == ref_index:
                    bp = Breakpoint.from_sv(sv)
                    init_breakpoint(bp, header.lengths,
                                    len(sv.consensus), sv.svt)
                    ref_probes[sv.id] = get_sv_ref(
                        seq, bp, ref_index, sv.svt, cfg.indelsize,
                        cfg.min_cons_window)
                if sv.chr == ref_index:
                    bp = Breakpoint.from_sv(sv)
                    if is_translocation(sv.svt):
                        bp.part1 = ref_probes[sv.id]
                    if sv.svt == 4:
                        buffer_space = max(
                            (len(sv.consensus) - sv.insLen) // 3,
                            cfg.min_flank_size)
                        init_breakpoint(bp, header.lengths,
                                        buffer_space, sv.svt)
                    else:
                        init_breakpoint(bp, header.lengths,
                                        len(sv.consensus), sv.svt)
                    sv_ref = get_sv_ref(seq, bp, ref_index, sv.svt,
                                        cfg.indelsize,
                                        cfg.min_cons_window)
                    if pool is not None:
                        futs.append(pool.submit(probe_task, sv, seq,
                                                sv_ref))
                    else:
                        futs.append(probe_task(sv, seq, sv_ref))
            for fut in futs:
                res = fut if not hasattr(fut, "result") else fut.result()
                if res is None:
                    continue
                for bp_point, consp, refp, region_chr, region in res:
                    cons_probe_arr[bp_point][region.id] = consp
                    ref_probe_arr[bp_point][region.id] = refp
                    bp_region[region_chr].append(region)
    finally:
        if pool is not None:
            pool.shutdown(wait=True)
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
    # batched_pairs_distance buckets the padded dims to powers of two so
    # the device pipeline cache stays small across chromosomes (the
    # per-batch max padding used previously compiled one pipeline per
    # distinct (M, N) — ruinous on slow-compile links).
    pairs = []
    for cons_probe, ref_probe, sequence, *_rest in jobs:
        pairs.append((cons_probe, sequence))
        pairs.append((ref_probe, sequence))
    dists = batched_pairs_distance(pairs, MODE_HW)
    # k-cap and score transform (coverage.h:109-114)
    for i, job in enumerate(jobs):
        (cons_probe, ref_probe, sequence, file_c, sv_id, qual,
         dumpinfo) = job[:7]
        d_alt, d_ref = int(dists[2 * i]), int(dists[2 * i + 1])
        if len(job) > 7 and job[7] is not None:
            # host-axis tape: record the computed distances so every
            # process can replay the tally in serial order
            job[7].append((sv_id, qual, d_alt, d_ref,
                           len(cons_probe), len(ref_probe)))
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
                    dump_entries.append((file_c, sv_id, dumpinfo))


def _cigar_stats(view, offsets):
    """Bulk per-record name hashes + CIGAR aggregates (native
    bam_cigar_stats; Python record parse as fallback) for a BamView's
    record buffer."""
    try:
        from delly_tpu import native
        st = native.bam_cigar_stats(view.data, offsets)
        if st is not None:
            return st
    except Exception:
        pass
    n = len(offsets)
    out = {"name_hash": np.empty(n, dtype=np.uint32),
           "fnv_hash": np.empty(n, dtype=np.uint64),
           "ref_span": np.empty(n, dtype=np.int32),
           "leading_sc": np.empty(n, dtype=np.int32),
           "clip_flags": np.empty(n, dtype=np.int32),
           "max_clip": np.empty(n, dtype=np.int32),
           "max_indel": np.empty(n, dtype=np.int32),
           "lead_clip": np.empty(n, dtype=np.int32),
           "trail_clip": np.empty(n, dtype=np.int32)}
    for i, off in enumerate(offsets):
        rec = view.parse_at(int(off))
        out["name_hash"][i] = hash_string(rec.qname)
        out["fnv_hash"][i] = _fnv1a64(rec.qname.encode())
        out["ref_span"][i] = rec.alignment_length()
        fl = 0
        lsc = 0
        mc = 0
        mi = 0
        ops = rec.cigar_ops
        lens = rec.cigar_lens
        clip = (ops == CSOFT_CLIP) | (ops == CHARD_CLIP)
        if (ops == CSOFT_CLIP).any():
            fl |= 3
        if (ops == CHARD_CLIP).any():
            fl |= 2
        if clip.any():
            mc = int(lens[clip].max())
        indel = (ops == CINS) | (ops == CDEL)
        if indel.any():
            mi = int(lens[indel].max())
        if len(ops) and ops[0] == CSOFT_CLIP:
            lsc = int(lens[0])
        out["leading_sc"][i] = lsc
        out["clip_flags"][i] = fl
        out["max_clip"][i] = mc
        out["max_indel"][i] = mi
        out["lead_clip"][i] = (int(lens[0]) if len(ops)
                               and ops[0] in (CSOFT_CLIP, CHARD_CLIP)
                               else 0)
        out["trail_clip"][i] = (int(lens[-1]) if len(ops)
                                and ops[-1] in (CSOFT_CLIP, CHARD_CLIP)
                                else 0)
    return out


def _match_coverage(view, offsets, target_len):
    """CMATCH base-coverage totals (coverage.h:461-476) for the records
    at `offsets` (native diff-array pass; Python walk as fallback)."""
    try:
        from delly_tpu import native
        cov = native.bam_match_coverage(view.data, offsets, target_len)
        if cov is not None:
            return cov
    except Exception:
        pass
    diff = np.zeros(target_len + 1, dtype=np.int32)
    for off in offsets:
        rec = view.parse_at(int(off))
        rp = 0
        for op, ol in zip(rec.cigar_ops, rec.cigar_lens):
            ol = int(ol)
            if op == CMATCH:
                lo = rec.pos + rp
                hi = min(rec.pos + rp + ol, target_len)
                if lo < hi:
                    diff[lo] += 1
                    diff[hi] -= 1
                rp += ol
            elif op in (CDEL, CREF_SKIP):
                rp += ol
    return np.cumsum(diff[:target_len], dtype=np.int32)


def _replay_jct(entries, file_c, count_map, ref_aligned_count, cfg):
    """Apply recorded junction-alignment results (sv_id, qual, d_alt,
    d_ref, len_cons, len_ref) in serial order — the same k-cap/score/
    cap/parity rules as _process_jobs_device (coverage.h:109-114 +
    425-454)."""
    fq = cfg.flank_quality
    for sv_id, qual, d_alt, d_ref, lc, lr_ in entries:
        score_alt = 0.0
        score_ref = 0.0
        if d_alt <= int(2 * fq * lc):
            score_alt = ((1.0 - fq) * lc) / (d_alt + 1)
        if d_ref <= int(2 * fq * lr_):
            score_ref = ((1.0 - fq) * lr_) / (d_ref + 1)
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


def annotate_coverage(cfg, bams, fasta, libs, svs):
    """coverage.h:265-743. Returns (jct_map, rc_map, span_map) per sample.

    Host-axis mode (>1 process, SURVEY §7.7): each process decodes and
    scans only its OWNED chromosomes, recording an event tape per
    (file, chromosome) — junction-alignment distances (the device DP
    already ran, sharded over the global mesh), spanning-pair
    store/pop ops and walk appends, and the chromosome-local coverage
    sums. Tapes are exchanged and every process replays them in the
    serial (file, chromosome, row) order, which reproduces the
    single-process tallies bit for bit (cap gates re-check at replay;
    an extra locally-enqueued job a serial run would have gate-skipped
    is dropped by the same cap at the same replay position)."""
    from delly_tpu.parallel import hostaxis

    header = bams[0].header
    nfiles = len(bams)
    cov_count = [[ReadCount() for _ in svs] for _ in range(nfiles)]
    count_map = [[JunctionCount() for _ in svs] for _ in range(nfiles)]
    span_map = [[SpanningCount() for _ in svs] for _ in range(nfiles)]

    nproc = hostaxis.process_count()
    hx = nproc > 1 and not getattr(cfg, "dumpfile", "")
    tape: dict = {}  # (file_c, ref_index) -> per-chromosome event tape

    from delly_tpu.utils.log import stage
    stage("Generate REF and ALT probes")
    ref_probe_arr, cons_probe_arr, bp_region, sv_on_chr = generate_probes(
        cfg, header, fasta, svs)

    stage("SV annotation")
    ref_aligned_read_count = [[0] * len(svs) for _ in range(nfiles)]
    ref_aligned_span_count = [[0] * len(svs) for _ in range(nfiles)]

    # SV-read dump (coverage.h:337-341, 519-535 SR rows, 656-661 PE rows)
    dump_out = None
    svt_of = {}
    if getattr(cfg, "dumpfile", ""):
        import gzip as _gzip
        from delly_tpu.utils.tags import add_id
        # dump mode disables host-axis sharding (rows interleave in
        # strict read order); every process runs the identical serial
        # pass, non-writers sink their rows to devnull
        dump_path = (cfg.dumpfile if hostaxis.is_writer()
                     else os.devnull)
        dump_out = _gzip.open(dump_path, "wt")
        dump_out.write("#svid\tbam\tqname\tchr\tpos\tmatechr\tmatepos"
                       "\tmapq\ttype\n")
        for sv in svs:
            svt_of[sv.id] = sv.svt

    def _dump_row(file_c, sv_id, qname, tid, pos, mtid, mpos, mapq, kind):
        from delly_tpu.utils.tags import add_id
        svid = add_id(svt_of[sv_id]) + str(sv_id).zfill(8)
        mname = header.names[mtid] if 0 <= mtid < len(header.names) else "*"
        dump_out.write(f"{svid}\t{cfg.files[file_c]}\t{qname}\t"
                       f"{header.names[tid]}\t{pos}\t{mname}\t{mpos}\t"
                       f"{mapq}\t{kind}\n")

    # Junction-alignment jobs accumulate across chromosomes and files
    # (each job carries its file index) and flush in large batches: the
    # reference dispatches per batch = 131072*threads (coverage.h:271);
    # per-chromosome batches are tiny on multi-contig inputs and each
    # device dispatch pays a round trip.
    jobs: list = []
    # enqueued-but-unflushed job counts per (file, sv): a single SV
    # accumulating far past the read cap triggers an early flush so
    # the creation gate sees fresh tallies
    pending_jobs = [dict() for _ in bams]
    _JOB_FLUSH = 65536

    def _flush_jobs(force: bool = False) -> None:
        if not jobs or (not force and len(jobs) < _JOB_FLUSH):
            return
        dump_entries = [] if dump_out is not None else None
        _process_jobs_device(jobs, count_map, ref_aligned_read_count,
                             cfg, dump_entries)
        if dump_entries:
            for f_c, sv_id, (qname, tid, pos, mtid, mpos, mapq) \
                    in dump_entries:
                _dump_row(f_c, sv_id, qname, tid, pos, mtid, mpos,
                          mapq, "SR")
        jobs.clear()
        for pj in pending_jobs:
            pj.clear()

    plan_all_ac = [ri for ri in range(header.n_targets) if sv_on_chr[ri]]
    for file_c, bam in enumerate(bams):
        cliptra = {}
        plan = (hostaxis.partition_plan(plan_all_ac) if hx
                else plan_all_ac)
        bam.set_decode_workers(
            getattr(cfg, "max_threads", 1) or 1, plan)
        for ref_index in plan:
            ch_tape = None
            if hx:
                ch_tape = {"jct": [], "auto": [], "walk": [], "cov": []}
                tape[(file_c, ref_index)] = ch_tape
            target_len = header.lengths[ref_index]
            cov_fragment = np.zeros(target_len, dtype=np.uint16)
            max_cov = np.iinfo(np.uint16).max

            # Sparse occupancy: merged disjoint [start,end) intervals.
            # "any occupied base in [a,b)" becomes a searchsorted probe
            # instead of a dense O(chrom) cumsum (coverage.h keeps a
            # dense bitset; breakpoint sets are sparse so interval
            # algebra is equivalent and O(#regions)).
            if bp_region[ref_index]:
                _ivs = sorted((b.regionStart, b.regionEnd)
                              for b in bp_region[ref_index])
                _ms, _me = [_ivs[0][0]], [_ivs[0][1]]
                for _s, _e in _ivs[1:]:
                    if _s <= _me[-1]:
                        if _e > _me[-1]:
                            _me[-1] = _e
                    else:
                        _ms.append(_s)
                        _me.append(_e)
                occ_starts = np.asarray(_ms, dtype=np.int64)
                occ_ends = np.asarray(_me, dtype=np.int64)
            else:
                occ_starts = occ_ends = np.zeros(0, dtype=np.int64)

            span_point = []
            for sv in svs:
                if sv.peSupport == 0:
                    continue
                if sv.chr == ref_index and sv.svStart < target_len:
                    span_point.append(SpanPoint(sv.svStart, sv.svt, sv.id,
                                                sv.chr2, sv.svEnd))
                if sv.chr2 == ref_index and sv.svEnd < target_len:
                    span_point.append(SpanPoint(sv.svEnd, sv.svt, sv.id,
                                                sv.chr, sv.svStart))
            span_point.sort(key=lambda s: s.bppos)
            span_bppos = [s.bppos for s in span_point]
            span_pos_arr = np.asarray(span_bppos, dtype=np.int64)
            bp_pos_sorted = [b.bppos for b in bp_region[ref_index]]

            import bisect as _bisect

            # SoA-driven record walk (coverage.h:456-681): core fields,
            # CIGAR aggregates and name hashes come from bulk native
            # passes over the per-chromosome view (indexed streaming on
            # large inputs); full records are parsed only for the few
            # reads that spawn junction-alignment jobs.
            view = bam.chrom(ref_index)
            excl = (FSECONDARY | FQCFAIL | FDUP | FSUPPLEMENTARY
                    | FUNMAP | FMUNMAP)
            keep = (((view["flag"] & excl) == 0)
                    & (view["mapq"] >= cfg.min_geno_qual))
            sel = np.nonzero(keep)[0]
            offs = view["offsets"][sel]
            stats = _cigar_stats(view, offs)
            totals = _match_coverage(view, offs, target_len)
            np.minimum(totals, max_cov - 1, out=totals)
            cov_bases = totals.astype(np.uint16)

            def _span_hits(lo, hi):
                """Count of span breakpoints in [lo, hi) > 0 (vector)."""
                return (np.searchsorted(span_pos_arr, hi, side="left")
                        > np.searchsorted(span_pos_arr, lo, side="left"))

            lib = libs[file_c]
            two_flank = 2 * cfg.min_flank_size
            bpr = bp_region[ref_index]

            # Vectorized per-read precompute (the scalar walk's gates,
            # hashes and svt classifications as numpy passes).
            pos_a = view["pos"][sel]
            flag_a = view["flag"][sel]
            mtid_a = view["mtid"][sel]
            mpos_a = view["mpos"][sel]
            lq_a = view["lqseq"][sel]
            nh_a = stats["name_hash"]
            # junction-job candidates: occupancy prefilter
            rbegin_a = np.maximum(0, pos_a - stats["leading_sc"])
            rend_a = np.minimum(pos_a + lq_a, target_len)
            if len(occ_starts):
                _oi = np.searchsorted(occ_starts, rend_a, side="left")
                occ_hit = ((_oi > 0)
                           & (occ_ends[np.maximum(_oi - 1, 0)] > rbegin_a))
            else:
                occ_hit = np.zeros(len(rend_a), dtype=bool)
            jcand = (lq_a >= two_flank) & (rbegin_a < rend_a) & occ_hit
            jrows = np.nonzero(jcand)[0]
            j_pos = pos_a[jrows].tolist()
            j_lq = lq_a[jrows].tolist()
            j_mapq = view["mapq"][sel][jrows].tolist()
            j_mtid = mtid_a[jrows].tolist()
            j_mpos = mpos_a[jrows].tolist()
            j_cfl = stats["clip_flags"][jrows].tolist()
            j_offs = offs[jrows].tolist()
            j_rb = rbegin_a[jrows].tolist()
            for k in range(len(j_offs)):
                rpos = j_pos[k]
                lqseq = j_lq[k]
                has_soft_clip = bool(j_cfl[k] & 1)
                has_clip = bool(j_cfl[k] & 2)
                it = _bisect.bisect_left(bp_pos_sorted, j_rb[k])
                rec = None
                while (it < len(bpr)
                       and rpos + lqseq >= bpr[it].bppos):
                    itbp = bpr[it]
                    it += 1
                    cm = count_map[file_c][itbp.id]
                    if (len(cm.ref) + len(cm.alt)
                            >= cfg.max_geno_read_count):
                        continue
                    spans = (has_soft_clip or (
                        (not has_clip)
                        and rpos + cfg.min_flank_size + itbp.homLeft
                        <= itbp.bppos
                        and rpos + lqseq
                        >= itbp.bppos + cfg.min_flank_size
                        + itbp.homRight))
                    if spans:
                        if rec is None:
                            rec = view.parse_at(j_offs[k])
                        sequence = adjust_orientation(
                            rec.seq, bool(itbp.bpPoint), itbp.svt)
                        job = (
                            cons_probe_arr[itbp.bpPoint][itbp.id],
                            ref_probe_arr[itbp.bpPoint][itbp.id],
                            sequence, file_c, itbp.id, j_mapq[k],
                            (rec.qname, ref_index, rpos, j_mtid[k],
                             j_mpos[k], j_mapq[k]))
                        if hx:
                            job = job + (ch_tape["jct"],)
                        if dump_out is not None:
                            # dump mode runs INLINE per read like the
                            # reference ("No multi-threading",
                            # coverage.h:518-537): rows interleave in
                            # strict read order and the cap gate sees
                            # fresh tallies
                            de: list = []
                            _process_jobs_device(
                                [job], count_map,
                                ref_aligned_read_count, cfg, de)
                            for f_c, sv_id, (qname, tid, pos, mtid,
                                             mpos, mapq) in de:
                                _dump_row(f_c, sv_id, qname, tid, pos,
                                          mtid, mpos, mapq, "SR")
                            continue
                        jobs.append(job)
                        pj = pending_jobs[file_c]
                        pj[itbp.id] = pj.get(itbp.id, 0) + 1
                        # ultra-deep pileup on one SV: flush early so
                        # the (tally-updated) read-cap gate re-engages
                        # — the tally drops past-cap jobs anyway, so a
                        # flush here cannot change outputs, it only
                        # stops enqueuing work the tally would discard
                        if pj[itbp.id] >= 2 * cfg.max_geno_read_count:
                            _flush_jobs(force=True)

            # --- Read-count and spanning annotation -------------------
            # The reference's mate-map pairing (coverage.h:550-600) is a
            # per-key store/overwrite/pop automaton in file order. For
            # intra-chromosome pairs it vectorizes exactly: first-ness
            # (first_pair_obs incl. the same-position seen-set) is a
            # group-min over (pos, name-hash), and store/pop matching is
            # "each second read pairs with the latest first since the
            # previous second of the same key" — a segmented cummax.
            # Inter-chromosome pairs keep the scalar dict (cliptra spans
            # chromosomes); span walks then run in merged file order so
            # every list append and %2 tally is order-identical.
            sv_chr_arr = np.asarray(sv_on_chr, dtype=bool)
            pm = (((flag_a & FPAIRED) != 0) & (mtid_a >= 0)
                  & sv_chr_arr[np.clip(mtid_a, 0, len(sv_on_chr) - 1)])
            prow = np.nonzero(pm)[0]
            P = len(prow)
            b_pos = pos_a[prow]
            b_mpos = mpos_a[prow]
            b_mtid = mtid_a[prow]
            b_flag = flag_a[prow]
            b_mapq = view["mapq"][sel][prow]
            b_lq = lq_a[prow]
            b_nh = nh_a[prow]
            b_rspan = stats["ref_span"][prow]
            b_clip = (stats["clip_flags"][prow] & 1) != 0
            b_offs = offs[prow]
            refs = np.full(P, ref_index, dtype=np.int64)
            b_hv1 = hash_pair_h_batch(b_nh, refs, b_pos, b_mtid, b_mpos)
            b_hv2 = hash_pair_h_batch(b_nh, b_mtid, b_mpos, refs, b_pos)
            b_svtp = get_sv_type_batch(b_flag, b_pos, b_mpos)
            b_svt = isize_mapping_pos_batch(
                b_flag, np.int64(ref_index), b_pos, b_mtid, b_mpos,
                view["tlen"][sel][prow], lib.maxISizeCutoff)

            from delly_tpu.models.pairing import (
                first_obs_mask, match_store_pop,
            )
            intra = b_mtid == ref_index
            lt = intra & (b_pos < b_mpos)
            eqm = intra & (b_pos == b_mpos)
            inter_first = ~intra & (ref_index < b_mtid)
            first_mask = first_obs_mask(b_pos, lt | inter_first, eqm,
                                        b_nh)

            # intra store/pop matching (exact dict semantics incl.
            # same-key overwrite)
            ii = np.nonzero(intra)[0]
            S_rows = np.zeros(0, dtype=np.int64)
            F_rows = np.zeros(0, dtype=np.int64)
            if len(ii):
                keyz = np.where(first_mask[ii], b_hv1[ii], b_hv2[ii])
                si, fi_ = match_store_pop(keyz, first_mask[ii])
                S_rows = ii[si]
                F_rows = ii[fi_]

            pq = np.minimum(b_mapq[F_rows], b_mapq[S_rows])
            pclip = b_clip[F_rows] | b_clip[S_rows]
            qok = pq >= cfg.min_geno_qual
            S_rows = S_rows[qok]
            F_rows = F_rows[qok]
            pq = pq[qok]
            pclip = pclip[qok]

            # fragment coverage: midpoint counting with saturation
            mid = b_pos[S_rows] + b_rspan[S_rows] // 2
            mid = mid[mid < target_len]
            if len(mid):
                frag = np.bincount(mid, minlength=target_len)
                np.minimum(frag, max_cov - 1, out=frag)
                cov_fragment = np.maximum(
                    cov_fragment, frag.astype(np.uint16))

            # inter-chromosome pairs through the scalar cliptra dict.
            # Host-axis mode records the store/pop ops instead: the
            # automaton spans chromosomes, so it resolves during the
            # post-exchange serial replay. The pop's span walk is
            # row-local, so its candidate sp.ids are precomputed here
            # and applied at replay with the resolved pair quality.
            inter_events = []  # (row, pair_quality)
            irows = np.nonzero(~intra)[0]
            if len(irows):
                i_first = first_mask[irows].tolist()
                i_hv1 = b_hv1[irows].tolist()
                i_hv2 = b_hv2[irows].tolist()
                i_clipf = b_clip[irows].tolist()
                i_mapq = b_mapq[irows].tolist()
                ir_l = irows.tolist()
                for k in range(len(ir_l)):
                    if i_first[k]:
                        if hx:
                            ch_tape["auto"].append(
                                ("s", i_hv1[k], int(i_mapq[k])))
                        else:
                            cliptra[i_hv1[k]] = (i_clipf[k], i_mapq[k])
                    elif hx:
                        row = ir_l[k]
                        spids = []
                        if lib.median != 0 and int(b_svt[row]) != -1:
                            rpos = int(b_pos[row])
                            lqseq = int(b_lq[row])
                            if int(b_flag[row]) & FREVERSE:
                                pbeg = max(0, rpos + lqseq
                                           - lib.maxNormalISize)
                                pend = min(rpos + lqseq, target_len)
                            else:
                                pbeg = rpos
                                pend = min(rpos + lib.maxNormalISize,
                                           target_len)
                            if pbeg < pend:
                                it = _bisect.bisect_left(span_bppos,
                                                         pbeg)
                                while (it < len(span_point)
                                       and pend
                                       >= span_point[it].bppos):
                                    sp = span_point[it]
                                    it += 1
                                    if (int(b_svt[row]) != sp.svt
                                            or int(b_mtid[row])
                                            != sp.chr2):
                                        continue
                                    if (abs(int(b_mpos[row])
                                            - sp.otherBppos)
                                            < lib.maxNormalISize):
                                        spids.append(sp.id)
                        ch_tape["auto"].append(
                            ("p", i_hv2[k], int(i_mapq[k]), row, spids))
                    else:
                        ent = cliptra.pop(i_hv2[k], None)
                        if ent is None:
                            continue
                        pair_quality = min(ent[1], i_mapq[k])
                        if pair_quality < cfg.min_geno_qual:
                            continue
                        inter_events.append((ir_l[k], pair_quality))

            if lib.median != 0 and (len(S_rows) or inter_events):
                # span-walk candidates (vectorized gates), walked in
                # merged file order for order-identical tallies
                events = []
                if len(S_rows):
                    s_pos = b_pos[S_rows]
                    s_mpos = b_mpos[S_rows]
                    s_lq = b_lq[S_rows]
                    outer = np.where(s_pos < s_mpos,
                                     s_mpos + s_lq - s_pos,
                                     s_pos + s_lq - s_mpos)
                    norm = (~pclip & (b_svtp[S_rows] == 2)
                            & (outer >= lib.minNormalISize)
                            & (outer <= lib.maxNormalISize))
                    spanlen = (0.8 * outer).astype(np.int64)
                    pbeg_n = np.minimum(s_pos, s_mpos) \
                        + (outer - spanlen) // 2
                    hi_n = np.minimum(pbeg_n + spanlen, target_len)
                    lo_n = np.maximum(0, pbeg_n)
                    norm &= (pbeg_n < hi_n) & _span_hits(
                        np.clip(lo_n, 0, target_len),
                        np.clip(hi_n, 0, target_len))
                    ab = (~((b_svtp[S_rows] == 2)
                            & (outer >= lib.minNormalISize)
                            & (outer <= lib.maxNormalISize))
                          & (b_svt[S_rows] != -1))
                    rev = (b_flag[S_rows] & FREVERSE) != 0
                    pbeg_a = np.where(
                        rev, np.maximum(0, s_pos + s_lq
                                        - lib.maxNormalISize), s_pos)
                    pend_a = np.where(
                        rev, np.minimum(s_pos + s_lq, target_len),
                        np.minimum(s_pos + lib.maxNormalISize,
                                   target_len))
                    ab &= (pbeg_a < pend_a) & _span_hits(
                        np.clip(pbeg_a, 0, target_len),
                        np.clip(pend_a, 0, target_len))
                    for k in np.nonzero(norm | ab)[0].tolist():
                        events.append((int(S_rows[k]), "i", k))
                for row, quality in inter_events:
                    # inter pairs only reach the abnormal section
                    if b_svt[row] == -1:
                        continue
                    rpos = int(b_pos[row])
                    lqseq = int(b_lq[row])
                    if b_flag[row] & FREVERSE:
                        pbeg = max(0, rpos + lqseq - lib.maxNormalISize)
                        pend = min(rpos + lqseq, target_len)
                    else:
                        pbeg = rpos
                        pend = min(rpos + lib.maxNormalISize, target_len)
                    if pbeg < pend and (
                            _bisect.bisect_left(span_bppos, pend)
                            > _bisect.bisect_left(span_bppos, pbeg)):
                        events.append((row, "x", quality))
                events.sort(key=lambda e: e[0])

                for row, kind, aux in events:
                    rpos = int(b_pos[row])
                    mpos = int(b_mpos[row])
                    mtid = int(b_mtid[row])
                    lqseq = int(b_lq[row])
                    ops = [] if hx else None
                    if kind == "i":
                        k = aux
                        pair_quality = int(pq[k])
                        if norm[k]:
                            st = int(pbeg_n[k])
                            spl = int(spanlen[k])
                            it = _bisect.bisect_left(span_bppos, st)
                            while (it < len(span_point)
                                   and st + spl >= span_point[it].bppos):
                                sp = span_point[it]
                                it += 1
                                if hx:
                                    ops.append(("r", sp.id, pair_quality))
                                    continue
                                ref_aligned_span_count[file_c][sp.id] += 1
                                if ref_aligned_span_count[file_c][sp.id] % 2:
                                    span_map[file_c][sp.id].ref.append(
                                        pair_quality)
                        if ab[k]:
                            svt = int(b_svt[row])
                            pbeg = int(pbeg_a[k])
                            pend = int(pend_a[k])
                            it = _bisect.bisect_left(span_bppos, pbeg)
                            while (it < len(span_point)
                                   and pend >= span_point[it].bppos):
                                sp = span_point[it]
                                it += 1
                                if svt != sp.svt or mtid != sp.chr2:
                                    continue
                                if (abs(mpos - sp.otherBppos)
                                        < lib.maxNormalISize):
                                    if hx:
                                        ops.append(("a", sp.id,
                                                    pair_quality))
                                        continue
                                    if dump_out is not None:
                                        rec = view.parse_at(
                                            int(b_offs[row]))
                                        _dump_row(file_c, sp.id,
                                                  rec.qname, ref_index,
                                                  rpos, mtid, mpos,
                                                  int(b_mapq[row]), "PE")
                                    span_map[file_c][sp.id].alt.append(
                                        pair_quality)
                        if hx and ops:
                            ch_tape["walk"].append((row, ops))
                    else:
                        pair_quality = aux
                        svt = int(b_svt[row])
                        if b_flag[row] & FREVERSE:
                            pbeg = max(0, rpos + lqseq
                                       - lib.maxNormalISize)
                            pend = min(rpos + lqseq, target_len)
                        else:
                            pbeg = rpos
                            pend = min(rpos + lib.maxNormalISize,
                                       target_len)
                        it = _bisect.bisect_left(span_bppos, pbeg)
                        while (it < len(span_point)
                               and pend >= span_point[it].bppos):
                            sp = span_point[it]
                            it += 1
                            if svt != sp.svt or mtid != sp.chr2:
                                continue
                            if (abs(mpos - sp.otherBppos)
                                    < lib.maxNormalISize):
                                if dump_out is not None:
                                    rec = view.parse_at(int(b_offs[row]))
                                    _dump_row(file_c, sp.id, rec.qname,
                                              ref_index, rpos, mtid,
                                              mpos, int(b_mapq[row]),
                                              "PE")
                                span_map[file_c][sp.id].alt.append(
                                    pair_quality)
            _flush_jobs()

            # Assign fragment/base counts to SVs (coverage.h:684-733).
            # Few SVs per chromosome: direct slice sums beat a dense
            # O(chrom) prefix sum; prefix form only when many queries.
            svs_here = sum(1 for sv in svs if sv.chr == ref_index)
            use_cum = svs_here > 64
            if use_cum:
                cb_src = np.concatenate(([0], np.cumsum(
                    cov_bases, dtype=np.int64)))
                cf_src = np.concatenate(([0], np.cumsum(
                    cov_fragment, dtype=np.int64)))
            else:
                cb_src, cf_src = cov_bases, cov_fragment

            def _range_sum(src, a, b):
                a = max(0, min(a, target_len))
                b = max(0, min(b, target_len))
                if a >= b:
                    return 0
                if use_cum:
                    return int(src[b] - src[a])
                return int(np.sum(src[a:b], dtype=np.int64))

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
                cum = cb_src if small_sv else cf_src
                lstart = max(sv.svStart - half, 0)
                left_rc = _range_sum(cum, lstart, sv.svStart)
                mstart, mend = sv.svStart, sv.svEnd
                if is_translocation(sv.svt) or sv.svt == 4:
                    mstart = max(sv.svStart - half, 0)
                    mend = min(sv.svStart + half, target_len)
                mid_rc = _range_sum(cum, mstart, mend)
                rstart = sv.svEnd
                rend = min(sv.svEnd + half, target_len)
                if is_translocation(sv.svt) or sv.svt == 4:
                    rstart = sv.svStart
                    rend = min(sv.svStart + half, target_len)
                right_rc = _range_sum(cum, rstart, rend)
                if hx:
                    ch_tape["cov"].append((sv.id, left_rc, mid_rc,
                                           right_rc))
                else:
                    cc = cov_count[file_c][sv.id]
                    cc.leftRC = left_rc
                    cc.rc = mid_rc
                    cc.rightRC = right_rc
    _flush_jobs(force=True)
    if dump_out is not None:
        dump_out.close()
    if hx:
        # Exchange the per-(file, chromosome) tapes and replay them in
        # serial order into FRESH tallies on every process. The
        # scan-time structures above only served the (permissive)
        # enqueue gates; replay re-applies every cap/parity rule at
        # its serial position, so the result is byte-identical to the
        # single-process pass.
        merged = hostaxis.exchange_owned(tape)
        cov_count = [[ReadCount() for _ in svs] for _ in range(nfiles)]
        count_map = [[JunctionCount() for _ in svs]
                     for _ in range(nfiles)]
        span_map = [[SpanningCount() for _ in svs]
                    for _ in range(nfiles)]
        ref_aligned_read_count = [[0] * len(svs) for _ in range(nfiles)]
        ref_aligned_span_count = [[0] * len(svs) for _ in range(nfiles)]
        for file_c in range(nfiles):
            cliptra = {}
            for ref_index in plan_all_ac:
                t = merged.get((file_c, ref_index))
                if t is None:
                    continue
                _replay_jct(t["jct"], file_c, count_map,
                            ref_aligned_read_count, cfg)
                resolved = []  # (row, pair_quality, spids)
                for op in t["auto"]:
                    if op[0] == "s":
                        cliptra[op[1]] = (None, op[2])
                        continue
                    _tag, hv2, mapq, row, spids = op
                    ent = cliptra.pop(hv2, None)
                    if ent is None:
                        continue
                    q = min(ent[1], mapq)
                    if q < cfg.min_geno_qual:
                        continue
                    if spids:
                        resolved.append((row, q, spids))
                walk = list(t["walk"])
                walk.extend((row, [("a", spid, q) for spid in spids])
                            for row, q, spids in resolved)
                walk.sort(key=lambda e: e[0])
                for _row, ops in walk:
                    for kind, spid, q in ops:
                        if kind == "r":
                            ref_aligned_span_count[file_c][spid] += 1
                            if ref_aligned_span_count[file_c][spid] % 2:
                                span_map[file_c][spid].ref.append(q)
                        else:
                            span_map[file_c][spid].alt.append(q)
                for sv_id, left_rc, mid_rc, right_rc in t["cov"]:
                    cc = cov_count[file_c][sv_id]
                    cc.leftRC = left_rc
                    cc.rc = mid_rc
                    cc.rightRC = right_rc
    return count_map, cov_count, span_map
