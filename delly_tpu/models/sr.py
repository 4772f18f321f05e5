"""Short-read SV discovery engine (``delly sr`` equivalent).

Reference: src/delly.h (driver), src/shortpe.h (PE/SR scan + assembly +
mergeSort). Host CPU handles BAM decoding, CIGAR walks and clustering;
MSA/realignment DP and genotyping edit distances run through the ops layer.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from delly_tpu.io.bam import (
    BamFile, FDUP, FMUNMAP, FPAIRED, FQCFAIL, FSECONDARY,
    FSUPPLEMENTARY, FUNMAP,
)
from delly_tpu.io.fasta import FastaFile
from delly_tpu.models.cluster import BamAlignRecord, cluster_pe, cluster_sr
from delly_tpu.models.junctions import extract_junctions_sr
from delly_tpu.models.refine import adjust_orientation, align_consensus
from delly_tpu.ops.gotoh import DnaScore
from delly_tpu.ops.msa import msa
from delly_tpu.models.genotype_sr import _cigar_stats
from delly_tpu.models.pairing import first_obs_mask, match_store_pop
from delly_tpu.utils.hashing import (
    hash_pair_h_batch, hash_sr, hash_sr_batch,
)
from delly_tpu.utils.stats import (
    get_library_params, get_variability, parse_exclude_intervals,
)
from delly_tpu.utils.tags import (
    SVT_TRANS, is_translocation, isize_mapping_pos_batch,
)




def _log(msg: str) -> None:
    from delly_tpu.utils.log import stage
    stage(msg)


_CAND_FIELDS = ("pos", "mapq", "mtid", "mpos", "flag", "svt", "rspan",
                "nh", "seed")


def _shard_bounds(n_rows: int, n_shards: int) -> list:
    """Contiguous row ranges covering [0, n_rows) — the chromosome-
    interval shards of the scan plane (SURVEY §7.7). Concatenating
    shard outputs in order reconstructs the serial row order exactly,
    so sharding is byte-neutral by construction."""
    n_shards = max(1, min(n_shards, n_rows)) if n_rows else 1
    step = -(-n_rows // n_shards) if n_rows else 1
    return [(lo, min(lo + step, n_rows))
            for lo in range(0, max(n_rows, 1), step)]


def _scan_phase_a(cfg, view, lib, ref_index, ivs, full_chrom, valid_mask,
                  lo, hi):
    """Row-local scan work for view rows [lo, hi): read gates, CIGAR
    aggregates, exclusion-interval filter, junction extraction and the
    PE candidate gates (shortpe.h:354-445) — everything EXCEPT the
    order-sensitive mate pairing, which _scan_phase_b replays over the
    concatenated per-shard candidates. Results are plain arrays/dicts
    (host-axis ready: shards can run on different hosts and merge)."""
    read_bp = {}
    keep = (((view["flag"][lo:hi] & (FQCFAIL | FDUP | FUNMAP)) == 0)
            & (view["mapq"][lo:hi] >= cfg.min_map_qual))
    sel = np.nonzero(keep)[0] + lo
    offs = view["offsets"][sel]
    stats = _cigar_stats(view, offs)
    # exclude regions: the reference iterates sam_itr_queryi over each
    # VALID interval (shortpe.h:349-350) — only reads whose alignment
    # overlaps a valid interval are scanned
    if not full_chrom:
        p_al = view["pos"][sel]
        e_al = p_al + np.maximum(stats["ref_span"], 1)
        vm = np.zeros(len(sel), dtype=bool)
        for ilo, ihi in ivs:
            vm |= (p_al < ihi) & (e_al > ilo)
        sel = sel[vm]
        offs = offs[vm]
        stats = {k: v[vm] for k, v in stats.items()}
    seeds_a = hash_sr_batch(stats["name_hash"],
                            stats["fnv_hash"], view["flag"][sel])
    # Junction rows: parse only records whose CIGAR aggregates fired
    # the clip/indel prefilter.
    jfire = np.nonzero((stats["max_clip"] > cfg.min_clip)
                       | (stats["max_indel"] > cfg.min_ref_sep))[0]
    # scalarize only the junction-firing subset: a full-column tolist
    # costs more than the whole decode on high-coverage chromosomes
    offs_j = offs[jfire].tolist()
    seeds_j = seeds_a[jfire].tolist()
    for k in range(len(offs_j)):
        rec = view.parse_at(offs_j[k])
        extract_junctions_sr(read_bp, seeds_j[k], rec,
                             cfg.min_ref_sep, cfg.min_clip)

    # Paired-end candidates: every per-read gate of the scalar walk
    # (shortpe.h:391-445) evaluated as one numpy pass.
    flag_a = view["flag"][sel]
    pos_a = view["pos"][sel]
    mapq_a = view["mapq"][sel]
    mtid_a = view["mtid"][sel]
    mpos_a = view["mpos"][sel]
    tlen_a = view["tlen"][sel]
    pe = (flag_a & FPAIRED) != 0
    if lib.median == 0:
        pe &= False
    pe &= (flag_a & (FSECONDARY | FSUPPLEMENTARY | FMUNMAP)) == 0
    pe &= mtid_a >= 0
    pe &= valid_mask[np.clip(mtid_a, 0, cfg.nchr - 1)]
    pe &= (mtid_a == ref_index) | (mapq_a >= cfg.min_tra_qual)
    svt_a = isize_mapping_pos_batch(
        flag_a, np.int64(ref_index), pos_a, mtid_a, mpos_a,
        tlen_a, lib.maxISizeCutoff)
    pe &= svt_a != -1
    if cfg.svtset:
        pe &= np.isin(svt_a, list(cfg.svtset))
    pe &= ~((svt_a == 2)
            & (lib.maxISizeCutoff > np.abs(tlen_a)))
    cand = np.nonzero(pe)[0]
    ca = {"pos": pos_a[cand], "mapq": mapq_a[cand],
          "mtid": mtid_a[cand], "mpos": mpos_a[cand],
          "flag": flag_a[cand], "svt": svt_a[cand],
          "rspan": stats["ref_span"][cand],
          "nh": stats["name_hash"][cand], "seed": seeds_a[cand]}
    return read_bp, ca


def _scan_phase_b(cfg, lib, ref_index, ca, bam_records, matetra):
    """Order-sensitive mate pairing over the chromosome's concatenated
    candidates (shortpe.h:411-445): first-mate observation, the
    intra-chromosome store/pop automaton and the cross-chromosome
    mate map. Runs serially per (file, chromosome) in deterministic
    order, so the sharded scan is byte-identical to the serial one."""
    c_pos = ca["pos"]
    c_mapq = ca["mapq"]
    c_mtid = ca["mtid"]
    c_mpos = ca["mpos"]
    c_flag = ca["flag"]
    c_svt = ca["svt"]
    c_rspan = ca["rspan"]
    c_nh = ca["nh"]
    c_seed = ca["seed"]
    intra = c_mtid == ref_index
    # first_pair_obs (tags.h:269-274): the reference probes the seed
    # set with hash_string(qname) but inserts hash_sr
    first = first_obs_mask(
        c_pos,
        (intra & (c_pos < c_mpos))
        | (~intra & (ref_index < c_mtid)),
        intra & (c_pos == c_mpos), c_nh, c_seed)
    refs = np.full(len(c_pos), ref_index, dtype=np.int64)
    hv1 = hash_pair_h_batch(c_nh, refs, c_pos, c_mtid, c_mpos)
    hv2 = hash_pair_h_batch(c_nh, c_mtid, c_mpos, refs, c_pos)

    # intra pairs (never translocations) through the vectorized
    # store/pop automaton; zero-mapq firsts are filtered after
    # matching, which yields the same skip outcomes as the
    # reference's non-consuming probe
    ii = np.nonzero(intra)[0]
    if len(ii):
        keys = np.where(first[ii], hv1[ii], hv2[ii])
        si, fi_ = match_store_pop(keys, first[ii])
        S = ii[si]
        F = ii[fi_]
        ok = c_mapq[F] != 0
        S, F = S[ok], F[ok]
        pq = np.minimum(c_mapq[F], c_mapq[S]).tolist()
        malen = c_rspan[F].tolist()
        s_pos = c_pos[S].tolist()
        s_mtid = c_mtid[S].tolist()
        s_mpos = c_mpos[S].tolist()
        s_flag = c_flag[S].tolist()
        s_svt = c_svt[S].tolist()
        s_rspan = c_rspan[S].tolist()
        for k in range(len(s_pos)):
            bam_records[s_svt[k]].append(BamAlignRecord(
                tid=ref_index, pos=s_pos[k], mtid=s_mtid[k],
                mpos=s_mpos[k], alen=s_rspan[k],
                malen=malen[k], median=lib.median, mad=lib.mad,
                maxNormalISize=lib.maxNormalISize,
                flag=s_flag[k], mapQuality=pq[k]))
        lib.abnormal_pairs += len(s_pos)

    # inter-chromosome pairs: scalar dict (matetra spans chroms)
    xi = np.nonzero(~intra)[0]
    if len(xi):
        x_first = first[xi].tolist()
        x_hv1 = hv1[xi].tolist()
        x_hv2 = hv2[xi].tolist()
        x_mapq = c_mapq[xi].tolist()
        x_rspan = c_rspan[xi].tolist()
        x_pos = c_pos[xi].tolist()
        x_mtid = c_mtid[xi].tolist()
        x_mpos = c_mpos[xi].tolist()
        x_flag = c_flag[xi].tolist()
        x_svt = c_svt[xi].tolist()
        for k in range(len(x_first)):
            if x_first[k]:
                matetra[x_hv1[k]] = (x_mapq[k], x_rspan[k])
                continue
            ent = matetra.get(x_hv2[k])
            if ent is None or not ent[0]:
                continue
            del matetra[x_hv2[k]]
            bam_records[x_svt[k]].append(BamAlignRecord(
                tid=ref_index, pos=x_pos[k], mtid=x_mtid[k],
                mpos=x_mpos[k], alen=x_rspan[k], malen=ent[1],
                median=lib.median, mad=lib.mad,
                maxNormalISize=lib.maxNormalISize,
                flag=x_flag[k],
                mapQuality=min(ent[0], x_mapq[k])))
            lib.abnormal_pairs += 1


def _merge_cands(parts: list) -> dict:
    if len(parts) == 1:
        return parts[0]
    return {f: np.concatenate([p[f] for p in parts])
            for f in _CAND_FIELDS}


def _merge_read_bp(dst: dict, parts: list) -> None:
    # shard order == row order, so per-seed junction lists extend in
    # exactly the serial append order
    for part in parts:
        for seed, jl in part.items():
            dst.setdefault(seed, []).extend(jl)


def scan_pe_and_sr(cfg, bams, valid_regions, svs, sr_svs, sr_store, libs):
    """shortpe.h:285-533, parallel over the scan plane.

    Two levels of concurrency around one serial merge:

    - per-sample drivers (one per BAM, reference shortpe.h:314-319
      spawns one ThreadPool task per file) walk their chromosomes and
      fan out phase-A shard tasks;
    - chromosome-interval row shards (SURVEY §7.7): the expensive
      row-local work (view decode, CIGAR aggregates, gates, junction
      parsing) runs per contiguous row range on a shared worker pool;
    - phase B (the order-sensitive mate pairing) then replays the
      concatenated candidates per (file, chromosome) in deterministic
      order, so outputs are byte-identical for ANY worker count
      (asserted by tests/test_scan_shard.py).
    """
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from delly_tpu.parallel import hostaxis

    header = bams[0].header
    nsvt = 2 * SVT_TRANS
    sr_br = [[] for _ in range(nsvt)]
    bam_records = [[] for _ in range(nsvt)]
    valid_mask = np.asarray([bool(v) for v in valid_regions], dtype=bool)
    _log("Paired-end and split-read scanning")

    nproc = hostaxis.process_count()
    plan_all = [ri for ri in range(header.n_targets) if valid_regions[ri]]
    nworkers = max(1, int(getattr(cfg, "max_threads", 1) or 1))
    import os as _os
    shard_rows = int(_os.environ.get("DELLY_TPU_SCAN_SHARD_ROWS",
                                     str(1 << 18)))
    pool = ThreadPoolExecutor(nworkers) if nworkers > 1 else None
    # bound not-yet-executed shard closures (each pins its view)
    gate = threading.Semaphore(nworkers * 4)

    def full_chrom(ref_index, ivs):
        return (len(ivs) == 1 and ivs[0][0] <= 0
                and ivs[0][1] >= header.lengths[ref_index])

    def drive_file(file_c, bam):
        """Phase-A producer for one sample: sequential chromosome
        views (the reader prefetches tid+1 in background), sharded
        row-range tasks on the shared pool. Under the host axis each
        process decodes ONLY its owned plan slots; the exchanged
        products replay in full plan order (byte-identical)."""
        lib = libs[file_c]
        out = []
        plan = (hostaxis.partition_plan(plan_all) if nproc > 1
                else plan_all)
        # deepen the reader's background decode pipeline so view
        # inflate/SoA scans for upcoming chromosomes overlap phase A
        bam.set_decode_workers(nworkers, plan)
        for ref_index in plan:
            view = bam.chrom(ref_index)
            ivs = valid_regions[ref_index]
            fc = full_chrom(ref_index, ivs)
            n = len(view)
            want = max(1, min(-(-n // shard_rows), nworkers * 2))
            futs = []
            for lo, hi in _shard_bounds(n, want):
                if pool is None:
                    futs.append(_scan_phase_a(
                        cfg, view, lib, ref_index, ivs, fc, valid_mask,
                        lo, hi))
                else:
                    gate.acquire()

                    def job(v=view, ri=ref_index, iv=ivs, f=fc,
                            a=lo, b=hi):
                        try:
                            return _scan_phase_a(cfg, v, lib, ri, iv,
                                                 f, valid_mask, a, b)
                        finally:
                            gate.release()

                    futs.append(pool.submit(job))
            out.append((ref_index, futs))
        return out

    drivers = None
    try:
        if pool is not None and len(bams) > 1:
            drivers = ThreadPoolExecutor(len(bams))
            plan_futs = [drivers.submit(drive_file, fc, bam)
                         for fc, bam in enumerate(bams)]
        else:
            plan_futs = None

        # Deterministic merge: files in order, chromosomes in order,
        # shards in row order — identical record/junction sequences to
        # the serial scan for any worker count. File 0's phase B starts
        # as soon as its own shards land (no all-file barrier); later
        # files keep scanning concurrently. Under the host axis the
        # owned-chromosome products are exchanged first, and the same
        # full-plan replay runs on every process.
        merged_products = None
        if nproc > 1:
            products = {}
            for file_c, bam in enumerate(bams):
                plan = (plan_futs[file_c].result()
                        if plan_futs is not None
                        else drive_file(file_c, bam))
                for ref_index, futs in plan:
                    parts = [f if isinstance(f, tuple) else f.result()
                             for f in futs]
                    rb: dict = {}
                    _merge_read_bp(rb, [p[0] for p in parts])
                    ca = _merge_cands([p[1] for p in parts])
                    products[(file_c, ref_index)] = (rb, ca)
            merged_products = hostaxis.exchange_owned(products)

        for file_c, bam in enumerate(bams):
            if merged_products is None:
                plan = (plan_futs[file_c].result()
                        if plan_futs is not None
                        else drive_file(file_c, bam))
            else:
                plan = [(ri, None) for ri in plan_all]
            lib = libs[file_c]
            matetra = {}
            read_bp = {}
            per_file_sr = [[] for _ in range(nsvt)]
            for ref_index, futs in plan:
                if merged_products is not None:
                    rb, ca = merged_products[(file_c, ref_index)]
                    _merge_read_bp(read_bp, [rb])
                else:
                    parts = [f if isinstance(f, tuple) else f.result()
                             for f in futs]
                    _merge_read_bp(read_bp, [p[0] for p in parts])
                    ca = _merge_cands([p[1] for p in parts])
                _scan_phase_b(cfg, lib, ref_index, ca, bam_records,
                              matetra)
            for jv in read_bp.values():
                jv.sort(key=lambda j: j.sort_key())
            fetch_sr_only(cfg, read_bp, per_file_sr)
            for svt in range(nsvt):
                sr_br[svt].extend(per_file_sr[svt])
    finally:
        if drivers is not None:
            drivers.shutdown(wait=True)
        if pool is not None:
            pool.shutdown(wait=True)

    _log("Split-read clustering")
    for svt in range(nsvt):
        if cfg.svtset and svt not in cfg.svtset:
            continue
        if not sr_br[svt]:
            continue
        sr_br[svt].sort(key=lambda r: r.sort_key())
        cluster_sr(sr_br[svt], sr_svs, svt, cfg.nchr, cfg.max_read_sep,
                   cfg.graph_pruning, cfg.min_clique_size)

    _log("Paired-end clustering")
    varisize = get_variability(libs)
    for svt in range(nsvt):
        if cfg.svtset and svt not in cfg.svtset:
            continue
        if not bam_records[svt]:
            continue
        bam_records[svt].sort(key=lambda r: r.sort_key())
        cluster_pe(bam_records[svt], svs, varisize, svt, cfg.graph_pruning,
                   cfg.min_clique_size)

    # Track split-reads (shortpe.h:514-525). unordered_map::insert
    # keeps the FIRST svid for a duplicate (rstart, id) key —
    # setdefault, not assignment.
    for svt in range(nsvt):
        for r in sr_br[svt]:
            if r.svid != -1 and r.rstart != -1:
                if r.rstart < header.lengths[r.chr]:
                    sr_store[r.chr].setdefault((r.rstart, r.id), r.svid)
                if r.chr != r.chr2 and r.rstart < header.lengths[r.chr2]:
                    sr_store[r.chr2].setdefault((r.rstart, r.id), r.svid)


def fetch_sr_only(cfg, read_bp, br):
    """shortpe.h:456-461 (no bridgeInsertions in sr mode)."""
    from delly_tpu.models.junctions import (
        select_deletions, select_duplications, select_insertions,
        select_inversions, select_translocations,
    )
    s = cfg.svtset
    if not s or 2 in s:
        select_deletions(read_bp, br, cfg.max_read_sep, cfg.min_ref_sep)
    if not s or 3 in s:
        select_duplications(read_bp, br, cfg.max_read_sep, cfg.min_ref_sep)
    if not s or 0 in s or 1 in s:
        select_inversions(read_bp, br, cfg.max_read_sep, cfg.min_ref_sep)
    if not s or 4 in s:
        select_insertions(read_bp, br, cfg.max_read_sep, cfg.min_ref_sep)
    if not s or any(t in s for t in range(SVT_TRANS, SVT_TRANS + 4)):
        select_translocations(read_bp, br, cfg.max_read_sep)


def assemble_split_reads(cfg, bams, fasta, valid_regions, sr_store, svs):
    """shortpe.h:48-282."""
    from delly_tpu.parallel import hostaxis

    header = bams[0].header
    _log("Split-read assembly")
    sc = DnaScore(cfg.match, cfg.mismatch, cfg.gap_open, cfg.gap_ext)
    tra_store = [dict() for _ in svs]  # seq -> qual (insertion ordered)
    # Phase 1 — read-window collection for every chromosome (an SV's
    # reads live on its own chromosome, so one global store is safe).
    # Collection (BAM decode + record parse, host-axis sharded by
    # chromosome) is split from application (cap/dedup/insert, replayed
    # in serial chromosome/bam/row order on every process so the
    # stores fill identically at any process count).
    seq_store = [dict() for _ in svs]
    nproc = hostaxis.process_count()
    plan = [ri for ri in range(header.n_targets)
            if valid_regions[ri] and sr_store[ri]]
    plan_mine = hostaxis.partition_plan(plan) if nproc > 1 else plan
    visited = set(plan)
    for bam in bams:
        bam.set_decode_workers(getattr(cfg, "max_threads", 1) or 1,
                               plan_mine)

    def collect_chrom(ref_index):
        """Ordered (svid, adjusted-seq, mapq) contributions of one
        chromosome, bam-major in file order (shortpe.h:88-101 SoA
        prefilter: only reads whose start position matches an SR-store
        entry are parsed)."""
        hits = set(pos for pos, _h in sr_store[ref_index])
        hit_arr = np.fromiter(hits, dtype=np.int64, count=len(hits))
        contrib = []
        for bam in bams:
            view = bam.chrom(ref_index)
            flag_a = view["flag"]
            keep = (((flag_a & (FQCFAIL | FDUP | FUNMAP | FSECONDARY
                                | FSUPPLEMENTARY)) == 0)
                    & (view["mapq"] >= cfg.min_map_qual))
            sel = np.nonzero(keep)[0]
            inhits = np.isin(view["pos"][sel], hit_arr)
            for off in view["offsets"][sel[inhits]].tolist():
                rec = view.parse_at(off)
                seed = hash_sr(rec.qname, rec.flag)
                svid = sr_store[ref_index].get((rec.pos, seed))
                if svid is None:
                    continue
                sequence = rec.seq
                bp_point = False
                if is_translocation(svs[svid].svt):
                    bp_point = rec.tid == svs[svid].chr2
                elif svs[svid].svt == 0:
                    bp_point = rec.pos + 25 > svs[svid].svStart
                elif svs[svid].svt == 1:
                    bp_point = rec.pos + 25 > svs[svid].svEnd
                sequence = adjust_orientation(sequence, bp_point,
                                              svs[svid].svt)
                contrib.append((svid, sequence, rec.mapq))
        return contrib

    contribs = {ri: collect_chrom(ri) for ri in plan_mine}
    if nproc > 1:
        contribs = hostaxis.exchange_owned(contribs)
    for ref_index in plan:
        for svid, sequence, mapq in contribs[ref_index]:
            if len(seq_store[svid]) < cfg.max_read_per_sv:
                if is_translocation(svs[svid].svt):
                    if sequence not in tra_store[svid]:
                        tra_store[svid][sequence] = mapq
                else:
                    if sequence not in seq_store[svid]:
                        seq_store[svid][sequence] = mapq
    del contribs

    # Phase 2 — one GLOBAL cross-SV batched LCS + lockstep MSA over
    # every chromosome's SVs: a single device dispatch per guide-tree
    # depth instead of one per chromosome (dispatch round trips
    # dominate on remote/tunneled devices).
    from delly_tpu.ops.msa import (
        distance_matrix_from_lcs, lcs_pairs, msa_batch,
    )
    sv_seqs = {}
    pair_slices = {}
    all_pairs = []
    for svid in range(len(svs)):
        if is_translocation(svs[svid].svt) or len(seq_store[svid]) <= 1:
            continue
        seqs = list(seq_store[svid].keys())
        sv_seqs[svid] = seqs
        start = len(all_pairs)
        all_pairs.extend((seqs[i], seqs[j])
                         for i in range(len(seqs))
                         for j in range(i + 1, len(seqs)))
        pair_slices[svid] = (start, len(all_pairs))
    ls_all = lcs_pairs(all_pairs)
    batch_ids = [svid for svid in sv_seqs]
    batch_items = []
    for svid in batch_ids:
        lo, hi = pair_slices[svid]
        batch_items.append((sv_seqs[svid],
                            distance_matrix_from_lcs(
                                sv_seqs[svid], ls_all[lo:hi])))
    consensi = dict(zip(batch_ids,
                        msa_batch(batch_items, cfg.min_clique_size, sc)))

    # Phase 3 — per-chromosome breakpoint refinement against the
    # reference slice (host/native DP; shortpe.h:174-205).
    for ref_index in range(header.n_targets):
        if ref_index not in visited:
            continue
        seq = None
        for svid in range(len(svs)):
            if is_translocation(svs[svid].svt):
                continue
            if svs[svid].chr != ref_index:
                continue
            if len(seq_store[svid]) <= 1:
                svs[svid].consensus = ""
                svs[svid].srSupport = 0
                svs[svid].srAlignQuality = 0
                continue
            if seq is None:
                seq = fasta.fetch(header.names[ref_index])
            _, svs[svid].consensus = consensi[svid]
            if not align_consensus(cfg, header.lengths, seq, None, svs[svid]):
                svs[svid].consensus = ""
                svs[svid].srSupport = 0
                svs[svid].srAlignQuality = 0
            else:
                quals = sorted(seq_store[svid].values())
                svs[svid].mapq = sum(quals)
                svs[svid].srMapQuality = quals[len(quals) // 2]
                svs[svid].srSupport = len(seq_store[svid])

    # Translocations (shortpe.h:208-273)
    for ref_index2 in range(header.n_targets):
        if not valid_regions[ref_index2]:
            continue
        snd_seq = None
        for ref_index in range(ref_index2 + 1, header.n_targets):
            if not valid_regions[ref_index]:
                continue
            seq = None
            for svid in range(len(svs)):
                if not is_translocation(svs[svid].svt):
                    continue
                if svs[svid].chr != ref_index or svs[svid].chr2 != ref_index2:
                    continue
                if len(tra_store[svid]) <= 1:
                    svs[svid].consensus = ""
                    svs[svid].srSupport = 0
                    svs[svid].srAlignQuality = 0
                    continue
                if seq is None:
                    seq = fasta.fetch(header.names[ref_index])
                if snd_seq is None:
                    snd_seq = fasta.fetch(header.names[ref_index2])
                seqs = list(tra_store[svid].keys())
                _, svs[svid].consensus = msa(seqs, cfg.min_clique_size, sc)
                if not align_consensus(cfg, header.lengths, seq, snd_seq,
                                       svs[svid]):
                    svs[svid].consensus = ""
                    svs[svid].srSupport = 0
                    svs[svid].srAlignQuality = 0
                else:
                    quals = sorted(tra_store[svid].values())
                    svs[svid].mapq = sum(quals)
                    svs[svid].srMapQuality = quals[len(quals) // 2]
                    svs[svid].srSupport = len(tra_store[svid])


def merge_sort(pe: list, sr: list) -> None:
    """Augment PE SVs with SR info; append SR-only SVs (shortpe.h:536-621).

    Single sorted pass: the reference re-sorts `pe` after every SR-only
    push_back, but appended records are PRECISE and the augment test
    skips precise records, so they can never match a later SR record —
    collecting them aside and merging with one final sort yields the
    same result in O((P+S) log(P+S)) instead of O(S·P log P).
    """
    pe.sort(key=lambda s: s.sort_key())
    sr.sort(key=lambda s: s.sort_key())
    import bisect
    import copy

    def _live_key(s):
        # tags.h:104-108 operator< tuple, read from the LIVE record
        return (s.chr, s.svStart, s.chr2, s.svEnd, -s.peSupport,
                -s.srSupport)

    # `keys` mirrors the reference's pe vector exactly: live values,
    # position-synced, possibly locally unsorted after an in-place
    # augmentation until the next push_back re-sort — lower_bound and
    # the window-scan break then see the same (stale-ordered) data the
    # reference sees (shortpe.h:553-579).
    keys = [_live_key(s) for s in pe]
    for svt in range(10):
        for i in range(len(sr)):
            if sr[i].svt != svt:
                continue
            if sr[i].srSupport == 0 or sr[i].srAlignQuality == 0:
                continue
            search_window = 500
            sv_exists = False
            target = (sr[i].chr, max(0, sr[i].svStart - search_window),
                      sr[i].chr, sr[i].svEnd, 0, 0)
            it = bisect.bisect_left(keys, target)
            while it < len(pe) and abs(pe[it].svStart - sr[i].svStart) < search_window:
                other = pe[it]
                it += 1
                if other.svt != svt or other.precise:
                    continue
                if sr[i].chr != other.chr or sr[i].chr2 != other.chr2:
                    continue
                if (other.svStart + other.ciposlow < sr[i].svStart
                        < other.svStart + other.ciposhigh
                        and other.svEnd + other.ciendlow < sr[i].svEnd
                        < other.svEnd + other.ciendhigh):
                    sv_exists = True
                    other.svStart = sr[i].svStart
                    other.svEnd = sr[i].svEnd
                    other.ciposlow = sr[i].ciposlow
                    other.ciposhigh = sr[i].ciposhigh
                    other.ciendlow = sr[i].ciendlow
                    other.ciendhigh = sr[i].ciendhigh
                    other.srMapQuality = sr[i].srMapQuality
                    other.srSupport = sr[i].srSupport
                    other.insLen = sr[i].insLen
                    other.homLen = sr[i].homLen
                    other.srAlignQuality = sr[i].srAlignQuality
                    other.precise = True
                    other.consensus = sr[i].consensus
                    other.consBp = sr[i].consBp
                    other.mapq += sr[i].mapq
                    keys[it - 1] = _live_key(other)
            if sv_exists:
                continue
            # SR-only: suppress precise duplicates (shortpe.h:584-613)
            prec_window = 10
            precise_duplicate = False
            for j in range(i + 1, len(sr)):
                if abs(sr[i].svStart - sr[j].svStart) > prec_window:
                    break
                if sr[i].svt != sr[j].svt:
                    continue
                if sr[i].chr != sr[j].chr or sr[i].chr2 != sr[j].chr2:
                    continue
                if (sr[j].svStart + sr[j].ciposlow <= sr[i].svStart
                        <= sr[j].svStart + sr[j].ciposhigh
                        and sr[j].svEnd + sr[j].ciendlow <= sr[i].svEnd
                        <= sr[j].svEnd + sr[j].ciendhigh):
                    if (sr[i].srSupport < sr[j].srSupport
                            or (i < j and sr[i].srSupport == sr[j].srSupport)):
                        precise_duplicate = True
            for j in range(i - 1, -1, -1):
                if abs(sr[i].svStart - sr[j].svStart) > prec_window:
                    break
                if sr[i].svt != sr[j].svt:
                    continue
                if sr[i].chr != sr[j].chr or sr[i].chr2 != sr[j].chr2:
                    continue
                if (sr[j].svStart + sr[j].ciposlow < sr[i].svStart
                        < sr[j].svStart + sr[j].ciposhigh
                        and sr[j].svEnd + sr[j].ciendlow < sr[i].svEnd
                        < sr[j].svEnd + sr[j].ciendhigh):
                    if (sr[i].srSupport < sr[j].srSupport
                            or (i < j and sr[i].srSupport == sr[j].srSupport)):
                        precise_duplicate = True
            if not precise_duplicate:
                # push_back + immediate re-sort (shortpe.h:615-616):
                # the re-sort also repairs augmentation-perturbed
                # ordering. Timsort on the nearly-sorted list is
                # O(P) per append — the reference pays O(P log P).
                pe.append(copy.deepcopy(sr[i]))
                pe.sort(key=lambda s: s.sort_key())
                keys = [_live_key(s) for s in pe]


def run_sr(cfg) -> int:
    """Main sr driver (delly.h:86-196)."""
    from delly_tpu.models.genotype_sr import annotate_coverage
    from delly_tpu.models.vcf_out import vcf_output

    bams = [BamFile(f, genome=cfg.genome) for f in cfg.files]
    header = bams[0].header
    cfg.nchr = header.n_targets
    if not cfg.sample_names:
        import os
        cfg.sample_names = [
            b.header.sample_name(os.path.splitext(os.path.basename(f))[0])
            for b, f in zip(bams, cfg.files)]
    fasta = FastaFile(cfg.genome)
    try:
        valid_regions = parse_exclude_intervals(cfg.exclude or None,
                                                header)
    except ValueError as exc:
        print(exc, file=sys.stderr)
        return 1
    libs = [get_library_params(b, valid_regions, cfg.mad_cutoff,
                               cfg.mad_normal_cutoff) for b in bams]
    for i, lib in enumerate(libs):
        if lib.rs == 0:
            print(f"Sample has not enough data to estimate library "
                  f"parameters! File: {cfg.files[i]}", file=sys.stderr)
            return 1

    svs: list = []
    if not cfg.vcffile:
        sr_svs: list = []
        sr_store = [dict() for _ in range(cfg.nchr)]
        scan_pe_and_sr(cfg, bams, valid_regions, svs, sr_svs, sr_store, libs)
        assemble_split_reads(cfg, bams, fasta, valid_regions, sr_store,
                             sr_svs)
        merge_sort(svs, sr_svs)
    else:
        from delly_tpu.models.vcf_in import vcf_parse
        svs = vcf_parse(cfg.vcffile, header)

    svs.sort(key=lambda s: s.sort_key())
    for i, sv in enumerate(svs):
        sv.id = i

    jct_map, rc_map, span_map = [], [], []
    if svs:
        jct_map, rc_map, span_map = annotate_coverage(cfg, bams, fasta, libs,
                                                      svs)
    from delly_tpu.parallel import hostaxis
    if hostaxis.is_writer():
        vcf_output(cfg, header, svs, jct_map, rc_map, span_map)
        _log("Sample statistics")
        for i, lib in enumerate(libs):
            print(f"Sample:{cfg.sample_names[i]},ReadSize={lib.rs},"
                  f"Median={lib.median},MAD={lib.mad},"
                  f"UniqueDiscordantPairs={lib.abnormal_pairs}",
                  file=sys.stderr)
    hostaxis.barrier("sr-done")
    _log("Done.")
    return 0
