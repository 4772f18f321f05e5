"""Read-depth scan windows and CN2-stable window selection.

Reference: src/scan.h — 10kb (or BED-provided) windows, midpoint fragment
counting with an insert-size filter, uniq-MAPQ fraction, and
median±MAD-based selection of copy-number-2-stable windows that anchor
the GC bias model.
"""

from __future__ import annotations

from dataclasses import dataclass

import sys

import numpy as np

from delly_tpu.io.bam import (
    FDUP, FMUNMAP, FPAIRED, FQCFAIL, FSECONDARY, FSUPPLEMENTARY, FUNMAP,
)
from delly_tpu.models.depth import add_base_coverage

from delly_tpu.utils.log import stage


@dataclass
class ScanWindow:
    """scan.h:20-33."""
    select: bool = False
    start: int = 0
    end: int = 0
    cov: int = 0
    uniqcov: int = 0


def est_count_bounds(scan_counts: list):
    """Median ± MAD coverage bounds over selected windows
    (scan.h:51-70)."""
    all_cov = [w.cov for chrom in scan_counts for w in chrom if w.select]
    if not all_cov:
        return 0, 0
    arr = np.sort(np.asarray(all_cov, dtype=np.int64))
    median = int(arr[len(arr) // 2])
    absdev = np.sort(np.abs(arr - median))
    mad = int(absdev[len(absdev) // 2])
    lower = median - mad if mad < median else 0
    return lower, median + mad


def scan(cfg, bam, fasta, li, scan_counts: list) -> None:
    """Window fragment counting (scan.h:72-231). Mutates scan_counts
    (per-chromosome ScanWindow lists)."""
    header = bam.header
    stage("Scanning Windows")

    if cfg.scan_file:
        from delly_tpu.models.bed import parse_bed_intervals
        scan_regions = parse_bed_intervals(cfg.scan_file, header)
        for ref_index in range(header.n_targets):
            for lo, hi in scan_regions[ref_index]:
                if lo < hi and hi < header.lengths[ref_index]:
                    scan_counts[ref_index].append(
                        ScanWindow(select=True, start=lo, end=hi))
            scan_counts[ref_index].sort(key=lambda w: (w.start, w.end))

    from delly_tpu.io.bam import default_decode_workers
    from delly_tpu.parallel import hostaxis
    bam.set_decode_workers(default_decode_workers())
    nproc = hostaxis.process_count()

    def fill_chrom(ref_index, wins):
        """One chromosome's window fill into `wins`; returns the
        chromosome's total_cov contribution (host-axis unit: the
        cross-chromosome small-chromosome gate replays after the
        exchange)."""
        delta = 0
        reflen = header.lengths[ref_index]
        if not cfg.scan_file:
            bin_of = None
        else:
            bin_of = np.full(reflen, -1, dtype=np.int32)
            # LAST_BIN cap (scan.h:131-137): windows beyond 65534 stay
            # unmapped and collect no fragments
            if len(wins) >= 65535:
                print(f"Warning: Too many scan windows on "
                      f"{header.names[ref_index]}", file=sys.stderr)
            for b, w in enumerate(wins[:65535]):
                bin_of[w.start:w.end] = b

        def find_bin(midpoint):
            if bin_of is not None:
                return int(bin_of[midpoint])
            b = midpoint // cfg.scan_window
            return b if b < reflen // cfg.scan_window else -1

        cov = np.zeros(reflen, dtype=np.uint16) if cfg.basecov else None
        cov_uniq = np.zeros(reflen, dtype=np.uint16) if cfg.basecov else None
        if cfg.basecov:
            for rec in bam.records(tid=ref_index):
                if rec.flag & (FSECONDARY | FQCFAIL | FDUP | FSUPPLEMENTARY
                               | FUNMAP):
                    continue
                if rec.flag & FPAIRED and (rec.flag & FMUNMAP
                                           or rec.tid != rec.mtid):
                    continue
                if rec.mapq < cfg.min_qual:
                    continue
                add_base_coverage(rec, cov, cov_uniq, cfg.mapq_uniq, reflen)
        else:
            # SoA-driven midpoint counting (scan.h:107-198)
            view = bam.chrom(ref_index)
            flag_a = view["flag"]
            keep = (((flag_a & (FSECONDARY | FQCFAIL | FDUP
                                | FSUPPLEMENTARY | FUNMAP)) == 0)
                    & ~(((flag_a & FPAIRED) != 0)
                        & (((flag_a & FMUNMAP) != 0)
                           | (view["mtid"] != ref_index)))
                    & (view["mapq"] >= cfg.min_qual))
            sel = np.nonzero(keep)[0]
            from delly_tpu.models.genotype_sr import _cigar_stats
            from delly_tpu.models.pairing import (
                first_obs_mask, match_store_pop,
            )
            from delly_tpu.utils.hashing import hash_pair_h_batch
            stats = _cigar_stats(view, view["offsets"][sel])
            flag_a = view["flag"][sel]
            pos_a = view["pos"][sel]
            mpos_a = view["mpos"][sel]
            mapq_a = view["mapq"][sel]
            nh_a = stats["name_hash"]
            rspan_a = stats["ref_span"]
            # pair orientation code 2 (tags.h:218-227) for FR layout
            fwd = (flag_a & 16) == 0
            mrev = (flag_a & 32) != 0
            fr2 = np.where(fwd, mrev & (pos_a < mpos_a),
                           (~mrev) & (pos_a > mpos_a))
            paired_a = (flag_a & FPAIRED) != 0
            use = ~paired_a | fr2

            # vectorized mate pairing (scan.h:131-166 automaton)
            pr = np.nonzero(paired_a & use)[0]
            mids = []
            qual_src = []
            if len(pr):
                refs = np.full(len(pr), ref_index, dtype=np.int64)
                p_first = first_obs_mask(pos_a[pr],
                                         pos_a[pr] < mpos_a[pr],
                                         pos_a[pr] == mpos_a[pr],
                                         nh_a[pr])
                hv1 = hash_pair_h_batch(nh_a[pr], refs, pos_a[pr], refs,
                                        mpos_a[pr])
                hv2 = hash_pair_h_batch(nh_a[pr], refs, mpos_a[pr],
                                        refs, pos_a[pr])
                keys = np.where(p_first, hv1, hv2)
                S_loc, _F = match_store_pop(keys, p_first)
                S = pr[S_loc]
                isize = pos_a[S] + rspan_a[S] - mpos_a[S]
                inb = ((isize > li.minNormalISize)
                       & (isize < li.maxNormalISize))
                S = S[inb]
                mids.append(mpos_a[S] + isize[inb] // 2)
                qual_src.append(mapq_a[S])
            up = np.nonzero(~paired_a)[0]
            if len(up):
                mids.append(pos_a[up] + rspan_a[up] // 2)
                qual_src.append(mapq_a[up])
            if mids:
                mid = np.concatenate(mids)
                mq = np.concatenate(qual_src)
                ok = (mid >= 0) & (mid < reflen)
                mid = mid[ok]
                mq = mq[ok]
                if bin_of is not None:
                    bins = bin_of[mid]
                else:
                    bins = mid // cfg.scan_window
                    bins = np.where(bins < reflen // cfg.scan_window,
                                    bins, -1)
                okb = bins >= 0
                bins = bins[okb]
                mq = mq[okb]
                nb = len(wins)
                covb = np.bincount(bins, minlength=nb)
                uniqb = np.bincount(bins[mq >= cfg.mapq_uniq],
                                    minlength=nb)
                for b in np.nonzero(covb)[0].tolist():
                    wins[b].cov += int(covb[b])
                    wins[b].uniqcov += int(uniqb[b])
                delta += int(covb.sum())

        if cfg.basecov:
            nz = np.nonzero(cov)[0]
            for pos in nz:
                b = find_bin(int(pos))
                if b >= 0:
                    w = wins[b]
                    c = int(cov[pos])
                    w.cov += c
                    if 2 * int(cov_uniq[pos]) >= c:
                        w.uniqcov += c
                    delta += 1
        return delta

    def eligible(ref_index):
        """Deterministic per-chromosome gates (scan.h:84-92); the
        total_cov-dependent small-chromosome gate is applied by the
        caller in serial chromosome order."""
        if not bam.mapped_count(ref_index):
            return False
        return header.names[ref_index] not in ("chrX", "chrY", "X", "Y")

    def fresh_wins(ref_index):
        if cfg.scan_file:
            return scan_counts[ref_index]
        allbins = header.lengths[ref_index] // cfg.scan_window
        return [ScanWindow(start=i * cfg.scan_window,
                           end=(i + 1) * cfg.scan_window)
                for i in range(allbins)]

    if nproc > 1:
        # Host axis: owners fill their chromosomes unconditionally
        # (decode-then-drop — the small-chromosome gate needs the
        # serial running total), then every process replays the gate
        # over the exchanged per-chromosome results.
        import copy as _copy
        results = {}
        plan = hostaxis.partition_plan(
            [ri for ri in range(header.n_targets) if eligible(ri)])
        for ref_index in plan:
            wins = (_copy.deepcopy(scan_counts[ref_index])
                    if cfg.scan_file else fresh_wins(ref_index))
            results[ref_index] = (wins, fill_chrom(ref_index, wins))
        merged = hostaxis.exchange_owned(results)
        total_cov = 0
        for ref_index in range(header.n_targets):
            ent = merged.get(ref_index)
            if ent is None:
                continue
            if (header.lengths[ref_index] < cfg.min_chr_len
                    and total_cov > 1000000):
                continue
            scan_counts[ref_index] = ent[0]
            total_cov += ent[1]
        return

    total_cov = 0
    for ref_index in range(header.n_targets):
        if not eligible(ref_index):
            continue
        if (header.lengths[ref_index] < cfg.min_chr_len
                and total_cov > 1000000):
            continue
        wins = fresh_wins(ref_index)
        if not cfg.scan_file:
            scan_counts[ref_index] = wins
        total_cov += fill_chrom(ref_index, wins)


def select_windows(cfg, scan_counts: list) -> None:
    """CN2-stable window selection (scan.h:234-281)."""
    if cfg.no_scan_window_selection:
        for chrom in scan_counts:
            for w in chrom:
                w.select = True
        return
    for chrom in scan_counts:
        for w in chrom:
            uniqratio = w.uniqcov / w.cov if w.cov > 0 else 0.0
            w.select = uniqratio > cfg.unique_to_total_cov_ratio
    if cfg.scan_file:
        for chrom in scan_counts:
            for w in chrom:
                scale = 10000 / (w.end - w.start)
                w.uniqcov = int(w.uniqcov * scale)
                w.cov = int(w.cov * scale)
    lower, upper = est_count_bounds(scan_counts)
    for chrom in scan_counts:
        for w in chrom:
            if w.select:
                w.select = lower < w.cov < upper
