"""Library insert-size statistics (reference util.h:771-891)."""

from __future__ import annotations

from dataclasses import dataclass

from delly_tpu.io.bam import (
    FDUP, FMUNMAP, FPAIRED, FQCFAIL, FREAD2, FSECONDARY, FSUPPLEMENTARY,
    FUNMAP,
)
from delly_tpu.utils.tags import get_sv_type


@dataclass
class LibraryInfo:
    """util.h:29-40."""
    rs: int = 0
    median: int = 0
    mad: int = 0
    minNormalISize: int = 0
    minISizeCutoff: int = 0
    maxNormalISize: int = 0
    maxISizeCutoff: int = 0
    abnormal_pairs: int = 0


def _median_nth(values: list) -> int:
    """nth_element-style median: element at index n//2 of the sorted list."""
    s = sorted(values)
    return s[len(s) // 2]


def get_library_params(bam, valid_regions, mad_cutoff: int = 9,
                       mad_normal_cutoff: int = 5) -> LibraryInfo:
    """Estimate read-size and insert-size stats for one BAM.

    Mirrors util.h getLibraryParams: sample up to 1M reads/pairs within the
    valid regions, median/MAD of |isize|, cutoffs with deletion sanity floors.
    """
    lib = LibraryInfo()
    max_screened = 10_000_000
    max_num = 1_000_000
    min_num = 1_000
    aligned = 0
    num_pairs = 0
    num_reads = 0
    rplus = 0
    nonrplus = 0
    isizes = []
    readsizes = []
    done = False
    for ref_index in range(bam.header.n_targets):
        if not valid_regions[ref_index]:
            continue
        for rec in bam.records(tid=ref_index):
            if (rec.flag & FREAD2) or rec.l_qseq >= 65000:
                continue
            if rec.flag & (FSECONDARY | FQCFAIL | FDUP | FSUPPLEMENTARY | FUNMAP):
                continue
            if (aligned > max_screened
                    or (num_reads >= max_num and num_pairs == 0)
                    or num_pairs >= max_num):
                done = True
                break
            aligned += 1
            if num_reads < max_num:
                readsizes.append(rec.l_qseq)
                num_reads += 1
            if (rec.flag & FPAIRED) and not (rec.flag & FMUNMAP) and rec.tid == rec.mtid:
                if num_pairs < max_num:
                    isizes.append(abs(rec.tlen))
                    if get_sv_type(rec.flag, rec.pos, rec.mpos) == 2:
                        rplus += 1
                    else:
                        nonrplus += 1
                    num_pairs += 1
        if done:
            break
    if num_reads >= min_num:
        lib.rs = _median_nth(readsizes)
    if num_pairs >= min_num:
        median = _median_nth(isizes)
        mad = _median_nth([abs(i - median) for i in isizes])
        if 50 <= median <= 100000:
            if rplus < nonrplus:
                import sys
                print("Warning: Sample has a non-default paired-end layout!",
                      file=sys.stderr)
            else:
                lib.median = median
                lib.mad = mad
                lib.maxNormalISize = median + mad_normal_cutoff * mad
                lib.minNormalISize = max(0, median - mad_normal_cutoff * mad)
                lib.maxISizeCutoff = median + mad_cutoff * mad
                lib.minISizeCutoff = max(0, median - mad_cutoff * mad)
                # Deletion insert-size sanity checks (util.h:875-877)
                lib.maxISizeCutoff = max(lib.maxISizeCutoff, 2 * lib.rs, 500)
    return lib


def get_variability(libs: list) -> int:
    """util.h:759-768."""
    v = 0
    for lib in libs:
        v = max(v, lib.maxNormalISize, lib.rs)
    return v


def parse_exclude_intervals(exclude_path, header):
    """Valid-region interval lists per chromosome (util.h:666-740).

    Returns list (per tid) of sorted [start, end) tuples. With no exclude
    file, each chromosome is one full interval.
    """
    n = header.n_targets
    excl = [[] for _ in range(n)]
    valid_chr = [True] * n
    if exclude_path:
        with open(exclude_path) as fh:
            for line in fh:
                toks = [t for t in line.replace(",", " ").replace(";", " ").split()]
                if not toks:
                    continue
                tid = header.name2id(toks[0])
                if tid < 0:
                    continue
                if len(toks) >= 3:
                    start, end = int(toks[1]), int(toks[2])
                    if start < end:
                        excl[tid].append((start, end))
                    else:
                        raise ValueError(f"bad exclude line: {line!r}")
                else:
                    valid_chr[tid] = False
    valid = [[] for _ in range(n)]
    for tid in range(n):
        if not valid_chr[tid]:
            continue
        # boost::icl joins overlapping intervals; emulate by merging.
        merged = []
        for s, e in sorted(excl[tid]):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        istart = 0
        for s, e in merged:
            if istart + 1 < s:
                valid[tid].append((istart, s - 1))
            istart = e
        if istart + 1 < header.lengths[tid]:
            valid[tid].append((istart, header.lengths[tid]))
    return valid
