"""Library insert-size statistics (reference util.h:771-891)."""

from __future__ import annotations

from dataclasses import dataclass

from delly_tpu.io.bam import (
    FDUP, FMUNMAP, FPAIRED, FQCFAIL, FREAD2, FSECONDARY, FSUPPLEMENTARY,
    FUNMAP,
)


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


def iround(x: float) -> int:
    """boost::math::round/iround — halfway cases away from zero
    (Python's round() is half-to-even, which flips e.g. CN 2.5)."""
    import math
    return int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))


def _nth_element(arr) -> int:
    """nth_element-style median (util.h): np.partition selects the same
    element a sorted copy would hold at index n//2."""
    import numpy as np
    k = len(arr) // 2
    return int(np.partition(np.asarray(arr), k)[k])


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
    # Vectorized over SoA chunks in file order (sequential sam_read1
    # walk of util.h:771-891): record filters, then the aligned/read/
    # pair caps evaluated in stream order. Chunked iteration keeps
    # memory bounded on indexed multi-GB inputs.
    import numpy as np

    nchr = bam.header.n_targets
    valid_arr = np.asarray([bool(v) for v in valid_regions], dtype=bool)
    lens = bam.header.lengths
    # sub-chromosome valid intervals (exclude/scan BEDs): the reference
    # samples inserts via sam_itr_queryi over each interval
    # (util.h:808-811) — reads outside must not enter the statistics
    partial = {t for t in range(nchr)
               if valid_regions[t]
               and not (len(valid_regions[t]) == 1
                        and valid_regions[t][0][0] <= 0
                        and valid_regions[t][0][1] >= lens[t])}
    acc = {k: [] for k in ("flag", "lqseq", "tid", "mtid", "pos",
                           "mpos", "tlen")}
    tot = 0
    tot_pairs = 0
    for view in bam.iter_soa_chunks():
        s = view.soa
        vtid = s["tid"]
        vflag = s["flag"]
        keep = ((vtid >= 0) & valid_arr[np.clip(vtid, 0, nchr - 1)]
                & ((vflag & FREAD2) == 0) & (s["lqseq"] < 65000)
                & ((vflag & (FSECONDARY | FQCFAIL | FDUP
                             | FSUPPLEMENTARY | FUNMAP)) == 0))
        if partial:
            pos_c = s["pos"]
            end_c = pos_c + np.maximum(s["lqseq"], 1)
            for t in np.unique(vtid[keep]).tolist():
                if t not in partial:
                    continue
                m = vtid == t
                sub = np.zeros(len(vtid), dtype=bool)
                for lo, hi in valid_regions[t]:
                    sub |= (pos_c < hi) & (end_c > lo)
                keep &= ~m | sub
        for k in acc:
            acc[k].append(s[k][keep])
        kf = vflag[keep]
        tot += int(keep.sum())
        tot_pairs += int(np.count_nonzero(
            ((kf & FPAIRED) != 0) & ((kf & FMUNMAP) == 0)
            & (vtid[keep] == s["mtid"][keep])))
        if tot > max_screened or tot_pairs >= max_num \
                or (tot >= max_num and tot_pairs == 0):
            break
    flag = np.concatenate(acc["flag"]) if acc["flag"] else \
        np.zeros(0, dtype=np.int32)
    lqseq = np.concatenate(acc["lqseq"]) if acc["lqseq"] else flag
    tid = np.concatenate(acc["tid"]) if acc["tid"] else flag
    mtid = np.concatenate(acc["mtid"]) if acc["mtid"] else flag
    pos = np.concatenate(acc["pos"]) if acc["pos"] else flag
    mpos = np.concatenate(acc["mpos"]) if acc["mpos"] else flag
    tlen = np.concatenate(acc["tlen"]) if acc["tlen"] else flag
    pair = (((flag & FPAIRED) != 0) & ((flag & FMUNMAP) == 0)
            & (tid == mtid))
    pairs_before = np.concatenate(
        ([0], np.cumsum(pair, dtype=np.int64)[:-1]))
    n = len(flag)
    idx = np.arange(n, dtype=np.int64)
    reads_before = np.minimum(idx, max_num)
    capped_pairs = np.minimum(pairs_before, max_num)
    done_mask = ((idx > max_screened)
                 | ((reads_before >= max_num) & (capped_pairs == 0))
                 | (capped_pairs >= max_num))
    stop = int(np.argmax(done_mask)) if done_mask.any() else n
    num_reads = min(stop, max_num)
    readsizes = lqseq[:num_reads]
    pw = np.nonzero(pair[:stop])[0][:max_num]
    num_pairs = len(pw)
    isizes = np.abs(tlen[pw])
    # orientation tally (tags.h:218-227): code 2 = FR default layout
    pf = flag[pw]
    pp = pos[pw]
    pm = mpos[pw]
    fwd = (pf & 16) == 0
    mrev = (pf & 32) != 0
    is_fr = np.where(fwd, mrev & (pp < pm), (~mrev) & (pp > pm))
    rplus = int(np.count_nonzero(is_fr))
    nonrplus = num_pairs - rplus
    if num_reads >= min_num:
        lib.rs = _nth_element(readsizes)
    if num_pairs >= min_num:
        median = _nth_element(isizes)
        mad = _nth_element(np.abs(isizes - median))
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
                elif len(toks) == 2:
                    # chr + start with the end column missing is a
                    # format error in the reference (util.h:716-720),
                    # NOT a whole-chromosome exclusion
                    raise ValueError(
                        "Exclude file needs to be in tab-delimited "
                        f"format: chr, start, end. Offending line: "
                        f"{line!r}")
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


def seq_sum(vals) -> float:
    """Plain left-to-right float accumulation. CPython 3.12+ builtin
    sum() compensates float error (Neumaier), which rounds differently
    from the reference's sequential C loops — use this wherever a sum
    mirrors a reference running total."""
    acc = 0.0
    for v in vals:
        acc += v
    return acc
