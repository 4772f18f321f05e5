"""Read-depth track builders for the CNV engine.

Vectorized (numpy) per-chromosome tracks mirroring the reference's
per-base loops: GC-content sliding fragment window (coral.h:142-162),
base-level coverage with a high-MAPQ subtrack (util.h:454-474),
split-read clip collection (util.h:477-499), and the callable /
hom-del-vs-unmappable mask logic (coral.h:260-281).

These are streaming, memory-bound array transforms — the natural home is
vectorized host preprocessing feeding the device window reductions.
"""

from __future__ import annotations

import os

import numpy as np

from delly_tpu.io.bam import (
    CDEL, CDIFF, CEQUAL, CHARD_CLIP, CMATCH, CREF_SKIP, CSOFT_CLIP,
)

MAX_COVERAGE = np.iinfo(np.uint16).max


_GC_MEMO: dict = {}
# cache budget in track bytes (~2 B/bp): covers whole genomes up to
# ~1 Gbp; beyond it the resident prefix is kept (no clear-all thrash)
# and the rest recompute — memory stays bounded either way
_GC_MEMO_BUDGET = int(os.environ.get(
    "DELLY_TPU_GC_MEMO_MB", "2048")) * 1024 * 1024


def gc_content_track(seq: str, meanisize: int, key=None) -> np.ndarray:
    """Per-bp GC count over a centered fragment-sized window
    (coral.h:142-162). Positions within halfwin of either end stay 0.
    `key` (e.g. a chromosome name) memoizes the track across the CNV
    engine's three genome passes."""
    if key is not None:
        hit = _GC_MEMO.get((key, meanisize, len(seq)))
        if hit is not None:
            return hit
    track = _gc_content_track(seq, meanisize)
    if key is not None:
        held = sum(t.nbytes for t in _GC_MEMO.values())
        if held + track.nbytes <= _GC_MEMO_BUDGET:
            _GC_MEMO[(key, meanisize, len(seq))] = track
    return track


def _gc_content_track(seq: str, meanisize: int) -> np.ndarray:
    n = len(seq)
    b = np.frombuffer(seq.encode(), dtype=np.uint8)
    up = b & ~np.uint8(0x20)
    # int32 prefix sums are exact for contigs < 2 Gbp; window sums via
    # shifted slices of the cumsum (no index-array gathers)
    gcref = ((up == ord("C")) | (up == ord("G"))).astype(np.int32)
    gc = np.zeros(n, dtype=np.uint16)
    halfwin = meanisize // 2
    if n <= 2 * halfwin:
        return gc
    cs = np.concatenate(([0], np.cumsum(gcref, dtype=np.int32)))
    gc[halfwin:n - halfwin] = (
        cs[2 * halfwin + 1:n + 1] - cs[:n - 2 * halfwin]).astype(np.uint16)
    return gc


def base_coverage_bulk(view, offsets, mapq_uniq: int, reflen: int):
    """Bulk dual M/=/X base-coverage totals (util.h:454-474) for the
    records at `offsets` of a BamView — native diff-array pass with a
    Python per-record fallback. Returns (total, uniq) int32 arrays,
    un-clamped."""
    try:
        from delly_tpu import native
        bc = native.bam_base_coverage(view.data, offsets, mapq_uniq,
                                      reflen)
        if bc is not None:
            return bc
    except Exception:
        pass
    diff_all = np.zeros(reflen + 1, dtype=np.int32)
    diff_uniq = np.zeros(reflen + 1, dtype=np.int32)
    for off in offsets:
        rec = view.parse_at(int(off))
        uniq = rec.mapq >= mapq_uniq
        rp = rec.pos
        for op, ol in zip(rec.cigar_ops, rec.cigar_lens):
            ol = int(ol)
            if op in (CMATCH, CEQUAL, CDIFF):
                lo = max(rp, 0)
                hi = min(rp + ol, reflen)
                if hi > lo:
                    diff_all[lo] += 1
                    diff_all[hi] -= 1
                    if uniq:
                        diff_uniq[lo] += 1
                        diff_uniq[hi] -= 1
                rp += ol
            elif op in (CDEL, CREF_SKIP):
                rp += ol
    return (np.cumsum(diff_all[:reflen], dtype=np.int32),
            np.cumsum(diff_uniq[:reflen], dtype=np.int32))


def add_base_coverage(rec, cov: np.ndarray, cov_uniq: np.ndarray,
                      mapq_uniq: int, reflen: int) -> None:
    """util.h:454-474 (saturating uint16 increments over M/=/X spans)."""
    unique_read = rec.mapq >= mapq_uniq
    rp = rec.pos
    for op, ol in zip(rec.cigar_ops, rec.cigar_lens):
        ol = int(ol)
        if op in (CMATCH, CEQUAL, CDIFF):
            lo = max(rp, 0)
            hi = min(rp + ol, reflen)
            if hi > lo:
                seg = cov[lo:hi]
                seg[seg < MAX_COVERAGE - 1] += 1
                if unique_read:
                    seg = cov_uniq[lo:hi]
                    seg[seg < MAX_COVERAGE - 1] += 1
            rp += ol
        elif op in (CDEL, CREF_SKIP):
            rp += ol


def add_split_read_breakpoints(rec, min_clip: int, min_ref_sep: int,
                               reflen: int, clips: list) -> None:
    """util.h:477-499."""
    rp = rec.pos
    for op, ol in zip(rec.cigar_ops, rec.cigar_lens):
        ol = int(ol)
        if op in (CMATCH, CEQUAL, CDIFF):
            rp += ol
        elif op == CDEL:
            if ol > min_ref_sep:
                if 0 <= rp < reflen:
                    clips.append(rp)
                if 0 <= rp + ol < reflen:
                    clips.append(rp + ol)
            rp += ol
        elif op == CREF_SKIP:
            rp += ol
        elif op in (CSOFT_CLIP, CHARD_CLIP):
            if ol > min_clip and 0 <= rp < reflen:
                clips.append(rp)


def uniq_content_track(cov_map: np.ndarray, cov_uniq: np.ndarray,
                       seq: str, meanisize: int) -> np.ndarray:
    """Callable mask scaled to meanisize, with zero-coverage runs kept
    callable only when flanked by callable bases and short enough to be a
    plausible homozygous deletion (coral.h:260-281)."""
    n = len(cov_map)
    b = np.frombuffer(seq.encode(), dtype=np.uint8)
    is_n = (b & ~np.uint8(0x20)) == ord("N")
    zero = cov_map == 0
    u = np.where(zero, ~is_n, 2 * cov_uniq.astype(np.uint32)
                 >= cov_map.astype(np.uint32))
    uniq = np.where(u, np.uint16(meanisize), np.uint16(0))

    # Zero-coverage runs: hom-del vs unmappable
    max_hom_del = 1000000
    if zero.any():
        # run starts/ends over the zero mask
        padded = np.concatenate(([False], zero, [False]))
        d = np.diff(padded.astype(np.int8))
        starts = np.where(d == 1)[0]
        ends = np.where(d == -1)[0]
        for rstart, rend in zip(starts, ends):
            left_ok = rstart > 0 and uniq[rstart - 1] > 0
            right_ok = rend < n and uniq[rend] > 0
            if not left_ok or not right_ok or rend - rstart > max_hom_del:
                uniq[rstart:rend] = 0
    return uniq


def set_min_chr_len(target_lens: list, xx: float) -> int:
    """util.h:583-599: smallest chromosome length among the largest
    chromosomes covering fraction xx of the genome."""
    chrlen = sorted(target_lens, reverse=True)
    genomelen = sum(chrlen)
    cumsum = 0
    min_chr_len = 0
    for ln in chrlen:
        cumsum += ln
        min_chr_len = ln
        if cumsum > genomelen * xx:
            break
    return min_chr_len
