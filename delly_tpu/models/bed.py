"""BED interval parsing (reference: src/bed.h).

gzip-aware BED parsing into per-chromosome sorted, merged interval lists
(the role of boost::icl interval sets in the reference, bed.h:27-68).
"""

from __future__ import annotations

import gzip


def _open_maybe_gzip(path: str):
    with open(path, "rb") as fh:
        magic = fh.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rt")
    return open(path)


def merge_intervals(ivals: list) -> list:
    """Sorted union of [start, end) intervals."""
    if not ivals:
        return []
    ivals = sorted(ivals)
    out = [list(ivals[0])]
    for lo, hi in ivals[1:]:
        if lo <= out[-1][1]:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return [tuple(x) for x in out]


def parse_bed_intervals(path: str, header) -> list:
    """Per-tid merged interval lists (bed.h:27-68). Lines whose
    chromosome is not in the BAM header are skipped."""
    regions = [[] for _ in range(header.n_targets)]
    with _open_maybe_gzip(path) as fh:
        for line in fh:
            # reference tokenizer accepts space/tab/comma/semicolon
            # (bed.h:47 char_separator " \t,;")
            toks = line.replace(",", " ").replace(";", " ").split()
            if len(toks) < 3:
                continue
            tid = header.name2id(toks[0])
            if tid < 0:
                continue
            try:
                start, end = int(toks[1]), int(toks[2])
            except ValueError:
                continue
            if start < end:
                regions[tid].append((start, end))
    return [merge_intervals(r) for r in regions]
