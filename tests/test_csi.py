"""CSI index loffset semantics (htslib hts_itr_query compatibility).

A long record lands in a parent bin and sits earlier in the file than
the first record of a later leaf bin. Readers compute min_off from the
query-start bin's loff and discard chunks ending at or before it, so the
loff must come from a linear index over 16kb windows, not from each
bin's own chunks (reference: htslib bcf_index_build / hts_idx_push).
"""

import struct

from delly_tpu.io.bgzf import bgzf_compress
from delly_tpu.io.csi import (DEPTH, MIN_SHIFT, build_csi, read_csi,
                              reg2bin, _bin_first_pos)


def _query_chunks(refs, tid, qbeg, qend):
    """htslib-style region query: overlapping bins at every level, with
    chunks ending at/before the query-start bin's loff discarded."""
    bins = refs[tid]
    # candidate bins: all levels overlapping [qbeg, qend)
    cand = []
    t = 0
    for level in range(DEPTH + 1):
        s = MIN_SHIFT + 3 * (DEPTH - level)
        for b in range(t + (qbeg >> s), t + ((qend - 1) >> s) + 1):
            if b in bins:
                cand.append(b)
        t += 1 << (3 * level)
    # min_off: loff of the finest-level bin containing qbeg that exists,
    # walking up to parents when absent (hts_itr_query behavior).
    min_off = 0
    b = reg2bin(qbeg, qbeg + 1)
    while True:
        if b in bins:
            min_off = bins[b][0]  # we re-read loff below
            break
        if b == 0:
            break
        b = (b - 1) >> 3
    return cand, min_off


def test_parent_bin_record_survives_leaf_query():
    # Build a fake BCF body: one BGZF block, records at known offsets.
    payload = bytes(range(256)) * 8
    stream = bgzf_compress(payload)
    # Record A: a long SV spanning several 16kb windows -> parent bin.
    # Record B: short record much later in the same leaf-bin range.
    beg_a, end_a = 10_000, 200_000       # spans windows 0..12
    beg_b, end_b = 180_000, 180_100      # leaf bin near window 10
    records = [(0, beg_a, end_a, 0), (0, beg_b, end_b, 512)]
    idx = build_csi(stream, 1, records)
    min_shift, depth, refs = read_csi(idx)
    assert (min_shift, depth) == (MIN_SHIFT, DEPTH)

    bins = refs[0]
    bin_a = reg2bin(beg_a, end_a)
    bin_b = reg2bin(beg_b, end_b)
    assert bin_a != bin_b  # A really is in a coarser bin

    # Reconstruct loffs: read_csi returns chunks only; re-parse raw for
    # loff values.
    from delly_tpu.io.bgzf import bgzf_decompress
    raw = bgzf_decompress(idx)
    pos = 4 + 12 + 4
    loffs = {}
    (n_bin,) = struct.unpack_from("<i", raw, pos)
    pos += 4
    for _ in range(n_bin):
        b, loff = struct.unpack_from("<IQ", raw, pos)
        pos += 12
        (n_chunk,) = struct.unpack_from("<i", raw, pos)
        pos += 4 + 16 * n_chunk
        loffs[b] = loff

    # A query starting inside record A's span but in B's leaf-bin region
    # must not discard record A's chunk: A's chunk end > loff(bin of the
    # query start).
    qbeg = 180_050
    leaf = reg2bin(qbeg, qbeg + 1)
    # walk up to the first bin present in the index
    while leaf not in loffs and leaf:
        leaf = (leaf - 1) >> 3
    min_off = loffs.get(leaf, 0)
    chunk_a_end = bins[bin_a][0][1]
    assert chunk_a_end > min_off, (
        "record A's chunk would be discarded by min_off filtering")
    # and the linear-index loff points at/before record A's start
    chunk_a_beg = bins[bin_a][0][0]
    assert min_off <= chunk_a_beg


def test_bin_first_pos_levels():
    # level 0 root covers position 0
    assert _bin_first_pos(0) == 0
    # first level-5 (leaf) bin starts at 0, second at 16kb
    t_leaf = sum(1 << (3 * k) for k in range(DEPTH))  # bins before leaves
    assert _bin_first_pos(t_leaf) == 0
    assert _bin_first_pos(t_leaf + 1) == 1 << MIN_SHIFT
    # level-1 bins cover 8^4 * 16kb each
    assert _bin_first_pos(2) == 1 << (MIN_SHIFT + 3 * (DEPTH - 1))
