"""CSI (coordinate-sorted index) writer for BCF outputs.

Mirrors htslib's `bcf_index_build(path, 14)` used throughout the
reference (modvcf.h:790, merge.h:1213, cnv.h:741): a binning index with
min_shift=14, depth=5, serialized as BGZF-compressed "CSI\\x01".
Virtual file offsets are (compressed_block_offset << 16) | within_block,
derived from the deterministic BGZF block layout of the BCF stream.
"""

from __future__ import annotations

import bisect
import struct

from delly_tpu.io.bgzf import bgzf_compress

MIN_SHIFT = 14
DEPTH = 5


def reg2bin(beg: int, end: int, min_shift: int = MIN_SHIFT,
            depth: int = DEPTH) -> int:
    """Smallest bin containing [beg, end) (CSI spec reg2bin)."""
    end -= 1
    s = min_shift
    t = ((1 << depth * 3) - 1) // 7
    for level in range(depth, 0, -1):
        if beg >> s == end >> s:
            return t + (beg >> s)
        s += 3
        t -= 1 << (level - 1) * 3
    return 0


def _block_table(bcf_bytes: bytes):
    """[(uncompressed_offset, compressed_offset)] for each BGZF block."""
    table = []
    cpos = 0
    upos = 0
    n = len(bcf_bytes)
    while cpos + 18 <= n:
        if bcf_bytes[cpos:cpos + 2] != b"\x1f\x8b":
            break
        xlen = struct.unpack_from("<H", bcf_bytes, cpos + 10)[0]
        bsize = 0
        xoff = 0
        xstart = cpos + 12
        while xoff + 4 <= xlen:
            si1 = bcf_bytes[xstart + xoff]
            si2 = bcf_bytes[xstart + xoff + 1]
            slen = struct.unpack_from("<H", bcf_bytes,
                                      xstart + xoff + 2)[0]
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = struct.unpack_from(
                    "<H", bcf_bytes, xstart + xoff + 4)[0] + 1
            xoff += 4 + slen
        if not bsize:
            break
        isize = struct.unpack_from("<I", bcf_bytes, cpos + bsize - 4)[0]
        table.append((upos, cpos))
        upos += isize
        cpos += bsize
    return table


def _bin_first_pos(b: int, min_shift: int = MIN_SHIFT,
                   depth: int = DEPTH) -> int:
    """Genomic start position covered by bin `b` (CSI bin numbering)."""
    level, t = 0, 0
    while level <= depth:
        nt = t + (1 << (3 * level))
        if b < nt:
            break
        t = nt
        level += 1
    return (b - t) << (min_shift + 3 * (depth - level))


def _voffset(table, uoff: int) -> int:
    """Uncompressed offset -> BGZF virtual offset."""
    lo, hi = 0, len(table)
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        if table[mid][0] <= uoff:
            lo = mid
        else:
            hi = mid
    upos, cpos = table[lo]
    return (cpos << 16) | (uoff - upos)


def build_csi(bcf_bytes: bytes, n_ref: int, records) -> bytes:
    """Build a CSI index for a BCF byte stream.

    records: iterable of (tid, beg, end, uncompressed_offset) in file
    order (beg/end 0-based half-open). Returns BGZF-compressed index.
    """
    table = _block_table(bcf_bytes)
    # bins[tid][bin] = [(voff_beg, voff_end)], loffset per bin
    bins = [dict() for _ in range(n_ref)]
    # linear index over 16kb windows: min virtual start offset of any
    # record overlapping the window (htslib hts_idx_push semantics).
    # Bin loffsets are read from this, not from each bin's own chunks:
    # a long record stored in a parent bin can precede the leaf bin's
    # first chunk in the file, and readers discard chunks ending before
    # loff (hts_itr_query min_off).
    lidx = [dict() for _ in range(n_ref)]
    rec_list = list(records)
    # htslib bcf_index_build grows the depth until the longest interval
    # fits (hts_idx_init n_lvls from the max contig length); a fixed
    # depth 5 tops out at 2^29 and misbins >536 Mb contigs
    depth = DEPTH
    max_end = max((r[2] for r in rec_list), default=0)
    while max_end > (1 << (MIN_SHIFT + 3 * depth)):
        depth += 1
    # virtual end of each record = virtual start of the next (or EOF)
    voffs = [_voffset(table, r[3]) for r in rec_list]
    eof_voff = None
    for i, (tid, beg, end, uoff) in enumerate(rec_list):
        v_beg = voffs[i]
        v_end = voffs[i + 1] if i + 1 < len(rec_list) else None
        if v_end is None:
            if eof_voff is None:
                # end of the last data block
                eof_voff = _voffset(table, uoff) | 0xFFFF
            v_end = eof_voff
        end1 = max(end, beg + 1)
        b = reg2bin(beg, end1, MIN_SHIFT, depth)
        if 0 <= tid < n_ref:
            bins[tid].setdefault(b, []).append((v_beg, v_end))
            for w in range(beg >> MIN_SHIFT, ((end1 - 1) >> MIN_SHIFT) + 1):
                cur = lidx[tid].get(w)
                if cur is None or v_beg < cur:
                    lidx[tid][w] = v_beg

    out = bytearray()
    out += b"CSI\x01"
    out += struct.pack("<i", MIN_SHIFT)
    out += struct.pack("<i", depth)
    out += struct.pack("<i", 0)  # l_aux
    out += struct.pack("<i", n_ref)
    for tid in range(n_ref):
        out += struct.pack("<i", len(bins[tid]))
        lwins = sorted(lidx[tid])
        lvals = [lidx[tid][w] for w in lwins]
        for b in sorted(bins[tid]):
            chunks = bins[tid][b]
            # loff = linear-index entry for the window holding the bin's
            # start; any record overlapping a query that starts in this
            # bin spans down to that window, so its chunk end is > loff.
            w = _bin_first_pos(b, MIN_SHIFT, depth) >> MIN_SHIFT
            k = bisect.bisect_right(lwins, w) - 1
            if k >= 0:
                loffset = lvals[k]
            elif lwins:
                loffset = lvals[0]
            else:
                loffset = min(c[0] for c in chunks)
            out += struct.pack("<I", b)
            out += struct.pack("<Q", loffset)
            out += struct.pack("<i", len(chunks))
            for cb, ce in chunks:
                out += struct.pack("<QQ", cb, ce)
    return bgzf_compress(bytes(out))


def read_csi(data: bytes):
    """Parse a CSI index (for validation). Returns
    (min_shift, depth, [{bin: [(beg,end),...]}, ...])."""
    from delly_tpu.io.bgzf import bgzf_decompress
    raw = bgzf_decompress(data)
    if raw[:4] != b"CSI\x01":
        raise ValueError("not a CSI index")
    pos = 4
    min_shift, depth, l_aux = struct.unpack_from("<iii", raw, pos)
    pos += 12 + l_aux
    (n_ref,) = struct.unpack_from("<i", raw, pos)
    pos += 4
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        bins = {}
        for _ in range(n_bin):
            b, loffset = struct.unpack_from("<IQ", raw, pos)
            pos += 12
            (n_chunk,) = struct.unpack_from("<i", raw, pos)
            pos += 4
            chunks = []
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", raw, pos)
                pos += 16
                chunks.append((cb, ce))
            bins[b] = chunks
        refs.append(bins)
    return min_shift, depth, refs
