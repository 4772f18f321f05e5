"""BAM index (.bai / .csi) reader + writer.

Role of HTSlib's hts_idx_load / hts_itr_query / sam_itr_queryi, used by
every reference driver for region iteration (e.g. shortpe.h:354,
coral.h:199, coverage.h:456). The binning scheme matches the SAM spec:
.bai is fixed min_shift=14 / depth=5 with a 16kb linear index; .csi
carries min_shift/depth explicitly and per-bin loffsets.
"""

from __future__ import annotations

import os
import struct

import numpy as np

BAI_MIN_SHIFT = 14
BAI_DEPTH = 5
_METADATA_BIN = 37450  # bin 37450: htslib per-ref metadata pseudo-bin
_VEC_THRESHOLD = 50_000  # records; above this the vectorized assembly
                         # runs (byte-identical, parity-tested)


def reg2bins(beg: int, end: int, min_shift: int, depth: int):
    """All bins overlapping [beg, end) at every level (SAM spec)."""
    out = []
    t = 0
    s = min_shift + 3 * depth
    for level in range(depth + 1):
        lo = t + (beg >> s)
        hi = t + ((end - 1) >> s)
        out.extend(range(lo, hi + 1))
        t += 1 << (3 * level)
        s -= 3
    return out


def reg2bin(beg: int, end: int, min_shift: int = BAI_MIN_SHIFT,
            depth: int = BAI_DEPTH) -> int:
    end -= 1
    s = min_shift
    t = ((1 << depth * 3) - 1) // 7
    for level in range(depth, 0, -1):
        if beg >> s == end >> s:
            return t + (beg >> s)
        s += 3
        t -= 1 << (level - 1) * 3
    return 0


class BamIndex:
    """Parsed .bai/.csi: per-reference bin chunks + linear index."""

    def __init__(self, min_shift: int, depth: int, refs: list,
                 n_no_coor: int = 0):
        self.min_shift = min_shift
        self.depth = depth
        # refs: [(bins: {bin: [(vbeg, vend), ...]},
        #         lidx: np.ndarray uint64, loffs: {bin: loff} | None)]
        self.refs = refs
        self.n_no_coor = n_no_coor

    @property
    def n_ref(self) -> int:
        return len(self.refs)

    def has_reads(self, tid: int) -> bool:
        if not 0 <= tid < len(self.refs):
            return False
        bins = self.refs[tid][0]
        return any(b != _METADATA_BIN for b in bins)

    def mapped_stat(self, tid: int):
        """Mapped-read count from the metadata pseudo-bin (role of
        hts_idx_get_stat), or None when absent from the index."""
        if not 0 <= tid < len(self.refs):
            return None
        meta = self.refs[tid][0].get(_METADATA_BIN)
        if not meta or len(meta) < 2:
            # an empty reference with no pseudo-bin: no reads
            return 0 if not self.has_reads(tid) else None
        # chunk[1] = (n_mapped, n_unmapped)
        return int(meta[1][0])

    def _min_off(self, tid: int, beg: int) -> int:
        """min_off for a query starting at `beg` (hts_itr_query): the
        linear-index entry of beg's window, or the bin loffset (CSI),
        walking up to parents when empty."""
        bins, lidx, loffs = self.refs[tid]
        w = beg >> self.min_shift
        if lidx is not None and len(lidx):
            if w < len(lidx):
                v = int(lidx[w])
                if v:
                    return v
                # htslib back-fills empty leading slots with the
                # previous non-zero entry
                nz = np.nonzero(lidx[:w])[0]
                if len(nz):
                    return int(lidx[nz[-1]])
                return 0
            nz = np.nonzero(lidx)[0]
            return int(lidx[nz[-1]]) if len(nz) else 0
        if loffs is not None:
            b = reg2bin(beg, beg + 1, self.min_shift, self.depth)
            while True:
                if b in loffs:
                    return loffs[b]
                if b == 0:
                    return 0
                b = (b - 1) >> 3
        return 0

    def chunks(self, tid: int, beg: int, end: int) -> list:
        """Merged (vbeg, vend) chunk list whose records can overlap
        [beg, end) on `tid`, with min_off filtering applied."""
        if not 0 <= tid < len(self.refs) or end <= beg:
            return []
        bins = self.refs[tid][0]
        min_off = self._min_off(tid, beg)
        raw = []
        for b in reg2bins(beg, end, self.min_shift, self.depth):
            for cbeg, cend in bins.get(b, ()):
                if cend > min_off:
                    raw.append((max(cbeg, min_off), cend))
        if not raw:
            return []
        raw.sort()
        merged = [list(raw[0])]
        for cbeg, cend in raw[1:]:
            # merge chunks that touch or whose gap lies within the same
            # BGZF block (htslib merges at block granularity)
            if cbeg >> 16 <= merged[-1][1] >> 16:
                merged[-1][1] = max(merged[-1][1], cend)
            else:
                merged.append([cbeg, cend])
        return [tuple(c) for c in merged]


def parse_bai(data: bytes) -> BamIndex:
    if data[:4] != b"BAI\x01":
        raise ValueError("not a BAI index")
    pos = 4
    (n_ref,) = struct.unpack_from("<i", data, pos)
    pos += 4
    refs = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", data, pos)
        pos += 4
        bins = {}
        for _ in range(n_bin):
            b, n_chunk = struct.unpack_from("<Ii", data, pos)
            pos += 8
            chunks = []
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", data, pos)
                pos += 16
                chunks.append((cb, ce))
            bins[b] = chunks
        (n_intv,) = struct.unpack_from("<i", data, pos)
        pos += 4
        lidx = np.frombuffer(data, dtype=np.uint64, count=n_intv,
                             offset=pos).copy()
        pos += 8 * n_intv
        refs.append((bins, lidx, None))
    n_no_coor = 0
    if pos + 8 <= len(data):
        (n_no_coor,) = struct.unpack_from("<Q", data, pos)
    return BamIndex(BAI_MIN_SHIFT, BAI_DEPTH, refs, n_no_coor)


def parse_csi(data: bytes) -> BamIndex:
    from delly_tpu.io.bgzf import bgzf_decompress
    raw = bgzf_decompress(data) if data[:2] == b"\x1f\x8b" else data
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
        loffs = {}
        for _ in range(n_bin):
            b, loff = struct.unpack_from("<IQ", raw, pos)
            pos += 12
            (n_chunk,) = struct.unpack_from("<i", raw, pos)
            pos += 4
            chunks = []
            for _ in range(n_chunk):
                cb, ce = struct.unpack_from("<QQ", raw, pos)
                pos += 16
                chunks.append((cb, ce))
            bins[b] = chunks
            loffs[b] = loff
        refs.append((bins, None, loffs))
    n_no_coor = 0
    if pos + 8 <= len(raw):
        (n_no_coor,) = struct.unpack_from("<Q", raw, pos)
    return BamIndex(min_shift, depth, refs, n_no_coor)


def load_bam_index(bam_path: str) -> BamIndex | None:
    """Locate and parse the index next to a BAM (.bai/.csi, including
    the basename variants), or None when absent."""
    base, _ext = os.path.splitext(bam_path)
    for cand, parser in ((bam_path + ".bai", parse_bai),
                        (base + ".bai", parse_bai),
                        (bam_path + ".csi", parse_csi),
                        (base + ".csi", parse_csi)):
        if os.path.exists(cand):
            with open(cand, "rb") as fh:
                return parser(fh.read())
    return None


# ---------------------------------------------------------------------------
# Writer (role of sam_index_build; used for synthesized/test BAMs and
# by our own BAM emitters so downstream region queries work)
# ---------------------------------------------------------------------------

def build_bai(bgzf_bytes: bytes) -> bytes:
    """Build a .bai for a BGZF-compressed BAM byte string."""
    from delly_tpu.io.bam import _scan_soa, parse_header_from
    from delly_tpu.io.bgzf import bgzf_decompress
    from delly_tpu.io.csi import _block_table

    table = _block_table(bgzf_bytes)
    data = bgzf_decompress(bgzf_bytes)
    header, rec_start = parse_header_from(data)
    n_ref = header.n_targets

    # SoA scan for core fields + ref spans
    soa = _scan_soa(data, rec_start)
    spans = None
    try:
        from delly_tpu import native
        st = native.bam_cigar_stats(data, soa["offsets"])
        if st is not None:
            spans = st["ref_span"]
    except Exception:
        spans = None

    offsets = soa["offsets"]
    tids = soa["tid"]
    poss = soa["pos"]
    flags = soa["flag"]
    nrec = len(offsets)
    if spans is None:
        from delly_tpu.io.bam import parse_record_at
        spans = np.zeros(nrec, dtype=np.int64)
        for i in range(nrec):
            spans[i] = parse_record_at(data, int(offsets[i])
                                       ).alignment_length()

    # virtual offsets of each record start + the end of the stream,
    # vectorized over the block table
    u_starts = np.asarray([u for u, _c in table], dtype=np.int64)
    c_starts = np.asarray([c for _u, c in table], dtype=np.int64)
    upos = np.concatenate([np.asarray(offsets, dtype=np.int64),
                           [np.int64(len(data))]])
    bidx = np.searchsorted(u_starts, upos, side="right") - 1
    bidx = np.clip(bidx, 0, len(table) - 1)
    voffs = ((c_starts[bidx].astype(np.uint64) << np.uint64(16))
             | (upos - u_starts[bidx]).astype(np.uint64))
    n_no_coor = 0

    if nrec >= _VEC_THRESHOLD:
        # the vectorized assembly assumes coordinate order over the
        # PLACED records (tid-grouped, pos non-decreasing within tid —
        # what samtools sort emits and indexing requires); anything
        # else takes the order-robust scalar path
        t64 = np.asarray(tids, dtype=np.int64)
        p64 = np.asarray(poss, dtype=np.int64)
        pl = t64 >= 0
        tp, pp = t64[pl], p64[pl]
        same = tp[1:] == tp[:-1]
        sorted_ok = (len(tp) < 2
                     or (bool(np.all(tp[1:] >= tp[:-1]))
                         and bool(np.all(pp[1:][same] >= pp[:-1][same]))))
        if sorted_ok:
            return _assemble_bai_vec(n_ref, offsets, tids, poss, flags,
                                     spans, voffs)

    refs_bins = [dict() for _ in range(n_ref)]
    refs_lidx = [dict() for _ in range(n_ref)]
    # metadata pseudo-bin accumulators (hts_idx_get_stat source):
    # per-ref [off_beg, off_end, n_mapped, n_unmapped]
    refs_meta = [[0, 0, 0, 0] for _ in range(n_ref)]
    for i in range(nrec):
        tid = int(tids[i])
        if tid >= 0 and int(flags[i]) & 4:
            # placed-unmapped: counted in the pseudo-bin only
            m = refs_meta[tid]
            if m[2] + m[3] == 0:
                m[0] = int(voffs[i])
            m[1] = int(voffs[i + 1])
            m[3] += 1
            continue
        if tid < 0 or int(flags[i]) & 4:
            n_no_coor += 1
            continue
        m = refs_meta[tid]
        if m[2] + m[3] == 0:
            m[0] = int(voffs[i])
        m[1] = int(voffs[i + 1])
        m[2] += 1
        beg = int(poss[i])
        end = beg + max(int(spans[i]), 1)
        vb, ve = int(voffs[i]), int(voffs[i + 1])
        b = reg2bin(beg, end)
        refs_bins[tid].setdefault(b, []).append((vb, ve))
        for w in range(beg >> BAI_MIN_SHIFT,
                       ((end - 1) >> BAI_MIN_SHIFT) + 1):
            cur = refs_lidx[tid].get(w)
            if cur is None or vb < cur:
                refs_lidx[tid][w] = vb

    out = bytearray(b"BAI\x01")
    out += struct.pack("<i", n_ref)
    for tid in range(n_ref):
        bins = refs_bins[tid]
        # merge adjacent chunks within each bin
        packed = {}
        for b, chunks in bins.items():
            chunks.sort()
            merged = [list(chunks[0])]
            for cb, ce in chunks[1:]:
                if cb <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], ce)
                else:
                    merged.append([cb, ce])
            packed[b] = merged
        meta = refs_meta[tid]
        have_meta = (meta[2] + meta[3]) > 0
        out += struct.pack("<i", len(packed) + (1 if have_meta else 0))
        for b in sorted(packed):
            out += struct.pack("<Ii", b, len(packed[b]))
            for cb, ce in packed[b]:
                out += struct.pack("<QQ", cb, ce)
        if have_meta:
            out += struct.pack("<Ii", _METADATA_BIN, 2)
            out += struct.pack("<QQ", meta[0], meta[1])
            out += struct.pack("<QQ", meta[2], meta[3])
        lidx = refs_lidx[tid]
        n_intv = (max(lidx) + 1) if lidx else 0
        out += struct.pack("<i", n_intv)
        prev = 0
        for w in range(n_intv):
            v = lidx.get(w)
            if v is None:
                v = prev
            out += struct.pack("<Q", v)
            prev = v
    out += struct.pack("<Q", n_no_coor)
    return bytes(out)


def reg2bin_vec(beg: np.ndarray, end: np.ndarray,
                min_shift: int = BAI_MIN_SHIFT,
                depth: int = BAI_DEPTH) -> np.ndarray:
    """Vectorized reg2bin — deepest level whose window contains
    [beg, end-1], same result as reg2bin per element."""
    e = end - 1
    out = np.zeros(len(beg), dtype=np.int64)
    done = np.zeros(len(beg), dtype=bool)
    s = min_shift
    t = ((1 << depth * 3) - 1) // 7
    for level in range(depth, 0, -1):
        hit = ~done & ((beg >> s) == (e >> s))
        out[hit] = t + (beg[hit] >> s)
        done |= hit
        s += 3
        t -= 1 << (level - 1) * 3
    return out


def _assemble_bai_vec(n_ref, offsets, tids, poss, flags, spans, voffs):
    """Vectorized .bai assembly (identical bytes to the scalar loop in
    build_bai; a parity test asserts this). O(passes) numpy instead of
    O(records) Python — genome-scale BAMs index in seconds."""
    tids = np.asarray(tids, dtype=np.int64)
    poss = np.asarray(poss, dtype=np.int64)
    flags = np.asarray(flags, dtype=np.int64)
    spans = np.asarray(spans, dtype=np.int64)
    nrec = len(tids)
    vb = voffs[:-1].astype(np.uint64)
    ve = voffs[1:].astype(np.uint64)

    unmapped = (flags & 4) != 0
    placed = tids >= 0
    counted = placed                     # enters the pseudo-bin
    binned = placed & ~unmapped          # enters bins + linear index
    n_no_coor = int(np.count_nonzero(~placed))

    # per-ref metadata: first/last counted voffset, mapped/unmapped
    meta = {}
    cidx = np.nonzero(counted)[0]
    if len(cidx):
        ct = tids[cidx]
        # records are tid-grouped (coordinate-sorted BAM): first/last
        # occurrence per tid via searchsorted on the grouped tids
        ut, first = np.unique(ct, return_index=True)
        last = np.searchsorted(ct, ut, side="right") - 1
        n_map = np.bincount(ct[~unmapped[cidx]]
                            if (~unmapped[cidx]).any()
                            else np.zeros(0, np.int64),
                            minlength=int(ut.max()) + 1)
        n_unm = np.bincount(ct[unmapped[cidx]]
                            if unmapped[cidx].any()
                            else np.zeros(0, np.int64),
                            minlength=int(ut.max()) + 1)
        for k, t in enumerate(ut):
            meta[int(t)] = (int(vb[cidx[first[k]]]),
                            int(ve[cidx[last[k]]]),
                            int(n_map[t]), int(n_unm[t]))

    out = bytearray(b"BAI\x01")
    out += struct.pack("<i", n_ref)

    bidx = np.nonzero(binned)[0]
    bt = tids[bidx]
    beg = poss[bidx]
    end = beg + np.maximum(spans[bidx], 1)
    bins_all = reg2bin_vec(beg, end)
    bvb, bve = vb[bidx], ve[bidx]
    w0 = beg >> BAI_MIN_SHIFT
    w1 = (end - 1) >> BAI_MIN_SHIFT

    for tid in range(n_ref):
        lo = int(np.searchsorted(bt, tid, side="left"))
        hi = int(np.searchsorted(bt, tid, side="right"))
        tb = bins_all[lo:hi]
        tvb = bvb[lo:hi]
        tve = bve[lo:hi]
        # group by bin, file order preserved (stable sort); within a
        # group voffsets are increasing, so chunk merging is a
        # previous-ve comparison
        order = np.argsort(tb, kind="stable")
        gb = tb[order]
        gvb = tvb[order]
        gve = tve[order]
        n = len(gb)
        chunks_per_bin = {}
        if n:
            newg = np.ones(n, dtype=bool)
            newg[1:] = gb[1:] != gb[:-1]
            newc = newg.copy()
            newc[1:] |= gvb[1:] > gve[:-1]
            cid = np.cumsum(newc) - 1
            c_start = gvb[newc]
            # last ve per chunk (ve increasing within a chunk)
            c_end = np.zeros(int(cid[-1]) + 1, dtype=np.uint64)
            np.maximum.at(c_end, cid, gve)
            c_bin = gb[newc]
            ub, bfirst = np.unique(c_bin, return_index=True)
            blast = np.searchsorted(c_bin, ub, side="right")
            for k, b in enumerate(ub):
                chunks_per_bin[int(b)] = list(
                    zip(c_start[bfirst[k]:blast[k]].tolist(),
                        c_end[bfirst[k]:blast[k]].tolist()))
        have_meta = tid in meta
        out += struct.pack("<i", len(chunks_per_bin)
                           + (1 if have_meta else 0))
        for b in sorted(chunks_per_bin):
            ch = chunks_per_bin[b]
            out += struct.pack("<Ii", b, len(ch))
            for cb, ce in ch:
                out += struct.pack("<QQ", cb, ce)
        if have_meta:
            m = meta[tid]
            out += struct.pack("<Ii", _METADATA_BIN, 2)
            out += struct.pack("<QQ", m[0], m[1])
            out += struct.pack("<QQ", m[2], m[3])
        # linear index: min voffset per 16kb window; records are
        # pos-sorted so the first record covering a window has the
        # smallest voffset. Expand multi-window spans then keep first.
        tw0 = w0[lo:hi]
        tw1 = w1[lo:hi]
        if hi > lo:
            reps = (tw1 - tw0 + 1)
            wexp = np.repeat(tw0, reps)
            bump = np.arange(len(wexp)) - np.repeat(
                np.cumsum(reps) - reps, reps)
            wexp = wexp + bump
            vexp = np.repeat(tvb, reps)
            n_intv = int(wexp.max()) + 1
            lval = np.full(n_intv, np.uint64(np.iinfo(np.uint64).max))
            np.minimum.at(lval, wexp, vexp)
            # back-fill empty windows with the previous entry (0 lead)
            empty = lval == np.iinfo(np.uint64).max
            lval[empty] = 0
            lval = np.maximum.accumulate(lval)
            out += struct.pack("<i", n_intv)
            out += lval.astype("<u8").tobytes()
        else:
            out += struct.pack("<i", 0)
    out += struct.pack("<Q", n_no_coor)
    return bytes(out)


def write_bai(bam_path: str, index_path: str | None = None) -> str:
    with open(bam_path, "rb") as fh:
        idx = build_bai(fh.read())
    index_path = index_path or bam_path + ".bai"
    with open(index_path, "wb") as fh:
        fh.write(idx)
    return index_path
