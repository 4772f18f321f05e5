"""BAM parser, from scratch (no htslib / pysam).

Implements the BAM binary format (SAM spec section 4) on top of the BGZF
codec: header (magic, SAM text, reference dictionary) and alignment records
with CIGAR, 4-bit packed SEQ, QUAL and auxiliary tags. Mirrors the role of
HTSlib's sam_read1/bam_get_* used throughout the reference.

Records are parsed lazily into light-weight objects; the hot accessors
(cigar walk, sequence decode) are numpy-assisted.
"""

from __future__ import annotations

import os
import struct
from collections import OrderedDict
from dataclasses import dataclass

import numpy as np

from delly_tpu.io.bgzf import bgzf_decompress_file

# CIGAR operations, same encoding as htslib BAM_C* constants.
CMATCH, CINS, CDEL, CREF_SKIP, CSOFT_CLIP, CHARD_CLIP, CPAD, CEQUAL, CDIFF = range(9)
CIGAR_CHARS = "MIDNSHP=X"

SEQ_NT16 = "=ACMGRSVTWYHKDBN"

# BAM flags (htslib BAM_F*)
FLAGS = {
    "PAIRED": 1,
    "PROPER_PAIR": 2,
    "UNMAP": 4,
    "MUNMAP": 8,
    "REVERSE": 16,
    "MREVERSE": 32,
    "READ1": 64,
    "READ2": 128,
    "SECONDARY": 256,
    "QCFAIL": 512,
    "DUP": 1024,
    "SUPPLEMENTARY": 2048,
}

FPAIRED = 1
FUNMAP = 4
FMUNMAP = 8
FREVERSE = 16
FMREVERSE = 32
FREAD1 = 64
FREAD2 = 128
FSECONDARY = 256
FQCFAIL = 512
FDUP = 1024
FSUPPLEMENTARY = 2048

_SEQ_LUT = np.frombuffer(SEQ_NT16.encode(), dtype=np.uint8)


@dataclass
class BamHeader:
    text: str
    names: list
    lengths: list

    @property
    def n_targets(self) -> int:
        return len(self.names)

    def name2id(self, name: str) -> int:
        try:
            return self.names.index(name)
        except ValueError:
            return -1

    def sample_name(self, default: str) -> str:
        """@RG SM tag extraction (reference: util.h getSMTag:626-664)."""
        sm = []
        for line in self.text.split("\n"):
            if line.startswith("@RG"):
                for field in line.split("\t"):
                    if field.startswith("SM:"):
                        v = field[3:]
                        if v not in sm:
                            sm.append(v)
        if not sm:
            return default
        return sorted(sm)[0]


class BamRecord:
    """One alignment record. Positions are 0-based (like raw BAM)."""

    __slots__ = (
        "qname", "flag", "tid", "pos", "mapq", "cigar_ops", "cigar_lens",
        "mtid", "mpos", "tlen", "l_qseq", "_seqbytes", "_qualbytes", "_aux",
        "_auxcache",
    )

    def __init__(self):
        self._auxcache = None

    # --- sequence/qual ---
    @property
    def seq(self) -> str:
        n = self.l_qseq
        if n == 0:
            return ""
        packed = np.frombuffer(self._seqbytes, dtype=np.uint8)
        nibs = np.empty(len(packed) * 2, dtype=np.uint8)
        nibs[0::2] = packed >> 4
        nibs[1::2] = packed & 0x0F
        return _SEQ_LUT[nibs[:n]].tobytes().decode()

    @property
    def qual(self) -> np.ndarray:
        return np.frombuffer(self._qualbytes, dtype=np.uint8)

    # --- cigar helpers (reference: util.h readLength/alignmentLength) ---
    @property
    def n_cigar(self) -> int:
        return len(self.cigar_ops)

    def read_length(self) -> int:
        """l_qseq + hard clips (util.h:430-438)."""
        hc = int(self.cigar_lens[self.cigar_ops == CHARD_CLIP].sum())
        return self.l_qseq + hc

    def alignment_length(self) -> int:
        """Ref-consuming span: M/=/X/D/N (util.h:440-447)."""
        mask = (
            (self.cigar_ops == CMATCH)
            | (self.cigar_ops == CEQUAL)
            | (self.cigar_ops == CDIFF)
            | (self.cigar_ops == CDEL)
            | (self.cigar_ops == CREF_SKIP)
        )
        return int(self.cigar_lens[mask].sum())

    def half_alignment_length(self) -> int:
        return self.alignment_length() // 2

    def cigar_string(self) -> str:
        return "".join(
            f"{l}{CIGAR_CHARS[o]}" for o, l in zip(self.cigar_ops, self.cigar_lens)
        )

    # --- aux tags ---
    def aux(self, tag: str):
        if self._auxcache is None:
            self._auxcache = _parse_aux(self._aux)
        return self._auxcache.get(tag)

    def __repr__(self):
        return (
            f"BamRecord({self.qname} flag={self.flag} tid={self.tid} "
            f"pos={self.pos} mapq={self.mapq} cigar={self.cigar_string()})"
        )


_AUX_FMT = {
    ord("c"): ("<b", 1), ord("C"): ("<B", 1),
    ord("s"): ("<h", 2), ord("S"): ("<H", 2),
    ord("i"): ("<i", 4), ord("I"): ("<I", 4),
    ord("f"): ("<f", 4), ord("A"): ("<c", 1),
}


def _parse_aux(buf: bytes) -> dict:
    out = {}
    pos = 0
    n = len(buf)
    try:
        while pos + 3 <= n:
            tag = buf[pos : pos + 2].decode("latin-1")
            typ = buf[pos + 2]
            pos += 3
            if typ in _AUX_FMT:
                fmt, sz = _AUX_FMT[typ]
                (val,) = struct.unpack_from(fmt, buf, pos)
                if typ == ord("A"):
                    val = val.decode("latin-1")
                pos += sz
            elif typ == ord("d"):
                # legacy SAM double (pre-spec tools emit it)
                (val,) = struct.unpack_from("<d", buf, pos)
                pos += 8
            elif typ in (ord("Z"), ord("H")):
                end = buf.index(b"\x00", pos)
                val = buf[pos:end].decode("latin-1")
                pos = end + 1
            elif typ == ord("B"):
                sub = buf[pos]
                (count,) = struct.unpack_from("<I", buf, pos + 1)
                fmt, sz = _AUX_FMT[sub]
                dtype = {"<b": np.int8, "<B": np.uint8, "<h": np.int16,
                         "<H": np.uint16, "<i": np.int32, "<I": np.uint32,
                         "<f": np.float32}[fmt]
                val = np.frombuffer(buf, dtype=dtype, count=count,
                                    offset=pos + 5).copy()
                pos += 5 + sz * count
            else:
                break  # unknown type byte: cannot know its size
            out[tag] = val
    except (struct.error, ValueError, KeyError):
        # truncated/corrupt aux block: keep the tags parsed so far
        pass
    return out


def parse_header_from(data: bytes):
    """Parse the BAM header block from uncompressed bytes. Returns
    (BamHeader, record_start_offset)."""
    if data[:4] != b"BAM\x01":
        raise ValueError("not a BAM stream")
    (l_text,) = struct.unpack_from("<i", data, 4)
    text = data[8 : 8 + l_text].split(b"\x00")[0].decode()
    pos = 8 + l_text
    (n_ref,) = struct.unpack_from("<i", data, pos)
    pos += 4
    names, lengths = [], []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, pos)
        pos += 4
        names.append(data[pos : pos + l_name - 1].decode())
        pos += l_name
        (l_ref,) = struct.unpack_from("<i", data, pos)
        pos += 4
        lengths.append(l_ref)
    return BamHeader(text=text, names=names, lengths=lengths), pos


def parse_record_at(data: bytes, pos: int) -> BamRecord:
    """Parse one alignment record at byte offset `pos`."""
    (block_size,) = struct.unpack_from("<i", data, pos)
    pos += 4
    end = pos + block_size
    (refid, rpos, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
     next_refid, next_pos, tlen) = struct.unpack_from(
        "<iiBBHHHiiii", data, pos)
    rec = BamRecord()
    rec.tid = refid
    rec.pos = rpos
    rec.mapq = mapq
    rec.flag = flag
    rec.l_qseq = l_seq
    rec.mtid = next_refid
    rec.mpos = next_pos
    rec.tlen = tlen
    p = pos + 32
    # stop at the first NUL: BAM writers pad qname with extranul bytes
    # (bam_get_qname semantics); padding must not reach name hashes
    rec.qname = data[p : p + l_read_name - 1].split(b"\x00")[0].decode()
    p += l_read_name
    cig = np.frombuffer(data, dtype=np.uint32, count=n_cigar, offset=p)
    rec.cigar_ops = (cig & 0xF).astype(np.int32)
    rec.cigar_lens = (cig >> 4).astype(np.int64)
    p += 4 * n_cigar
    nseqbytes = (l_seq + 1) // 2
    rec._seqbytes = data[p : p + nseqbytes]
    p += nseqbytes
    rec._qualbytes = data[p : p + l_seq]
    p += l_seq
    rec._aux = data[p:end]
    rec._auxcache = None
    # >65535-op alignments are stored with a 2-op '<l_seq>S<ref_len>N'
    # placeholder CIGAR plus the real one in a CG:B,I tag; htslib's
    # sam_read1 restores it transparently, so the pipelines must see
    # the real CIGAR here too (SAM spec 4.2.2)
    if (n_cigar == 2 and l_seq
            and rec.cigar_ops[0] == CSOFT_CLIP
            and rec.cigar_lens[0] == l_seq
            and rec.cigar_ops[1] == CREF_SKIP):
        cg = rec.aux("CG")
        if isinstance(cg, np.ndarray) and len(cg):
            real = cg.astype(np.uint32)
            rec.cigar_ops = (real & 0xF).astype(np.int32)
            rec.cigar_lens = (real >> 4).astype(np.int64)
    return rec


def _scan_soa(data: bytes, start: int):
    """SoA core-field scan of a record byte stream (native bam_scan with
    a Python struct-walk fallback)."""
    try:
        from delly_tpu import native
        soa = native.bam_scan(data, start)
        if soa is not None:
            return soa
    except Exception:
        pass
    n = len(data)
    pos = start
    offsets = []
    rows = []
    while pos + 4 <= n:
        (block_size,) = struct.unpack_from("<i", data, pos)
        if block_size < 32 or pos + 4 + block_size > n:
            break
        offsets.append(pos)
        rows.append(struct.unpack_from("<iiBBHHHiiii", data, pos + 4))
        pos += 4 + block_size
    arr = np.asarray(rows, dtype=np.int64).reshape(len(rows), 11)
    return {
        "offsets": np.asarray(offsets, dtype=np.int64),
        "tid": arr[:, 0].astype(np.int32),
        "pos": arr[:, 1].astype(np.int32),
        "mapq": arr[:, 3].astype(np.int32),
        "flag": arr[:, 6].astype(np.int32),
        "lqseq": arr[:, 7].astype(np.int32),
        "mtid": arr[:, 8].astype(np.int32),
        "mpos": arr[:, 9].astype(np.int32),
        "tlen": arr[:, 10].astype(np.int32),
    }


def _read_header_blocks(reader, path: str):
    """Header + record-start offset from leading BGZF blocks only."""
    want = 1 << 16
    while True:
        head = reader.read_prefix_blocks(want)
        try:
            return parse_header_from(head)
        except (struct.error, IndexError, UnicodeDecodeError):
            if len(head) < want:
                raise ValueError(f"{path}: truncated BAM header")
            want *= 4


def read_bam_header(path: str, genome: str | None = None) -> "BamHeader":
    """Read only the header of a BAM/CRAM (role of sam_hdr_read for the
    startup checks — no record decompression for BAM)."""
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic == b"CRAM":
        # header-only container walk — no record decode, no transcode
        from delly_tpu.io.cram import CramStream
        cs = CramStream(path, genome)
        try:
            return BamHeader(text=cs.sam_text, names=cs.names,
                             lengths=cs.lengths)
        finally:
            cs.close()
    from delly_tpu.io.bgzf import BgzfReader
    reader = BgzfReader(path)
    try:
        header, _ = _read_header_blocks(reader, path)
        return header
    finally:
        reader.close()


def _empty_soa():
    return {
        "offsets": np.zeros(0, dtype=np.int64),
        **{k: np.zeros(0, dtype=np.int32)
           for k in ("tid", "pos", "flag", "mapq", "mtid", "mpos",
                     "tlen", "lqseq")}}


class BamView:
    """Position-sorted records of one region/chromosome: a record byte
    buffer plus SoA core-field arrays (offsets are into `data`). In
    streaming mode the buffer holds only the indexed chunks covering
    the region — memory is O(region), not O(file)."""

    __slots__ = ("data", "soa")

    def __init__(self, data: bytes, soa: dict):
        self.data = data
        self.soa = soa

    def __getitem__(self, key):
        return self.soa[key]

    @property
    def offsets(self):
        return self.soa["offsets"]

    def __len__(self):
        return len(self.soa["offsets"])

    def parse_at(self, off: int) -> BamRecord:
        return parse_record_at(self.data, int(off))

    def records(self):
        for off in self.soa["offsets"]:
            yield parse_record_at(self.data, int(off))


# Uncompressed-size threshold above which an indexed BAM is read by
# region instead of whole-file (compressed size * typical ~3x ratio).
STREAM_THRESHOLD = int(os.environ.get("DELLY_TPU_STREAM_THRESHOLD",
                                      64 * 1024 * 1024))
# Background decode of the next chromosome during sequential scans.
_PREFETCH = os.environ.get("DELLY_TPU_PREFETCH", "1") != "0"


def default_decode_workers() -> int:
    """Depth of the background view-decode pipeline for drivers without
    their own thread knob (the reference's cnv/gcbias/scan passes take
    no -h threads option). DELLY_TPU_DECODE_WORKERS overrides."""
    v = os.environ.get("DELLY_TPU_DECODE_WORKERS", "").strip()
    if v:
        return max(1, int(v))
    return max(1, min(4, os.cpu_count() or 1))


class BamFile:
    """BAM/CRAM reader.

    Two modes (selected at open):

    - whole-file: decompress the full BGZF stream once; views share the
      buffer. Fastest for small inputs and the only option without an
      index (or for CRAM, which is transcoded in memory).
    - streaming: header-only open; per-chromosome/region views
      decompress just the BGZF chunks the .bai/.csi maps to the region
      (role of sam_itr_queryi, reference shortpe.h:354, coral.h:199).
      Memory scales with the region, not the file.
    """

    def __init__(self, path: str, genome: str | None = None,
                 streaming: bool | None = None):
        self.path = path
        self._index = None        # whole-file SoA
        self._data = None
        self._bai = None
        self._reader = None
        self._cram = None
        # Byte-budgeted LRU of decoded per-chromosome views: multi-pass
        # drivers (cnv's scan/gcbias/count passes, sr's scan+assembly+
        # genotyping) revisit chromosomes; re-decoding each pass costs
        # more than the views' memory on all but huge inputs. The
        # budget keeps streaming-mode memory bounded (O(budget), not
        # O(file)); a view larger than the whole budget is still
        # served, just never retained.
        self._chrom_cache: "OrderedDict[int, BamView]" = OrderedDict()
        self._cache_budget = int(os.environ.get(
            "DELLY_TPU_VIEW_CACHE_MB", "8192")) << 20
        self._cache_dropped = 0
        self._prefetch = {}               # tid -> Future[BamView]
        self._prefetch_pool = None
        self._prefetch_pool_size = 0
        self._decode_workers = 1          # background decode pipeline depth
        self._scan_plan = None            # upcoming-tid order (drivers set)
        self._preaders = []               # per-worker BGZF handles
        self._tlocal = None               # thread-local reader slot
        with open(path, "rb") as fh:
            magic = fh.read(4)
        if magic == b"CRAM":
            csize = os.path.getsize(path)
            # CRAM compresses harder than BGZF; assume ~6x
            if streaming is None:
                streaming = csize * 6 > STREAM_THRESHOLD
            if streaming:
                # container-granular region decode (io/cram.CramStream):
                # memory stays O(region) like the indexed BAM path
                from delly_tpu.io.cram import CramStream
                self._cram = CramStream(path, genome)
                self.header = BamHeader(text=self._cram.sam_text,
                                        names=self._cram.names,
                                        lengths=self._cram.lengths)
                self._rec_start = 0
                self.streaming = True
                return
            # small CRAM: decode + transcode to an uncompressed BAM
            # stream once, then every downstream consumer (SoA index,
            # native passes, record parsing) runs unchanged (io/cram.py).
            from delly_tpu.io.cram import cram_to_bam_bytes
            with open(path, "rb") as fh:
                data = cram_to_bam_bytes(fh.read(), genome)
            self._init_whole(data, path)
            return
        if streaming is None or streaming:
            from delly_tpu.io.bai import load_bam_index
            self._bai = load_bam_index(path)
        csize = os.path.getsize(path)
        if streaming is None:
            streaming = (self._bai is not None
                         and csize * 3 > STREAM_THRESHOLD)
        elif streaming and self._bai is None:
            raise ValueError(
                f"{path}: streaming requested but no .bai/.csi index")
        self.streaming = streaming
        if not streaming:
            self._bai = None
            self._init_whole(bgzf_decompress_file(path), path)
            return
        from delly_tpu.io.bgzf import BgzfReader
        self._reader = BgzfReader(path)
        self.header, self._rec_start = _read_header_blocks(self._reader,
                                                          path)

    def _init_whole(self, data: bytes, path: str) -> None:
        if data[:4] != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM/CRAM file")
        self.header, pos = parse_header_from(data)
        self._data = data
        self._rec_start = pos
        self.streaming = False
        # Native SoA record index (the HTSlib-equivalent scan): offsets +
        # core fields for every record, so per-chromosome iteration can
        # skip non-matching records without Python-parsing them.
        try:
            from delly_tpu import native
            self._index = native.bam_scan(data, pos)
        except Exception:
            self._index = None

    def __iter__(self):
        return self.records()

    def _parse_at(self, pos: int):
        return parse_record_at(self._data, pos)

    # Whole-file BamFile quacks like a BamView over the full buffer so
    # bulk helpers (_cigar_stats, base_coverage_bulk, ...) accept both.
    @property
    def data(self) -> bytes:
        if self._data is None:
            raise RuntimeError("no whole-file buffer in streaming mode; "
                               "use chrom()/region() views")
        return self._data

    def parse_at(self, pos: int):
        return parse_record_at(self.data, pos)

    # --- region views -----------------------------------------------------

    def set_decode_workers(self, n: int, plan=None) -> None:
        """Deepen the background view-decode pipeline (streaming mode):
        chrom() keeps up to `n` upcoming chromosomes decoding on a
        worker pool with per-thread BGZF handles (the native inflate
        and SoA scan release the GIL). `plan` optionally fixes the
        upcoming-tid order (the scan drivers pass their valid-region
        chromosome list); default is tid+1, tid+2, ..."""
        self._decode_workers = max(1, int(n))
        if plan is not None:
            self._scan_plan = list(plan)

    def chrom(self, tid: int) -> BamView:
        """View of all records on reference `tid` (the per-chromosome
        iteration every driver uses; reference sam_itr_queryi(tid, 0,
        len)). Sequential scans overlap I/O with compute: serving tid
        keeps the next `_decode_workers` planned chromosomes decoding
        in the background."""
        view = self._chrom_cache.get(tid)
        if view is not None:
            self._chrom_cache.move_to_end(tid)
            self._cache_dropped = 0
            self._schedule_prefetch_after(tid)
            return view
        fut = self._prefetch.pop(tid, None)
        if fut is not None:
            try:
                view = fut.result()
            except Exception:
                view = None
        if view is None:
            view = self.region(tid, 0, self.header.lengths[tid]
                               if 0 <= tid < self.header.n_targets
                               else 1 << 29)
        self._cache_put(tid, view)
        self._schedule_prefetch_after(tid)
        return view

    def _schedule_prefetch_after(self, tid: int) -> None:
        if (not self.streaming or self._cram is not None
                or self._bai is None or not _PREFETCH
                or self.header is None):
            return
        # Prefetched-but-unconsumed views sit outside the LRU cache, so
        # they must honor the memory budget too: the pipeline depth is
        # capped so that resident bytes (cache + completed prefetch
        # results) plus the PROJECTED size of in-flight decodes (mean
        # of the views seen so far) stay within the budget, falling
        # back to 1-deep lookahead at the cap.
        depth = self._decode_workers
        if depth > 1:
            resident = 0
            sizes = [self._view_nbytes(v)
                     for v in self._chrom_cache.values()]
            resident += sum(sizes)
            for fut in self._prefetch.values():
                if fut.done():
                    try:
                        nb = self._view_nbytes(fut.result())
                    except Exception:
                        nb = 0
                    sizes.append(nb)
                    resident += nb
            if resident >= self._cache_budget:
                depth = 1
            elif sizes:
                avg = max(1, sum(sizes) // len(sizes))
                room = (self._cache_budget - resident) // avg
                depth = max(1, min(depth, int(room)))
        plan = self._scan_plan
        if plan is not None:
            try:
                i = plan.index(tid)
                upcoming = plan[i + 1:i + 1 + depth]
            except ValueError:
                upcoming = []
        else:
            upcoming = range(tid + 1,
                             min(tid + 1 + depth,
                                 self.header.n_targets))
        for t in upcoming:
            if len(self._prefetch) >= depth:
                break
            self._start_prefetch(t)

    def _view_nbytes(self, view) -> int:
        # whole-file mode: every view shares self._data — charging the
        # shared buffer per view would "fill" the budget after a couple
        # of chromosomes; only the per-view SoA arrays are marginal cost
        n = 0 if view.data is self._data else len(view.data)
        try:
            n += sum(a.nbytes for a in view.soa.values())
        except Exception:
            pass
        return n

    def close(self) -> None:
        """Release file handles, the prefetch workers and cached views.
        Safe to call more than once."""
        for fut in self._prefetch.values():
            fut.cancel()
        self._prefetch.clear()
        if self._prefetch_pool is not None:
            self._prefetch_pool.shutdown(wait=True)
            self._prefetch_pool = None
        for r in self._preaders:
            try:
                r.close()
            except Exception:
                pass
        self._preaders = []
        self._tlocal = None
        if self._reader is not None:
            try:
                self._reader.close()
            except Exception:
                pass
            self._reader = None
        if self._cram is not None:
            try:
                self._cram.close()
            except Exception:
                pass
            self._cram = None
        self._chrom_cache.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def _cache_put(self, tid: int, view) -> None:
        nb = self._view_nbytes(view)
        if nb > self._cache_budget:
            return               # single view larger than the budget
        total = sum(self._view_nbytes(v)
                    for v in self._chrom_cache.values())
        if total + nb > self._cache_budget:
            # Working set exceeds the budget: retaining the newest
            # entry would evict one that a sequential re-pass will ask
            # for first (classic LRU thrash, 0% hits). Keep the
            # resident prefix for the life of this reader instead —
            # drivers revisit chromosomes in the same order every
            # pass, so the resident entries keep hitting. Only a
            # long run of misses with NO hits at all (an access
            # pattern that never touches the resident set) clears it.
            self._cache_dropped += 1
            if self._cache_dropped > 4 * max(
                    len(self._chrom_cache),
                    self.header.n_targets
                    if self.header is not None else 0) + 16:
                self._chrom_cache.clear()
                self._cache_dropped = 0
            return
        self._cache_dropped = 0
        self._chrom_cache[tid] = view
        self._chrom_cache.move_to_end(tid)

    def _start_prefetch(self, tid: int) -> None:
        if (not self.streaming or self._cram is not None
                or self._bai is None or not _PREFETCH
                or not (0 <= tid < self.header.n_targets)
                or tid in self._prefetch
                or tid in self._chrom_cache):
            return
        import concurrent.futures
        want = max(1, self._decode_workers)
        if (self._prefetch_pool is not None
                and self._prefetch_pool_size != want
                and not self._prefetch):
            # set_decode_workers changed the depth after the pool was
            # created: replace it once no futures are outstanding
            self._prefetch_pool.shutdown(wait=False)
            self._prefetch_pool = None
        if self._prefetch_pool is None:
            self._prefetch_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=want)
            self._prefetch_pool_size = want
        self._prefetch[tid] = self._prefetch_pool.submit(
            self._decode_chrom_bg, tid)

    def _decode_chrom_bg(self, tid: int):
        """region(tid, 0, len) on a per-worker-thread prefetch reader
        (BgzfReader seek state is per-handle, so concurrent decodes
        need one handle per pool thread)."""
        import threading

        from delly_tpu.io.bgzf import BgzfReader
        if self._tlocal is None:
            self._tlocal = threading.local()
        reader = getattr(self._tlocal, "reader", None)
        if reader is None:
            # the pipeline already parallelizes across chromosomes, so
            # each worker's codec runs single-threaded (oversubscribing
            # the native inflate pool costs more than it buys)
            reader = self._tlocal.reader = BgzfReader(
                self.path, threads=1 if self._decode_workers > 1
                else None)
            self._preaders.append(reader)
        end = self.header.lengths[tid]
        chunks = self._bai.chunks(tid, 0, end)
        if not chunks:
            return BamView(b"", _empty_soa())
        parts = [reader.read_voffset_range(cb, ce)
                 for cb, ce in chunks]
        buf = b"".join(parts)
        soa = _scan_soa(buf, 0)
        mask = (soa["tid"] == tid) & (soa["pos"] < end)
        soa = {k: v[mask] for k, v in soa.items()}
        return BamView(buf, soa)

    def region(self, tid: int, beg: int, end: int) -> BamView:
        """View of records overlapping [beg, end) on `tid` — records
        are filtered by start position <= end and tid; the caller sees
        position-sorted records exactly as the reference's iterator
        emits them."""
        if not self.streaming:
            ci = self.core_index()
            mask = ci["tid"] == tid
            if beg > 0 or end < (1 << 29):
                # include any record starting before `end`; upstream
                # span filters handle the rest (mirrors hts iterator
                # overlap semantics closely enough for start-sorted
                # consumers)
                mask &= ci["pos"] < end
            soa = {k: v[mask] for k, v in ci.items()}
            return BamView(self._data, soa)
        if self._cram is not None:
            buf = self._cram.decode_region(tid, beg, end)
        else:
            chunks = self._bai.chunks(tid, beg, end)
            if not chunks:
                return BamView(b"", _empty_soa())
            parts = [self._reader.read_voffset_range(cb, ce)
                     for cb, ce in chunks]
            buf = b"".join(parts)
        soa = _scan_soa(buf, 0)
        mask = (soa["tid"] == tid) & (soa["pos"] < end)
        soa = {k: v[mask] for k, v in soa.items()}
        return BamView(buf, soa)

    def prefix_view(self, max_records: int) -> BamView:
        """View over the first ~`max_records` records (library-parameter
        sampling, reference util.h:771-891 reads the file head)."""
        if not self.streaming:
            ci = self.core_index()
            soa = {k: v[:max_records] for k, v in ci.items()}
            return BamView(self._data, soa)
        if self._cram is not None:
            parts = []
            soas = []
            base = 0
            total = 0
            for buf in self._cram.iter_container_bytes():
                soa = _scan_soa(buf, 0)
                soa["offsets"] = soa["offsets"] + base
                parts.append(buf)
                soas.append(soa)
                base += len(buf)
                total += len(soa["offsets"])
                if total >= max_records:
                    break
            if not soas:
                return BamView(b"", _empty_soa())
            merged = {k: np.concatenate([s[k] for s in soas])[:max_records]
                      for k in soas[0]}
            return BamView(b"".join(parts), merged)
        # ~min record size 40B is a safe lower bound; grow until enough
        want = max(1 << 20, 64 * max_records)
        while True:
            buf = self._reader.read_prefix_blocks(want)
            soa = _scan_soa(buf, self._rec_start)
            if len(soa["offsets"]) >= max_records or len(buf) < want:
                break
            want *= 4
        soa = {k: v[:max_records] for k, v in soa.items()}
        return BamView(buf, soa)

    def iter_soa_chunks(self, chunk_bytes: int = 1 << 23):
        """Stream BamViews over the whole file in record order with
        bounded memory (streaming mode decompresses ~chunk_bytes at a
        time; whole-file mode yields a single view). The sequential
        analogue of the reference's sam_read1 loop for sampling passes."""
        if not self.streaming:
            yield BamView(self._data, self.core_index())
            return
        if self._cram is not None:
            for buf in self._cram.iter_container_bytes():
                yield BamView(buf, _scan_soa(buf, 0))
            return
        coff = 0
        leftover = b""
        first = True
        while True:
            data, ncoff = self._reader.read_blocks(coff, chunk_bytes)
            if not data:
                break
            buf = leftover + data
            start = self._rec_start if first else 0
            if first:
                # headers larger than one chunk (draft-assembly BAMs
                # with ~1M contigs): keep reading whole blocks until
                # the record area begins, or the leftover slice below
                # would drop the header tail and desynchronize
                while len(buf) < start:
                    data, ncoff2 = self._reader.read_blocks(ncoff,
                                                            chunk_bytes)
                    if not data:
                        break
                    buf += data
                    ncoff = ncoff2
            first = False
            soa = _scan_soa(buf, start)
            offs = soa["offsets"]
            if len(offs):
                last = int(offs[-1])
                (bs,) = struct.unpack_from("<i", buf, last)
                endoff = last + 4 + bs
            else:
                endoff = start
            yield BamView(buf, soa)
            leftover = buf[endoff:]
            if ncoff == coff:
                break
            coff = ncoff

    def records(self, tid: int | None = None):
        """Iterate alignment records, optionally filtered to one reference.

        Records in a coordinate-sorted BAM come out position-sorted, matching
        the reference's indexed per-chromosome iteration order.
        """
        if self.streaming:
            if tid is not None:
                yield from self.chrom(tid).records()
            else:
                for t in range(self.header.n_targets):
                    yield from self.chrom(t).records()
            return
        if self._index is not None:
            offsets = self._index["offsets"]
            if tid is not None:
                offsets = offsets[self._index["tid"] == tid]
            for off in offsets:
                yield self._parse_at(int(off))
            return
        data = self._data
        pos = self._rec_start
        n = len(data)
        while pos + 8 <= n:
            (block_size,) = struct.unpack_from("<i", data, pos)
            # same truncation/corruption guard as _scan_soa: a bogus
            # block_size must not loop forever or crash mid-record
            if block_size < 32 or pos + 4 + block_size > n:
                break
            (refid,) = struct.unpack_from("<i", data, pos + 4)
            if tid is None or refid == tid:
                yield self._parse_at(pos)
            pos += 4 + block_size

    def core_index(self):
        """SoA core-field arrays for vectorized pre-filtering
        (offsets/tid/pos/flag/mapq/mtid/mpos/tlen/lqseq). Whole-file
        mode only; streaming callers use chrom()/region()/prefix_view()."""
        if self.streaming:
            raise RuntimeError(
                "core_index() is whole-file; use chrom()/region() in "
                "streaming mode")
        if self._index is None:
            self._index = _scan_soa(self._data, self._rec_start)
        return self._index

    def _build_index_python(self):
        return _scan_soa(self._data, self._rec_start)

    def mapped_count(self, tid: int) -> int:
        """Whether a chromosome has mapped reads (role of hts_idx_get_stat)."""
        if self.streaming:
            if self._cram is not None:
                return int(self._cram.has_reads(tid))
            return int(self._bai.has_reads(tid))
        if self._index is not None:
            m = (self._index["tid"] == tid) \
                & ((self._index["flag"] & FUNMAP) == 0)
            return int(m.any())
        for rec in self.records(tid=tid):
            if not rec.flag & FUNMAP:
                return 1
        return 0
