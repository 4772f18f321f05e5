"""BAM parser, from scratch (no htslib / pysam).

Implements the BAM binary format (SAM spec section 4) on top of the BGZF
codec: header (magic, SAM text, reference dictionary) and alignment records
with CIGAR, 4-bit packed SEQ, QUAL and auxiliary tags. Mirrors the role of
HTSlib's sam_read1/bam_get_* used throughout the reference.

Records are parsed lazily into light-weight objects; the hot accessors
(cigar walk, sequence decode) are numpy-assisted.
"""

from __future__ import annotations

import struct
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
    while pos + 3 <= n:
        tag = buf[pos : pos + 2].decode()
        typ = buf[pos + 2]
        pos += 3
        if typ in _AUX_FMT:
            fmt, sz = _AUX_FMT[typ]
            (val,) = struct.unpack_from(fmt, buf, pos)
            if typ == ord("A"):
                val = val.decode()
            pos += sz
        elif typ in (ord("Z"), ord("H")):
            end = buf.index(b"\x00", pos)
            val = buf[pos:end].decode()
            pos = end + 1
        elif typ == ord("B"):
            sub = buf[pos]
            (count,) = struct.unpack_from("<I", buf, pos + 1)
            fmt, sz = _AUX_FMT[sub]
            dtype = {"<b": np.int8, "<B": np.uint8, "<h": np.int16,
                     "<H": np.uint16, "<i": np.int32, "<I": np.uint32,
                     "<f": np.float32}[fmt]
            val = np.frombuffer(buf, dtype=dtype, count=count, offset=pos + 5).copy()
            pos += 5 + sz * count
        else:
            break
        out[tag] = val
    return out


class BamFile:
    """Whole-file BAM reader.

    Decompresses the full BGZF stream once and parses records on iteration.
    For the example-scale data this is fast; the production path is the C++
    decoder in delly_tpu/native (same role as HTSlib in the reference).
    """

    def __init__(self, path: str, genome: str | None = None):
        self.path = path
        with open(path, "rb") as fh:
            magic = fh.read(4)
        if magic == b"CRAM":
            # CRAM input: decode + transcode to an uncompressed BAM
            # stream once, then every downstream consumer (SoA index,
            # native passes, record parsing) runs unchanged (io/cram.py).
            from delly_tpu.io.cram import cram_to_bam_bytes
            with open(path, "rb") as fh:
                data = cram_to_bam_bytes(fh.read(), genome)
        else:
            data = bgzf_decompress_file(path)
        if data[:4] != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM/CRAM file")
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
        self.header = BamHeader(text=text, names=names, lengths=lengths)
        self._data = data
        self._rec_start = pos
        # Native SoA record index (the HTSlib-equivalent scan): offsets +
        # core fields for every record, so per-chromosome iteration can
        # skip non-matching records without Python-parsing them.
        self._index = None
        try:
            from delly_tpu import native
            self._index = native.bam_scan(data, pos)
        except Exception:
            self._index = None

    def __iter__(self):
        return self.records()

    def _parse_at(self, pos: int):
        data = self._data
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
        rec.qname = data[p : p + l_read_name - 1].decode()
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
        return rec

    def records(self, tid: int | None = None):
        """Iterate alignment records, optionally filtered to one reference.

        Records in a coordinate-sorted BAM come out position-sorted, matching
        the reference's indexed per-chromosome iteration order.
        """
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
        while pos + 4 <= n:
            (block_size,) = struct.unpack_from("<i", data, pos)
            (refid,) = struct.unpack_from("<i", data, pos + 4)
            if tid is None or refid == tid:
                yield self._parse_at(pos)
            pos += 4 + block_size

    def core_index(self):
        """SoA core-field arrays for vectorized pre-filtering
        (offsets/tid/pos/flag/mapq/mtid/mpos/tlen/lqseq). Built natively
        at open time; falls back to a struct walk here."""
        if self._index is None:
            self._index = self._build_index_python()
        return self._index

    def _build_index_python(self):
        data = self._data
        n = len(data)
        pos = self._rec_start
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

    def mapped_count(self, tid: int) -> int:
        """Whether a chromosome has mapped reads (role of hts_idx_get_stat)."""
        if self._index is not None:
            m = (self._index["tid"] == tid) \
                & ((self._index["flag"] & FUNMAP) == 0)
            return int(m.any())
        for rec in self.records(tid=tid):
            if not rec.flag & FUNMAP:
                return 1
        return 0
