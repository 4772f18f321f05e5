"""BCF2.2 binary codec (reader + writer), from scratch.

Implements the BCF2 record layout from the VCFv4.3/BCFv2.2
specification on top of the BGZF codec: typed descriptors, the
header-order dictionary of FILTER/INFO/FORMAT IDs (PASS implicitly
first), contig index mapping, and the shared/indiv record blocks. This
fills the role of HTSlib's vcf.c (reference modvcf.h writes BCF through
bcf_write1 / bcf_hdr_*).

Integration is by conversion: `vcf_text_to_bcf` serializes a complete
VCF text document to BCF bytes, `bcf_to_vcf_text` inflates a BCF file
back to VCF text — so every pipeline keeps producing/consuming text
records internally while .bcf paths hold conformant binary BCF.
"""

from __future__ import annotations

import re
import struct

from delly_tpu.io.bgzf import bgzf_compress, bgzf_decompress

MAGIC = b"BCF\x02\x02"

# typed-value atom types (spec table)
T_INT8, T_INT16, T_INT32, T_FLOAT, T_CHAR = 1, 2, 3, 5, 7

INT8_MISSING = -128
INT16_MISSING = -32768
INT32_MISSING = -2147483648
# NaN sentinels must be written with their exact payload bits; routing
# them through Python floats would canonicalize the NaN payload.
FLOAT_MISSING_BYTES = struct.pack("<I", 0x7F800001)
FLOAT_VECTOR_END_BYTES = struct.pack("<I", 0x7F800002)
MISSING = object()      # marker for a missing float value
VECTOR_END = object()   # marker for a float vector-end value


def _pack_float(v) -> bytes:
    if v is MISSING:
        return FLOAT_MISSING_BYTES
    if v is VECTOR_END:
        return FLOAT_VECTOR_END_BYTES
    return struct.pack("<f", float(v))


def _typed_descriptor(atom: int, length: int) -> bytes:
    """Type descriptor byte (+ typed int length when >= 15)."""
    if length < 15:
        return bytes([(length << 4) | atom])
    return bytes([(15 << 4) | atom]) + _typed_int(length)


def _typed_int(v: int) -> bytes:
    if -120 <= v <= 127:
        return bytes([(1 << 4) | T_INT8]) + struct.pack("<b", v)
    if -32000 <= v <= 32767:
        return bytes([(1 << 4) | T_INT16]) + struct.pack("<h", v)
    return bytes([(1 << 4) | T_INT32]) + struct.pack("<i", v)


def _typed_string(s: str) -> bytes:
    b = s.encode()
    return _typed_descriptor(T_CHAR, len(b)) + b


def _typed_ints(vals: list) -> bytes:
    if not vals:
        return bytes([T_INT8])  # length-0 vector
    lo, hi = min(vals), max(vals)
    if -120 <= lo and hi <= 127:
        return (_typed_descriptor(T_INT8, len(vals))
                + struct.pack(f"<{len(vals)}b", *vals))
    if -32000 <= lo and hi <= 32767:
        return (_typed_descriptor(T_INT16, len(vals))
                + struct.pack(f"<{len(vals)}h", *vals))
    return (_typed_descriptor(T_INT32, len(vals))
            + struct.pack(f"<{len(vals)}i", *vals))


def _typed_floats(vals: list) -> bytes:
    return (_typed_descriptor(T_FLOAT, len(vals))
            + b"".join(_pack_float(v) for v in vals))


class _HeaderDicts:
    """IDX dictionaries from the header text (spec 6.2.1): the string
    dictionary covers FILTER/INFO/FORMAT IDs in order of appearance
    with PASS at index 0; contigs index in order of ##contig lines."""

    def __init__(self, header_lines: list):
        self.strings = ["PASS"]
        self.sidx = {"PASS": 0}
        self.contigs = []
        self.cidx = {}
        self.info_type = {}    # ID -> (Type, Number)
        self.format_type = {}
        self.filter_decl = {"PASS"}   # PASS is implicit (IDX 0)
        rx = re.compile(r"##(FILTER|INFO|FORMAT)=<ID=([^,>]+)")
        rx_type = re.compile(r"Type=([A-Za-z]+)")
        rx_num = re.compile(r"Number=([^,>]+)")
        rx_contig = re.compile(r"##contig=<ID=([^,>]+)")
        for line in header_lines:
            m = rx.match(line)
            if m:
                kind, name = m.groups()
                if name not in self.sidx:
                    self.sidx[name] = len(self.strings)
                    self.strings.append(name)
                t = rx_type.search(line)
                n = rx_num.search(line)
                typ = t.group(1) if t else "String"
                num = n.group(1) if n else "."
                if kind == "INFO":
                    self.info_type[name] = (typ, num)
                elif kind == "FORMAT":
                    self.format_type[name] = (typ, num)
                else:
                    self.filter_decl.add(name)
                continue
            m = rx_contig.match(line)
            if m:
                name = m.group(1)
                if name not in self.cidx:
                    self.cidx[name] = len(self.contigs)
                    self.contigs.append(name)


def _encode_value(typ: str, raw, n_allele: int):
    """Encode one INFO/FORMAT value string per its declared type."""
    if typ == "Flag":
        return bytes([T_INT8])  # length-0 vector marks a set flag
    parts = str(raw).split(",")
    if typ == "Integer":
        vals = []
        for p in parts:
            if p in (".", ""):
                vals.append(INT32_MISSING)
            else:
                vals.append(int(float(p)))
        return _typed_ints(vals)
    if typ == "Float":
        vals = []
        for p in parts:
            vals.append(MISSING if p in (".", "") else float(p))
        return _typed_floats(vals)
    return _typed_string(str(raw))


def _encode_gt(gt: str) -> list:
    """GT string -> BCF allele-int encoding ((allele+1)<<1 | phased)."""
    phased = "|" in gt
    out = []
    for i, a in enumerate(gt.replace("|", "/").split("/")):
        if a == ".":
            v = 0
        else:
            v = (int(a) + 1) << 1
        if i > 0 and phased:
            v |= 1
        out.append(v)
    return out


def vcf_text_to_bcf(text: str, with_index: bool = False):
    """Serialize a complete VCF text document to BCF2.2 bytes.

    With with_index=True returns (bcf_bytes, n_ref, records) where
    records = [(tid, beg, end, uncompressed_offset), ...] for CSI
    construction (end from INFO/END when present, htslib rlen rule).
    """
    header_lines = []
    body = []
    column_header = ""
    for line in text.split("\n"):
        if not line:
            continue
        if line.startswith("##"):
            header_lines.append(line)
        elif line.startswith("#CHROM"):
            column_header = line
        else:
            body.append(line)
    d = _HeaderDicts(header_lines)
    samples = column_header.split("\t")[9:] if column_header else []
    n_sample = len(samples)

    # contigs must exist for every record chromosome
    for line in body:
        chrom = line.split("\t", 1)[0]
        if chrom not in d.cidx:
            d.cidx[chrom] = len(d.contigs)
            d.contigs.append(chrom)
            header_lines.append(f"##contig=<ID={chrom}>")

    # FILTER/INFO/FORMAT keys used by the body but absent from the
    # header would otherwise be appended to the IDX dictionary at
    # encode time with no matching header line — unresolvable by any
    # conformant reader (htslib rebuilds the dictionary purely from
    # header lines). Pre-pass the body and synthesize declarations.
    def _declare(name: str, hline: str, kind_map, kind_val=None):
        # the string dictionary is shared across contexts, but a reader
        # resolves an ID per context — an ID declared only as INFO still
        # needs a ##FORMAT line when the body uses it in FORMAT
        if name not in d.sidx:
            d.sidx[name] = len(d.strings)
            d.strings.append(name)
        if name in kind_map:
            return
        header_lines.append(hline)
        if isinstance(kind_map, set):
            kind_map.add(name)
        else:
            kind_map[name] = kind_val
    for line in body:
        cols = line.split("\t")
        if len(cols) < 8:
            continue
        filt, info = cols[6], cols[7]
        if filt not in (".", ""):
            for f in filt.split(";"):
                _declare(f, f'##FILTER=<ID={f},Description="{f}">',
                         d.filter_decl)
        for item in info.split(";"):
            if not item or item == ".":
                continue
            if "=" in item:
                k, _v = item.split("=", 1)
                _declare(k, f'##INFO=<ID={k},Number=.,Type=String,'
                            f'Description="{k}">',
                         d.info_type, ("String", "."))
            else:
                _declare(item, f'##INFO=<ID={item},Number=0,Type=Flag,'
                               f'Description="{item}">',
                         d.info_type, ("Flag", "0"))
        if len(cols) > 8:
            for k in cols[8].split(":"):
                if k == "GT":
                    _declare(k, '##FORMAT=<ID=GT,Number=1,Type=String,'
                                'Description="Genotype">',
                             d.format_type, ("String", "1"))
                else:
                    _declare(k, f'##FORMAT=<ID={k},Number=.,Type=String,'
                                f'Description="{k}">',
                             d.format_type, ("String", "."))

    htext = "\n".join(header_lines + [column_header]) + "\n\x00"
    out = bytearray()
    out += MAGIC
    hbytes = htext.encode()
    out += struct.pack("<I", len(hbytes))
    out += hbytes

    rec_meta = []
    for line in body:
        cols = line.split("\t")
        chrom, pos, vid, ref, alt, qual, filt, info = cols[:8]
        fmt_keys = cols[8].split(":") if len(cols) > 8 else []
        sample_cols = cols[9:9 + n_sample]

        alleles = [ref] + ([a for a in alt.split(",")] if alt not in
                           (".", "") else [])
        n_allele = len(alleles)

        # htslib sets rlen from INFO/END when present (symbolic SVs)
        end_pos = int(pos) - 1 + len(ref)
        for item in info.split(";"):
            if item.startswith("END="):
                try:
                    end_pos = int(item[4:])
                except ValueError:
                    pass
                break
        rlen = max(end_pos - (int(pos) - 1), len(ref))

        shared = bytearray()
        shared += struct.pack("<i", d.cidx[chrom])
        shared += struct.pack("<i", int(pos) - 1)
        shared += struct.pack("<i", rlen)
        shared += _pack_float(MISSING if qual in (".", "")
                              else float(qual))

        info_items = []
        for item in info.split(";"):
            if not item or item == ".":
                continue
            if "=" in item:
                k, v = item.split("=", 1)
            else:
                k, v = item, None
            info_items.append((k, v))
        shared += struct.pack("<I",
                              (n_allele << 16) | (len(info_items) & 0xFFFF))
        shared += struct.pack("<I",
                              (len(fmt_keys) << 24) | (n_sample & 0xFFFFFF))
        shared += (_typed_string(vid) if vid not in (".",)
                   else _typed_descriptor(T_CHAR, 0))
        for a in alleles:
            shared += _typed_string(a)
        # FILTER
        if filt in (".", ""):
            shared += bytes([T_INT8])
        else:
            fids = []
            for f in filt.split(";"):
                if f not in d.sidx:
                    d.sidx[f] = len(d.strings)
                    d.strings.append(f)
                fids.append(d.sidx[f])
            shared += _typed_ints(fids)
        # INFO
        for k, v in info_items:
            if k not in d.sidx:
                d.sidx[k] = len(d.strings)
                d.strings.append(k)
            shared += _typed_int(d.sidx[k])
            typ = d.info_type.get(k, ("Flag" if v is None else "String",
                                      "."))[0]
            if v is None and typ != "Flag":
                typ = "Flag"
            shared += _encode_value(typ, v, n_allele)

        indiv = bytearray()
        for key in fmt_keys:
            if key not in d.sidx:
                d.sidx[key] = len(d.strings)
                d.strings.append(key)
            indiv += _typed_int(d.sidx[key])
            typ = d.format_type.get(key, ("String", "."))[0]
            svals = [sc.split(":")[fmt_keys.index(key)]
                     if len(sc.split(":")) > fmt_keys.index(key) else "."
                     for sc in sample_cols]
            if key == "GT":
                encs = [_encode_gt(v if v not in (".", "") else "./.")
                        for v in svals]
                width = max((len(e) for e in encs), default=0)
                indiv += _typed_descriptor(T_INT8, width)
                for e in encs:
                    e = e + [0x81] * (width - len(e))  # vector end
                    indiv += struct.pack(f"<{width}b",
                                         *[x - 256 if x > 127 else x
                                           for x in e])
            elif typ == "Integer":
                encs = []
                for v in svals:
                    vals = []
                    for p in str(v).split(","):
                        vals.append(INT32_MISSING if p in (".", "")
                                    else int(float(p)))
                    encs.append(vals)
                width = max(len(e) for e in encs)
                for e in encs:
                    e += [INT32_MISSING + 1] * (width - len(e))
                flat = [x for e in encs for x in e]
                lo = min(flat)
                hi = max(flat)
                if -120 <= lo and hi <= 127:
                    atom, fmt, miss, vend = T_INT8, "b", INT8_MISSING, \
                        INT8_MISSING + 1
                elif -32000 <= lo and hi <= 32767:
                    atom, fmt, miss, vend = T_INT16, "h", INT16_MISSING, \
                        INT16_MISSING + 1
                else:
                    atom, fmt, miss, vend = T_INT32, "i", INT32_MISSING, \
                        INT32_MISSING + 1
                indiv += _typed_descriptor(atom, width)
                for e in encs:
                    vals = [miss if x == INT32_MISSING
                            else (vend if x == INT32_MISSING + 1 else x)
                            for x in e]
                    indiv += struct.pack(f"<{width}{fmt}", *vals)
            elif typ == "Float":
                encs = []
                for v in svals:
                    vals = [MISSING if p in (".", "") else float(p)
                            for p in str(v).split(",")]
                    encs.append(vals)
                width = max(len(e) for e in encs)
                for e in encs:
                    e += [VECTOR_END] * (width - len(e))
                indiv += _typed_descriptor(T_FLOAT, width)
                for e in encs:
                    indiv += b"".join(_pack_float(x) for x in e)
            else:  # String
                bl = [str(v).encode() for v in svals]
                width = max((len(b) for b in bl), default=1)
                width = max(width, 1)
                indiv += _typed_descriptor(T_CHAR, width)
                for b in bl:
                    indiv += b.ljust(width, b"\x00")

        # index interval = the record's rlen span (htslib
        # bcf_index_build bins by rlen), not just INFO/END
        rec_meta.append((d.cidx[chrom], int(pos) - 1,
                         int(pos) - 1 + rlen, len(out)))
        out += struct.pack("<II", len(shared), len(indiv))
        out += shared
        out += indiv

    # IDX annotations are implicit (order of appearance); recomputing
    # the header for FILTER ids appended mid-body is unnecessary because
    # delly always declares its filters.
    bcf_bytes = bgzf_compress(bytes(out))
    if with_index:
        return bcf_bytes, len(d.contigs), rec_meta
    return bcf_bytes


# ---------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------

class _Cursor:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def u32(self) -> int:
        return struct.unpack_from("<I", self.read(4))[0]

    def i32(self) -> int:
        return struct.unpack_from("<i", self.read(4))[0]

    def f32(self) -> float:
        return struct.unpack_from("<f", self.read(4))[0]


def _read_typed(cur: _Cursor):
    """Read one typed value -> (atom, list-of-values or str)."""
    desc = cur.read(1)[0]
    atom = desc & 0x0F
    length = desc >> 4
    if length == 15:
        _, inner = _read_typed(cur)
        length = inner[0]
    if atom == 0:
        return atom, []
    if atom == T_CHAR:
        return atom, cur.read(length).decode("latin-1")
    if atom == T_INT8:
        return atom, list(struct.unpack_from(f"<{length}b",
                                             cur.read(length)))
    if atom == T_INT16:
        return atom, list(struct.unpack_from(f"<{length}h",
                                             cur.read(2 * length)))
    if atom == T_INT32:
        return atom, list(struct.unpack_from(f"<{length}i",
                                             cur.read(4 * length)))
    if atom == T_FLOAT:
        raw = cur.read(4 * length)
        vals = []
        for i in range(length):
            bits = struct.unpack_from("<I", raw, 4 * i)[0]
            if bits == 0x7F800001:
                vals.append(MISSING)
            elif bits == 0x7F800002:
                vals.append(VECTOR_END)
            else:
                vals.append(struct.unpack_from("<f", raw, 4 * i)[0])
        return atom, vals
    raise ValueError(f"unknown BCF atom type {atom}")


_MISSING_BY_ATOM = {T_INT8: INT8_MISSING, T_INT16: INT16_MISSING,
                    T_INT32: INT32_MISSING}


def _fmt_scalar(atom, v):
    if atom == T_FLOAT:
        if v is MISSING or v is VECTOR_END:
            return "."
        return f"{v:g}"
    if v == _MISSING_BY_ATOM.get(atom):
        return "."
    return str(v)


def is_bcf(data: bytes) -> bool:
    # any 2.x minor (htslib accepts major == 2; 2.1 records use the
    # same layout for everything this reader consumes)
    return data[:4] == MAGIC[:4]


def bcf_to_vcf_text(data: bytes) -> str:
    """Inflate a BCF2 file (raw bytes, BGZF-compressed) to VCF text."""
    raw = bgzf_decompress(data)
    if not is_bcf(raw):
        raise ValueError("not a BCF2 file")
    cur = _Cursor(raw, 5)
    l_text = cur.u32()
    htext = cur.read(l_text).split(b"\x00")[0].decode()
    header_lines = [l for l in htext.split("\n") if l]
    d = _HeaderDicts(header_lines)
    column_header = next((l for l in header_lines
                          if l.startswith("#CHROM")), "")
    n_sample = max(0, len(column_header.split("\t")) - 9)
    out = [l for l in header_lines]

    while cur.pos + 8 <= len(raw):
        l_shared = cur.u32()
        l_indiv = cur.u32()
        end = cur.pos + l_shared + l_indiv
        chrom_id = cur.i32()
        pos0 = cur.i32()
        _rlen = cur.i32()
        qual_raw = cur.read(4)
        qual_bits = struct.unpack("<I", qual_raw)[0]
        qual = struct.unpack("<f", qual_raw)[0]
        n_ai = cur.u32()
        n_allele = n_ai >> 16
        n_info = n_ai & 0xFFFF
        n_fs = cur.u32()
        n_fmt = n_fs >> 24
        nsmp = n_fs & 0xFFFFFF
        _, vid = _read_typed(cur)
        alleles = []
        for _ in range(n_allele):
            _, a = _read_typed(cur)
            alleles.append(a)
        _, filt_ids = _read_typed(cur)
        if isinstance(filt_ids, str):
            filt_ids = [ord(c) for c in filt_ids]
        filt = (";".join(d.strings[i] for i in filt_ids)
                if filt_ids else ".")
        info_parts = []
        for _ in range(n_info):
            _, kid = _read_typed(cur)
            key = d.strings[kid[0] if isinstance(kid, list) else int(kid)]
            atom, vals = _read_typed(cur)
            if atom == 0 or vals == []:
                info_parts.append(key)
            elif isinstance(vals, str):
                info_parts.append(f"{key}={vals}")
            else:
                info_parts.append(
                    f"{key}=" + ",".join(_fmt_scalar(atom, v)
                                         for v in vals))
        qual_str = "." if qual_bits == 0x7F800001 else f"{qual:g}"
        chrom = d.contigs[chrom_id]
        row = [chrom, str(pos0 + 1), vid if vid else ".", alleles[0],
               ",".join(alleles[1:]) if n_allele > 1 else ".",
               qual_str, filt,
               ";".join(info_parts) if info_parts else "."]

        # FORMAT / samples
        if n_fmt:
            fmt_keys = []
            sample_vals = [[] for _ in range(nsmp)]
            for _ in range(n_fmt):
                _, kid = _read_typed(cur)
                key = d.strings[kid[0] if isinstance(kid, list)
                                else int(kid)]
                fmt_keys.append(key)
                desc = cur.buf[cur.pos]
                atom = desc & 0x0F
                width = desc >> 4
                cur.pos += 1
                if width == 15:
                    _, inner = _read_typed(cur)
                    width = inner[0]
                for s in range(nsmp):
                    if atom == T_CHAR:
                        v = cur.read(width).rstrip(b"\x00").decode(
                            "latin-1")
                        sample_vals[s].append(v if v else ".")
                    elif atom == T_FLOAT:
                        fraw = cur.read(4 * width)
                        outv = []
                        for i in range(width):
                            bits = struct.unpack_from("<I", fraw,
                                                      4 * i)[0]
                            if bits == 0x7F800002:
                                break
                            if bits == 0x7F800001:
                                outv.append(".")
                            else:
                                outv.append("{:g}".format(
                                    struct.unpack_from("<f", fraw,
                                                       4 * i)[0]))
                        sample_vals[s].append(",".join(outv) or ".")
                    else:
                        size = {T_INT8: 1, T_INT16: 2, T_INT32: 4}[atom]
                        fmtc = {T_INT8: "b", T_INT16: "h",
                                T_INT32: "i"}[atom]
                        vals = struct.unpack_from(
                            f"<{width}{fmtc}", cur.read(size * width))
                        if key == "GT":
                            gt = []
                            seps = []
                            for i, v in enumerate(vals):
                                if v == _MISSING_BY_ATOM[atom] + 1:
                                    break
                                allele = (v >> 1) - 1
                                gt.append("." if allele < 0
                                          else str(allele))
                                if i > 0:
                                    seps.append("|" if v & 1 else "/")
                            s_out = gt[0] if gt else "."
                            for sep, g in zip(seps, gt[1:]):
                                s_out += sep + g
                            sample_vals[s].append(s_out)
                        else:
                            outv = []
                            for v in vals:
                                if v == _MISSING_BY_ATOM[atom] + 1:
                                    break
                                outv.append(
                                    "." if v == _MISSING_BY_ATOM[atom]
                                    else str(v))
                            sample_vals[s].append(",".join(outv) or ".")
            row.append(":".join(fmt_keys))
            for s in range(nsmp):
                row.append(":".join(sample_vals[s]))
        out.append("\t".join(row))
        cur.pos = end
    out_text = "\n".join([l for l in out if not l.startswith("#CHROM")
                          and l.startswith("#")]
                         + [column_header]
                         + [l for l in out if not l.startswith("#")])
    return out_text + "\n"
