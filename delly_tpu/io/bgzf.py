"""BGZF (blocked gzip) codec, from scratch.

BGZF is the container format used by BAM/BCF/bgzipped-VCF: a series of gzip
members, each at most 64 KiB uncompressed, carrying an extra subfield
(SI1=66, SI2=67) holding BSIZE = total block size - 1. The reference uses
HTSlib for this (src/htslib submodule); we implement it directly on zlib.
"""

from __future__ import annotations

import struct
import zlib

# Maximum uncompressed payload per BGZF block.
MAX_BLOCK_PAYLOAD = 65280

# Canonical 28-byte BGZF EOF marker block.
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def is_gzip(path: str) -> bool:
    with open(path, "rb") as fh:
        magic = fh.read(2)
    return magic == b"\x1f\x8b"


def bgzf_decompress(data: bytes, threads: int | None = None) -> bytes:
    """Decompress a multi-member gzip/BGZF byte string.

    Prefers the native multithreaded codec (delly_tpu/native/hostio.cpp,
    the HTSlib-equivalent host plane); falls back to pure Python.
    `threads` caps the codec's internal pool — callers that already
    parallelize across buffers (the view-decode pipeline) pass 1 to
    avoid oversubscription.
    """
    try:
        from delly_tpu import native
        res = native.bgzf_inflate(data, threads)
        if res is not None:
            return res
    except Exception:
        pass
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # Tolerate trailing garbage/zero padding after the EOF block.
        if data[pos : pos + 2] != b"\x1f\x8b":
            break
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(data[pos:])
        out.append(chunk)
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def bgzf_decompress_file(path: str) -> bytes:
    with open(path, "rb") as fh:
        return bgzf_decompress(fh.read())


def _block_size_at(fh, coffset: int) -> int:
    """Total compressed size of the BGZF block at `coffset` (0 at EOF)."""
    fh.seek(coffset)
    head = fh.read(18)
    if len(head) < 18 or head[:2] != b"\x1f\x8b":
        return 0
    (xlen,) = struct.unpack_from("<H", head, 10)
    extra = head[12:18]
    if xlen > 6:
        extra = head[12:] + fh.read(xlen - 6)
    off = 0
    while off + 4 <= xlen:
        si1, si2 = extra[off], extra[off + 1]
        (slen,) = struct.unpack_from("<H", extra, off + 2)
        if si1 == 66 and si2 == 67 and slen == 2:
            return struct.unpack_from("<H", extra, off + 4)[0] + 1
        off += 4 + slen
    return 0


class BgzfReader:
    """Random-access BGZF reader: decompresses only the blocks covering
    a requested virtual-offset range. This is the seek machinery behind
    indexed region queries (role of HTSlib's bgzf_seek + bam_read1 under
    sam_itr_next)."""

    def __init__(self, path: str, threads: int | None = None):
        self.path = path
        self._threads = threads
        self._fh = open(path, "rb")

    def close(self):
        self._fh.close()

    def read_voffset_range(self, vbeg: int, vend: int) -> bytes:
        """Uncompressed bytes for the virtual-offset range [vbeg, vend).

        vbeg/vend are BGZF virtual offsets ((coffset << 16) | uoffset).
        A vend with uoffset 0 ends at the start of its block."""
        cbeg, ubeg = vbeg >> 16, vbeg & 0xFFFF
        cend, uend = vend >> 16, vend & 0xFFFF
        fh = self._fh
        if cend > cbeg and uend == 0:
            # range ends exactly at a block boundary
            fh.seek(cbeg)
            comp = fh.read(cend - cbeg)
            if ubeg:
                try:
                    from delly_tpu import native
                    r = native.bgzf_inflate_range(comp, ubeg, 0,
                                                  self._threads)
                    if r is not None:
                        return r
                except Exception:
                    pass
            data = bgzf_decompress(comp, self._threads)
            return data[ubeg:] if ubeg else data
        last_size = _block_size_at(fh, cend)
        fh.seek(cbeg)
        comp = fh.read(cend + last_size - cbeg)
        # size of the final block's payload = ISIZE trailer
        if last_size >= 8 and cend + last_size - cbeg <= len(comp):
            (isize,) = struct.unpack_from("<I", comp,
                                          cend - cbeg + last_size - 4)
        else:
            isize = 0
        tail_drop = isize - min(uend, isize)
        try:
            # head/tail trim inside the native inflate pass: skips the
            # output-sized slice copy (hot on whole-contig views)
            from delly_tpu import native
            r = native.bgzf_inflate_range(comp, ubeg, tail_drop,
                                          self._threads)
            if r is not None:
                return r
        except Exception:
            pass
        data = bgzf_decompress(comp, self._threads)
        if not data:
            return b""
        end = len(data) - tail_drop
        return data[ubeg:end]

    def read_blocks(self, coff: int, max_bytes: int):
        """Decompress consecutive blocks starting at compressed offset
        `coff` until at least `max_bytes` uncompressed (or EOF).
        Returns (data, next_coff)."""
        fh = self._fh
        start = coff
        got = 0
        while got < max_bytes:
            size = _block_size_at(fh, coff)
            if size <= 0:
                break
            fh.seek(coff + size - 4)
            isz = fh.read(4)
            if len(isz) < 4:
                break
            got += struct.unpack("<I", isz)[0]
            coff += size
        if coff == start:
            return b"", start
        fh.seek(start)
        return bgzf_decompress(fh.read(coff - start), self._threads), coff

    def read_prefix_blocks(self, max_bytes: int) -> bytes:
        """Decompress blocks from the file start until at least
        `max_bytes` of uncompressed data (or EOF). Walks block headers
        to find the boundary, then inflates the span in one call."""
        fh = self._fh
        coff = 0
        got = 0
        while got < max_bytes:
            size = _block_size_at(fh, coff)
            if size <= 0:
                break
            fh.seek(coff + size - 4)
            isz = fh.read(4)
            if len(isz) < 4:
                break
            got += struct.unpack("<I", isz)[0]
            coff += size
        fh.seek(0)
        return bgzf_decompress(fh.read(coff))


def _bgzf_block(payload: bytes, level: int = 6) -> bytes:
    comp = zlib.compressobj(level, zlib.DEFLATED, -15)
    cdata = comp.compress(payload) + comp.flush()
    # BSIZE = total block size - 1 = header(18) + cdata + crc(4) + isize(4) - 1
    bsize = 18 + len(cdata) + 8 - 1
    header = (
        b"\x1f\x8b\x08\x04"      # ID1 ID2 CM FLG(FEXTRA)
        + b"\x00\x00\x00\x00"    # MTIME
        + b"\x00\xff"            # XFL OS
        + struct.pack("<H", 6)    # XLEN
        + b"BC"                  # SI1 SI2
        + struct.pack("<H", 2)    # SLEN
        + struct.pack("<H", bsize)
    )
    trailer = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload))
    return header + cdata + trailer


def bgzf_compress(data: bytes, level: int = 6, eof: bool = True) -> bytes:
    """Compress bytes into a BGZF stream (with EOF marker by default)."""
    try:
        from delly_tpu import native
        res = native.bgzf_deflate(data, level=level, eof=eof)
        if res is not None:
            return res
    except Exception:
        pass
    blocks = []
    for off in range(0, len(data), MAX_BLOCK_PAYLOAD):
        blocks.append(_bgzf_block(data[off : off + MAX_BLOCK_PAYLOAD], level))
    if not data:
        blocks.append(_bgzf_block(b"", level))
    if eof:
        blocks.append(BGZF_EOF)
    return b"".join(blocks)


def bgzf_compress_to_file(path: str, data: bytes, level: int = 6) -> None:
    with open(path, "wb") as fh:
        fh.write(bgzf_compress(data, level))
