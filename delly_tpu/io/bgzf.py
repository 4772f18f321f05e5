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


def bgzf_decompress(data: bytes) -> bytes:
    """Decompress a multi-member gzip/BGZF byte string.

    Prefers the native multithreaded codec (delly_tpu/native/hostio.cpp,
    the HTSlib-equivalent host plane); falls back to pure Python.
    """
    try:
        from delly_tpu import native
        res = native.bgzf_inflate(data)
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
