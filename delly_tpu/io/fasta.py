"""FASTA reader with .fai support, from scratch.

Mirrors the role of HTSlib faidx in the reference (e.g. faidx_fetch_seq
in src/shortpe.h:88, src/coverage.h:187): with a .fai (built on demand
when absent, like fai_build), fetches seek straight to the requested
chromosome slice — memory stays O(chromosome), never O(genome). An LRU
of one chromosome backs the drivers' per-chromosome loops. Sequences
come back as raw strings in file case; callers uppercase where the
reference does.

Bgzip-compressed genomes (.fa.gz) are supported like htslib faidx:
random access goes through a .gzi block index (htslib-compatible
binary format, built on demand when absent) mapping uncompressed
offsets to BGZF blocks, so fetches still inflate only the blocks
covering the requested slice.
"""

from __future__ import annotations

import os
import struct


class _BgzfText:
    """Random access over a bgzip file's UNCOMPRESSED byte space via a
    .gzi block index (role of htslib's bgzf_index / .gzi)."""

    def __init__(self, path: str):
        self.path = path
        self._c_offs: list[int] = [0]
        self._u_offs: list[int] = [0]
        gzi = path + ".gzi"
        loaded = False
        if (os.path.exists(gzi)
                and os.path.getmtime(gzi) >= os.path.getmtime(path)):
            try:
                self._load_gzi(gzi)
                loaded = True
            except (struct.error, OSError):
                # truncated/corrupt sidecar: rebuild from the file
                self._c_offs = [0]
                self._u_offs = [0]
        if not loaded:
            self._build_index()
            if len(self._c_offs) < 2 and getattr(self, "usize", 0) == 0:
                # gzip magic but no BGZF blocks: plain gzip — random
                # access is impossible (htslib faidx rejects this too)
                raise ValueError(
                    f"{path}: compressed with plain gzip, not bgzip — "
                    f"faidx random access requires BGZF")
            try:
                self._write_gzi(gzi)
            except OSError:
                pass

    def _load_gzi(self, gzi: str) -> None:
        with open(gzi, "rb") as fh:
            raw = fh.read()
        (n,) = struct.unpack_from("<Q", raw, 0)
        for k in range(n):
            c, u = struct.unpack_from("<QQ", raw, 8 + 16 * k)
            self._c_offs.append(c)
            self._u_offs.append(u)

    def _write_gzi(self, gzi: str) -> None:
        # temp + rename: a partial write must never leave a corrupt
        # sidecar newer than the fasta
        tmp = gzi + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(struct.pack("<Q", len(self._c_offs) - 1))
            for c, u in zip(self._c_offs[1:], self._u_offs[1:]):
                fh.write(struct.pack("<QQ", c, u))
        os.replace(tmp, gzi)

    def _build_index(self) -> None:
        """Header-hop over the BGZF blocks recording (compressed,
        uncompressed) start offsets — no inflation."""
        from delly_tpu.io.bgzf import _block_size_at
        with open(self.path, "rb") as fh:
            c = 0
            u = 0
            while True:
                size = _block_size_at(fh, c)
                if size <= 0:
                    break
                fh.seek(c + size - 4)
                tail = fh.read(4)
                if len(tail) < 4:
                    break
                (isize,) = struct.unpack("<I", tail)
                c += size
                u += isize
                if isize == 0:       # EOF block
                    break
                self._c_offs.append(c)
                self._u_offs.append(u)
        self.usize = u

    def read(self, u_start: int, u_end: int) -> bytes:
        """Uncompressed bytes [u_start, u_end): inflate only the
        covering blocks."""
        import bisect

        from delly_tpu.io.bgzf import bgzf_decompress
        if u_end <= u_start:
            return b""
        bi = bisect.bisect_right(self._u_offs, u_start) - 1
        bj = bisect.bisect_left(self._u_offs, u_end)
        c_lo = self._c_offs[bi]
        c_hi = (self._c_offs[bj] if bj < len(self._c_offs)
                else os.path.getsize(self.path))
        with open(self.path, "rb") as fh:
            fh.seek(c_lo)
            comp = fh.read(c_hi - c_lo)
        data = bgzf_decompress(comp)
        rel = u_start - self._u_offs[bi]
        return data[rel:rel + (u_end - u_start)]

    def iter_chunks(self, chunk_blocks: int = 4096):
        """Sequential decompressed chunks (for the .fai build pass)."""
        from delly_tpu.io.bgzf import bgzf_decompress
        with open(self.path, "rb") as fh:
            n = len(self._c_offs)
            k = 0
            csize = os.path.getsize(self.path)
            while k < n:
                c_lo = self._c_offs[k]
                k2 = min(k + chunk_blocks, n)
                c_hi = self._c_offs[k2] if k2 < n else csize
                fh.seek(c_lo)
                comp = fh.read(c_hi - c_lo)
                if not comp:
                    break
                yield bgzf_decompress(comp)
                k = k2


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        self.names: list[str] = []
        self.lengths: dict[str, int] = {}
        # .fai columns: name, length, byte offset, bases/line, bytes/line
        self._fai: dict[str, tuple[int, int, int, int]] = {}
        self._cache: tuple[str | None, str] = (None, "")
        self._bgzf: _BgzfText | None = None
        with open(path, "rb") as fh:
            if fh.read(2) == b"\x1f\x8b":
                self._bgzf = _BgzfText(path)
        self._load_fai()

    def _load_fai(self) -> None:
        fai = self.path + ".fai"
        if not os.path.exists(fai) \
                or os.path.getmtime(fai) < os.path.getmtime(self.path):
            # (re)index: the freshly-built table is authoritative even
            # when the .fai cannot be (re)written (read-only mount with
            # a stale index would otherwise serve wrong byte offsets)
            for name, ln, off, lb, lw in self._build_fai(fai):
                self.names.append(name)
                self.lengths[name] = ln
                self._fai[name] = (ln, off, lb, lw)
            return
        with open(fai) as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 5:
                    name = parts[0]
                    self.names.append(name)
                    self.lengths[name] = int(parts[1])
                    self._fai[name] = (int(parts[1]), int(parts[2]),
                                      int(parts[3]), int(parts[4]))

    def _raw_lines(self):
        """Lines (with terminators) of the possibly-compressed text."""
        if self._bgzf is None:
            with open(self.path, "rb") as fh:
                yield from fh
            return
        tail = b""
        for chunk in self._bgzf.iter_chunks():
            buf = tail + chunk
            lines = buf.split(b"\n")
            tail = lines.pop()
            for ln in lines:
                yield ln + b"\n"
        if tail:
            yield tail

    def _build_fai(self, fai_path: str) -> list[tuple]:
        """fai_build equivalent: one sequential pass recording offsets
        (uncompressed-space offsets for bgzipped genomes, like htslib)."""
        rows = []
        name = None
        seq_len = 0
        line_bases = 0
        line_bytes = 0
        offset = 0
        first_line = True
        pos = 0
        for raw in self._raw_lines():
            n = len(raw)
            line = raw.rstrip(b"\r\n")
            if line.startswith(b">"):
                if name is not None:
                    rows.append((name, seq_len, offset, line_bases,
                                 line_bytes))
                name = line[1:].split()[0].decode()
                seq_len = 0
                first_line = True
                offset = pos + n
            else:
                if first_line and line:
                    line_bases = len(line)
                    line_bytes = n
                    first_line = False
                seq_len += len(line)
            pos += n
        if name is not None:
            rows.append((name, seq_len, offset, line_bases, line_bytes))
        try:
            with open(fai_path, "w") as fh:
                for r in rows:
                    fh.write("\t".join(str(x) for x in r) + "\n")
        except OSError:
            pass  # read-only location: caller keeps the table in memory
        return rows

    def has_seq(self, name: str) -> bool:
        return name in self._fai

    def fetch(self, name: str, start: int = 0, end: int | None = None) -> str:
        """0-based half-open fetch; clamps to sequence bounds. Seeks via
        the .fai offsets; whole-chromosome fetches hit a 1-entry cache."""
        length, offset, line_bases, line_bytes = self._fai[name]
        if end is None:
            end = length
        start = max(0, start)
        end = min(length, end)
        if end <= start:
            return ""
        cname, cseq = self._cache
        if cname == name:
            return cseq[start:end]
        if start == 0 and end == length:
            seq = self._read_range(offset, 0, length, line_bases,
                                   line_bytes)
            self._cache = (name, seq)
            return seq
        return self._read_range(offset, start, end, line_bases, line_bytes)

    def _read_range(self, offset: int, start: int, end: int,
                    line_bases: int, line_bytes: int) -> str:
        if line_bases <= 0:
            return ""
        byte_start = offset + (start // line_bases) * line_bytes \
            + start % line_bases
        byte_end = offset + ((end - 1) // line_bases) * line_bytes \
            + (end - 1) % line_bases + 1
        if self._bgzf is not None:
            raw = self._bgzf.read(byte_start, byte_end)
        else:
            with open(self.path, "rb") as fh:
                fh.seek(byte_start)
                raw = fh.read(byte_end - byte_start)
        return raw.replace(b"\n", b"").replace(b"\r", b"").decode()
