"""FASTA reader with .fai support, from scratch.

Mirrors the role of HTSlib faidx in the reference (e.g. faidx_fetch_seq
in src/shortpe.h:88, src/coverage.h:187): with a .fai (built on demand
when absent, like fai_build), fetches seek straight to the requested
chromosome slice — memory stays O(chromosome), never O(genome). An LRU
of one chromosome backs the drivers' per-chromosome loops. Sequences
come back as raw strings in file case; callers uppercase where the
reference does.
"""

from __future__ import annotations

import os


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        self.names: list[str] = []
        self.lengths: dict[str, int] = {}
        # .fai columns: name, length, byte offset, bases/line, bytes/line
        self._fai: dict[str, tuple[int, int, int, int]] = {}
        self._cache: tuple[str | None, str] = (None, "")
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

    def _build_fai(self, fai_path: str) -> list[tuple]:
        """fai_build equivalent: one sequential pass recording offsets."""
        rows = []
        with open(self.path, "rb") as fh:
            name = None
            seq_len = 0
            line_bases = 0
            line_bytes = 0
            offset = 0
            first_line = True
            pos = 0
            for raw in fh:
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
        with open(self.path, "rb") as fh:
            fh.seek(byte_start)
            raw = fh.read(byte_end - byte_start)
        return raw.replace(b"\n", b"").replace(b"\r", b"").decode()
