"""FASTA reader with .fai support, from scratch.

Mirrors the role of HTSlib faidx in the reference (e.g. faidx_fetch_seq in
src/shortpe.h:88, src/coverage.h:187). Sequences are returned as raw strings
in file case; callers uppercase where the reference does.
"""

from __future__ import annotations

import os


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        self.names: list[str] = []
        self.lengths: dict[str, int] = {}
        self._seqs: dict[str, str] = {}
        self._load()

    def _load(self) -> None:
        fai = self.path + ".fai"
        if os.path.exists(fai):
            with open(fai) as fh:
                for line in fh:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) >= 2:
                        self.names.append(parts[0])
                        self.lengths[parts[0]] = int(parts[1])
        name = None
        chunks: list[str] = []
        with open(self.path) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    if name is not None:
                        self._seqs[name] = "".join(chunks)
                    name = line[1:].split()[0]
                    chunks = []
                    if name not in self.lengths:
                        self.names.append(name)
                else:
                    chunks.append(line)
        if name is not None:
            self._seqs[name] = "".join(chunks)
        for n, s in self._seqs.items():
            self.lengths.setdefault(n, len(s))

    def has_seq(self, name: str) -> bool:
        return name in self._seqs

    def fetch(self, name: str, start: int = 0, end: int | None = None) -> str:
        """0-based half-open fetch; clamps to sequence bounds."""
        seq = self._seqs[name]
        if end is None:
            end = len(seq)
        start = max(0, start)
        end = min(len(seq), end)
        return seq[start:end]
