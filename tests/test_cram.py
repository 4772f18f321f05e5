"""CRAM 3.0 codec tests: varints, rANS, full-record round-trip parity
and engine-output identity on CRAM input (io/cram.py)."""

import os
import random
import subprocess
import sys

import numpy as np
import pytest

from delly_tpu.io.bam import BamFile
from delly_tpu.io.cram import (
    rans_decode, rans_encode_order0, read_itf8, read_ltf8, write_cram,
    write_itf8, write_ltf8,
)

EXAMPLE = "/root/reference/example"


def test_itf8_roundtrip():
    rnd = random.Random(1)
    for _ in range(500):
        v = rnd.getrandbits(rnd.randint(1, 31))
        b = write_itf8(v)
        r, p = read_itf8(b, 0)
        assert (r, p) == (v, len(b))


def test_ltf8_roundtrip():
    rnd = random.Random(2)
    for _ in range(500):
        v = rnd.getrandbits(rnd.randint(1, 60))
        b = write_ltf8(v)
        r, p = read_ltf8(b, 0)
        assert (r, p) == (v, len(b))


def test_rans_order0_roundtrip():
    rng = np.random.default_rng(5)
    for payload in (
            bytes(rng.integers(65, 70, 4000).astype(np.uint8)),
            bytes(rng.integers(0, 256, 3333).astype(np.uint8)),
            bytes([9]) * 1000,
            b"A"):
        assert rans_decode(rans_encode_order0(payload)) == payload


def _roundtrip(bam_path, cram_path, use_rans=True):
    bam = BamFile(bam_path)
    write_cram(bam, f"{EXAMPLE}/ref.fa", cram_path, use_rans=use_rans)
    cram = BamFile(cram_path, genome=f"{EXAMPLE}/ref.fa")
    a, b = bam.core_index(), cram.core_index()
    for k in a:
        assert np.array_equal(a[k], b[k]), k
    for x, y in zip(bam.records(), cram.records()):
        assert x.qname == y.qname
        assert x.cigar_string() == y.cigar_string()
        assert x.seq == y.seq
        assert bytes(x.qual) == bytes(y.qual)
        assert bytes(x._aux) == bytes(y._aux)


def test_sr_bam_cram_roundtrip(tmp_path):
    _roundtrip(f"{EXAMPLE}/sr.bam", str(tmp_path / "sr.cram"))


def test_lr_bam_cram_roundtrip(tmp_path):
    """Long reads: MM/ML B-array tags, hard clips, SEQ-less secondary
    records (CF 0x8), large CIGARs."""
    _roundtrip(f"{EXAMPLE}/lr.bam", str(tmp_path / "lr.cram"))


def test_gzip_only_blocks(tmp_path):
    _roundtrip(f"{EXAMPLE}/sr.bam", str(tmp_path / "srgz.cram"),
               use_rans=False)


def test_sr_engine_identical_on_cram(tmp_path):
    """The SV caller output must be byte-identical for BAM vs CRAM."""
    cram = str(tmp_path / "sr.cram")
    write_cram(BamFile(f"{EXAMPLE}/sr.bam"), f"{EXAMPLE}/ref.fa", cram)
    outs = []
    for inp in (f"{EXAMPLE}/sr.bam", cram):
        out = str(tmp_path / (os.path.basename(inp) + ".bcf"))
        r = subprocess.run(
            [sys.executable, "-m", "delly_tpu.cli", "sr",
             "-g", f"{EXAMPLE}/ref.fa", "-o", out, inp],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-1500:]
        outs.append(open(out, "rb").read())
    assert outs[0] == outs[1]


def test_native_and_python_slice_decoders_agree(tmp_path):
    """The native slice transcoder and the Python fallback must produce
    identical BAM streams."""
    import delly_tpu.io.cram as C
    cram_path = str(tmp_path / "agree.cram")
    write_cram(BamFile(f"{EXAMPLE}/sr.bam"), f"{EXAMPLE}/ref.fa",
               cram_path)
    raw = open(cram_path, "rb").read()
    fast = C.cram_to_bam_bytes(raw, f"{EXAMPLE}/ref.fa")
    orig = C._decode_slice_native
    C._decode_slice_native = lambda *a, **k: None
    try:
        slow = C.cram_to_bam_bytes(raw, f"{EXAMPLE}/ref.fa")
    finally:
        C._decode_slice_native = orig
    assert fast == slow


def test_mapped_stats_on_streaming_cram(tmp_path):
    """A streaming CRAM has no .bai — the cnv mapped-read estimate must
    take the chunked-scan fallback, not crash on the missing index."""
    from delly_tpu.models.coral import _mapped_stats
    cram = str(tmp_path / "sr.cram")
    write_cram(BamFile(f"{EXAMPLE}/sr.bam"), f"{EXAMPLE}/ref.fa", cram)
    stream = BamFile(cram, genome=f"{EXAMPLE}/ref.fa", streaming=True)
    assert stream.streaming and getattr(stream, "_bai", None) is None
    total, genome_len = _mapped_stats(stream)
    whole = BamFile(f"{EXAMPLE}/sr.bam")
    w_total, w_len = _mapped_stats(whole)
    assert (total, genome_len) == (w_total, w_len)
    stream.close()
