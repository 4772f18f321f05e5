"""Native host-I/O codec + pangenome graph parsing tests."""

import numpy as np
import pytest

from delly_tpu import native
from delly_tpu.io.bam import BamFile
from delly_tpu.models.pangenome import (
    AlignRecord, Graph, parse_align_record, parse_gaf_cigar, parse_gfa,
)

LR_BAM = "/root/reference/example/lr.bam"


@pytest.fixture(scope="module")
def lib():
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    return native


def test_native_inflate_matches_python(lib):
    data = open(LR_BAM, "rb").read()
    out = lib.bgzf_inflate(data)
    from delly_tpu.io import bgzf
    # pure-python path (bypass the native shortcut)
    import zlib
    pos = 0
    parts = []
    n = len(data)
    while pos < n:
        if data[pos:pos + 2] != b"\x1f\x8b":
            break
        d = zlib.decompressobj(wbits=31)
        parts.append(d.decompress(data[pos:]))
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    assert out == b"".join(parts)


def test_native_deflate_roundtrip(lib):
    payload = bytes(range(256)) * 1000
    comp = lib.bgzf_deflate(payload)
    assert lib.bgzf_inflate(comp) == payload
    # empty input still yields a valid stream with EOF marker
    comp0 = lib.bgzf_deflate(b"")
    assert lib.bgzf_inflate(comp0) == b""


def test_native_bam_scan_matches_parser(lib):
    bf = BamFile(LR_BAM)
    scan = lib.bam_scan(bf._data, bf._rec_start)
    py = [(r.tid, r.pos, r.flag, r.mapq, r.l_qseq)
          for r in bf.records()]
    assert len(scan["offsets"]) == len(py)
    nat = list(zip(scan["tid"].tolist(), scan["pos"].tolist(),
                   scan["flag"].tolist(), scan["mapq"].tolist(),
                   scan["lqseq"].tolist()))
    assert nat == py


GFA = """S\ts1\tACGTACGTAC
S\ts2\tGGGGCCCC
L\ts1\t+\ts2\t+\t0M
"""

GAF_LINE = ("read1\t100\t5\t95\t+\t>s1>s2\t18\t2\t16\t80\t90\t60\t"
            "cg:Z:50M10D40M")


def test_parse_gfa(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_text(GFA)
    g = parse_gfa(str(p))
    assert len(g.offset) == 2
    assert g.nodeseq(0) == "ACGTACGTAC"
    assert g.nodeseq(1) == "GGGGCCCC"
    assert g.nodelen(1) == 8
    assert len(g.links) == 1
    assert g.smap == {"s1": 0, "s2": 1}


def test_parse_gaf_record(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_text(GFA)
    g = parse_gfa(str(p))
    parsed = parse_align_record(GAF_LINE, g)
    assert parsed is not None
    ar, qname = parsed
    assert qname == "read1"
    assert ar.qlen == 100
    assert ar.path == [(True, 0), (True, 1)]
    assert ar.cigarop == [0, 2, 0]  # M D M
    assert ar.cigarlen == [50, 10, 40]
    assert ar.mapq == 60


def test_parse_gaf_cigar():
    ar = AlignRecord()
    parse_gaf_cigar("5M2I3D", ar)
    assert ar.cigarlen == [5, 2, 3]
    assert ar.cigarop == [0, 1, 2]
