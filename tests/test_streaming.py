"""Indexed streaming I/O: region queries, bounded memory, e2e parity.

The reference never materializes a BAM — it iterates regions via
BAI/CSI (sam_itr_queryi, shortpe.h:354). These tests pin our
equivalent: per-chromosome views decompress only the indexed chunks,
resident bytes stay O(chromosome) not O(file), and the sr pipeline's
output is byte-identical between whole-file and streaming modes on a
multi-contig dataset with implanted deletions.
"""

import numpy as np
import pytest

from delly_tpu.io.bam import BamFile
from tests.bamsynth import make_multi_contig_del_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    return make_multi_contig_del_dataset(str(d), n_contigs=5)


def test_streaming_views_match_whole_file(dataset):
    bam_path, _fa, _truth = dataset
    whole = BamFile(bam_path, streaming=False)
    stream = BamFile(bam_path, streaming=True)
    assert stream.streaming
    for tid in range(whole.header.n_targets):
        ci = whole.core_index()
        m = ci["tid"] == tid
        v = stream.chrom(tid)
        assert len(v) == int(m.sum())
        for k in ("pos", "flag", "mapq", "mtid", "mpos", "tlen",
                  "lqseq"):
            np.testing.assert_array_equal(v[k], ci[k][m])
        # record payloads identical through the region buffer
        r_s = next(v.records())
        r_w = next(whole.records(tid=tid))
        assert (r_s.qname, r_s.seq, r_s.cigar_string()) == \
            (r_w.qname, r_w.seq, r_w.cigar_string())


def test_streaming_memory_is_region_bounded(dataset):
    bam_path, _fa, _truth = dataset
    import os

    from delly_tpu.io.bgzf import bgzf_decompress_file
    total = len(bgzf_decompress_file(bam_path))
    stream = BamFile(bam_path, streaming=True)
    peak = 0
    for tid in range(stream.header.n_targets):
        v = stream.chrom(tid)
        peak = max(peak, len(v.data))
    # 5 equal contigs: a per-chromosome view must be well under half
    # the decompressed file
    assert peak < total / 2, (peak, total)
    # chunked sequential scan also bounded
    peak_chunk = max(len(v.data)
                     for v in stream.iter_soa_chunks(chunk_bytes=1 << 18))
    assert peak_chunk < total / 2


def test_sr_pipeline_identical_between_modes(dataset, monkeypatch,
                                             tmp_path):
    bam_path, fa, truth = dataset
    from delly_tpu.models.config import SrConfig
    from delly_tpu.models.sr import run_sr

    out = {}
    for mode, thr in (("whole", 1 << 62), ("stream", 0)):
        monkeypatch.setattr("delly_tpu.io.bam.STREAM_THRESHOLD", thr)
        path = str(tmp_path / f"{mode}.vcf")
        cfg = SrConfig(genome=fa, files=[bam_path], outfile=path)
        assert run_sr(cfg) == 0
        out[mode] = open(path).read()
    assert out["whole"] == out["stream"]
    # and the implanted deletions are actually called
    body = [ln.split("\t") for ln in out["stream"].splitlines()
            if ln and not ln.startswith("#")]
    dels = [(c[0], int(c[1])) for c in body if "SVTYPE=DEL" in c[7]]
    called = 0
    for chrom, start, _end in truth:
        if any(c == chrom and abs(p - start) < 60 for c, p in dels):
            called += 1
    assert called >= len(truth) - 1, (called, truth, dels)


def test_cram_streaming_matches_transcode(tmp_path):
    """CRAM region streaming (CramStream) produces the same records
    and identical sr output as the whole-file transcode path."""
    import subprocess
    import sys

    from delly_tpu.io.bam import BamFile
    from delly_tpu.io.cram import write_cram

    ex = "/root/reference/example"
    cram = str(tmp_path / "sr.cram")
    write_cram(BamFile(f"{ex}/sr.bam"), f"{ex}/ref.fa", cram)
    whole = BamFile(cram, genome=f"{ex}/ref.fa", streaming=False)
    stream = BamFile(cram, genome=f"{ex}/ref.fa", streaming=True)
    assert stream._cram is not None
    ci = whole.core_index()
    v = stream.chrom(0)
    m = ci["tid"] == 0
    assert len(v) == int(m.sum())
    for k in ("pos", "flag", "mapq", "mtid", "mpos", "tlen", "lqseq"):
        np.testing.assert_array_equal(v[k], ci[k][m])

    outs = []
    for thr in ("1", str(1 << 62)):
        out = str(tmp_path / f"cram_{thr}.vcf")
        r = subprocess.run(
            [sys.executable, "-m", "delly_tpu.cli", "sr",
             "-g", f"{ex}/ref.fa", "-o", out, cram],
            capture_output=True, text=True, timeout=600,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "HOME": "/root",
                 "DELLY_TPU_STREAM_THRESHOLD": thr})
        assert r.returncode == 0, r.stderr[-1500:]
        outs.append(open(out).read())
    assert outs[0] == outs[1]
    body = [ln for ln in outs[0].splitlines()
            if ln and not ln.startswith("#")]
    assert len(body) == 1 and "SVTYPE=DEL" in body[0]


def test_build_bai_vectorized_parity(tmp_path, monkeypatch):
    """The vectorized .bai assembly must emit byte-identical indexes to
    the scalar reference loop, including metadata pseudo-bins, chunk
    merging and linear-index back-fill (placed-unmapped + multi-window
    spans included)."""
    import random
    import struct as _struct

    from delly_tpu.io import bai as bai_mod
    from tests.bamsynth import encode_record, random_contig, write_bam

    rng = random.Random(5)
    contigs = [(f"c{i}", random_contig(rng, 120_000)) for i in range(3)]
    recs = []
    qid = 0
    for tid, (_n, ref) in enumerate(contigs):
        for _ in range(900):
            p = rng.randint(0, len(ref) - 400)
            if rng.random() < 0.03:
                # placed-unmapped (pseudo-bin only)
                recs.append((tid, p, encode_record(
                    f"u{qid}", 0x4, tid, p, 0, [], -1, -1, 0, "A" * 50)))
            elif rng.random() < 0.05:
                # long span crossing 16kb windows
                recs.append((tid, p, encode_record(
                    f"l{qid}", 0x0, tid, p, 60,
                    [("M", 100), ("N", 20000), ("M", 100)],
                    -1, -1, 0, "A" * 200)))
            else:
                recs.append((tid, p, encode_record(
                    f"r{qid}", 0x0, tid, p, 60, [("M", 100)],
                    -1, -1, 0, "A" * 100)))
            qid += 1
    recs.sort(key=lambda r: (r[0], r[1]))
    bam = str(tmp_path / "p.bam")
    write_bam(bam, contigs, [r[2] for r in recs], index=False)
    raw = open(bam, "rb").read()
    monkeypatch.setattr(bai_mod, "_VEC_THRESHOLD", 1 << 60)
    scalar = bai_mod.build_bai(raw)
    monkeypatch.setattr(bai_mod, "_VEC_THRESHOLD", 0)
    vec = bai_mod.build_bai(raw)
    assert scalar == vec
    # sanity: parses and serves region queries
    idx = bai_mod.parse_bai(vec)
    assert idx.n_ref == 3 and idx.mapped_stat(0) > 0
