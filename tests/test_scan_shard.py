"""Interval-sharded scan plane: byte-identity across worker counts.

The PE/SR scan (models/sr.py::scan_pe_and_sr) fans its row-local work
out over per-sample drivers x chromosome-interval row shards and
replays the order-sensitive mate pairing over the concatenated shard
candidates (reference hot loop shortpe.h:354; SURVEY §7.7). These
tests assert the sharded scan is byte-identical to the serial one on
multi-SV synthetic data, for any worker count and shard size —
including a shard size small enough to split every chromosome many
times and a multi-sample run exercising the per-file drivers.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))


def _run_sr(fa, bams, out, threads):
    from delly_tpu.models.config import SrConfig
    from delly_tpu.models.sr import run_sr
    cfg = SrConfig(genome=fa, files=list(bams), outfile=out,
                   max_threads=threads)
    assert run_sr(cfg) == 0
    return open(out).read()


def test_scan_sharded_byte_identical_single_sample(tmp_path, monkeypatch):
    from bamsynth import make_multi_contig_del_dataset
    bam, fa, truth = make_multi_contig_del_dataset(
        str(tmp_path), n_contigs=3, contig_len=80_000,
        error_rate=0.005, name="shard_sr")
    base = _run_sr(fa, [bam], str(tmp_path / "t1.vcf"), threads=1)
    body = [ln for ln in base.splitlines()
            if ln and not ln.startswith("#")]
    assert len(body) == len(truth)
    # 4 workers, default shard size
    got = _run_sr(fa, [bam], str(tmp_path / "t4.vcf"), threads=4)
    assert got == base
    # tiny shards: every chromosome splits into many row ranges
    monkeypatch.setenv("DELLY_TPU_SCAN_SHARD_ROWS", "37")
    got = _run_sr(fa, [bam], str(tmp_path / "t4s.vcf"), threads=4)
    assert got == base


def test_scan_sharded_byte_identical_multi_sample(tmp_path, monkeypatch):
    """Two samples through the per-file scan drivers (reference
    shortpe.h:314-319): any worker count, same bytes."""
    from bamsynth import make_somatic_pair_dataset
    tumor, control, fa, germ, soma = make_somatic_pair_dataset(
        str(tmp_path), n_contigs=2, contig_len=100_000)
    base = _run_sr(fa, [tumor, control], str(tmp_path / "m1.vcf"),
                   threads=1)
    body = [ln for ln in base.splitlines()
            if ln and not ln.startswith("#")]
    assert len(body) >= len(germ)
    got = _run_sr(fa, [tumor, control], str(tmp_path / "m4.vcf"),
                  threads=4)
    assert got == base
    monkeypatch.setenv("DELLY_TPU_SCAN_SHARD_ROWS", "53")
    got = _run_sr(fa, [tumor, control], str(tmp_path / "m4s.vcf"),
                  threads=4)
    assert got == base


def test_shard_bounds_cover_and_order():
    from delly_tpu.models.sr import _shard_bounds
    for n in (0, 1, 7, 100, 1000):
        for w in (1, 3, 8, 64):
            b = _shard_bounds(n, w)
            assert b[0][0] == 0 and b[-1][1] == n
            for (a1, b1), (a2, b2) in zip(b, b[1:]):
                assert b1 == a2 and a1 < b1
