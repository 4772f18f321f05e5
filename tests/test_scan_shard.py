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


def test_scan_sharded_byte_identical_with_exclude(tmp_path, monkeypatch):
    """The sharded phase A's exclusion-interval branch (full_chrom ==
    False, reference shortpe.h:349-350 valid-interval iteration) must
    stay byte-identical across worker counts and shard sizes."""
    from bamsynth import make_multi_sv_dataset
    bam, fa, _truth = make_multi_sv_dataset(
        str(tmp_path), n_contigs=2, contig_len=100_000,
        pairs_per_contig=1500)
    excl = tmp_path / "excl.bed"
    excl.write_text("chr1\t10000\t30000\nchr2\t60000\t80000\n")

    def run(out, threads):
        from delly_tpu.models.config import SrConfig
        from delly_tpu.models.sr import run_sr
        cfg = SrConfig(genome=fa, files=[bam], outfile=out,
                       exclude=str(excl), max_threads=threads)
        assert run_sr(cfg) == 0
        return open(out).read()

    base = run(str(tmp_path / "x1.vcf"), 1)
    got = run(str(tmp_path / "x4.vcf"), 4)
    assert got == base
    monkeypatch.setenv("DELLY_TPU_SCAN_SHARD_ROWS", "41")
    got = run(str(tmp_path / "x4s.vcf"), 4)
    assert got == base
    # exclusion semantics hold under sharding: no calls inside the
    # excluded windows
    for ln in base.splitlines():
        if ln.startswith("#"):
            continue
        c, p = ln.split("\t")[0], int(ln.split("\t")[1])
        assert not (c == "chr1" and 11000 < p < 29000), ln
        assert not (c == "chr2" and 61000 < p < 79000), ln


def _phase_a_worker(args):
    """Runs in a SEPARATE PROCESS (a stand-in host): opens its own
    reader, computes one chromosome-interval shard of scan phase A and
    returns the plain (junction-dict, candidate-arrays) value."""
    bam_path, fa, cfg, ref_index, lo, hi, nchr = args
    import numpy as np

    from delly_tpu.io.bam import BamFile
    from delly_tpu.models import sr as srm
    from delly_tpu.utils.stats import get_library_params
    bam = BamFile(bam_path, genome=fa)
    valid_regions = [[(0, ln)] for ln in bam.header.lengths]
    lib = get_library_params(bam, valid_regions, cfg.mad_cutoff, 9)
    view = bam.chrom(ref_index)
    out = srm._scan_phase_a(cfg, view, lib, ref_index,
                            valid_regions[ref_index], True,
                            np.ones(nchr, dtype=bool), lo, hi)
    bam.close()
    return out


def test_scan_phase_a_cross_process_merge(tmp_path):
    """Host-axis readiness (SURVEY §7.7): phase-A shard results are
    plain values, so shards computed in SEPARATE PROCESSES (each with
    its own reader — the multi-host data plane in miniature) merge to
    records byte-identical to the in-process scan."""
    import multiprocessing
    from concurrent.futures import ProcessPoolExecutor

    import numpy as np

    from bamsynth import make_multi_contig_del_dataset
    from delly_tpu.io.bam import BamFile
    from delly_tpu.models import sr as srm
    from delly_tpu.models.config import SrConfig
    from delly_tpu.utils.stats import get_library_params

    bam_path, fa, _truth = make_multi_contig_del_dataset(
        str(tmp_path), n_contigs=2, contig_len=60_000,
        error_rate=0.005, name="xproc")
    cfg = SrConfig(genome=fa, files=[bam_path])
    bam = BamFile(bam_path, genome=fa)
    header = bam.header
    cfg.nchr = header.n_targets
    valid_regions = [[(0, ln)] for ln in header.lengths]
    lib = get_library_params(bam, valid_regions, cfg.mad_cutoff, 9)
    valid_mask = np.ones(header.n_targets, dtype=bool)

    # reference: fully in-process, one shard per chromosome
    want_records = [[] for _ in range(10)]
    want_bp = {}
    matetra = {}
    jobs = []
    for ri in range(header.n_targets):
        view = bam.chrom(ri)
        n = len(view)
        rb, ca = srm._scan_phase_a(cfg, view, lib, ri,
                                   valid_regions[ri], True,
                                   valid_mask, 0, n)
        srm._merge_read_bp(want_bp, [rb])
        srm._scan_phase_b(cfg, lib, ri, ca, want_records, matetra)
        # shard plan for the cross-process run: 3 row ranges per chrom
        jobs.append([(bam_path, fa, cfg, ri, lo, hi, header.n_targets)
                     for lo, hi in srm._shard_bounds(n, 3)])
    bam.close()

    got_records = [[] for _ in range(10)]
    got_bp = {}
    matetra2 = {}
    lib2 = get_library_params(BamFile(bam_path, genome=fa),
                              valid_regions, cfg.mad_cutoff, 9)
    # spawn, not fork: the parent holds JAX's thread pools and a
    # forked child can deadlock on their locks (os.fork warning)
    with ProcessPoolExecutor(
            2, mp_context=multiprocessing.get_context("spawn")) as ex:
        for ri, chrom_jobs in enumerate(jobs):
            parts = list(ex.map(_phase_a_worker, chrom_jobs))
            srm._merge_read_bp(got_bp, [p[0] for p in parts])
            ca = srm._merge_cands([p[1] for p in parts])
            srm._scan_phase_b(cfg, lib2, ri, ca, got_records, matetra2)

    for svt in range(10):
        assert len(got_records[svt]) == len(want_records[svt])
        for a, b in zip(got_records[svt], want_records[svt]):
            assert a == b
    assert set(got_bp) == set(want_bp)
    any_junctions = False
    for seed in want_bp:
        assert len(got_bp[seed]) == len(want_bp[seed])
        any_junctions = True
        for a, b in zip(got_bp[seed], want_bp[seed]):
            assert a == b
    assert any_junctions
    assert sum(len(r) for r in want_records) > 0


def test_shard_bounds_cover_and_order():
    from delly_tpu.models.sr import _shard_bounds
    for n in (0, 1, 7, 100, 1000):
        for w in (1, 3, 8, 64):
            b = _shard_bounds(n, w)
            assert b[0][0] == 0 and b[-1][1] == n
            for (a1, b1), (a2, b2) in zip(b, b[1:]):
                assert b1 == a2 and a1 < b1


def test_kitchen_sink_cross_feature_byte_identity(tmp_path, monkeypatch):
    """Feature intersection: two samples (one transcoded to CRAM), an
    exclude file, sharded scan workers, tiny shard rows AND an
    8-device mesh — byte-identical to the plain 1-thread no-mesh run."""
    from bamsynth import make_somatic_pair_dataset
    from delly_tpu.io.bam import BamFile
    from delly_tpu.io.cram import write_cram

    tumor, control, fa, germ, soma = make_somatic_pair_dataset(
        str(tmp_path), n_contigs=2, contig_len=100_000)
    cram = str(tmp_path / "control.cram")
    write_cram(BamFile(control), fa, cram)
    excl = tmp_path / "excl.bed"
    excl.write_text("chr2\t70000\t90000\n")

    def run(out, threads, mesh_env):
        import subprocess
        import sys
        env = dict(os.environ)
        env["DELLY_TPU_MESH"] = mesh_env
        env["JAX_PLATFORMS"] = "cpu"
        if mesh_env != "0":
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        env["DELLY_TPU_SCAN_SHARD_ROWS"] = "61"
        r = subprocess.run(
            [sys.executable, "-m", "delly_tpu.cli", "sr", "-g", fa,
             "-x", str(excl), "-h", str(threads), "-o", out,
             tumor, cram],
            capture_output=True, text=True, timeout=590, env=env)
        assert r.returncode == 0, r.stderr[-1500:]
        return open(out).read()

    base = run(str(tmp_path / "plain.vcf"), 1, "0")
    body = [ln for ln in base.splitlines()
            if ln and not ln.startswith("#")]
    assert len(body) >= len(germ)
    got = run(str(tmp_path / "mesh.vcf"), 4, "8")
    assert got == base
