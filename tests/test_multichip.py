"""Multi-chip production-path parity.

The sharded path is the production kernel under shard_map
(parallel/dispatch.py): distances are integers and the tally logic runs
on the gathered vector in job order, so an 8-device run must be
BYTE-identical to a 1-device run. These tests assert that end-to-end on
the bundled example data over the virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax

from delly_tpu.ops.edist import (
    MODE_HW, MODE_NW, MODE_SHW, batched_pairs_distance,
)
from delly_tpu.parallel import dispatch
from delly_tpu.parallel.genotype_step import run_sr_on_mesh
from delly_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")
    return make_mesh(8)


def test_sharded_distances_match_single_device(mesh):
    rng = np.random.default_rng(5)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for _ in range(137):  # deliberately not a multiple of 8
        qa = letters[rng.integers(0, 4, size=rng.integers(5, 80))]
        tb = letters[rng.integers(0, 4, size=rng.integers(5, 120))]
        pairs.append((qa.tobytes().decode(), tb.tobytes().decode()))
    for mode in (MODE_NW, MODE_SHW, MODE_HW):
        single = np.asarray(batched_pairs_distance(pairs, mode))
        with dispatch.use_mesh(mesh):
            sharded = np.asarray(batched_pairs_distance(pairs, mode))
        np.testing.assert_array_equal(single, sharded)


def test_sr_vcf_byte_identical_1_vs_8_devices(mesh, example_dir):
    bam = f"{example_dir}/sr.bam"
    ref = f"{example_dir}/ref.fa"
    mesh1 = make_mesh(1)
    vcf1 = run_sr_on_mesh(mesh1, bam, ref)
    vcf8 = run_sr_on_mesh(mesh, bam, ref)
    assert vcf8 == vcf1
    body = [ln for ln in vcf8.splitlines()
            if ln and not ln.startswith("#")]
    assert len(body) == 1 and "SVTYPE=DEL" in body[0]


def test_sr_multi_sv_dataset_byte_identical_on_mesh(mesh, tmp_path):
    """Synthetic multi-contig dataset (several DELs + noise) through
    the full sr pipeline: 8-device == 1-device byte-for-byte."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import make_multi_contig_del_dataset

    bam, fa, truth = make_multi_contig_del_dataset(
        str(tmp_path), n_contigs=3, contig_len=80_000,
        error_rate=0.005, name="mesh_sr")
    vcf1 = run_sr_on_mesh(make_mesh(1), bam, fa)
    vcf8 = run_sr_on_mesh(mesh, bam, fa)
    assert vcf8 == vcf1
    body = [ln for ln in vcf8.splitlines()
            if ln and not ln.startswith("#")]
    assert len(body) == len(truth)


def test_lr_vcf_byte_identical_1_vs_8_devices(mesh, tmp_path):
    """lr engine (probe genotyping + consensus device batches) under
    the mesh: 8-device == 1-device byte-for-byte."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import make_lr_genome_dataset

    from delly_tpu.models.config import LrConfig
    from delly_tpu.models.lr import run_lr

    bam, fa, truth = make_lr_genome_dataset(
        str(tmp_path), n_contigs=1, contig_len=200_000,
        reads_per_contig=60, var_reads=12, error_rate=0.02,
        name="mesh_lr")
    outs = {}
    for label, m in (("one", make_mesh(1)), ("eight", mesh)):
        out = str(tmp_path / f"lr_{label}.vcf")
        cfg = LrConfig(genome=fa, files=[bam], outfile=out)
        with dispatch.use_mesh(m):
            assert run_lr(cfg) == 0
        outs[label] = open(out).read()
    assert outs["one"] == outs["eight"]
    body = [ln for ln in outs["eight"].splitlines()
            if ln and not ln.startswith("#")]
    assert len(body) == len(truth)


def test_cnv_vcf_byte_identical_1_vs_8_devices(mesh, tmp_path):
    """cnv engine under the mesh: 8-device == 1-device byte-for-byte
    (window depth math shared with parallel/depth_step)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import make_multi_contig_del_dataset

    from delly_tpu.models.coral import CnvConfig, run_cnv

    bam, fa, _truth = make_multi_contig_del_dataset(
        str(tmp_path), n_contigs=2, contig_len=120_000,
        pairs_per_contig=2500, name="mesh_cnv")
    outs = {}
    for label, m in (("one", make_mesh(1)), ("eight", mesh)):
        out = str(tmp_path / f"cnv_{label}.vcf")
        cfg = CnvConfig(genome=fa, bam_file=bam, outfile=out)
        with dispatch.use_mesh(m):
            assert run_cnv(cfg) == 0
        outs[label] = open(out).read()
    assert outs["one"] == outs["eight"]
