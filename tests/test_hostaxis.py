"""Multi-process (host-axis) layer tests.

Each test launches REAL OS processes that bring up
jax.distributed.initialize over localhost (CPU backend, gloo
collectives) and form one global mesh spanning both processes —
the configuration SURVEY.md §7.7 prescribes for pod runs, validated
without TPU hardware.
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "hostaxis_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_world(case: str, tmpdir, nproc: int = 2, timeout: int = 300,
              worker=WORKER, extra=()):
    """Launch an nproc-process world; returns per-process result dicts."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("DELLY_TPU_DIST", None)
    root = os.path.dirname(HERE)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, worker, case, str(pid), str(nproc),
             str(port), str(tmpdir), *extra],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = []
    for pid, p in enumerate(procs):
        try:
            so, se = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {pid} timed out")
        if p.returncode != 0:
            pytest.fail(f"worker {pid} rc={p.returncode}\n"
                        f"stdout:\n{so.decode()}\nstderr:\n{se.decode()}")
        with open(os.path.join(str(tmpdir), f"p{pid}.pkl"), "rb") as fh:
            outs.append(pickle.load(fh))
    return outs


def test_primitives_two_process(tmp_path):
    outs = run_world("primitives", tmp_path)
    # both processes observe the same gathered object list
    assert outs[0]["gather"] == outs[1]["gather"]
    assert outs[0]["gather"][0] == {"pid": 0, "data": [0, 0, 0]}
    assert outs[0]["gather"][1] == {"pid": 1, "data": [1, 1, 1]}
    # ownership partitions the plan (round-robin, disjoint, covering)
    assert outs[0]["plan"] == [0, 2, 4, 6]
    assert outs[1]["plan"] == [1, 3, 5]
    # writer gate: exactly process 0
    assert outs[0]["writer"] is True
    assert outs[1]["writer"] is False
    # exchange_owned merges per-key products identically everywhere
    want = {k: f"p{k % 2}:{k}" for k in range(7)}
    assert outs[0]["merged"] == want
    assert outs[1]["merged"] == want


def test_sr_pipeline_two_process_byte_identical(tmp_path):
    """run_sr under a 2-process world: interval-owned scan/assembly
    decode, exchanged products, process-0 VCF — byte-identical to the
    1-process run (SURVEY §7.7 / BASELINE 2-host target)."""
    d2 = tmp_path / "two"
    d1 = tmp_path / "one"
    d2.mkdir()
    d1.mkdir()
    outs2 = run_world("sr_e2e", d2)
    assert [o["rc"] for o in outs2] == [0, 0]
    assert outs2[0]["nproc_seen"] == 2
    outs1 = run_world("sr_e2e", d1, nproc=1)
    assert outs1[0]["rc"] == 0
    v2 = (d2 / "out.vcf").read_bytes()
    v1 = (d1 / "out.vcf").read_bytes()
    assert v2 == v1
    body = [ln for ln in v2.decode().splitlines()
            if not ln.startswith("#")]
    assert len(body) == 1 and "SVTYPE=DEL" in body[0]


def test_sr_multicontig_two_process_byte_identical(tmp_path):
    """Multi-contig mixed-SV genome under 2 processes: both processes
    own real chromosome subsets, cross-chromosome pairs resolve through
    the replayed automaton, output byte-identical to 1 process."""
    d2 = tmp_path / "two"
    d1 = tmp_path / "one"
    d2.mkdir()
    d1.mkdir()
    outs2 = run_world("sr_multi", d2, timeout=600)
    assert [o["rc"] for o in outs2] == [0, 0]
    outs1 = run_world("sr_multi", d1, nproc=1, timeout=600)
    assert outs1[0]["rc"] == 0

    def _norm(p):
        # the ##reference line embeds the per-world tmp path; all
        # other bytes must match exactly
        return [ln for ln in p.read_bytes().splitlines()
                if not ln.startswith(b"##reference=")]

    v2l = _norm(d2 / "out.vcf")
    assert v2l == _norm(d1 / "out.vcf")
    v2 = b"\n".join(v2l)
    body = [ln for ln in v2.decode().splitlines()
            if not ln.startswith("#")]
    types = {ln.split("SVTYPE=")[1].split(";")[0] for ln in body}
    assert {"DEL", "DUP", "INV", "INS", "BND"} <= types


def test_sr_multicontig_three_process_byte_identical(tmp_path):
    """Process counts beyond two: a 3-process world over the
    multi-contig corpus (uneven ownership: 4 chromosomes over 3
    owners) must still match the 1-process bytes."""
    d3 = tmp_path / "three"
    d1 = tmp_path / "one"
    d3.mkdir()
    d1.mkdir()
    outs3 = run_world("sr_multi", d3, nproc=3, timeout=600)
    assert [o["rc"] for o in outs3] == [0, 0, 0]
    outs1 = run_world("sr_multi", d1, nproc=1, timeout=600)
    assert outs1[0]["rc"] == 0

    def _norm(p):
        return [ln for ln in p.read_bytes().splitlines()
                if not ln.startswith(b"##reference=")]

    assert _norm(d3 / "out.vcf") == _norm(d1 / "out.vcf")


def test_lr_two_process_byte_identical(tmp_path):
    """run_lr under 2 processes: sharded junction scan, distributed
    consensus tasks, chromosome-owned genotyping with the
    translocation attempt tape — byte-identical to 1 process."""
    d2 = tmp_path / "two"
    d1 = tmp_path / "one"
    d2.mkdir()
    d1.mkdir()
    outs2 = run_world("lr_multi", d2, timeout=600)
    assert [o["rc"] for o in outs2] == [0, 0]
    outs1 = run_world("lr_multi", d1, nproc=1, timeout=600)
    assert outs1[0]["rc"] == 0

    def _norm(p):
        return [ln for ln in p.read_bytes().splitlines()
                if not ln.startswith(b"##reference=")]

    v2l = _norm(d2 / "out.vcf")
    assert v2l == _norm(d1 / "out.vcf")
    body = [ln.decode() for ln in v2l if not ln.startswith(b"#")]
    types = {ln.split("SVTYPE=")[1].split(";")[0] for ln in body}
    assert "BND" in types and "DEL" in types


def test_cnv_multicontig_two_process_identical(tmp_path):
    """cnv driver under 2 processes: all three read passes sharded by
    chromosome, covfile blocks and CNV calls stitched in order —
    outputs identical to 1 process."""
    import gzip

    d2 = tmp_path / "two"
    d1 = tmp_path / "one"
    d2.mkdir()
    d1.mkdir()
    outs2 = run_world("cnv_multi", d2, timeout=600)
    assert [o["rc"] for o in outs2] == [0, 0]
    outs1 = run_world("cnv_multi", d1, nproc=1, timeout=600)
    assert outs1[0]["rc"] == 0
    with gzip.open(d2 / "out.cov.gz") as fh:
        cov2 = fh.read()
    with gzip.open(d1 / "out.cov.gz") as fh:
        cov1 = fh.read()
    assert cov2 == cov1
    assert cov2.count(b"\n") > 100

    def _norm(p):
        return [ln for ln in p.read_bytes().splitlines()
                if not ln.startswith(b"##reference=")]

    assert _norm(d2 / "out.vcf") == _norm(d1 / "out.vcf")


def test_sr_regenotyping_two_process_byte_identical(tmp_path):
    """`sr -v sites` under 2 processes (the cohort workflow's
    genotyping step): annotate tapes exchange, output byte-identical
    to 1 process."""
    d2 = tmp_path / "two"
    d1 = tmp_path / "one"
    d2.mkdir()
    d1.mkdir()
    outs2 = run_world("sr_regeno", d2, timeout=600)
    assert [o["rc"] for o in outs2] == [0, 0]
    outs1 = run_world("sr_regeno", d1, nproc=1, timeout=600)
    assert outs1[0]["rc"] == 0

    def _norm(p):
        return [ln for ln in p.read_bytes().splitlines()
                if not ln.startswith(b"##reference=")]

    assert _norm(d2 / "out.vcf") == _norm(d1 / "out.vcf")


def test_sr_multisample_two_process_byte_identical(tmp_path):
    """Two input BAMs (tumor/control) under 2 processes: per-file
    interval ownership and the per-file serial replay hold across
    samples — output byte-identical to 1 process."""
    d2 = tmp_path / "two"
    d1 = tmp_path / "one"
    d2.mkdir()
    d1.mkdir()
    outs2 = run_world("sr_pair", d2, timeout=600)
    assert [o["rc"] for o in outs2] == [0, 0]
    outs1 = run_world("sr_pair", d1, nproc=1, timeout=600)
    assert outs1[0]["rc"] == 0

    def _norm(p):
        return [ln for ln in p.read_bytes().splitlines()
                if not ln.startswith(b"##reference=")]

    v2l = _norm(d2 / "out.vcf")
    assert v2l == _norm(d1 / "out.vcf")
    # two-sample FORMAT columns present
    chrom = next(ln for ln in v2l if ln.startswith(b"#CHROM"))
    assert len(chrom.split(b"\t")) == 11


def test_merge_gated_to_writer_process(tmp_path):
    """A pod-wide script chains sr then merge: the sr stage shards,
    the merge stage runs on process 0 only, and both processes exit
    cleanly through the barrier."""
    outs = run_world("merge_gate", tmp_path, timeout=600)
    assert [o["rc"] for o in outs] == [0, 0]
    assert outs[0]["merged_exists"] is True


def test_kernels_global_mesh_match_single_process(tmp_path):
    """The production batched kernels over a 2-process global mesh
    must equal the single-process (1-process world) results bit for
    bit, on every process."""
    outs2 = run_world("kernels", tmp_path)
    assert outs2[0]["edist"] == outs2[1]["edist"]
    assert outs2[0]["cnv"][0] == outs2[1]["cnv"][0]

    d1 = str(tmp_path / "single")
    os.makedirs(d1, exist_ok=True)
    outs1 = run_world("kernels", d1, nproc=1)
    assert outs2[0]["edist"] == outs1[0]["edist"]
    cn2, logr2, tot2 = outs2[0]["cnv"]
    cn1, logr1, tot1 = outs1[0]["cnv"]
    assert cn2 == cn1
    assert logr2 == logr1
    assert tot2 == tot1
