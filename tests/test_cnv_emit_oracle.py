"""Differential oracle for the CNV BCF emission plane.

tests/cnv_emit_probe.cpp compiles the reference's cnv.h AS-IS and runs
the real mergeAdjacentSameCN + cnvVCF (with bolog.h's _computeCNLs) and
the re-genotyping reader parseVcfCNV over the functional text-mode vcf
layer; this module fuzzes randomized CNV call sets against
delly_tpu/models/cnv.py: the same-CN merge, CN/CNL/GQ/FT genotype
fields, the LowQual / CN==ploidy / callable-fraction gates, the
genotyping-mode pass-through, and the VCF->CNV parse round trip.
"""

import os
import random
import shutil
import subprocess
import types

import pytest

from delly_tpu.models.cnv import (
    CNV, cnv_vcf, merge_adjacent_same_cn, parse_vcf_cnv,
)
from delly_tpu.io.bcf import bcf_to_vcf_text

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__),
                         "cnv_emit_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "cnv.h"))):
        pytest.skip("g++ or reference cnv.h unavailable")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", SHIM_DIR,
                        "-I", REF_SRC, PROBE_SRC])

    def run(lines):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


class _Hdr:
    def __init__(self, nchr, lens):
        self.names = [str(i) for i in range(nchr)]
        self.lengths = list(lens)

    @property
    def n_targets(self):
        return len(self.names)

    def name2id(self, name):
        try:
            return self.names.index(name)
        except ValueError:
            return -1


def _gen_cnvs(rng, nchr, lens, geno):
    cnvs = []
    for c in range(nchr):
        pos = 5000
        while pos < lens[c] - 60000:
            size = rng.randint(2000, 40000)
            ci = rng.randint(20, 800)
            srl = rng.choice([0, 0, rng.randint(1, 8)])
            srr = rng.choice([0, 0, rng.randint(1, 8)])
            cn = rng.choice([-1.0, 0.12, 0.97, 2.0, 2.04, 2.5, 3.1,
                             4.02, 7.7])
            mp = rng.choice([0.3, 0.85, 0.95, 1.0])
            cnvs.append(dict(
                chr=c, start=pos, end=pos + size,
                cil=-ci, cih=ci, cel=-ci, ceh=ci,
                qval=rng.randint(0, 400) if geno else 0,
                srl=srl, srr=srr, cn=cn, mappable=mp,
                uniqfrac=rng.choice([-1.0, 0.5, 0.93]),
                sd=rng.choice([0.025, 0.08, 0.31]),
                id=f"CNV{len(cnvs):08d}" if geno else "."))
            pos += size + rng.randint(500, 20000)
    return cnvs


def _my_body(cnvs, nchr, lens, ploidy, min_callable, merge_tol, geno,
             tmp_path, tag):
    hdr = _Hdr(nchr, lens)
    my = []
    for d in cnvs:
        v = CNV(chr=d["chr"], start=d["start"], end=d["end"],
                ciposlow=d["cil"], ciposhigh=d["cih"],
                ciendlow=d["cel"], ciendhigh=d["ceh"],
                qval=d["qval"], srleft=d["srl"], srright=d["srr"],
                cn=d["cn"], mappable=d["mappable"],
                uniqfrac=d["uniqfrac"], sd=d["sd"],
                id="" if d["id"] == "." else d["id"])
        my.append(v)
    out = str(tmp_path / f"{tag}.bcf")
    cfg = types.SimpleNamespace(
        ploidy=ploidy, cn_min_callable=min_callable,
        cn_merge_tol=merge_tol, has_geno_file=geno,
        genofile="x" if geno else "", sample_name="0", outfile=out,
        segfile="", genome="ref.fa", bam_file="0", min_cnv_size=0)
    if not geno:
        my = merge_adjacent_same_cn(my, merge_tol)
    cnv_vcf(cfg, hdr, my)
    with open(out, "rb") as fh:
        return [l for l in bcf_to_vcf_text(fh.read()).splitlines()
                if not l.startswith("#")]


def test_cnv_emission_matches_reference(oracle, tmp_path):
    rng = random.Random(777555)
    lines = []
    cases = []
    for case in range(8):
        nchr = rng.randint(1, 2)
        lens = [rng.randint(300000, 2000000) for _ in range(nchr)]
        geno = case % 3 == 2
        ploidy = rng.choice([2, 2, 1])
        min_callable = rng.choice([0.5, 0.9])
        merge_tol = rng.choice([0.3, 0.05])
        cnvs = _gen_cnvs(rng, nchr, lens, geno)
        cases.append((cnvs, nchr, lens, ploidy, min_callable,
                      merge_tol, geno))
        tok = " ".join(
            f"{d['chr']},{d['start']},{d['end']},{d['cil']},{d['cih']},"
            f"{d['cel']},{d['ceh']},{d['qval']},{d['srl']},{d['srr']} "
            f"{d['cn']!r} {d['mappable']!r} {d['uniqfrac']!r} "
            f"{d['sd']!r} {d['id']}"
            for d in cnvs)
        lines.append(
            f"CNVEMIT {ploidy} {min_callable!r} {merge_tol!r} "
            f"{1 if geno else 0} {nchr} "
            + ",".join(str(x) for x in lens) + f" {len(cnvs)} " + tok)
    outs = oracle(lines)
    total = 0
    for k, ((cnvs, nchr, lens, ploidy, min_callable, merge_tol, geno),
            out) in enumerate(zip(cases, outs)):
        ref = [] if out == "-" else out.split("\x01")
        mine = _my_body(cnvs, nchr, lens, ploidy, min_callable,
                        merge_tol, geno, tmp_path, f"c{k}")
        assert len(mine) == len(ref), (k, len(mine), len(ref),
                                       mine[:1], ref[:1])
        for i, (m, r) in enumerate(zip(mine, ref)):
            assert m == r, (k, i, m, r)
        total += len(ref)
    assert total >= 15, total


def test_cnv_parse_round_trip_matches_reference(oracle, tmp_path):
    """parseVcfCNV (cnv.h:463-555) reads a CNV VCF for re-genotyping;
    both sides parse the same emitted file identically."""
    rng = random.Random(424242)
    nchr = 2
    lens = [800000, 900000]
    cnvs = _gen_cnvs(rng, nchr, lens, False)
    mine_body = _my_body(cnvs, nchr, lens, 2, 0.5, 0.3, False,
                         tmp_path, "rt")
    hdr_lines = (
        ["##fileformat=VCFv4.2"]
        + [f"##contig=<ID={i},length={lens[i]}>" for i in range(nchr)]
        + ['##FILTER=<ID=LowQual,Description="L">',
           '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
           '##INFO=<ID=CIPOS,Number=2,Type=Integer,Description="C">',
           '##INFO=<ID=CIEND,Number=2,Type=Integer,Description="C">',
           '##INFO=<ID=MP,Number=1,Type=Float,Description="M">',
           '##INFO=<ID=UNIQ,Number=1,Type=Float,Description="U">',
           '##INFO=<ID=SRL,Number=1,Type=Integer,Description="S">',
           '##INFO=<ID=SRR,Number=1,Type=Integer,Description="S">',
           '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
           '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
           '##FORMAT=<ID=RDCN,Number=1,Type=Float,Description="R">',
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0"])
    vcf = str(tmp_path / "roundtrip.vcf")
    with open(vcf, "w") as fh:
        fh.write("\n".join(hdr_lines + mine_body) + "\n")
    out = oracle([f"CNVPARSE {vcf} {nchr}"])
    ref = [] if out[0] == "-" else out[0].split("|")
    hdr = _Hdr(nchr, lens)
    parsed = parse_vcf_cnv(vcf, hdr)
    mine = [
        f"{v.chr},{v.start},{v.end},{v.ciposlow},{v.ciposhigh},"
        f"{v.ciendlow},{v.ciendhigh},{v.qval},{v.srleft},{v.srright},"
        f"{float(v.cn):g},{float(v.mappable):g},{v.id or '.'}"
        for v in parsed]
    assert mine == ref
    assert len(ref) >= 5
