"""Differential oracle for the somatic/germline filter engine.

tests/filter_probe.cpp compiles the reference's filter.h AS-IS (minus
its program_options CLI function, sliced off at fixture time) and runs
the real filterRun over a functional text-mode VCF layer; this module
generates randomized cohort VCFs — germline SV cohorts with redundancy
clusters, germline CNV cohorts (both >=50-confident reclassification
and DROP-sized), somatic tumor/control pairs, somatic CNVs — runs OUR
production filter_run on the same files, and byte-compares the output
VCF bodies across soft/hard filtering and PASS-gating configurations:
every gate, the posterior-GQ re-genotyping, popgen EM annotations, CNV
reclassification with recomputed CNLs, and the dosage-R2 collapse.
"""

import os
import random
import shutil
import subprocess

import pytest

from delly_tpu.models.filter import FilterConfig, filter_run

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "filter_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "filter.h"))):
        pytest.skip("g++ or reference filter.h unavailable")
    gen = tmp_path_factory.mktemp("filter_oracle")
    lines = open(os.path.join(REF_SRC, "filter.h")).read().splitlines(
        keepends=True)
    cut = next(i for i, ln in enumerate(lines)
               if "int filter(int argc, char **argv)" in ln)
    (gen / "filter_sliced.h").write_text(
        "".join(lines[:cut]) + "\n}\n\n#endif\n")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", str(gen), "-I", SHIM_DIR,
         "-I", REF_SRC, PROBE_SRC])

    def run(vcf_path, cfg, roles=()):
        args = [exe, vcf_path, cfg.filter,
                str(int(cfg.soft_filter)), str(int(cfg.filter_for_pass)),
                str(cfg.minsize), str(cfg.maxsize), str(cfg.coverage),
                str(cfg.qualthres), str(cfg.rdist), str(cfg.rminshared),
                repr(cfg.ratiogeno), repr(cfg.altaf),
                repr(cfg.controlcont), repr(cfg.genogq), repr(cfg.hwe),
                repr(cfg.rsize), repr(cfg.rcorr), repr(cfg.rddel),
                repr(cfg.rddup), repr(cfg.maxsd), repr(cfg.rec_cnv),
                repr(cfg.pgerm), repr(cfg.cn_offset),
                str(int(cfg.no_refine)), str(int(cfg.no_collapse))]
        args += [f"{n}={r}" for n, r in roles]
        out = subprocess.run(args, capture_output=True, text=True,
                             check=True).stdout
        return [l for l in out.splitlines() if not l.startswith("#")]

    return run


HDR_SV = [
    "##fileformat=VCFv4.2",
    "##contig=<ID=chr1,length=1000000>",
    "##contig=<ID=chr2,length=1000000>",
    '##FILTER=<ID=LowQual,Description="Low quality">',
    '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
    '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
    '##INFO=<ID=INSLEN,Number=1,Type=Integer,Description="I">',
    '##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="P">',
    '##INFO=<ID=IMPRECISE,Number=0,Type=Flag,Description="I">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
    '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="G">',
    '##FORMAT=<ID=RC,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=RCL,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=RCR,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=RR,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=RV,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=DR,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=DV,Number=1,Type=Integer,Description="G">',
]

HDR_CNV = [
    "##fileformat=VCFv4.2",
    "##contig=<ID=chr1,length=5000000>",
    '##FILTER=<ID=LowQual,Description="Low quality">',
    '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
    '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
    '##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="P">',
    '##INFO=<ID=IMPRECISE,Number=0,Type=Flag,Description="I">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
    '##FORMAT=<ID=CN,Number=1,Type=Integer,Description="C">',
    '##FORMAT=<ID=CNL,Number=.,Type=Float,Description="C">',
    '##FORMAT=<ID=RDCN,Number=1,Type=Float,Description="C">',
    '##FORMAT=<ID=RDSD,Number=1,Type=Float,Description="C">',
    '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=FT,Number=1,Type=String,Description="F">',
]


def _col_hdr(samples):
    return ("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(samples))


def _sv_sample(rng, carrier, precise):
    """One SV genotype column GT:GQ:PL:RC:RCL:RCR:RR:RV:DR:DV.

    Invariant of real delly output: a non-missing GT implies the
    GL-driving evidence channel is non-empty (RR+RV for PRECISE,
    DR+DV otherwise) — _computeGLs yields a missing GT on empty
    quality vectors (bolog.h:23-85), so zero-evidence genotyped
    samples cannot occur and would otherwise inject 0/0=NaN into the
    reference's nth_element percentile (UB ordering)."""
    missing = rng.random() < 0.06
    if missing:
        gt, pl = "./.", ".,.,."
    elif carrier:
        gt = rng.choice(["0/1", "0/1", "1/1"])
        pl = (f"{rng.randint(60, 900)},0,{rng.randint(60, 900)}"
              if gt == "0/1" else
              f"{rng.randint(200, 990)},{rng.randint(30, 200)},0")
    else:
        gt = "0/0"
        pl = f"0,{rng.randint(60, 500)},{rng.randint(200, 990)}"
    gq = rng.randint(5, 99)
    rc = rng.randint(200, 1500)
    rcl = rng.randint(300, 1200)
    rcr = rng.randint(300, 1200)
    alt_n = rng.randint(6, 25) if carrier and gt != "0/0" else \
        (rng.randint(0, 1) if rng.random() < 0.2 else 0)
    ref_n = rng.randint(0, 25)
    rr, rv = (ref_n, alt_n) if precise else (rng.randint(0, 4), 0)
    dr, dv = (rng.randint(0, 4), 0) if precise else (ref_n, alt_n)
    if not missing:
        if precise and rr + rv == 0:
            rr = 1
        if not precise and dr + dv == 0:
            dr = 1
    if carrier and rng.random() < 0.3:
        rc = rc // 2  # depth drop
    return f"{gt}:{gq}:{pl}:{rc}:{rcl}:{rcr}:{rr}:{rv}:{dr}:{dv}"


def _gen_sv_cohort(rng, nsmpl, nrec):
    """Germline SV cohort with redundancy clusters across two chroms."""
    samples = [f"S{i}" for i in range(nsmpl)]
    lines = []
    pos = 10000
    k = 0
    while k < nrec:
        chrom = rng.choice(["chr1", "chr2"])
        cluster = rng.randint(1, 3)
        svt = rng.choice(["DEL", "DEL", "DUP", "INV", "INS", "BND"])
        size = rng.randint(50, 20000)
        carriers = set(rng.sample(range(nsmpl),
                                  rng.randint(0, max(1, nsmpl // 3))))
        base_cols = None
        # one evidence channel per cluster: reused columns must satisfy
        # the non-empty-GL-channel invariant for every member record
        precise = rng.random() < 0.7
        for j in range(cluster):
            p = pos + rng.randint(0, 200)
            end = p + int(size * rng.uniform(0.85, 1.15))
            qual = rng.choice([40, 299, 300, 500, 1200])
            filt = rng.choice(["PASS", "PASS", "PASS", "LowQual"])
            inslen = rng.randint(40, 900)
            info = ("PRECISE" if precise else "IMPRECISE")
            info += f";SVTYPE={svt};END={end}"
            if svt == "INS":
                info += f";INSLEN={inslen}"
            if base_cols is None or rng.random() < 0.3:
                cols = [_sv_sample(rng, i in carriers, precise)
                        for i in range(nsmpl)]
                base_cols = cols
            else:
                # correlated genotypes for the dosage-R2 collapse
                cols = [
                    c if rng.random() < 0.9
                    else _sv_sample(rng, rng.random() < 0.3, precise)
                    for c in base_cols]
            lines.append(
                f"{chrom}\t{p}\t{svt}{k:08d}\tN\t<{svt}>\t{qual}\t"
                f"{filt}\t{info}\tGT:GQ:PL:RC:RCL:RCR:RR:RV:DR:DV\t"
                + "\t".join(cols))
            k += 1
            if k >= nrec:
                break
        pos += rng.randint(300, 4000)
    # records must be coordinate-sorted like a BCF
    body = sorted(lines,
                  key=lambda l: (l.split("\t")[0],
                                 int(l.split("\t")[1])))
    return samples, body


def _gen_cnv_cohort(rng, nsmpl, nrec, kind):
    samples = [f"S{i}" for i in range(nsmpl)]
    lines = []
    pos = 50000
    for k in range(nrec):
        size = rng.randint(2000, 80000)
        end = pos + size
        qual = rng.choice([40, 400, 900])
        filt = rng.choice(["PASS", "PASS", "LowQual"])
        if kind == "del":
            base_cn = [2.0] * nsmpl
            for i in rng.sample(range(nsmpl), rng.randint(1, nsmpl // 4)):
                base_cn[i] = rng.choice([0.9, 1.1, 0.1])
        elif kind == "dup":
            base_cn = [2.0] * nsmpl
            for i in rng.sample(range(nsmpl), rng.randint(1, nsmpl // 4)):
                base_cn[i] = rng.choice([2.9, 3.1, 4.05])
        else:  # messy multi-allelic / noisy
            base_cn = [rng.choice([0.2, 1.0, 2.0, 2.0, 3.0, 4.8, 6.1])
                       for _ in range(nsmpl)]
        cols = []
        for i in range(nsmpl):
            cn = base_cn[i] + rng.uniform(-0.08, 0.08)
            rdcn = f"{cn:.4g}"
            if rng.random() < 0.04:
                rdcn = "-1"
            rdsd = f"{rng.uniform(0.02, 0.4):.3g}"
            gq = rng.randint(0, 99)
            ft = "PASS" if rng.random() < 0.85 else "LowQual"
            cnl = ",".join(f"{-rng.uniform(0.1, 60):.4g}"
                           for _ in range(10))
            cols.append(f"./.:{int(round(float(rdcn))) if rdcn != '-1' else '.'}"
                        f":{cnl}:{rdcn}:{rdsd}:{gq}:{ft}")
        info = f"IMPRECISE;SVTYPE=CNV;END={end}"
        lines.append(f"chr1\t{pos}\tCNV{k:08d}\tN\t<CNV>\t{qual}\t{filt}"
                     f"\t{info}\tGT:CN:CNL:RDCN:RDSD:GQ:FT\t"
                     + "\t".join(cols))
        pos += size + rng.randint(500, 30000)
    return samples, lines


def _run_mine(tmp_path, tag, hdr, samples, body, roles=(), **kw):
    vcf = str(tmp_path / f"{tag}.vcf")
    with open(vcf, "w") as fh:
        fh.write("\n".join(hdr + [_col_hdr(samples)] + body) + "\n")
    out = str(tmp_path / f"{tag}.out.vcf")
    cfg = FilterConfig(vcffile=vcf, outfile=out,
                       tumor_set={n for n, r in roles if r == "tumor"},
                       control_set={n for n, r in roles
                                    if r == "control"}, **kw)
    assert filter_run(cfg) == 0
    mine = [l for l in open(out).read().splitlines()
            if not l.startswith("#")]
    return vcf, cfg, mine


def _assert_same(tag, mine, ref):
    assert len(mine) == len(ref), (tag, len(mine), len(ref),
                                   mine[:1], ref[:1])
    for k, (m, r) in enumerate(zip(mine, ref)):
        assert m == r, (tag, k, m, r)


def test_germline_sv_cohorts_match_reference(oracle, tmp_path):
    rng = random.Random(4242)
    total = 0
    for case in range(6):
        nsmpl = rng.choice([8, 24, 40])
        samples, body = _gen_sv_cohort(rng, nsmpl, rng.randint(8, 30))
        kw = dict(filter="germline",
                  soft_filter=bool(case % 2),
                  filter_for_pass=bool(case % 3 == 0),
                  no_refine=bool(case == 4),
                  no_collapse=bool(case == 5),
                  qualthres=rng.choice([0, 300]),
                  altaf=rng.choice([0.03, 0.2]),
                  minsize=rng.choice([0, 500]))
        vcf, cfg, mine = _run_mine(tmp_path, f"g{case}", HDR_SV,
                                   samples, body, **kw)
        ref = oracle(vcf, cfg)
        _assert_same(f"germline{case}", mine, ref)
        total += len(ref)
    assert total >= 20, total


def test_somatic_sv_pairs_match_reference(oracle, tmp_path):
    rng = random.Random(777)
    for case in range(4):
        nsmpl = rng.choice([2, 4, 6])
        samples, body = _gen_sv_cohort(rng, nsmpl, rng.randint(6, 20))
        roles = [(s, "tumor" if i < nsmpl // 2 else "control")
                 for i, s in enumerate(samples)]
        kw = dict(filter="somatic",
                  soft_filter=bool(case % 2),
                  filter_for_pass=bool(case == 2),
                  coverage=rng.choice([2, 10]),
                  altaf=rng.choice([0.03, 0.1]),
                  controlcont=rng.choice([0.0, 0.1]))
        vcf, cfg, mine = _run_mine(tmp_path, f"s{case}", HDR_SV,
                                   samples, body, roles=roles, **kw)
        ref = oracle(vcf, cfg, roles=roles)
        _assert_same(f"somatic{case}", mine, ref)


def test_germline_cnv_reclassification_matches_reference(oracle,
                                                         tmp_path):
    rng = random.Random(90125)
    emitted = 0
    for case, (kind, nsmpl) in enumerate(
            [("del", 60), ("dup", 60), ("multi", 64), ("del", 12),
             ("dup", 60), ("multi", 60)]):
        samples, body = _gen_cnv_cohort(rng, nsmpl, rng.randint(4, 10),
                                        kind)
        kw = dict(filter="germline",
                  soft_filter=bool(case % 2),
                  maxsd=rng.choice([0.5, 0.15]),
                  minsize=rng.choice([0, 3000]))
        vcf, cfg, mine = _run_mine(tmp_path, f"c{case}", HDR_CNV,
                                   samples, body, **kw)
        ref = oracle(vcf, cfg)
        _assert_same(f"cnv_{kind}{case}", mine, ref)
        emitted += sum(1 for l in ref
                       if "SVTYPE=DEL" in l or "SVTYPE=DUP" in l)
    # the DEL/DUP reclassification path must actually fire
    assert emitted >= 3, emitted


def test_somatic_cnv_matches_reference(oracle, tmp_path):
    rng = random.Random(31337)
    for case in range(3):
        nsmpl = 6
        samples, body = _gen_cnv_cohort(rng, nsmpl, rng.randint(4, 10),
                                        rng.choice(["del", "multi"]))
        roles = [(s, "tumor" if i < 3 else "control")
                 for i, s in enumerate(samples)]
        kw = dict(filter="somatic",
                  soft_filter=bool(case % 2),
                  pgerm=rng.choice([0.001, 0.05]),
                  cn_offset=rng.choice([0.2, 0.01]))
        vcf, cfg, mine = _run_mine(tmp_path, f"sc{case}", HDR_CNV,
                                   samples, body, roles=roles, **kw)
        ref = oracle(vcf, cfg, roles=roles)
        _assert_same(f"somcnv{case}", mine, ref)
