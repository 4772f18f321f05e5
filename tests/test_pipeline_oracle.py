"""Full-pipeline golden VCF oracle (probe #16).

tests/pipeline_probe.cpp compiles the reference's shortpe.h +
coverage.h + modvcf.h AS-IS and drives them in the exact dellyRun
stage order (delly.h:86-196) over the functional htslib replay layer,
with a functional text-mode vcf layer underneath the real vcfOutput
(modvcf.h:342-800).  This module feeds the probe the records of real
BAM files — the reference's bundled example plus the synthetic SV-family
corpora — runs OUR production run_sr on the same files, renders our BCF
through io/bcf.py bcf_to_vcf_text, and byte-compares the VCF bodies:
site rows, INFO ordering and content, PASS/LowQual, GT/GQ/PL phasing,
AC/AN, RDCN — the whole emission layer executed, not argued.
"""

import os
import shutil
import subprocess

import pytest

from delly_tpu.io.bam import BamFile
from delly_tpu.io.bcf import bcf_to_vcf_text
from delly_tpu.io.fasta import FastaFile
from delly_tpu.models.config import SrConfig
from delly_tpu.models.sr import run_sr

REF_SRC = "/root/reference/src"
EXAMPLE = "/root/reference/example"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "pipeline_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "modvcf.h"))):
        pytest.skip("g++ or reference modvcf.h unavailable")
    gen = tmp_path_factory.mktemp("pipeline_oracle")
    # slice real reference code: getLibraryParams (util.h:771-891) and
    # entropy (util.h:565-579); UTIL_H is predefined by the probe
    lines_u = open(os.path.join(REF_SRC, "util.h")).read().splitlines(
        keepends=True)
    a = next(i for i, ln in enumerate(lines_u)
             if "getLibraryParams(TConfig" in ln) - 2
    b = next(i for i in range(a, len(lines_u))
             if "sam_close(samfile[file_c]);" in lines_u[i])
    while lines_u[b].rstrip() != "  }":
        b += 1
    lib_slice = "".join(lines_u[a:b + 1])
    e = next(i for i, ln in enumerate(lines_u)
             if "entropy(std::string const& st)" in ln) - 1
    f = next(i for i in range(e, len(lines_u))
             if lines_u[i].rstrip() == "  }")
    ent_slice = "".join(lines_u[e:f + 1])
    d0 = next(i for i, ln in enumerate(lines_u)
              if "_decodeOrientation(std::string const& value, "
                 "std::string const& svt)" in ln) - 1
    d1 = next(i for i in range(d0, len(lines_u))
              if lines_u[i].rstrip() == "  }")
    dec_slice = "".join(lines_u[d0:d1 + 1])
    (gen / "util_pipeline_slice.h").write_text(
        "namespace torali {\n" + ent_slice + "\n" + dec_slice + "\n"
        + lib_slice + "\n}\n")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", str(gen), "-I", SHIM_DIR,
         "-I", REF_SRC, PROBE_SRC,
         os.path.join(REF_SRC, "edlib.cpp"), "-pthread"])

    def run(lines):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


def _serialize_case(bam_path, fa_path, vcffile="-"):
    """Render a BAM + FASTA as one probe input line (PIPE protocol)."""
    fasta = FastaFile(fa_path)
    with BamFile(bam_path) as bf:
        names = list(bf.header.names)
        lens = list(bf.header.lengths)
        recs = []
        for tid in range(len(names)):
            for rec in bf.chrom(tid).records():
                recs.append(
                    f"{rec.qname} {rec.tid},{rec.pos},{rec.flag},"
                    f"{rec.mapq},{rec.mtid},{rec.mpos},{rec.tlen} "
                    f"{rec.cigar_string() or '*'} {rec.seq or '.'}")
    seqs = [fasta.fetch(n) for n in names]
    line = ("PIPE 1 20 5 9 25 2 25 40 250 20 1000 100 "
            f"{vcffile} "
            f"{len(names)} " + ",".join(str(x) for x in lens) + " "
            + " ".join(seqs) + f" {len(recs)} " + " ".join(recs))
    return line


def _my_body(bam_path, fa_path, tmp_path, tag):
    out = str(tmp_path / f"{tag}.bcf")
    cfg = SrConfig(genome=fa_path, files=[bam_path], outfile=out,
                   max_threads=1)
    assert run_sr(cfg) == 0
    with open(out, "rb") as fh:
        text = bcf_to_vcf_text(fh.read())
    return [l for l in text.splitlines() if not l.startswith("#")]


def _ref_body(out_line):
    return [] if out_line == "-" else out_line.split("\x01")


def _strip_contig_names(lines, names):
    """Probe contigs are index-named ('0','1',...); map ours to match."""
    idx = {n: str(i) for i, n in enumerate(names)}
    out = []
    for l in lines:
        chrom, rest = l.split("\t", 1)
        # CHR2 INFO + BND ALT bracket coordinates also carry names
        for n, i in sorted(idx.items(), key=lambda kv: -len(kv[0])):
            rest = rest.replace(f"CHR2={n};", f"CHR2={i};")
            rest = rest.replace(f"]{n}:", f"]{i}:")
            rest = rest.replace(f"[{n}:", f"[{i}:")
        out.append(idx[chrom] + "\t" + rest)
    return out


def _compare(case_name, bam, fa, oracle_out, tmp_path):
    with BamFile(bam) as bf:
        names = list(bf.header.names)
    mine = _strip_contig_names(_my_body(bam, fa, tmp_path, case_name),
                               names)
    ref = _ref_body(oracle_out)
    assert len(mine) == len(ref), (
        case_name, len(mine), len(ref), mine[:2], ref[:2])
    for k, (m, r) in enumerate(zip(mine, ref)):
        assert m == r, (case_name, k, m, r)
    return len(ref)


def test_example_sr_vcf_body_byte_identical(oracle, tmp_path):
    bam = os.path.join(EXAMPLE, "sr.bam")
    fa = os.path.join(EXAMPLE, "ref.fa")
    if not os.path.isfile(bam):
        pytest.skip("bundled example unavailable")
    out = oracle([_serialize_case(bam, fa)])
    n = _compare("example", bam, fa, out[0], tmp_path)
    assert n >= 1  # the known PRECISE DEL must be emitted


def test_synthetic_families_vcf_body_byte_identical(oracle, tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import (
        make_bnd_orientation_dataset, make_dup_inv_dataset,
        make_homopolymer_del_dataset, make_insertion_dataset,
        make_multi_contig_del_dataset, make_multi_sv_dataset,
        make_overlapping_dels_dataset, make_translocation_dataset,
    )

    cases = []
    for name, maker in (
            ("multi_sv", make_multi_sv_dataset),
            ("dup_inv", make_dup_inv_dataset),
            ("ins", make_insertion_dataset),
            ("tra", make_translocation_dataset),
            ("overlapping_dels", make_overlapping_dels_dataset),
            ("bnd_orient", make_bnd_orientation_dataset),
            ("homopolymer", make_homopolymer_del_dataset),
            ("multi_contig",
             lambda d: make_multi_contig_del_dataset(
                 d, n_contigs=3, contig_len=80_000,
                 error_rate=0.005))):
        sub = tmp_path / name
        sub.mkdir()
        d = maker(str(sub))
        cases.append((name, d[0], d[1]))

    lines = [_serialize_case(bam, fa) for _name, bam, fa in cases]
    outs = oracle(lines)
    total = 0
    for (name, bam, fa), out in zip(cases, outs):
        total += _compare(name, bam, fa, out, tmp_path)
    # the families must actually emit sites (DEL/DUP/INV/INS/BND)
    assert total >= 8, total


def _index_named_vcf(text, names, out_path):
    """Rewrite a VCF to the probe's index-named contigs ('0','1',...),
    header contig lines included."""
    idx = {n: str(i) for i, n in enumerate(names)}
    out = []
    for l in text.splitlines():
        if l.startswith("##contig=<ID="):
            rest = l[len("##contig=<ID="):]
            name, tail = rest.split(",", 1)
            out.append(f"##contig=<ID={idx.get(name, name)},{tail}")
        elif l.startswith("#"):
            out.append(l)
        else:
            out.extend(_strip_contig_names([l], names))
    with open(out_path, "w") as fh:
        fh.write("\n".join(out) + "\n")


def test_regenotyping_mode_vcf_body_byte_identical(oracle, tmp_path):
    """-v mode: reference vcfParse (modvcf.h:155-339) + annotateCoverage
    + vcfOutput execute over a previously-discovered site list."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import make_multi_sv_dataset

    sub = tmp_path / "regeno"
    sub.mkdir()
    bam, fa, _truth = make_multi_sv_dataset(str(sub))
    # stage 1: discovery (mine) -> site list text
    sites_bcf = str(tmp_path / "sites.bcf")
    cfg = SrConfig(genome=fa, files=[bam], outfile=sites_bcf,
                   max_threads=1)
    assert run_sr(cfg) == 0
    with open(sites_bcf, "rb") as fh:
        sites_text = bcf_to_vcf_text(fh.read())
    with BamFile(bam) as bf:
        names = list(bf.header.names)
    # my re-genotyping run against the site list
    sites_vcf = str(tmp_path / "sites.vcf")
    with open(sites_vcf, "w") as fh:
        fh.write(sites_text if sites_text.endswith("\n")
                 else sites_text + "\n")
    out2 = str(tmp_path / "regeno.bcf")
    cfg2 = SrConfig(genome=fa, files=[bam], outfile=out2,
                    vcffile=sites_vcf, max_threads=1)
    assert run_sr(cfg2) == 0
    with open(out2, "rb") as fh:
        mine = [l for l in bcf_to_vcf_text(fh.read()).splitlines()
                if not l.startswith("#")]
    mine = _strip_contig_names(mine, names)
    # the probe's re-genotyping over the same (index-named) site list
    probe_sites = str(tmp_path / "sites_idx.vcf")
    _index_named_vcf(sites_text, names, probe_sites)
    out = oracle([_serialize_case(bam, fa, vcffile=probe_sites)])
    ref = _ref_body(out[0])
    assert len(mine) == len(ref), (len(mine), len(ref), mine[:1],
                                   ref[:1])
    for k, (m, r) in enumerate(zip(mine, ref)):
        assert m == r, (k, m, r)
    assert len(ref) >= 4
