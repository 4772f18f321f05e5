"""Full LR-pipeline golden VCF oracle (probe #22).

tests/tegua_probe.cpp compiles the reference's tegua.h AS-IS (CLI
drivers sliced off) and runs the real runTegua over the replay +
in-memory-faidx + text-VCF layers; this module feeds the probe the
records of real long-read BAMs — the reference's bundled example plus
synthetic ONT-like corpora — runs OUR production run_lr on the same
files, and byte-compares the VCF bodies: _clusterSRReads discovery,
msaEdlib/msaWfa consensus, the dedup pass, genotypeLR with HP/PS
phasing and MM/ML methylation FORMAT fields, and the full vcfOutput
emission with methylMap.
"""

import os
import shutil
import subprocess

import pytest

from delly_tpu.io.bam import BamFile
from delly_tpu.io.bcf import bcf_to_vcf_text
from delly_tpu.io.fasta import FastaFile
from delly_tpu.models.config import LrConfig
from delly_tpu.models.lr import run_lr

REF_SRC = "/root/reference/src"
EXAMPLE = "/root/reference/example"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "tegua_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "tegua.h"))):
        pytest.skip("g++ or reference tegua.h unavailable")
    gen = tmp_path_factory.mktemp("tegua_oracle")

    def slice_driver(fname, marker, outname):
        lines = open(os.path.join(REF_SRC, fname)).read().splitlines(
            keepends=True)
        cut = next(i for i, ln in enumerate(lines) if marker in ln)
        (gen / outname).write_text("".join(lines[:cut])
                                   + "\n}\n\n#endif\n")

    slice_driver("delly.h", "int delly(int argc, char **argv)",
                 "delly.h")
    slice_driver("tegua.h", "int tegua(int argc, char **argv)",
                 "tegua_sliced.h")
    ul = open(os.path.join(REF_SRC, "util.h")).read().splitlines(
        keepends=True)

    def grab(marker):
        a = next(i for i, ln in enumerate(ul) if marker in ln) - 1
        b = next(i for i in range(a, len(ul))
                 if ul[i].rstrip() == "  }")
        return "".join(ul[a:b + 1])

    a = next(i for i, ln in enumerate(ul)
             if "_alternateAlignments(TConfig& c, std::vector" in ln) - 2
    b = next(i for i in range(a, len(ul))
             if "return _alternateAlignments(c, align, genome);"
             in ul[i])
    while ul[b].rstrip() != "  }":
        b += 1
    alt = "".join(ul[a:b + 1])
    (gen / "util_tegua_slice.h").write_text(
        "namespace torali {\n"
        + grab("_decodeOrientation(std::string const& value, "
               "std::string const& svt)")
        + "\n" + grab("entropy(std::string const& st)")
        + "\n" + alt + "\n}\n")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", str(gen),
                        "-I", SHIM_DIR, "-I", REF_SRC, PROBE_SRC,
                        os.path.join(REF_SRC, "edlib.cpp"),
                        "-pthread"])

    def run(lines):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


def _serialize_case(bam_path, fa_path, indel_extension):
    fasta = FastaFile(fa_path)
    with BamFile(bam_path) as bf:
        names = list(bf.header.names)
        lens = list(bf.header.lengths)
        recs = []
        for tid in range(len(names)):
            for rec in bf.chrom(tid).records():
                aux = rec._aux.hex() if rec._aux else "."
                recs.append(
                    f"{rec.qname} {rec.tid},{rec.pos},{rec.flag},"
                    f"{rec.mapq},{rec.mtid},{rec.mpos},{rec.tlen} "
                    f"{rec.cigar_string() or '*'} {rec.seq or '.'} "
                    f"{aux}")
    seqs = [fasta.fetch(n) for n in names]
    line = (f"TEGUA 1 25 3 30 500 15 {indel_extension} 1000 100 0.9 "
            f"10000 25 250 128 5 1000 "
            f"{len(names)} " + ",".join(str(x) for x in lens) + " "
            + " ".join(seqs) + f" {len(recs)} " + " ".join(recs))
    return line


def _strip_contig_names(lines, names):
    idx = {n: str(i) for i, n in enumerate(names)}
    out = []
    for l in lines:
        chrom, rest = l.split("\t", 1)
        for n, i in sorted(idx.items(), key=lambda kv: -len(kv[0])):
            rest = rest.replace(f"CHR2={n};", f"CHR2={i};")
            rest = rest.replace(f"]{n}:", f"]{i}:")
            rest = rest.replace(f"[{n}:", f"[{i}:")
        out.append(idx[chrom] + "\t" + rest)
    return out


def _compare(case_name, bam, fa, oracle_out, tmp_path, technology):
    out = str(tmp_path / f"{case_name}.bcf")
    cfg = LrConfig(genome=fa, files=[bam], outfile=out,
                   technology=technology, max_threads=1)
    assert run_lr(cfg) == 0
    with open(out, "rb") as fh:
        mine = [l for l in bcf_to_vcf_text(fh.read()).splitlines()
                if not l.startswith("#")]
    with BamFile(bam) as bf:
        names = list(bf.header.names)
    mine = _strip_contig_names(mine, names)
    ref = [] if oracle_out == "-" else oracle_out.split("\x01")
    assert len(mine) == len(ref), (case_name, len(mine), len(ref),
                                   mine[:1], ref[:1])
    for k, (m, r) in enumerate(zip(mine, ref)):
        assert m == r, (case_name, k, m, r)
    return len(ref)


def test_example_lr_vcf_body_byte_identical(oracle, tmp_path):
    bam = os.path.join(EXAMPLE, "lr.bam")
    fa = os.path.join(EXAMPLE, "ref.fa")
    if not os.path.isfile(bam):
        pytest.skip("bundled example unavailable")
    out = oracle([_serialize_case(bam, fa, 0.5)])
    n = _compare("example_lr", bam, fa, out[0], tmp_path, "ont")
    assert n >= 1  # the known DEL must be emitted


def test_synthetic_lr_corpora_byte_identical(oracle, tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import (
        make_lr_insertion_dataset, make_lr_sv_dataset,
    )

    cases = []
    sub = tmp_path / "lrins"
    sub.mkdir()
    d = make_lr_insertion_dataset(str(sub))
    cases.append(("lr_ins", d[0], d[1]))
    sub = tmp_path / "lrsv"
    sub.mkdir()
    d = make_lr_sv_dataset(str(sub))
    cases.append(("lr_sv", d[0], d[1]))

    lines = [_serialize_case(bam, fa, 0.5) for _n, bam, fa in cases]
    outs = oracle(lines)
    total = 0
    for (name, bam, fa), out in zip(cases, outs):
        total += _compare(name, bam, fa, out, tmp_path, "ont")
    assert total >= 3, total
