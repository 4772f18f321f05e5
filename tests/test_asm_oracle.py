"""Differential oracle for assembly mode, end to end.

tests/asm_probe.cpp compiles the reference's asmode.h AS-IS (CLI
drivers of delly.h/merge.h/asmode.h sliced off at fixture time) and
runs the real runAsm over the functional replay + text-VCF layers; this
module writes the same haplotype-assembly alignments (whole-chromosome
records with embedded D/I CIGAR events and split-contig clip pairs)
into real BAMs, runs OUR production run_asm and byte-compares the
output VCF bodies: findAsmJunctions candidates, assembly-derived
consensus windows, _directIndelAllele left-aligned alleles, and the
cross-sample merge with haplotype-aware phased GT synthesis — in both
squashed and diploid modes.
"""

import os
import random
import shutil
import subprocess

import pytest

from delly_tpu.io.bam import BamFile
from delly_tpu.models.asmode import AsmConfig, run_asm

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "asm_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "asmode.h"))):
        pytest.skip("g++ or reference asmode.h unavailable")
    gen = tmp_path_factory.mktemp("asm_oracle")

    def slice_driver(fname, marker, outname):
        lines = open(os.path.join(REF_SRC, fname)).read().splitlines(
            keepends=True)
        cut = next(i for i, ln in enumerate(lines) if marker in ln)
        (gen / outname).write_text("".join(lines[:cut])
                                   + "\n}\n\n#endif\n")

    slice_driver("delly.h", "int delly(int argc, char **argv)",
                 "delly.h")
    slice_driver("merge.h", "int merge(int argc, char **argv)",
                 "merge.h")
    slice_driver("asmode.h", "int asmode(int argc, char **argv)",
                 "asmode_sliced.h")
    ul = open(os.path.join(REF_SRC, "util.h")).read().splitlines(
        keepends=True)

    def grab(marker):
        a = next(i for i, ln in enumerate(ul) if marker in ln) - 1
        b = next(i for i in range(a, len(ul))
                 if ul[i].rstrip() == "  }")
        return "".join(ul[a:b + 1])

    (gen / "util_asm_slice.h").write_text(
        "namespace torali {\n"
        + grab("_decodeOrientation(std::string const& value, "
               "std::string const& svt)")
        + "\n" + grab("entropy(std::string const& st)") + "\n}\n")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", str(gen), "-I", SHIM_DIR,
         "-I", REF_SRC, PROBE_SRC,
         os.path.join(REF_SRC, "edlib.cpp"), "-pthread"])

    def run(lines, workdir):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True, cwd=str(workdir),
        ).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


def _seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _make_case(rng, nsamples, diploid):
    """Haplotype assemblies over a shared genome: whole-chromosome
    alignments with embedded DEL/INS CIGAR events plus an occasional
    split-contig clip pair."""
    nchr = rng.randint(1, 2)
    seqs = [_seq(rng, rng.randint(25000, 45000)) for _ in range(nchr)]
    events = []  # (chrom, pos, kind, len_or_seq)
    for c, s in enumerate(seqs):
        pos = 3000
        while pos < len(s) - 4000:
            kind = rng.choice(["del", "ins"])
            if kind == "del":
                events.append((c, pos, "del", rng.randint(35, 900)))
            else:
                events.append((c, pos, "ins",
                               _seq(rng, rng.randint(35, 500))))
            pos += rng.randint(3000, 8000)
    nfiles = nsamples * 2 if diploid else nsamples
    files = []  # per file: list of records
    for f in range(nfiles):
        carried = [ev for ev in events if rng.random() < 0.6]
        recs = []
        for c, s in enumerate(seqs):
            evs = sorted([e for e in carried if e[0] == c],
                         key=lambda e: e[1])
            # build the assembly contig + cigar
            cig = []
            seq_parts = []
            cur = 0
            for (_c, pos, kind, val) in evs:
                seg = pos - cur
                if seg <= 0:
                    continue
                cig.append(("M", seg))
                seq_parts.append(s[cur:pos])
                if kind == "del":
                    cig.append(("D", val))
                    cur = pos + val
                else:
                    cig.append(("I", len(val)))
                    seq_parts.append(val)
                    cur = pos
            cig.append(("M", len(s) - cur))
            seq_parts.append(s[cur:])
            # merge adjacent Ms
            merged = []
            for op, ln in cig:
                if merged and merged[-1][0] == op:
                    merged[-1] = (op, merged[-1][1] + ln)
                else:
                    merged.append((op, ln))
            contig = "".join(seq_parts)
            qn = f"ctg_f{f}_c{c}"
            recs.append((qn, c, 0, 0, rng.choice([50, 60]),
                         merged, contig))
            # occasional split-contig clip pair (same seed pairing)
            if rng.random() < 0.5 and len(s) > 20000:
                a = rng.randint(4000, len(s) // 2 - 1000)
                b = rng.randint(len(s) // 2 + 1000, len(s) - 4000)
                piece1 = s[a - 3000:a]
                piece2 = s[b:b + 3000]
                whole = piece1 + piece2
                qn2 = f"split_f{f}_c{c}"
                recs.append((qn2, c, a - 3000, 0, 60,
                             [("M", len(piece1)), ("S", len(piece2))],
                             whole))
                recs.append((qn2, c, b, 0x800, 60,
                             [("S", len(piece1)), ("M", len(piece2))],
                             whole))
        recs.sort(key=lambda r: (r[1], r[2]))
        files.append(recs)
    return seqs, files


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


@pytest.mark.parametrize("diploid", [False, True])
def test_asm_end_to_end_matches_reference(oracle, tmp_path, diploid):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import encode_record, write_bam, write_fasta

    rng = random.Random(777 + int(diploid))
    cases = []
    for _ in range(4):
        nsamples = rng.randint(1, 3)
        cases.append((_make_case(rng, nsamples, diploid), nsamples))

    lines = []
    for (seqs, files), _ns in cases:
        rectok = []
        for f, recs in enumerate(files):
            for qn, tid, pos, flag, mapq, cig, seq in recs:
                rectok.append(
                    f"{f} {qn} {tid},{pos},{flag},{mapq},{tid},{pos},0 "
                    + "".join(f"{ln}{op}" for op, ln in cig) + " "
                    + seq)
        nrec = len(rectok)
        lines.append(
            f"ASM 10 25 30 100 1000 100 0.9 10000 "
            f"{1 if diploid else 0} {len(files)} {len(seqs)} "
            + ",".join(str(len(s)) for s in seqs) + " "
            + " ".join(seqs) + f" {nrec} " + " ".join(rectok))

    wd = tmp_path / "probe_wd"
    wd.mkdir()
    outs = oracle(lines, wd)
    total = 0
    for idx, (((seqs, files), _ns), out) in enumerate(zip(cases, outs)):
        ref_body = [] if out == "-" else out.split("\x01")
        # my side: real BAMs through the production run_asm
        contigs = [(str(t), seqs[t]) for t in range(len(seqs))]
        bams = []
        for f, recs in enumerate(files):
            encoded = [encode_record(qn, flag, tid, pos, mapq, cig,
                                     tid, pos, 0, seq)
                       for qn, tid, pos, flag, mapq, cig, seq in recs]
            p = str(tmp_path / f"case{idx}_f{f}.bam")
            write_bam(p, contigs, encoded, sample=f"S{f}")
            bams.append(p)
        fa = str(tmp_path / f"case{idx}.fa")
        write_fasta(fa, contigs)
        outfile = str(tmp_path / f"case{idx}.vcf")
        cfg = AsmConfig(genome=fa, files=bams, outfile=outfile,
                        mode="diploid" if diploid else "squashed")
        assert run_asm(cfg) == 0
        mine = [l for l in open(outfile).read().splitlines()
                if not l.startswith("#")]
        with BamFile(bams[0]) as bf:
            names = list(bf.header.names)
        mine = _strip_contig_names(mine, names)
        assert len(mine) == len(ref_body), (idx, len(mine),
                                            len(ref_body), mine[:1],
                                            ref_body[:1])
        for k, (m, r) in enumerate(zip(mine, ref_body)):
            assert m == r, (idx, k, m, r)
        total += len(ref_body)
    assert total >= 8, total
