"""Adversarial parity corpus (substitute for reference-binary goldens,
which cannot be built in this image): overlapping SVs, homopolymer
breakpoints, all four BND orientations across three contigs, mixed-MAPQ
noise, CRAM through cnv, and lr -v re-genotyping round-trips. Each case
asserts exact ALT structure/genotypes so any semantic drift from the
reference algorithms (cluster.h, split.h, coverage.h) surfaces here."""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from bamsynth import (  # noqa: E402
    make_bnd_orientation_dataset, make_homopolymer_del_dataset,
    make_multi_contig_del_dataset, make_overlapping_dels_dataset,
)

EXAMPLE = "/root/reference/example"


def _run(args, timeout=600):
    r = subprocess.run([sys.executable, "-m", "delly_tpu.cli"] + args,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, r.stderr[-1500:]
    return r


def _vcf_records(path):
    if path.endswith(".bcf"):
        from delly_tpu.io.bcf import bcf_to_vcf_text
        text = bcf_to_vcf_text(open(path, "rb").read())
    else:
        text = open(path).read()
    return [ln.split("\t") for ln in text.split("\n")
            if ln and not ln.startswith("#")]


def _info(rec):
    out = {}
    for item in rec[7].split(";"):
        if "=" in item:
            k, v = item.split("=", 1)
            out[k] = v
        else:
            out[item] = True
    return out


def test_all_four_bnd_orientations(tmp_path):
    bam, fa, truth = make_bnd_orientation_dataset(str(tmp_path))
    out = str(tmp_path / "bnd.vcf")
    _run(["sr", "-g", fa, "-o", out, bam])
    recs = [r for r in _vcf_records(out)
            if _info(r).get("SVTYPE") == "BND"]
    assert len(recs) == 4, [r[:5] for r in recs]
    got = set()
    for r in recs:
        info = _info(r)
        # delly stores BND on the larger tid with CHR2 = smaller tid
        got.add((info["CHR2"], r[0], info["CT"]))
    want = set()
    for c_small, b1, c_big, b2, ct in truth:
        want.add((c_small, c_big, ct))
    assert got == want
    # breakpoints within the PE wiggle of the implanted junctions
    for r in recs:
        info = _info(r)
        for c_small, b1, c_big, b2, ct in truth:
            if (info["CHR2"], r[0], info["CT"]) == (c_small, c_big, ct):
                assert abs(int(r[1]) - b2) < 500, (r[1], b2, ct)
                assert abs(int(info["POS2"]) - b1) < 500


def test_overlapping_deletions_both_called(tmp_path):
    bam, fa, truth = make_overlapping_dels_dataset(str(tmp_path))
    out = str(tmp_path / "ovl.vcf")
    _run(["sr", "-g", fa, "-o", out, bam])
    dels = [(int(r[1]), int(_info(r)["END"]), _info(r)) for r in
            _vcf_records(out) if _info(r).get("SVTYPE") == "DEL"]
    for bp1, bp2 in truth:
        match = [d for d in dels
                 if abs(d[0] - bp1) < 60 and abs(d[1] - bp2) < 60]
        assert match, (bp1, bp2, dels)
        assert "PRECISE" in match[0][2]


def test_homopolymer_breakpoint_homology(tmp_path):
    bam, fa, (bp1, bp2, hp_len) = make_homopolymer_del_dataset(
        str(tmp_path))
    out = str(tmp_path / "hp.vcf")
    _run(["sr", "-g", fa, "-o", out, bam])
    dels = [r for r in _vcf_records(out)
            if _info(r).get("SVTYPE") == "DEL"]
    assert dels
    info = _info(dels[0])
    # call lands within the homopolymer ambiguity range and reports
    # breakpoint micro-homology (split.h:262-280)
    assert abs(int(dels[0][1]) - bp1) <= hp_len + 10
    assert "PRECISE" in info
    assert int(info["HOMLEN"]) >= hp_len - 2, info["HOMLEN"]


def test_mapq_noise_rejected(tmp_path):
    """mapq-0 discordant pairs and low-mapq clipped reads scattered over
    the genome must not produce calls (shortpe.h mapq gates)."""
    import random

    from bamsynth import encode_record, random_contig, write_bam, \
        write_fasta
    rng = random.Random(71)
    ref = random_contig(rng, 50000)
    contigs = [("ctg1", ref)]
    rl = 100
    isize = 400
    recs = []
    qid = 0
    for _ in range(1300):
        p1 = rng.randint(0, len(ref) - isize - 1)
        p2 = p1 + isize - rl
        recs.append((p1, encode_record(
            f"p{qid}", 0x63, 0, p1, 60, [("M", rl)], 0, p2, isize,
            ref[p1:p1 + rl])))
        recs.append((p2, encode_record(
            f"p{qid}", 0x93, 0, p2, 60, [("M", rl)], 0, p1, -isize,
            ref[p2:p2 + rl])))
        qid += 1
    # mapq-0 discordant clutter: big aberrant inserts, all excluded by
    # the q>=1 gate
    for _ in range(60):
        p1 = rng.randint(0, 20000)
        p2 = p1 + rng.randint(5000, 20000)
        tl = p2 + rl - p1
        recs.append((p1, encode_record(
            f"n{qid}", 0x61, 0, p1, 0, [("M", rl)], 0, p2, tl,
            ref[p1:p1 + rl])))
        recs.append((p2, encode_record(
            f"n{qid}", 0x91, 0, p2, 0, [("M", rl)], 0, p1, -tl,
            ref[p2:p2 + rl])))
        qid += 1
    # scattered clipped reads with random clipped tails: no two share a
    # junction, so no clique forms
    for _ in range(40):
        p = rng.randint(1000, 45000)
        off = rng.randint(30, 70)
        seq = ref[p:p + off] + random_contig(rng, rl - off)
        recs.append((p, encode_record(
            f"c{qid}", 0x0, 0, p, 60, [("M", off), ("S", rl - off)],
            -1, -1, 0, seq)))
        qid += 1
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "noise.bam")
    fa = str(tmp_path / "noise.fa")
    write_bam(bam, contigs, [r[1] for r in recs])
    write_fasta(fa, contigs)
    out = str(tmp_path / "noise.vcf")
    _run(["sr", "-g", fa, "-o", out, bam])
    assert _vcf_records(out) == []


def test_cnv_identical_on_cram(tmp_path):
    """cnv engine byte-identical between BAM and CRAM input."""
    from delly_tpu.io.bam import BamFile
    from delly_tpu.io.cram import write_cram
    cram = str(tmp_path / "sr.cram")
    write_cram(BamFile(f"{EXAMPLE}/sr.bam"), f"{EXAMPLE}/ref.fa", cram)
    outs = []
    for inp in (f"{EXAMPLE}/sr.bam", cram):
        tag = os.path.basename(inp)
        out = str(tmp_path / f"{tag}.cnv.vcf")
        cov = str(tmp_path / f"{tag}.cov.gz")
        _run(["cnv", "-g", f"{EXAMPLE}/ref.fa", "-c", cov, "-o", out,
              inp])
        outs.append(open(out).read())
    assert outs[0] == outs[1]
    body = [ln for ln in outs[0].split("\n")
            if ln and not ln.startswith("#")]
    assert len(body) == 1


def test_lr_regenotyping_roundtrip(tmp_path):
    """lr -v re-genotyping against its own discovered sites reproduces
    the same site, GT and PRECISE consensus breakpoint."""
    disc = str(tmp_path / "lr_disc.bcf")
    reg = str(tmp_path / "lr_regen.bcf")
    _run(["lr", "-g", f"{EXAMPLE}/ref.fa", "-o", disc,
          f"{EXAMPLE}/lr.bam"])
    _run(["lr", "-g", f"{EXAMPLE}/ref.fa", "-v", disc, "-o", reg,
          f"{EXAMPLE}/lr.bam"])
    d = _vcf_records(disc)
    g = _vcf_records(reg)
    assert len(d) == len(g) == 1
    assert d[0][0:2] == g[0][0:2]           # same locus
    assert _info(d[0])["SVTYPE"] == _info(g[0])["SVTYPE"] == "DEL"
    assert d[0][9].split(":")[0] == g[0][9].split(":")[0]  # same GT


def test_sr_regenotyping_roundtrip(tmp_path):
    """sr -v against its own sites: same locus, same GT, DR/DV
    populated."""
    disc = str(tmp_path / "sr_disc.bcf")
    reg = str(tmp_path / "sr_regen.bcf")
    _run(["sr", "-g", f"{EXAMPLE}/ref.fa", "-o", disc,
          f"{EXAMPLE}/sr.bam"])
    _run(["sr", "-g", f"{EXAMPLE}/ref.fa", "-v", disc, "-o", reg,
          f"{EXAMPLE}/sr.bam"])
    d = _vcf_records(disc)
    g = _vcf_records(reg)
    assert len(d) == len(g) == 1
    assert d[0][0:2] == g[0][0:2]
    assert d[0][9].split(":")[0] == g[0][9].split(":")[0]
    fmt = g[0][8].split(":")
    vals = dict(zip(fmt, g[0][9].split(":")))
    assert int(vals["DV"]) > 0 and int(vals["RV"]) > 0

def test_cnv_regenotyping_roundtrip(tmp_path):
    """cnv -v re-genotypes a CNV site list (coral.h genotyping-only
    mode): discovery finds the implanted CN0 hole; the -v pass over the
    same BAM must reproduce the same RDCN at the same sites."""
    bam, fa, _truth = make_multi_contig_del_dataset(
        str(tmp_path), n_contigs=2, contig_len=120_000,
        pairs_per_contig=2500, name="cnvrt")
    disc = str(tmp_path / "cnv_disc.vcf")
    _run(["cnv", "-g", fa, "-o", disc, bam])
    sites = _vcf_records(disc)
    assert sites, "discovery produced no CNV records"

    geno = str(tmp_path / "cnv_geno.vcf")
    _run(["cnv", "-g", fa, "-o", geno, "-v", disc, bam])
    got = _vcf_records(geno)
    assert len(got) == len(sites)

    def keyed(recs):
        out = {}
        for r in recs:
            info = _info(r)
            fmt = dict(zip(r[8].split(":"), r[9].split(":")))
            out[(r[0], int(r[1]), info.get("END"))] = fmt.get("RDCN")
        return out

    want = keyed(sites)
    have = keyed(got)
    assert set(have) == set(want)
    for k in want:
        assert have[k] == want[k], (k, have[k], want[k])
    # deletion CNVs must genotype below diploid (the genome-scale CN0
    # hole recall is asserted by bench_e2e's cnv engine run)
    cns = [float(v) for v in have.values() if v not in (None, ".")]
    assert min(cns) < 1.5, cns


def test_sr_calls_survive_sequencing_errors(tmp_path):
    """Both implanted DELs called exactly with 1%% per-base
    substitution noise on every read (Illumina-class realism)."""
    bam, fa, truth = make_multi_contig_del_dataset(
        str(tmp_path), n_contigs=2, contig_len=80_000,
        error_rate=0.01, name="noisy_sr")
    out = str(tmp_path / "noisy_sr.vcf")
    _run(["sr", "-g", fa, "-o", out, bam])
    recs = _vcf_records(out)
    dels = [(r[0], int(r[1]), _info(r)) for r in recs
            if _info(r).get("SVTYPE") == "DEL"]
    for chrom, start, end in truth:
        assert any(c == chrom and abs(p - start) <= 30
                   and abs(int(i.get("END", 0)) - end) <= 30
                   for c, p, i in dels), (chrom, start, dels)
