"""Assembly-mode tests."""

import subprocess
import sys

from delly_tpu.models.asmode import (
    common_sample_name, direct_indel_allele, strip_haplotype_suffix,
)
from delly_tpu.utils.tags import StructuralVariantRecord


def test_strip_haplotype_suffix():
    assert strip_haplotype_suffix("HG002.hap1") == "HG002"
    assert strip_haplotype_suffix("HG002.h2") == "HG002"
    assert strip_haplotype_suffix("HG002.maternal") == "HG002"
    assert strip_haplotype_suffix("HG002") == "HG002"


def test_common_sample_name():
    # longest common prefix, trailing separators stripped (asmode.h:78-86)
    assert common_sample_name("HG002.hap1", "HG002.hap2") == "HG002.hap"
    assert common_sample_name("s1.mat", "s1.pat") == "s1"
    # no common prefix -> fall back to stripping a haplotype suffix
    assert common_sample_name("abc.hap1", "xyz.hap2") == "abc"


def test_direct_indel_allele_del_left_aligns():
    class Cfg:
        indelsize = 10000

    #       0123456789
    seq = "GGAAAAAACC"  # deleting AAA anywhere in the run left-aligns
    sv = StructuralVariantRecord(chr=0, svStart=5, chr2=0, svEnd=8, svt=2)
    ok = direct_indel_allele(Cfg(), seq, len(seq), sv)
    assert ok
    assert sv.svStart == 2  # left-aligned to the start of the A-run
    assert sv.svEnd == 5
    assert sv.precise
    ref, alt = sv.alleles.split(",")
    assert len(ref) == 4 and len(alt) == 1
    assert sv.homLen >= 3


def test_direct_indel_allele_ins():
    class Cfg:
        indelsize = 10000

    seq = "GGTTTTACGT"
    sv = StructuralVariantRecord(chr=0, svStart=6, chr2=0, svEnd=7, svt=4,
                                 insLen=3)
    sv.consensus = "XXTTTXX"
    sv.consBp = 2
    ok = direct_indel_allele(Cfg(), seq, len(seq), sv)
    assert ok
    assert sv.precise
    ref, alt = sv.alleles.split(",")
    assert len(alt) == 4 and len(ref) == 1
    # TTT insertion next to the TTTT run -> left-aligned with homology
    assert sv.svStart == 2
    assert sv.homLen == 4


def test_asm_end_to_end_squashed():
    out = "/tmp/test_asm_e2e.vcf"
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "asm",
         "-g", "/root/reference/example/ref.fa", "-o", out,
         "/root/reference/example/lr.bam"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    records = [l for l in open(out) if not l.startswith("#")]
    assert any(abs(int(l.split("\t")[1]) - 100000) < 50 for l in records)
    # every record has a genotype and exact or symbolic alleles
    for l in records:
        gt = l.split("\t")[9].split(":")[0]
        assert gt in ("0/1", "1/1", "0|1", "1|0")


def test_asm_diploid_genome_scale(tmp_path):
    """Two haplotype assemblies (one ~2Mb alignment each) with a shared
    homozygous DEL and a hap1-only heterozygous INS -> phased GTs
    (asmode.h squashed/diploid pipeline at assembly scale)."""
    import os
    import random
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import (encode_record, random_contig, write_bam,
                          write_fasta)
    rng = random.Random(91)
    L = 2_000_000
    ref = random_contig(rng, L)
    posd, dell = L // 3, 1200
    posi, insl = 2 * L // 3, 600
    ins_seq = random_contig(rng, insl)

    def hap(qname, with_ins):
        cig = [("M", posd), ("D", dell)]
        seq = ref[:posd]
        if with_ins:
            cig += [("M", posi - (posd + dell)), ("I", insl),
                    ("M", L - posi)]
            seq += ref[posd + dell:posi] + ins_seq + ref[posi:]
        else:
            cig += [("M", L - (posd + dell))]
            seq += ref[posd + dell:]
        return encode_record(qname, 0x0, 0, 0, 60, cig, -1, -1, 0, seq)

    h1 = str(tmp_path / "h1.bam")
    h2 = str(tmp_path / "h2.bam")
    fa = str(tmp_path / "asm.fa")
    write_bam(h1, [("chr1", ref)], [hap("s.hap1", True)])
    write_bam(h2, [("chr1", ref)], [hap("s.hap2", False)])
    write_fasta(fa, [("chr1", ref)])
    out = str(tmp_path / "asm.vcf")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "asm", "-g", fa,
         "-o", out, "-y", "diploid", h1, h2],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert len(recs) == 2, [x[:5] for x in recs]
    by_type = {}
    for rec in recs:
        info = dict(kv.split("=", 1) for kv in rec[7].split(";")
                    if "=" in kv)
        by_type[info["SVTYPE"]] = (int(rec[1]), rec[9].split(":")[0])
    dpos, dgt = by_type["DEL"]
    ipos, igt = by_type["INS"]
    # Reference asmode.h:619-655: hom-alt (both haps) does not set PS, so
    # GT stays unphased 1/1; het sets ps=1 -> phased 1|0 / 0|1.
    assert abs(dpos - posd) < 50 and dgt == "1/1"
    assert abs(ipos - posi) < 50 and igt in ("1|0", "0|1")


def test_asm_split_alignment_sv_families(tmp_path):
    """Assembly alignments carrying split-contig evidence must type
    DUP, INV (reverse-strand supplementary) and cross-contig BND like
    the reference's asm junction pairing (asmode.h:89-236) — not just
    CIGAR indels."""
    import os
    import random
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import encode_record, random_contig, write_bam, write_fasta
    from delly_tpu.utils.tags import revcomp
    rng = random.Random(7)
    L = 200_000
    ref1 = random_contig(rng, L)
    ref2 = random_contig(rng, L)
    h = 30_000
    recs1 = []
    recs2 = []

    # DUP at ctgA [40000,52000): contig crossing the copy junction
    d1, d2 = 40_000, 52_000
    seq = ref1[d2 - h:d2] + ref1[d1:d1 + h]
    recs1.append((d2 - h, encode_record(
        "dup.hap1", 0x0, 0, d2 - h, 60, [("M", h), ("S", h)],
        -1, -1, 0, seq)))
    recs1.append((d1, encode_record(
        "dup.hap1", 0x800, 0, d1, 60, [("S", h), ("M", h)],
        -1, -1, 0, seq)))

    # INV at ctgA [100000,140000): reverse-strand supplementary
    v1, v2 = 100_000, 140_000
    seq = ref1[v1 - h:v1] + revcomp(ref1[v2 - h:v2])
    recs1.append((v1 - h, encode_record(
        "inv.hap1", 0x0, 0, v1 - h, 60, [("M", h), ("S", h)],
        -1, -1, 0, seq)))
    recs1.append((v2 - h, encode_record(
        "inv.hap1", 0x810, 0, v2 - h, 60, [("M", h), ("S", h)],
        -1, -1, 0, revcomp(seq))))

    # BND ctgA:170000 -> ctgB:60000. Translocations survive the merge's
    # retain gate only with supp >= 2 (merge.h:632-645 _retainAllele,
    # identical here), so a second assembly sample carries the same
    # junction.
    ba, bb = 170_000, 60_000
    seq = ref1[ba - h:ba] + ref2[bb:bb + h]
    recs1.append((ba - h, encode_record(
        "bnd.hap1", 0x0, 0, ba - h, 60, [("M", h), ("S", h)],
        -1, -1, 0, seq)))
    recs2.append((bb, encode_record(
        "bnd.hap1", 0x800, 1, bb, 60, [("S", h), ("M", h)],
        -1, -1, 0, seq)))

    bam = str(tmp_path / "asm.bam")
    bam2 = str(tmp_path / "asm2.bam")
    fa = str(tmp_path / "ref.fa")
    allrecs = ([(0, p, b) for p, b in recs1]
               + [(1, p, b) for p, b in recs2])
    allrecs.sort(key=lambda r: (r[0], r[1]))
    write_bam(bam, [("ctgA", ref1), ("ctgB", ref2)],
              [r[2] for r in allrecs], sample="s1")
    bnd2 = [(0, ba - h, encode_record(
                "bnd.hap1", 0x0, 0, ba - h, 60, [("M", h), ("S", h)],
                -1, -1, 0, seq)),
            (1, bb, encode_record(
                "bnd.hap1", 0x800, 1, bb, 60, [("S", h), ("M", h)],
                -1, -1, 0, seq))]
    write_bam(bam2, [("ctgA", ref1), ("ctgB", ref2)],
              [r[2] for r in bnd2], sample="s2")
    write_fasta(fa, [("ctgA", ref1), ("ctgB", ref2)])
    out = str(tmp_path / "out.vcf")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "asm", "-g", fa,
         "-o", out, bam, bam2],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    calls = []
    for ln in open(out):
        if ln.startswith("#"):
            continue
        c = ln.split("\t")
        svt = [f for f in c[7].split(";")
               if f.startswith("SVTYPE=")][0][7:]
        calls.append((svt, c[0], int(c[1])))
    got = {s for s, *_ in calls}
    assert {"DUP", "INV", "BND"}.issubset(got), calls
    assert any(s == "DUP" and abs(p - d1) < 100 for s, _c, p in calls)
    assert any(s == "INV" and abs(p - v1) < 100 for s, _c, p in calls)
