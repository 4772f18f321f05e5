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
