"""Merge + filter + popgen tests."""

import subprocess
import sys

import numpy as np
import pytest

from delly_tpu.models.merge import (
    MergeConfig, MergeSV, best_seq_identity, cluster_and_select,
    merge_decode_svt, min_rotation, parse_bnd_mate, rec_overlap,
    seq_identity, sv_match,
)
from delly_tpu.ops.popgen import (
    chi2_sf_1df, dosage_r2, est_biallelic_af, est_biallelic_fic,
    est_biallelic_gt_freq, est_biallelic_hwe_lrt,
)

SR_VCF = "/tmp/test_merge_sr.vcf"


def test_rec_overlap():
    assert rec_overlap(0, 100, 0, 100) == 1.0
    assert rec_overlap(0, 100, 50, 150) == pytest.approx(0.5)
    assert rec_overlap(0, 100, 200, 300) == 0.0


def test_min_rotation_booth():
    assert min_rotation("CAB") == "ABC"
    assert min_rotation("BBAA") == "AABB"
    assert min_rotation("A") == "A"


def test_seq_identity():
    assert seq_identity("ACGT", "ACGT", 0.0) == 1.0
    assert seq_identity("ACGT", "ACGA", 0.0) == pytest.approx(0.75)
    # k-capped: identity below min -> 0.0
    assert seq_identity("AAAA", "TTTT", 0.9) == 0.0
    assert seq_identity("", "ACGT", 0.0) == -1.0


def test_best_seq_identity_rotation():
    a = "ACGTACGT"
    b = "CGTACGTA"  # rotation of a
    assert best_seq_identity(a, b, 1, 0.9, 10000) >= 0.9


def test_merge_decode_svt():
    assert merge_decode_svt("DEL", "3to5") == 2
    assert merge_decode_svt("DEL", None) == 2
    assert merge_decode_svt("INS", None) == 4
    assert merge_decode_svt("BND", None) == 5
    assert merge_decode_svt("CNV", None) == 9


def test_parse_bnd_mate():
    assert parse_bnd_mate("A[chr2:1000[") == ("chr2", 1000)
    assert parse_bnd_mate("]17:198982]A") == ("17", 198982)
    assert parse_bnd_mate("<DEL>") is None


def _node(start, end, svt=2, size=None, fidx=0, nid="X", score=500,
          seq=""):
    return MergeSV(tid=0, mtid=0, svStart=start, svEnd=end,
                   size=size if size is not None else end - start,
                   svt=svt, fileIdx=fidx, id=nid, score=score,
                   precise=True, sr=5, srmapq=60, srq=0.9, ce=1.5,
                   seq=seq)


def test_sv_match_and_cluster():
    cfg = MergeConfig(total_samples=2)
    a = _node(1000, 9000, nid="A", fidx=0)
    b = _node(1010, 9005, nid="B", fidx=1)
    assert sv_match(cfg, a, b)
    far = _node(1000, 2000, nid="C", fidx=1)
    assert not sv_match(cfg, a, far)
    selected = cluster_and_select(cfg, [a, b])
    assert len(selected) == 1
    agg = next(iter(selected.values()))
    assert agg.supp == 2
    assert agg.ac == 2


def test_cluster_singleton_gate():
    # Imprecise singleton -> dropped (supp < 2, retainAllele fails)
    cfg = MergeConfig(total_samples=2)
    x = _node(1000, 9000, nid="S", fidx=0)
    x.precise = False
    selected = cluster_and_select(cfg, [x])
    assert len(selected) == 0
    # Precise singleton with strong SR evidence -> kept
    y = _node(1000, 9000, nid="T", fidx=0)
    selected = cluster_and_select(cfg, [y])
    assert len(selected) == 1


def test_popgen_em_af():
    # 10 hom-ref, 10 het, 10 hom-alt -> AF(alt) ~ 0.5
    gl = ([[1.0, 1e-8, 1e-12]] * 10 + [[1e-8, 1.0, 1e-8]] * 10
          + [[1e-12, 1e-8, 1.0]] * 10)
    af = est_biallelic_af(gl)
    assert af[1] == pytest.approx(0.5, abs=0.01)
    gf = est_biallelic_gt_freq(gl)
    assert gf[1] == pytest.approx(1 / 3, abs=0.02)
    fic = est_biallelic_fic(gl, af)
    assert abs(fic) < 0.4
    pval = est_biallelic_hwe_lrt(gl, af, gf)
    assert 0.0 <= pval <= 1.0


def test_dosage_r2():
    a = [0, 1, 2, 0, 1, 2] * 5
    b = [0, 1, 2, 0, 1, 2] * 5
    assert dosage_r2(a, b, 20) == pytest.approx(1.0)
    assert dosage_r2(a, b, 100) == -1.0  # too few shared
    c = [2, 1, 0, 2, 1, 0] * 5
    assert dosage_r2(a, c, 20) == pytest.approx(1.0)  # r^2 of -1 corr


def test_chi2_sf():
    assert chi2_sf_1df(0.0) == pytest.approx(1.0)
    assert chi2_sf_1df(3.841) == pytest.approx(0.05, abs=0.001)


def test_merge_cli_end_to_end(tmp_path):
    """Two single-sample call sets with the same DEL merge to one site."""
    hdr = "\n".join([
        "##fileformat=VCFv4.2",
        "##contig=<ID=18,length=200001>",
        '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
        '##INFO=<ID=CT,Number=1,Type=String,Description="C">',
        '##INFO=<ID=PE,Number=1,Type=Integer,Description="P">',
        '##INFO=<ID=SR,Number=1,Type=Integer,Description="S">',
        '##INFO=<ID=SRMAPQ,Number=1,Type=Integer,Description="Q">',
        '##INFO=<ID=SRQ,Number=1,Type=Float,Description="Q">',
        '##INFO=<ID=CE,Number=1,Type=Float,Description="Q">',
        '##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="P">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
        '##FORMAT=<ID=RR,Number=1,Type=Integer,Description="G">',
        '##FORMAT=<ID=RV,Number=1,Type=Integer,Description="G">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS{}",
    ])
    rec = ("18\t{pos}\tDEL1\tG\t<DEL>\t900\tPASS\tPRECISE;SVTYPE=DEL;"
           "CT=3to5;END={end};PE=5;SR=6;SRMAPQ=60;SRQ=0.95;CE=1.8\t"
           "GT:RR:RV\t0/1:10:9")
    f1 = tmp_path / "s1.vcf"
    f2 = tmp_path / "s2.vcf"
    f1.write_text(hdr.format(1) + "\n"
                  + rec.format(pos=100000, end=108002) + "\n")
    f2.write_text(hdr.format(2) + "\n"
                  + rec.format(pos=100005, end=108000) + "\n")
    out = tmp_path / "merged.vcf"
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "merge", "-o", str(out),
         str(f1), str(f2)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    records = [l for l in open(out) if not l.startswith("#")]
    assert len(records) == 1
    info = records[0].split("\t")[7]
    assert "SUPP=2" in info
    assert "AC=2" in info
    assert "SVTYPE=DEL" in info


def test_filter_germline_cli(tmp_path):
    """Cohort DEL with clean carriers/non-carriers passes germline."""
    nsamp = 8
    hdr = "\n".join([
        "##fileformat=VCFv4.2",
        "##contig=<ID=18,length=200001>",
        '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
        '##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="P">',
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
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(f"S{i}" for i in range(nsamp)),
    ])
    het = "0/1:90:500,0,500:500:1000:1000:10:10:10:10"
    ref = "0/0:90:0,500,990:1000:1000:1000:20:0:20:0"
    cols = [het if i < 3 else ref for i in range(nsamp)]
    rec = ("18\t100000\tDEL1\tG\t<DEL>\t900\tPASS\t"
           "PRECISE;SVTYPE=DEL;END=108002\tGT:GQ:PL:RC:RCL:RCR:RR:RV:DR:DV"
           "\t" + "\t".join(cols))
    f1 = tmp_path / "cohort.vcf"
    f1.write_text(hdr + "\n" + rec + "\n")
    out = tmp_path / "filtered.vcf"
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "filter", "-f", "germline",
         "-o", str(out), str(f1)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    records = [l for l in open(out) if not l.startswith("#")]
    assert len(records) == 1
    info = records[0].split("\t")[7]
    assert "RDRATIO=" in info
    assert "AFmle=" in info
    assert "HWEpval=" in info


def test_filter_somatic_cli(tmp_path):
    """Tumor-only SV with clean control passes the somatic filter."""
    hdr = "\n".join([
        "##fileformat=VCFv4.2",
        "##contig=<ID=18,length=200001>",
        '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
        '##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="P">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
        '##FORMAT=<ID=RC,Number=1,Type=Integer,Description="G">',
        '##FORMAT=<ID=RR,Number=1,Type=Integer,Description="G">',
        '##FORMAT=<ID=RV,Number=1,Type=Integer,Description="G">',
        '##FORMAT=<ID=DR,Number=1,Type=Integer,Description="G">',
        '##FORMAT=<ID=DV,Number=1,Type=Integer,Description="G">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ttum\tctl",
    ])
    rec = ("18\t100000\tDEL1\tG\t<DEL>\t900\tPASS\t"
           "PRECISE;SVTYPE=DEL;END=108002\tGT:RC:RR:RV:DR:DV\t"
           "0/1:500:10:10:10:10\t0/0:1000:20:0:20:0")
    f1 = tmp_path / "pair.vcf"
    f1.write_text(hdr + "\n" + rec + "\n")
    sfile = tmp_path / "samples.tsv"
    sfile.write_text("tum\ttumor\nctl\tcontrol\n")
    out = tmp_path / "somatic.vcf"
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "filter", "-f", "somatic",
         "-s", str(sfile), "-o", str(out), str(f1)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    records = [l for l in open(out) if not l.startswith("#")]
    assert len(records) == 1
    assert "SOMATIC" in records[0]


def test_filter_somatic_cnv_gaussian_overlap():
    """Tumor-vs-control Gaussian overlap test (filter.h:163-225):
    a clear tumor CN shift is SOMATIC; matching CNs are germline."""
    from delly_tpu.models.filter import FilterConfig, filter_somatic_cnv

    cfg = FilterConfig(filter="somatic",
                       tumor_set={"t"}, control_set={"c"})

    def rec(tcn, ccn):
        return {"info": {}, "_sample_names": ["t", "c"],
                "samples": [{"RDCN": f"{tcn}", "RDSD": "0.05"},
                            {"RDCN": f"{ccn}", "RDSD": "0.05"}]}

    r = rec(1.0, 2.0)
    assert filter_somatic_cnv(cfg, r) is False      # kept
    assert r["info"].get("SOMATIC") is True
    assert "PGERM" in r["info"] and "CNDIFF" in r["info"]

    r2 = rec(2.0, 2.02)
    assert filter_somatic_cnv(cfg, r2) is True      # germline: dropped
    assert "SOMATIC" not in r2["info"]

    r3 = rec(-1, 2.0)                               # invalid CN fails
    assert filter_somatic_cnv(cfg, r3) is True


def test_somatic_zero_coverage_control_fails(tmp_path):
    """A control with GT=0/0 but zero coverage is 0/0 = NaN rVar in the
    reference (filter.h:837-840): it can never satisfy the
    contamination gate, so the record must NOT pass the somatic
    filter."""
    hdr = "\n".join([
        "##fileformat=VCFv4.2",
        "##contig=<ID=18,length=200001>",
        '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
        '##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="P">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
        '##FORMAT=<ID=RC,Number=1,Type=Integer,Description="G">',
        '##FORMAT=<ID=RR,Number=1,Type=Integer,Description="G">',
        '##FORMAT=<ID=RV,Number=1,Type=Integer,Description="G">',
        '##FORMAT=<ID=DR,Number=1,Type=Integer,Description="G">',
        '##FORMAT=<ID=DV,Number=1,Type=Integer,Description="G">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ttum\tctl",
    ])
    rec = ("18\t100000\tDEL1\tG\t<DEL>\t900\tPASS\t"
           "PRECISE;SVTYPE=DEL;END=108002\tGT:RC:RR:RV:DR:DV\t"
           "0/1:500:10:10:10:10\t0/0:1000:0:0:0:0")
    f1 = tmp_path / "pair.vcf"
    f1.write_text(hdr + "\n" + rec + "\n")
    sfile = tmp_path / "samples.tsv"
    sfile.write_text("tum\ttumor\nctl\tcontrol\n")
    out = tmp_path / "somatic.vcf"
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "filter", "-f", "somatic",
         "-s", str(sfile), "-o", str(out), str(f1)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert [l for l in open(out) if not l.startswith("#")] == []


def test_iround_half_away_from_zero():
    """boost::math::round semantics at CN halfway points (a 2.5-shifted
    RDCN classifies as CN3, not banker's CN2)."""
    from delly_tpu.models.filter import _iround
    assert _iround(2.5) == 3
    assert _iround(3.5) == 4
    assert _iround(-2.5) == -3
    assert _iround(0.5) == 1
    assert _iround(2.4999) == 2


def test_homlen_zero_not_overridden_by_stdev_pos():
    """HOMLEN present-with-zero keeps 0; STDEV_POS substitutes only
    when HOMLEN is absent (merge.h:532-534 else-if)."""
    from delly_tpu.models.merge import MergeConfig, collect_svtype

    def reader_for(info):
        class R:
            header_lines = ["##fileformat=VCFv4.2", "##contig=<ID=c1>"]
            column_header = "#CHROM\tPOS\t..."
            samples = ["s1"]
            records = [{
                "chrom": "c1", "pos": 100, "id": "DEL1", "ref": "A",
                "alt": "<DEL>", "qual": 300.0, "filter": "PASS",
                "info": dict({"SVTYPE": "DEL", "END": 500, "PE": 5,
                              "MAPQ": 40, "CT": "3to5",
                              "PRECISE": True, "SR": 5, "SRMAPQ": 60,
                              "SRQ": 1.0, "CE": 1.9}, **info),
                "samples": [{"GT": "0/1", "DR": 10, "DV": 10,
                             "RR": 10, "RV": 10}],
            }]

            def contig_names(self):
                return ["c1"]
        return R()

    cfg = MergeConfig(total_samples=1)
    n1 = collect_svtype(cfg, 2, {"c1": 0},
                        [reader_for({"HOMLEN": 0, "STDEV_POS": 40.0})])
    assert n1 and n1[0].homlen == 0
    n2 = collect_svtype(cfg, 2, {"c1": 0},
                        [reader_for({"STDEV_POS": 40.0})])
    assert n2 and n2[0].homlen == 40


def test_merge_missing_gt_sample_skipped():
    """With GT present for the record, a sample whose GT is '.' is
    skipped, not VAF-routed (merge.h:484-487)."""
    from delly_tpu.models.merge import MergeConfig, collect_svtype

    class R:
        header_lines = ["##fileformat=VCFv4.2", "##contig=<ID=c1>"]
        column_header = "#CHROM\tPOS\t..."
        samples = ["s1", "s2"]
        records = [{
            "chrom": "c1", "pos": 100, "id": "DEL1", "ref": "A",
            "alt": "<DEL>", "qual": 300.0, "filter": "PASS",
            "info": {"SVTYPE": "DEL", "END": 500, "PE": 5, "MAPQ": 40,
                     "CT": "3to5", "PRECISE": True, "SR": 5,
                     "SRMAPQ": 60, "SRQ": 1.0, "CE": 1.9},
            # sample 1 het; sample 2 missing GT but strong DR/DV —
            # the reference does NOT count it as a carrier
            "samples": [{"GT": "0/1", "RR": 10, "RV": 10},
                        {"GT": ".", "RR": 5, "RV": 15}],
        }]

        def contig_names(self):
            return ["c1"]

    cfg = MergeConfig(total_samples=2)
    nodes = collect_svtype(cfg, 2, {"c1": 0}, [R()])
    assert nodes and nodes[0].supp == 1 and nodes[0].ac == 1


def test_germline_cnv_single_missing_rdcn_sample():
    """One sample's RDCN='.' invalidates only that sample
    (filter.h:276), not the whole record."""
    from delly_tpu.models.filter import FilterConfig, filter_germline_cnv

    cfg = FilterConfig(filter="germline")
    nsm = 60
    samples = [{"RDCN": "1.0" if i < 20 else "2.0", "FT": "PASS",
                "RC": 100} for i in range(nsm)]
    samples[3] = {"RDCN": ".", "FT": "PASS", "RC": 100}
    rec = {"info": {}, "samples": samples, "id": "CNV1",
           "chrom": "c1", "pos": 100, "ref": "N", "alt": "<CNV>",
           "qual": 500.0, "filter": "PASS"}
    failgerm, dos, ac, ncalled, svtype = filter_germline_cnv(cfg, rec)
    assert not failgerm
    assert svtype == "DEL"
    assert samples[3]["GT"] == "./."     # only that sample blanked


def test_merge_all_missing_gt_record_dropped():
    """GT presence is record-level (merge.h ngt > 0 = the FORMAT
    column declares GT): a record where EVERY sample's GT is missing
    has zero carriers and is dropped — it must not re-qualify through
    the no-genotype VAF branch."""
    from delly_tpu.models.merge import MergeConfig, collect_svtype

    class R:
        header_lines = ["##fileformat=VCFv4.2", "##contig=<ID=c1>"]
        column_header = "#CHROM\tPOS\t..."
        samples = ["s1", "s2"]
        records = [{
            "chrom": "c1", "pos": 100, "id": "DEL1", "ref": "A",
            "alt": "<DEL>", "qual": 300.0, "filter": "PASS",
            "info": {"SVTYPE": "DEL", "END": 500, "CT": "3to5",
                     "PRECISE": True},
            # strong RR/RV support, but all genotypes missing
            "samples": [{"GT": ".", "RR": 5, "RV": 15},
                        {"GT": "./.", "RR": 4, "RV": 16}],
        }]

        def contig_names(self):
            return ["c1"]

    cfg = MergeConfig(total_samples=2)
    nodes = collect_svtype(cfg, 2, {"c1": 0}, [R()])
    assert nodes == []
