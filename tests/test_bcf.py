"""BCF2.2 codec roundtrip tests."""

import pytest

from delly_tpu.io.bcf import bcf_to_vcf_text, vcf_text_to_bcf
from delly_tpu.io.bgzf import bgzf_decompress

VCF_TEXT = """##fileformat=VCFv4.2
##FILTER=<ID=PASS,Description="All filters passed">
##FILTER=<ID=LowQual,Description="Low quality">
##contig=<ID=18,length=200001>
##contig=<ID=19,length=100>
##INFO=<ID=END,Number=1,Type=Integer,Description="End">
##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type">
##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="Precise">
##INFO=<ID=AF,Number=A,Type=Float,Description="AF">
##INFO=<ID=CIPOS,Number=2,Type=Integer,Description="CI">
##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">
##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="GQ">
##FORMAT=<ID=PL,Number=G,Type=Integer,Description="PL">
##FORMAT=<ID=RDCN,Number=1,Type=Float,Description="CN">
##FORMAT=<ID=FT,Number=1,Type=String,Description="FT">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2
18\t100000\tDEL1\tG\t<DEL>\t960\tPASS\tPRECISE;SVTYPE=DEL;END=108002;AF=0.25;CIPOS=-3,3\tGT:GQ:PL:RDCN:FT\t0/1:57:570,0,999:1.5:PASS\t1|1:12:999,60,0:0.9:LowQual
18\t150000\tINS1\tA\tAACGT\t.\tLowQual\tSVTYPE=INS;END=150000\tGT:GQ:PL:RDCN:FT\t./.:.:.,.,.:.:LowQual\t0/0:99:0,600,990:2.1:PASS
19\t50\tBND1\tN\tN[18:1000[\t77\tPASS\tSVTYPE=BND;END=51\tGT:GQ\t0/1:40\t0/1:33
"""


def _body(text):
    return [l for l in text.split("\n") if l and not l.startswith("#")]


def test_roundtrip_preserves_records():
    bcf = vcf_text_to_bcf(VCF_TEXT)
    assert bgzf_decompress(bcf)[:5] == b"BCF\x02\x02"
    back = bcf_to_vcf_text(bcf)
    want = _body(VCF_TEXT)
    got = _body(back)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.split("\t") == w.split("\t")


def test_roundtrip_header_retained():
    bcf = vcf_text_to_bcf(VCF_TEXT)
    back = bcf_to_vcf_text(bcf)
    assert "##contig=<ID=18,length=200001>" in back
    assert '##INFO=<ID=SVTYPE' in back
    assert back.index("#CHROM") > back.index("##contig=<ID=19")


def test_sitelist_without_samples():
    text = "\n".join([
        "##fileformat=VCFv4.2",
        "##contig=<ID=1>",
        '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "1\t10\tX\tA\t<DEL>\t5\tPASS\tEND=20",
        "",
    ])
    back = bcf_to_vcf_text(vcf_text_to_bcf(text))
    got = _body(back)[0].split("\t")
    assert got[:8] == ["1", "10", "X", "A", "<DEL>", "5", "PASS",
                       "END=20"]


def test_vcfreader_detects_bcf(tmp_path):
    from delly_tpu.io.vcf import VcfReader
    p = tmp_path / "x.bcf"
    p.write_bytes(vcf_text_to_bcf(VCF_TEXT))
    rdr = VcfReader(str(p))
    assert len(rdr.records) == 3
    assert rdr.samples == ["s1", "s2"]
    assert rdr.records[0]["samples"][1]["GT"] == "1|1"
    assert rdr.records[0]["info"]["AF"] == "0.25"


def test_undeclared_keys_get_synthesized_headers():
    """A user-supplied VCF with undeclared FILTER/INFO/FORMAT keys must
    still produce a self-consistent BCF: every IDX-dictionary entry
    needs a matching header line (spec 6.2.1; htslib rebuilds the
    dictionary purely from header lines)."""
    text = "\n".join([
        "##fileformat=VCFv4.2",
        "##contig=<ID=1>",
        '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1",
        "1\t10\tX\tA\t<DEL>\t5\tq10;Blacklist\tEND=20;NOVEL;XDEPTH=3.5"
        "\tGT:XQ\t0/1:17",
        "",
    ])
    bcf = vcf_text_to_bcf(text)
    back = bcf_to_vcf_text(bcf)
    for decl in ("##FILTER=<ID=q10", "##FILTER=<ID=Blacklist",
                 "##INFO=<ID=NOVEL,Number=0,Type=Flag",
                 "##INFO=<ID=XDEPTH", "##FORMAT=<ID=XQ"):
        assert decl in back, decl
    row = [l for l in back.split("\n")
           if l and not l.startswith("#")][0].split("\t")
    assert row[6] == "q10;Blacklist"
    assert "NOVEL" in row[7] and "XDEPTH=3.5" in row[7]
    assert row[8] == "GT:XQ"
    assert row[9] == "0/1:17"


def test_cross_context_key_gets_own_declaration():
    """An ID declared as INFO but used in FORMAT (or vice versa) shares
    one string-dictionary slot but still needs a header line per
    context a conformant reader resolves it in."""
    text = "\n".join([
        "##fileformat=VCFv4.2",
        "##contig=<ID=1>",
        '##INFO=<ID=DV,Number=1,Type=Integer,Description="x">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1",
        "1\t10\tX\tA\t<DEL>\t5\tDV\tDV=3\tGT:DV\t0/1:7",
        "",
    ])
    bcf = vcf_text_to_bcf(text)
    back = bcf_to_vcf_text(bcf)
    assert "##FORMAT=<ID=DV" in back
    assert "##FILTER=<ID=DV" in back
    row = [l for l in back.split("\n")
           if l and not l.startswith("#")][0].split("\t")
    assert row[6] == "DV" and row[7] == "DV=3"
    assert row[8] == "GT:DV" and row[9] == "0/1:7"
