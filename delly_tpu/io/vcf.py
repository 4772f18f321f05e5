"""VCF writing/reading for SV records.

Mirrors the role of src/modvcf.h vcfOutput/vcfParse. Output is VCF text
(or bgzipped VCF for .vcf.gz / .bcf output paths; a native BCF2 codec is on
the roadmap). Header lines, INFO/FORMAT ordering, ID padding and filter
rules match the reference.
"""

from __future__ import annotations

import datetime
import io

from delly_tpu.io.bgzf import bgzf_compress

HEADER_LINES = [
    '##ALT=<ID=DEL,Description="Deletion">',
    '##ALT=<ID=DUP,Description="Duplication">',
    '##ALT=<ID=INV,Description="Inversion">',
    '##ALT=<ID=BND,Description="Translocation">',
    '##ALT=<ID=INS,Description="Insertion">',
    '##FILTER=<ID=LowQual,Description="Poor quality and insufficient number of PEs and SRs.">',
    '##INFO=<ID=CIEND,Number=2,Type=Integer,Description="PE confidence interval around END">',
    '##INFO=<ID=CIPOS,Number=2,Type=Integer,Description="PE confidence interval around POS">',
    '##INFO=<ID=CHR2,Number=1,Type=String,Description="Chromosome for POS2 coordinate in case of an inter-chromosomal translocation">',
    '##INFO=<ID=POS2,Number=1,Type=Integer,Description="Genomic position for CHR2 in case of an inter-chromosomal translocation">',
    '##INFO=<ID=END,Number=1,Type=Integer,Description="End position of the structural variant">',
    '##INFO=<ID=PE,Number=1,Type=Integer,Description="Paired-end support of the structural variant">',
    '##INFO=<ID=MAPQ,Number=1,Type=Integer,Description="Median mapping quality of paired-ends">',
    '##INFO=<ID=SRMAPQ,Number=1,Type=Integer,Description="Median mapping quality of split-reads">',
    '##INFO=<ID=SR,Number=1,Type=Integer,Description="Split-read support">',
    '##INFO=<ID=SRQ,Number=1,Type=Float,Description="Split-read consensus alignment quality">',
    '##INFO=<ID=CONSENSUS,Number=1,Type=String,Description="Split-read consensus sequence">',
    '##INFO=<ID=CONSBP,Number=1,Type=Integer,Description="Consensus SV breakpoint position">',
    '##INFO=<ID=CE,Number=1,Type=Float,Description="Consensus sequence entropy">',
    '##INFO=<ID=CT,Number=1,Type=String,Description="Paired-end signature induced connection type">',
    '##INFO=<ID=SVLEN,Number=1,Type=Integer,Description="SV length; negative for DEL, positive for DUP/INV/INS.">',
    '##INFO=<ID=IMPRECISE,Number=0,Type=Flag,Description="Imprecise structural variation">',
    '##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="Precise structural variation">',
    '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type of structural variant">',
    '##INFO=<ID=SVMETHOD,Number=1,Type=String,Description="Type of approach used to detect SV">',
    '##INFO=<ID=INSLEN,Number=1,Type=Integer,Description="Predicted length of the insertion">',
    '##INFO=<ID=HOMLEN,Number=1,Type=Integer,Description="Breakpoint homology length">',
    '##INFO=<ID=SUBTYPE,Number=1,Type=String,Description="SV subtype: INS:ME:ALU, INS:ME:LINE1, INS:ME:SVA, INS:NUMT, INS:LTR, INS:HERVK, INS:TR, or DEL:TR">',
    '##INFO=<ID=ALLELEID,Number=1,Type=Integer,Description="Identifier of the merged locus">',
    '##INFO=<ID=NALLELE,Number=1,Type=Integer,Description="Number of distinct alleles at this locus">',
    '##INFO=<ID=AC,Number=A,Type=Integer,Description="Allele count">',
    '##INFO=<ID=AN,Number=1,Type=Integer,Description="Total number of alleles">',
    '##INFO=<ID=INSSTRAND,Number=1,Type=String,Description="Insertion strand for MEIs">',
    '##INFO=<ID=TRPERIOD,Number=1,Type=Integer,Description="Tandem repeat period in bp">',
    '##INFO=<ID=TRCOPIES,Number=1,Type=Float,Description="Tandem repeat copy number">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="Phred-scaled genotype likelihoods for RR,RA,AA genotypes">',
    '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype Quality">',
    '##FORMAT=<ID=FT,Number=1,Type=String,Description="Per-sample genotype filter">',
    '##FORMAT=<ID=RC,Number=1,Type=Integer,Description="Raw high-quality read counts or base counts for the SV">',
    '##FORMAT=<ID=RCL,Number=1,Type=Integer,Description="Raw high-quality read counts or base counts for the left control region">',
    '##FORMAT=<ID=RCR,Number=1,Type=Integer,Description="Raw high-quality read counts or base counts for the right control region">',
    '##FORMAT=<ID=RDCN,Number=1,Type=Integer,Description="Read-depth based copy-number estimate for autosomal sites">',
    '##FORMAT=<ID=DR,Number=1,Type=Integer,Description="# high-quality reference pairs">',
    '##FORMAT=<ID=DV,Number=1,Type=Integer,Description="# high-quality variant pairs">',
    '##FORMAT=<ID=RR,Number=1,Type=Integer,Description="# high-quality reference junction reads">',
    '##FORMAT=<ID=RV,Number=1,Type=Integer,Description="# high-quality variant junction reads">',
    '##FORMAT=<ID=HP,Number=4,Type=Integer,Description="Haplotype-specific junction read counts (HP1_ref,HP1_alt,HP2_ref,HP2_alt)">',
    '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="Phase set identifier from HP-tagged alignments">',
    '##FORMAT=<ID=MR,Number=4,Type=Integer,Description="Methylation % for REF allele [SV start left/right, SV end left/right]">',
    '##FORMAT=<ID=MA,Number=4,Type=Integer,Description="Methylation % for ALT allele [SV start left/right, SV end left/right]">',
    '##FORMAT=<ID=MNC,Number=4,Type=Integer,Description="Unique CpG sites observed per window [SV start left/right, SV end left/right]">',
    '##FORMAT=<ID=MDV,Number=4,Type=Integer,Description="Avg. read depth per CpG site per window [SV start left/right, SV end left/right]">',
]

FORMAT_KEYS = ["GT", "GQ", "PL", "FT", "RCL", "RC", "RCR", "RDCN", "DR",
               "DV", "RR", "RV", "HP", "PS", "MR", "MA", "MNC", "MDV"]

IUPAC_ALT = {
    "U": "T", "R": "A", "Y": "C", "S": "C", "W": "A", "K": "G", "M": "A",
    "B": "C", "D": "A", "H": "A", "V": "A",
}


def replace_iupac(alleles: str) -> str:
    """modvcf.h:101-133: sanitize IUPAC codes in the ALT allele only."""
    out = []
    in_tag = 0
    in_ref = True
    for ch in alleles:
        if ch == ",":
            in_ref = False
        if (in_ref or in_tag or ch in "ACGTNacgtn<>][,"):
            out.append(ch)
            if ch == "<":
                in_tag = 1
            elif ch == "]":
                in_tag = 0 if in_tag == 2 else 2
            elif ch == "[":
                in_tag = 0 if in_tag == 3 else 3
            elif ch == ">" and in_tag == 1:
                in_tag = 0
        else:
            out.append(IUPAC_ALT.get(ch.upper(), "N"))
    return "".join(out)


def fmt_float(x: float) -> str:
    """htslib-style %g float formatting."""
    s = f"{x:g}"
    return s


def fmt_float32(x) -> str:
    """Render a value the way htslib renders a BCF Float: stored as
    float32, then %g of the promoted double. Pre-rounding through
    6-digit text instead diverges on boundary values (pinned by the
    asm/merge emission oracles)."""
    import numpy as np
    return fmt_float(float(np.float32(x)))


class VcfWriter:
    def __init__(self, path: str, chrom_names, chrom_lens, samples,
                 genome_path: str = "", header_lines=None,
                 format_keys=None):
        self.path = path
        self.samples = list(samples)
        self.format_keys = list(format_keys or FORMAT_KEYS)
        buf = io.StringIO()
        buf.write("##fileformat=VCFv4.2\n")
        buf.write('##FILTER=<ID=PASS,Description="All filters passed">\n')
        today = datetime.date.today()
        buf.write(f"##fileDate={today.strftime('%Y%m%d')}\n")
        for line in (HEADER_LINES if header_lines is None else header_lines):
            buf.write(line + "\n")
        if genome_path:
            buf.write(f"##reference={genome_path}\n")
        for name, ln in zip(chrom_names, chrom_lens):
            buf.write(f"##contig=<ID={name},length={ln}>\n")
        cols = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
                "INFO"]
        if self.samples:
            cols += ["FORMAT"] + self.samples
        buf.write("\t".join(cols) + "\n")
        self._buf = buf

    def write_record(self, chrom, pos1, vid, ref, alt, qual, filt, info_pairs,
                     sample_fields):
        """info_pairs: list of (key, value-or-None-for-flag);
        sample_fields: list of dicts keyed by format_keys subset."""
        info = ";".join(k if v is None else f"{k}={v}" for k, v in info_pairs)
        row = [chrom, str(pos1), vid, ref, alt, str(qual), filt, info]
        if self.samples:
            row.append(":".join(self.format_keys))
            for sf in sample_fields:
                row.append(":".join(str(sf.get(k, "."))
                                    for k in self.format_keys))
        self._buf.write("\t".join(row) + "\n")

    def close(self):
        data = self._buf.getvalue()
        if self.path == "-":
            import sys
            sys.stdout.write(data)
            return
        if self.path.endswith(".bcf"):
            from delly_tpu.io.bcf import vcf_text_to_bcf
            from delly_tpu.io.csi import build_csi
            bcf_bytes, n_ref, rec_meta = vcf_text_to_bcf(data,
                                                         with_index=True)
            with open(self.path, "wb") as fh:
                fh.write(bcf_bytes)
            # CSI index (role of bcf_index_build, modvcf.h:790)
            with open(self.path + ".csi", "wb") as fh:
                fh.write(build_csi(bcf_bytes, n_ref, rec_meta))
        elif self.path.endswith(".gz"):
            with open(self.path, "wb") as fh:
                fh.write(bgzf_compress(data.encode()))
        else:
            with open(self.path, "w") as fh:
                fh.write(data)


def format_gt(gt, phased=False) -> str:
    if gt is None:
        return "./."
    sep = "|" if phased else "/"
    return f"{gt[0]}{sep}{gt[1]}"


class VcfReader:
    """Minimal VCF text/.gz reader used by merge/filter/re-genotyping."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as fh:
            head = fh.read(2)
        if head == b"\x1f\x8b":
            # sniff the first block only (the full stream inflates once
            # inside the branch taken)
            from delly_tpu.io.bgzf import BgzfReader
            rd = BgzfReader(path)
            try:
                sniff = rd.read_prefix_blocks(5)[:5]
            finally:
                rd.close()
            with open(path, "rb") as fh:
                raw = fh.read()
            if sniff[:4] == b"BCF\x02":
                # any 2.x minor (htslib accepts major == 2)
                from delly_tpu.io.bcf import bcf_to_vcf_text
                text = bcf_to_vcf_text(raw)
            elif sniff[:3] == b"BCF":
                raise ValueError(
                    f"{path}: unsupported BCF version "
                    f"{sniff[3]}.{sniff[4]} (need 2.x)")
            else:
                from delly_tpu.io.bgzf import bgzf_decompress
                text = bgzf_decompress(raw).decode()
        else:
            with open(path) as fh:
                text = fh.read()
        self.header_lines = []
        self.samples = []
        self.records = []
        self.column_header = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
        saw_header = False
        for line in text.split("\n"):
            if not line:
                continue
            if line.startswith("##"):
                self.header_lines.append(line)
            elif line.startswith("#CHROM"):
                saw_header = True
                self.column_header = line
                cols = line.split("\t")
                self.samples = cols[9:]
            else:
                rec = parse_vcf_line(line)
                rec["_raw"] = line
                self.records.append(rec)
        if not saw_header and not self.header_lines:
            raise ValueError(f"{path}: not a VCF file")

    def contig_names(self) -> list:
        """Contig order from ##contig header lines, falling back to the
        order of appearance in the records."""
        names = []
        for h in self.header_lines:
            if h.startswith("##contig=<ID="):
                name = h[len("##contig=<ID="):].split(",")[0].rstrip(">")
                names.append(name)
        if not names:
            seen = set()
            for rec in self.records:
                if rec["chrom"] not in seen:
                    seen.add(rec["chrom"])
                    names.append(rec["chrom"])
        return names


def parse_vcf_line(line: str) -> dict:
    cols = line.rstrip("\n").split("\t")
    info = {}
    for item in cols[7].split(";"):
        k, eq, v = item.partition("=")  # one scan vs find+split
        info[k] = v if eq else True
    rec = {
        "chrom": cols[0], "pos": int(cols[1]), "id": cols[2], "ref": cols[3],
        "alt": cols[4], "qual": cols[5], "filter": cols[6], "info": info,
    }
    if len(cols) > 8:
        fmt = cols[8].split(":")
        rec["samples"] = [dict(zip(fmt, c.split(":"))) for c in cols[9:]]
    return rec
