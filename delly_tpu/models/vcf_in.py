"""Re-genotyping input: parse a previously produced SV VCF.

Reference: modvcf.h vcfParse (:155-339). Requires CONSENSUS/CONSBP for
precise records (SVMETHOD starting with EMBL.DELLY and CONSBP present).
"""

from __future__ import annotations

import numpy as _np

import sys

from delly_tpu.io.vcf import VcfReader
from delly_tpu.utils.tags import (
    SVT_TRANS, StructuralVariantRecord, decode_orientation,
)


def vcf_parse(path: str, header) -> list:
    rdr = VcfReader(path)
    has_consbp = any("ID=CONSBP" in h for h in rdr.header_lines)
    svs = []
    # dellyVCF latches on the first record with a matching SVMETHOD
    # (modvcf.h:206-216); later records are parsed without re-checking
    delly_vcf = False
    for rec in rdr.records:
        info = rec["info"]
        if not delly_vcf:
            method = str(info.get("SVMETHOD", ""))
            if method.startswith("EMBL.DELLY") and has_consbp:
                delly_vcf = True
        if not delly_vcf:
            # first record failed to latch: error + stop (modvcf.h:310-313)
            print("Error: Delly genotyping requires local SV assembly "
                  "(INFO/CONSENSUS) and breakpoint (INFO/CONSBP)!",
                  file=sys.stderr)
            break
        sv = StructuralVariantRecord()
        tid = header.name2id(rec["chrom"])
        sv.chr = tid
        # VcfReader pos is the 1-based text POS; the reference's
        # rec->pos is htslib 0-based, so its "+1" (modvcf.h:222) is
        # already baked in here.
        sv.svStart = rec["pos"]
        sv.id = len(svs)
        try:
            sv.mapq = int(float(rec["qual"]))
        except ValueError:
            sv.mapq = 0
        ref, alt = rec["ref"], rec["alt"]
        if ref and ref != "." and alt and alt != ".":
            sv.alleles = ref + "," + alt
        if "SVTYPE" not in info or "CT" not in info:
            continue
        sv.svt = decode_orientation(info["CT"], info["SVTYPE"])
        sv.precise = bool(info.get("PRECISE", False))
        if "PE" in info:
            sv.peSupport = int(info["PE"])
        else:
            sv.peSupport = 0 if sv.precise else 2
        if sv.svt != 4:
            sv.insLen = int(info.get("INSLEN", 0))
        else:
            if "SVLEN" not in info:
                continue
            sv.insLen = int(info["SVLEN"])
        sv.homLen = int(info.get("HOMLEN", 0))
        sv.srSupport = int(info.get("SR", 0))
        sv.chr2 = tid
        sv.svEnd = rec["pos"]  # modvcf.h:260 (0-based pos + 1)
        if sv.svt < SVT_TRANS:
            if "END" in info:
                sv.svEnd = int(info["END"])
            if sv.alleles:
                comma = sv.alleles.find(",")
                is_symbolic = comma < 0
                if not is_symbolic:
                    a = sv.alleles[comma + 1:]
                    is_symbolic = bool(a) and (a[0] == "<" or "[" in a
                                               or "]" in a)
                if not is_symbolic:
                    sv.svEnd = sv.svStart + comma
        else:
            if "CHR2" in info:
                sv.chr2 = header.name2id(info["CHR2"])
            if "POS2" in info:
                sv.svEnd = int(info["POS2"])
        if "CONSENSUS" in info:
            sv.consensus = info["CONSENSUS"]
            sv.consBp = int(info.get("CONSBP", 0))
        else:
            sv.precise = False
        if "CIPOS" in info:
            lo, hi = info["CIPOS"].split(",")
            sv.ciposlow, sv.ciposhigh = int(lo), int(hi)
        else:
            sv.ciposlow, sv.ciposhigh = -50, 50
        if "CIEND" in info:
            lo, hi = info["CIEND"].split(",")
            sv.ciendlow, sv.ciendhigh = int(lo), int(hi)
        else:
            sv.ciendlow, sv.ciendhigh = -50, 50
        # (uint8_t) casts, modvcf.h:299-302
        sv.peMapQuality = int(info.get("MAPQ", 0)) & 0xFF
        sv.srMapQuality = int(info.get("SRMAPQ", 0)) & 0xFF
        # htslib parses the text through float32 then widens
        # (bcf_get_info_float; modvcf.h:303 (double)*srq)
        sv.srAlignQuality = float(_np.float32(info.get("SRQ", 0.0)))
        if "ALLELEID" in info:
            sv.alleleid = int(info["ALLELEID"])
            sv.nallele = int(info.get("NALLELE", 1))
        svs.append(sv)
    return svs
