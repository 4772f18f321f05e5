"""VCF record emission for SV calls (reference modvcf.h:342-800)."""

from __future__ import annotations


from delly_tpu.io.vcf import VcfWriter, fmt_float, fmt_float32, format_gt, replace_iupac
from delly_tpu.ops.likelihood import compute_gls
from delly_tpu.utils.tags import (
    SVT_TRANS, add_id, add_orientation, entropy, is_translocation,
)
import numpy as _np

from delly_tpu.version import SVMETHOD
from delly_tpu.utils.log import stage


def _sv_id_string(svt: int, svid: int) -> str:
    pad = str(svid)
    return add_id(svt) + "0" * max(0, 8 - len(pad)) + pad


def vcf_output(cfg, header, svs, jct_map, rc_map, span_map,
               methyl_map=None) -> None:
    nsamples = len(cfg.sample_names)
    writer = VcfWriter(cfg.outfile, header.names, header.lengths,
                       cfg.sample_names, cfg.genome)
    stage("Genotyping")
    for sv in svs:
        if sv.srSupport == 0 and sv.peSupport == 0:
            continue
        if not cfg.vcffile:
            total_gt_sup = 0
            for file_c in range(nsamples):
                total_gt_sup += (len(span_map[file_c][sv.id].alt)
                                 + len(jct_map[file_c][sv.id].alt))
            if total_gt_sup < 2:
                continue

        # Site filter (modvcf.h:475-482)
        if sv.chr == sv.chr2:
            lowqual = ((sv.peSupport < 3 or sv.peMapQuality < 20)
                       and (sv.srSupport < 3 or sv.srMapQuality < 20))
        else:
            lowqual = ((sv.peSupport < 5 or sv.peMapQuality < 20)
                       and (sv.srSupport < 5 or sv.srMapQuality < 20))
        filt = "LowQual" if lowqual else "PASS"

        sv_start_pos = max(0, sv.svStart - 1)
        sv_end_pos = max(1, sv.svEnd)
        sv_end_pos = min(sv_end_pos, header.lengths[sv.chr2])

        alleles = replace_iupac(sv.alleles)
        comma = alleles.find(",")
        ref_allele = alleles[:comma] if comma >= 0 else alleles
        alt_allele = alleles[comma + 1:] if comma >= 0 else ""

        info = []
        info.append(("PRECISE" if sv.precise else "IMPRECISE", None))
        info.append(("SVTYPE", add_id(sv.svt)))
        info.append(("SVMETHOD", SVMETHOD))
        if sv.svt < SVT_TRANS:
            is_symbolic = comma < 0
            if not is_symbolic:
                alt = alleles[comma + 1:]
                is_symbolic = bool(alt) and (alt[0] == "<" or "[" in alt
                                             or "]" in alt)
            if not is_symbolic:
                endv = sv_start_pos + comma
            else:
                if sv_end_pos < sv_start_pos + 1:
                    sv_end_pos = sv_start_pos + 1
                endv = sv_end_pos
            info.append(("END", endv))
        else:
            info.append(("END", sv_start_pos + 1))
            info.append(("CHR2", header.names[sv.chr2]))
            info.append(("POS2", sv_end_pos))
        if sv.svt == 4:
            info.append(("SVLEN", sv.insLen))
        elif sv.svt == 2:
            info.append(("SVLEN", sv.svStart - sv.svEnd))
        elif sv.svt in (3, 0, 1):
            info.append(("SVLEN", sv.svEnd - sv.svStart))
        info.append(("PE", sv.peSupport))
        info.append(("MAPQ", sv.peMapQuality))
        info.append(("CT", add_orientation(sv.svt)))
        info.append(("CIPOS", f"{sv.ciposlow},{sv.ciposhigh}"))
        info.append(("CIEND", f"{sv.ciendlow},{sv.ciendhigh}"))
        if sv.alleleid >= 0:
            info.append(("ALLELEID", sv.alleleid))
            info.append(("NALLELE", sv.nallele))
        homlen_emitted = False
        if sv.precise:
            info.append(("SRMAPQ", sv.srMapQuality))
            info.append(("INSLEN", sv.insLen))
            info.append(("HOMLEN", sv.homLen))
            homlen_emitted = True
            info.append(("SR", sv.srSupport))
            info.append(("SRQ", fmt_float32(sv.srAlignQuality)))
            if sv.consensus:
                info.append(("CONSENSUS", sv.consensus))
                info.append(("CE", fmt_float32(entropy(sv.consensus))))
                info.append(("CONSBP", sv.consBp))
        # SVAnno (modvcf.h:577-598)
        if not is_translocation(sv.svt):
            if sv.anno.homLen > 0:
                if homlen_emitted:
                    info = [(k, sv.anno.homLen if k == "HOMLEN" else v)
                            for k, v in info]
                else:
                    info.append(("HOMLEN", sv.anno.homLen))
            if 0 < sv.anno.seqType < 7:
                seqtypes = ["", "INS:ME:ALU", "INS:ME:LINE1", "INS:ME:SVA",
                            "INS:NUMT", "INS:LTR", "INS:HERVK"]
                info.append(("SUBTYPE", seqtypes[sv.anno.seqType]))
                info.append(("INSSTRAND", "-" if sv.anno.isRC else "+"))
            elif sv.anno.seqType == 7:
                info.append(("SUBTYPE",
                             "INS:TR" if sv.svt == 4 else "DEL:TR"))
                info.append(("TRPERIOD", sv.anno.trPeriod))
                info.append(("TRCOPIES", fmt_float32(sv.anno.trCopies)))

        # Genotypes
        sample_fields = []
        gts = []
        for file_c in range(nsamples):
            jc = jct_map[file_c][sv.id]
            sp = span_map[file_c][sv.id]
            rc = rc_map[file_c][sv.id]
            if sv.precise:
                gls, gq, gt, pls = compute_gls(jc.ref, jc.alt)
            else:
                gls, gq, gt, pls = compute_gls(sp.ref, sp.alt)
            phased = False
            if jc.ps != -1 and gt == (0, 1):
                hp1a = len(jc.hp1alt)
                hp2a = len(jc.hp2alt)
                if (hp1a + hp2a) > 0 and hp1a != hp2a:
                    phased = True
                    gt = (1, 0) if hp1a > hp2a else (0, 1)
            gts.append(gt)
            cnest = -1
            if (rc.leftRC + rc.rightRC) > 0:
                cn = 2.0 * rc.rc / (rc.leftRC + rc.rightRC)
                cn = min(max(cn, 0.0), 100000.0)
                # boost::math::iround: round half away from zero
                cnest = int(cn + 0.5) if cn >= 0 else -int(-cn + 0.5)
            ft = "LowQual" if gq < 15 else "PASS"
            fields = {
                "GT": format_gt(gt, phased),
                "GQ": gq,
                "PL": ",".join(str(p) for p in pls) if pls else ".,.,.",
                "FT": ft,
                "RCL": rc.leftRC, "RC": rc.rc, "RCR": rc.rightRC,
                "RDCN": cnest,
                "DR": len(sp.ref), "DV": len(sp.alt),
                "RR": len(jc.ref), "RV": len(jc.alt),
                "HP": f"{len(jc.hp1ref)},{len(jc.hp1alt)},"
                      f"{len(jc.hp2ref)},{len(jc.hp2alt)}",
                "PS": jc.ps,
            }
            if methyl_map is not None and file_c < len(methyl_map) \
                    and sv.id < len(methyl_map[file_c]):
                mi = methyl_map[file_c][sv.id]
                fields.update(mi.format_fields(sv.svt, cfg))
            else:
                fields.update({"MR": ".,.,.,.", "MA": ".,.,.,.",
                               "MNC": ".,.,.,.", "MDV": ".,.,.,."})
            sample_fields.append(fields)

        ac = sum(1 for g in gts if g is not None for a in g if a > 0)
        an = sum(2 for g in gts if g is not None)
        info.append(("AC", ac))
        info.append(("AN", an))

        qual = min(max(sv.mapq, 0), 10000)
        writer.write_record(header.names[sv.chr], sv_start_pos + 1,
                            _sv_id_string(sv.svt, sv.id), ref_allele,
                            alt_allele, qual, filt, info, sample_fields)
    writer.close()
