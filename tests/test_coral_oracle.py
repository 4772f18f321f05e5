"""Differential oracle #24: the reference CNV counting driver
bamCount (/root/reference/src/coral.h:93-437) EXECUTES over the replay
layer and its covfile rows + emitted CNV VCF body are byte-compared
against delly_tpu/models/coral.py::bam_count on synthetic corpora —
fragment and base-level counting, fixed and adaptive windows, regional
GC tiles, haploid chromosomes and re-genotyping mode."""

import gzip
import os
import random
import shutil
import subprocess

import pytest

REF_SRC = "/root/reference/src"
HERE = os.path.dirname(os.path.abspath(__file__))
SHIM_DIR = os.path.join(HERE, "boost_shim")
PROBE_SRC = os.path.join(HERE, "coral_probe.cpp")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "coral.h"))):
        pytest.skip("g++ or reference coral.h unavailable")
    gen = tmp_path_factory.mktemp("coral_oracle")

    # slice real reference code: alignmentLength..addSplitReadBreakpoints
    # (util.h:440-499) and chrNoData (util.h:612-625)
    lines_u = open(os.path.join(REF_SRC, "util.h")).read().splitlines(
        keepends=True)
    a = next(i for i, ln in enumerate(lines_u)
             if "alignmentLength(bam1_t const* rec)" in ln) - 1
    b = next(i for i, ln in enumerate(lines_u)
             if "inline std::size_t hash_pair(bam1_t* rec)" in ln)
    cov_slice = "".join(lines_u[a:b])
    c0 = next(i for i, ln in enumerate(lines_u)
              if "chrNoData(TConfig const& c" in ln) - 2
    c1 = next(i for i in range(c0, len(lines_u))
              if lines_u[i].rstrip() == "  }")
    chr_slice = "".join(lines_u[c0:c1 + 1])
    (gen / "util_coral_slice.h").write_text(
        "namespace torali {\n" + cov_slice + "\n" + chr_slice + "\n}\n")

    # slice coral.h at its program_options CLI function
    lines_c = open(os.path.join(REF_SRC, "coral.h")).read().splitlines(
        keepends=True)
    cut = next(i for i, ln in enumerate(lines_c)
               if "int coral(int argc, char **argv)" in ln)
    (gen / "coral_sliced.h").write_text(
        "".join(lines_c[:cut]) + "\n}\n\n#endif\n")

    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", str(gen),
                        "-I", SHIM_DIR, "-I", REF_SRC, PROBE_SRC])

    def run(lines):
        out = subprocess.run([exe], input="\n".join(lines) + "\n",
                             text=True, capture_output=True,
                             check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


def _mk_dataset(tmpdir, name, seed=5, nchr=2, chrlen=30_000,
                pairs=1500, singles=200, clip_reads=60, del_span=None):
    """Synthetic numeric-contig BAM with proper pairs, unpaired reads,
    clipped/indel reads, a coverage-loss region and low-MAPQ reads."""
    import sys
    sys.path.insert(0, HERE)
    from bamsynth import encode_record, random_contig, write_bam, \
        write_fasta

    rng = random.Random(seed)
    contigs = [(str(t), random_contig(rng, chrlen, gc_blocks=6))
               for t in range(nchr)]
    if del_span is None:
        del_span = (chrlen * 2 // 5, chrlen * 2 // 5 + 4000)
    rl, isz = 100, 200
    recs = []
    qid = 0
    for tid, (_n, ref) in enumerate(contigs):
        for _ in range(pairs):
            p1 = rng.randint(0, chrlen - isz - rl)
            if del_span[0] - isz < p1 < del_span[1]:
                if rng.random() < 0.85:
                    continue  # coverage loss
            p2 = p1 + isz - rl
            q = f"p{qid}"
            qid += 1
            mq = 60 if rng.random() > 0.08 else rng.randint(0, 15)
            recs.append((tid, p1, encode_record(
                q, 0x63, tid, p1, mq, [("M", rl)], tid, p2, isz,
                ref[p1:p1 + rl])))
            recs.append((tid, p2, encode_record(
                q, 0x93, tid, p2, mq, [("M", rl)], tid, p1, -isz,
                ref[p2:p2 + rl])))
        for _ in range(singles):
            p1 = rng.randint(0, chrlen - rl)
            q = f"s{qid}"
            qid += 1
            recs.append((tid, p1, encode_record(
                q, 0x0, tid, p1, 60, [("M", rl)], -1, -1, 0,
                ref[p1:p1 + rl])))
        for k in range(clip_reads):
            # soft-clipped reads piling at the del edges + D-op reads
            bp = del_span[k % 2]
            p1 = max(0, bp - 50)
            q = f"c{qid}"
            qid += 1
            if k % 3 == 2:
                cig = [("M", 40), ("D", 60), ("M", 60)]
                seq = ref[p1:p1 + 40] + ref[p1 + 100:p1 + 160]
            else:
                cig = [("M", 50), ("S", 50)]
                seq = ref[p1:p1 + 50] + "A" * 50
            recs.append((tid, p1, encode_record(
                q, 0x0, tid, p1, 60, cig, -1, -1, 0, seq)))
    recs.sort(key=lambda r: (r[0], r[1]))
    bam = os.path.join(str(tmpdir), f"{name}.bam")
    fa = os.path.join(str(tmpdir), f"{name}.fa")
    write_bam(bam, contigs, [r[2] for r in recs])
    write_fasta(fa, contigs)
    return bam, fa, contigs


def _serialize(bam_path, contigs, cfg, li, gccov, gcbound, regcorr,
               reg_win, genofile="-"):
    from delly_tpu.io.bam import BamFile

    recs = []
    with BamFile(bam_path) as bf:
        for tid in range(len(contigs)):
            for rec in bf.chrom(tid).records():
                recs.append(
                    f"{rec.qname} {rec.tid},{rec.pos},{rec.flag},"
                    f"{rec.mapq},{rec.mtid},{rec.mpos},{rec.tlen} "
                    f"{rec.cigar_string() or '*'} {rec.seq or '.'}")
    lens = ",".join(str(len(s)) for _n, s in contigs)
    seqs = " ".join(s for _n, s in contigs)
    refidx = (",".join(str(x) for x in sorted(cfg.ref_idx))
              if cfg.ref_idx else "-")
    rc = ",".join(repr(x) for x in regcorr) if regcorr else "-"
    return ("BAMCOUNT "
            f"{cfg.min_qual} {cfg.mapq_uniq} {cfg.min_clip} "
            f"{cfg.min_ref_sep} {cfg.min_bp_support} {cfg.penalty!r} "
            f"{cfg.cn_merge_tol!r} {cfg.cn_min_callable!r} "
            f"{cfg.min_cnv_size} {cfg.meanisize} {cfg.window_size} "
            f"{cfg.window_offset} {cfg.frac_window!r} "
            f"{cfg.fragment_unique!r} {cfg.unique_to_total_cov_ratio!r} "
            f"{cfg.ploidy!r} {cfg.ctrl_ploidy!r} {cfg.expected_cn!r} "
            f"{cfg.purity!r} {int(cfg.basecov)} {int(cfg.adaptive)} "
            f"{cfg.target_exp_cov!r} {li.minNormalISize} "
            f"{li.maxNormalISize} {reg_win} {gcbound[0]} {gcbound[1]} "
            f"{refidx} {genofile} {len(contigs)} {lens} {seqs} "
            + ",".join(repr(x) for x in gccov) + f" {rc} "
            + f"{len(recs)} " + " ".join(recs))


def _run_mine(tmp_path, tag, bam, fa, cfg_kw, li, gccov, gcbound,
              regcorr, reg_win):
    from delly_tpu.models.coral import CnvConfig, bam_count
    from delly_tpu.models.gcbias import GcBias
    from delly_tpu.io.bam import BamFile
    from delly_tpu.io.fasta import FastaFile
    from delly_tpu.io.bcf import bcf_to_vcf_text

    cov = str(tmp_path / f"{tag}.cov.gz")
    out = str(tmp_path / f"{tag}.vcf")
    cfg = CnvConfig(genome=fa, bam_file=bam, outfile=out, covfile=cov,
                    sample_name="0", **cfg_kw)
    gcbias = [GcBias() for _ in range(cfg.meanisize + 1)]
    for i, v in enumerate(gccov):
        gcbias[i].coverage = v
    with BamFile(bam, genome=fa) as bf:
        cfg.nchr = bf.header.n_targets

        class _Li:
            pass

        l = _Li()
        l.minNormalISize = li.minNormalISize
        l.maxNormalISize = li.maxNormalISize
        l.median = 200
        l.mad = 15
        l.rs = 100
        assert bam_count(cfg, bf, FastaFile(fa), l, gcbias, gcbound,
                         regcorr, reg_win) == 0
    with gzip.open(cov, "rt") as fh:
        covtext = fh.read().splitlines()
    body = [ln for ln in open(out).read().splitlines()
            if not ln.startswith("#")]
    return covtext, body


class _Li:
    minNormalISize = 120
    maxNormalISize = 280


def _gc_curve(meanisize, seed=3, base=0.05):
    """Expected-coverage-per-position curve scaled to the counting
    mode: fragment midpoints ~pairs/chrlen (=0.05/bp for the default
    corpus), base-level ~2*pairs*rl/chrlen (=10/bp) — so windows are
    callable and the logR/CN emission paths actually execute."""
    rng = random.Random(seed)
    return [round(base * (0.8 + 0.4 * rng.random()), 6)
            for _ in range(meanisize + 1)]


CASES = [
    # (tag, cfg_kw, adaptive/window, regcorr?, refidx?)
    ("fragfix", dict(basecov_flag="fragment", window_size=500,
                     window_offset=500, meanisize=51)),
    ("basefix", dict(basecov_flag="base", window_size=400,
                     window_offset=600, meanisize=51)),
    ("adaptive", dict(basecov_flag="fragment", meanisize=51)),
    ("haploid", dict(basecov_flag="fragment", window_size=500,
                     window_offset=500, meanisize=51)),
    ("regional", dict(basecov_flag="fragment", window_size=500,
                      window_offset=500, meanisize=51)),
    ("purity", dict(basecov_flag="fragment", window_size=500,
                    window_offset=500, meanisize=51, ploidy=3.0,
                    purity=0.6, ctrl_ploidy=2.0, expected_cn=2.0)),
]


@pytest.mark.parametrize("tag,cfg_kw", CASES)
def test_bamcount_matches_reference(oracle, tmp_path, tag, cfg_kw):
    bam, fa, contigs = _mk_dataset(tmp_path, tag,
                                   seed=11 + len(tag))
    meanisize = cfg_kw["meanisize"]
    gccov = _gc_curve(
        meanisize,
        base=10.0 if cfg_kw["basecov_flag"] == "base" else 0.05)
    gcbound = (8, meanisize - 8)
    regcorr = []
    reg_win = 50000
    cfg_kw = dict(cfg_kw)
    # resolve basecov/adaptive exactly like run_cnv does
    cfg_kw["basecov"] = cfg_kw["basecov_flag"] == "base"
    if "window_size" not in cfg_kw:
        cfg_kw["adaptive"] = True
        cfg_kw["target_exp_cov"] = 25.0
    if tag == "haploid":
        cfg_kw["ref_idx"] = {1}
    if tag == "regional":
        rng = random.Random(9)
        regcorr = [round(0.7 + 0.6 * rng.random(), 3)
                   for _ in range(101)]
        reg_win = 7000

    from delly_tpu.models.coral import CnvConfig
    probe_cfg = CnvConfig(genome=fa, bam_file=bam, sample_name="0",
                          **cfg_kw)
    line = _serialize(bam, contigs, probe_cfg, _Li, gccov, gcbound,
                      regcorr, reg_win)
    ref_out = oracle([line])[0]
    assert ref_out != "ERR"
    ref_cov, ref_vcf = ref_out.split("\x02")
    ref_cov = [] if ref_cov == "-" else ref_cov.split("\x01")
    ref_vcf = [] if ref_vcf == "-" else ref_vcf.split("\x01")

    my_cov, my_vcf = _run_mine(tmp_path, tag, bam, fa, cfg_kw, _Li,
                               gccov, gcbound, regcorr, reg_win)
    assert my_cov == ref_cov
    assert len(ref_cov) > 10
    assert my_vcf == ref_vcf


def test_bamcount_genofile_regenotyping(oracle, tmp_path):
    """hasGenoFile mode: discovery first, then re-genotype the emitted
    sites through both bamCounts (parseVcfCNV + genotype-only path)."""
    bam, fa, contigs = _mk_dataset(tmp_path, "geno", seed=29)
    meanisize = 51
    gccov = _gc_curve(meanisize)
    gcbound = (8, meanisize - 8)
    cfg_kw = dict(basecov_flag="fragment", basecov=False,
                  window_size=500, window_offset=500,
                  meanisize=meanisize)
    my_cov, my_vcf = _run_mine(tmp_path, "geno_disc", bam, fa, cfg_kw,
                               _Li, gccov, gcbound, [], 50000)
    if not my_vcf:
        pytest.skip("no CNVs discovered to re-genotype")
    # write a VCF file for re-genotyping input (text mode)
    vcf_path = str(tmp_path / "sites.vcf")
    header = ("##fileformat=VCFv4.2\n"
              + "".join(f"##contig=<ID={n},length={len(s)}>\n"
                        for n, s in contigs)
              + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                "\t0\n")
    with open(vcf_path, "w") as fh:
        fh.write(header + "\n".join(my_vcf) + "\n")

    from delly_tpu.models.coral import CnvConfig
    cfg_kw2 = dict(cfg_kw, genofile=vcf_path)
    probe_cfg = CnvConfig(genome=fa, bam_file=bam, sample_name="0",
                          **cfg_kw2)
    line = _serialize(bam, contigs, probe_cfg, _Li, gccov, gcbound,
                      [], 50000, genofile=vcf_path)
    ref_out = oracle([line])[0]
    assert ref_out != "ERR"
    ref_cov, ref_vcf = ref_out.split("\x02")
    ref_vcf = [] if ref_vcf == "-" else ref_vcf.split("\x01")
    my_cov2, my_vcf2 = _run_mine(tmp_path, "geno_re", bam, fa, cfg_kw2,
                                 _Li, gccov, gcbound, [], 50000)
    assert my_vcf2 == ref_vcf
    assert len(ref_vcf) >= 1
