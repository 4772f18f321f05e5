"""Differential oracle for the multi-sample merge EMISSION engine.

tests/merge_emit_probe.cpp compiles the reference's merge.h AS-IS
(minus its program_options CLI function, sliced off at fixture time)
and runs the real mergeRun + mergeBCFs pipeline over the functional
text-mode VCF layer; this module generates randomized per-sample
delly-like call sets over a shared synthetic genome — jittered shared
events per SV family (DEL with explicit deleted-sequence alleles,
symbolic + sequence INS, MEI-subtype INS, INS:TR/DEL:TR for the
_regroupLoci relabeling, DUP/INV with junction consensus, BND with
CHR2/POS2), runs OUR production run_merge on the same files, and
byte-compares the merged site lists: _collectSVtype gating, _svMatch
clustering with rotations/sequence identity, allele grouping +
_retainAllele, _emitSelected AC/AN/AF/SUPP/ALLELEID/NALLELE emission,
the site-list re-merge path, and the CNV interval mode.
"""

import os
import random
import shutil
import subprocess

import pytest

from delly_tpu.models.merge import MergeConfig, run_merge

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__),
                         "merge_emit_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")

CT_OF = {"DEL": "3to5", "DUP": "5to3", "INV0": "3to3", "INV1": "5to5",
         "INS": "NtoN"}


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "merge.h"))):
        pytest.skip("g++ or reference merge.h unavailable")
    gen = tmp_path_factory.mktemp("merge_emit_oracle")
    lines = open(os.path.join(REF_SRC, "merge.h")).read().splitlines(
        keepends=True)
    cut = next(i for i, ln in enumerate(lines)
               if "int merge(int argc, char **argv)" in ln)
    (gen / "merge_sliced.h").write_text(
        "".join(lines[:cut]) + "\n}\n\n#endif\n")
    ul = open(os.path.join(REF_SRC, "util.h")).read().splitlines(
        keepends=True)
    d0 = next(i for i, ln in enumerate(ul)
              if "_decodeOrientation(std::string const& value, "
                 "std::string const& svt)" in ln) - 1
    d1 = next(i for i in range(d0, len(ul)) if ul[i].rstrip() == "  }")
    e0 = next(i for i, ln in enumerate(ul)
              if "entropy(std::string const& st)" in ln) - 1
    e1 = next(i for i in range(e0, len(ul)) if ul[i].rstrip() == "  }")
    (gen / "util_merge_slice.h").write_text(
        "namespace torali {\n" + "".join(ul[d0:d1 + 1]) + "\n"
        + "".join(ul[e0:e1 + 1]) + "\n}\n")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", str(gen), "-I", SHIM_DIR,
         "-I", REF_SRC, PROBE_SRC,
         os.path.join(REF_SRC, "edlib.cpp")])

    def run(files, cfg, workdir):
        out = str(workdir / "ref_merged.vcf")
        tmp = workdir / "ref_tmp"
        tmp.mkdir(exist_ok=True)
        env = dict(os.environ)
        env["DELLY_MERGE_CHUNKSIZE"] = str(cfg.chunksize)
        args = [exe, out, str(tmp),
                str(int(cfg.cnv_mode)), str(int(cfg.filter_for_pass)),
                str(int(cfg.filter_for_precise)), str(cfg.qualthres),
                str(cfg.recurrent_samples), repr(cfg.vaf),
                str(cfg.coverage), str(cfg.minsize), str(cfg.maxsize),
                str(cfg.bpoffset), repr(cfg.recoverlap),
                repr(cfg.rep_min_af), cfg.genome or "-"] + files
        subprocess.run(args, capture_output=True, text=True,
                       check=True, env=env)
        return [l for l in open(out).read().splitlines()
                if not l.startswith("#")]

    return run


HDR = [
    "##fileformat=VCFv4.2",
    "##contig=<ID=chrA,length=2000000>",
    "##contig=<ID=chrB,length=2000000>",
    '##FILTER=<ID=LowQual,Description="Low quality">',
    '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
    '##INFO=<ID=POS2,Number=1,Type=Integer,Description="P">',
    '##INFO=<ID=CHR2,Number=1,Type=String,Description="C">',
    '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
    '##INFO=<ID=CT,Number=1,Type=String,Description="C">',
    '##INFO=<ID=PE,Number=1,Type=Integer,Description="P">',
    '##INFO=<ID=MAPQ,Number=1,Type=Integer,Description="M">',
    '##INFO=<ID=SR,Number=1,Type=Integer,Description="S">',
    '##INFO=<ID=SRMAPQ,Number=1,Type=Integer,Description="Q">',
    '##INFO=<ID=SRQ,Number=1,Type=Float,Description="Q">',
    '##INFO=<ID=CE,Number=1,Type=Float,Description="Q">',
    '##INFO=<ID=CONSENSUS,Number=1,Type=String,Description="C">',
    '##INFO=<ID=CONSBP,Number=1,Type=Integer,Description="C">',
    '##INFO=<ID=INSLEN,Number=1,Type=Integer,Description="I">',
    '##INFO=<ID=HOMLEN,Number=1,Type=Integer,Description="H">',
    '##INFO=<ID=SUBTYPE,Number=1,Type=String,Description="S">',
    '##INFO=<ID=INSSTRAND,Number=1,Type=String,Description="S">',
    '##INFO=<ID=TRPERIOD,Number=1,Type=Integer,Description="T">',
    '##INFO=<ID=TRCOPIES,Number=1,Type=Float,Description="T">',
    '##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="P">',
    '##INFO=<ID=IMPRECISE,Number=0,Type=Flag,Description="I">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
    '##FORMAT=<ID=RR,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=RV,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=DR,Number=1,Type=Integer,Description="G">',
    '##FORMAT=<ID=DV,Number=1,Type=Integer,Description="G">',
]


def _seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _gen_events(rng, genome, n_events):
    """Shared truth events over the synthetic genome."""
    events = []
    pos = 5000
    for k in range(n_events):
        fam = rng.choice(["DEL", "DEL", "DEL", "DUP", "INV", "INS",
                          "INS", "BND", "TR"])
        size = rng.randint(60, 9000)
        ev = {"fam": fam, "chrom": "chrA" if rng.random() < 0.7
              else "chrB", "pos": pos, "size": size,
              "qual": rng.choice([80, 150, 250, 600, 1100]),
              "cons": _seq(rng, rng.randint(80, 240))}
        if fam == "INS":
            ev["ins"] = _seq(rng, rng.randint(50, 400))
            ev["mei"] = rng.random() < 0.3
        if fam == "TR":
            period = rng.choice([2, 3, 4, 6])
            unit = _seq(rng, period)
            copies = rng.randint(15, 60)
            ev["ins"] = unit * copies
            ev["period"] = period
            ev["trdel"] = rng.random() < 0.4
        if fam == "BND":
            ev["chrom"], ev["chrom2"] = "chrA", "chrB"
            ev["pos2"] = rng.randint(5000, 1900000)
            ev["ct"] = rng.randint(0, 3)
        events.append(ev)
        pos += size + rng.randint(1500, 12000)
    return events


def _render_record(rng, genome, ev, k):
    """One delly-like record for this sample (jittered)."""
    jit = rng.randint(-15, 15)
    pos = max(100, ev["pos"] + jit)
    fam = ev["fam"]
    precise = rng.random() < 0.8
    info = ["PRECISE" if precise else "IMPRECISE"]
    qual = ev["qual"] + rng.randint(-20, 20)
    ref, alt = "N", None
    chrom = ev["chrom"]
    end = pos + ev["size"]
    if fam == "DEL":
        info += [f"SVTYPE=DEL;CT=3to5;END={end}"]
        if ev["size"] <= 500 and precise:
            # explicit alleles: deleted reference bases
            ref = genome[pos - 1:end]
            alt = ref[0]
        else:
            alt = "<DEL>"
    elif fam == "DUP":
        info += [f"SVTYPE=DUP;CT=5to3;END={end}"]
        alt = "<DUP>"
        info += [f"CONSENSUS={ev['cons']}", "CONSBP=60"]
    elif fam == "INV":
        ct = rng.choice(["3to3", "5to5"])
        info += [f"SVTYPE=INV;CT={ct};END={end}"]
        alt = "<INV>"
        info += [f"CONSENSUS={ev['cons']}", "CONSBP=60"]
    elif fam in ("INS", "TR"):
        ins = ev["ins"]
        if fam == "TR" and ev["trdel"]:
            info += [f"SVTYPE=DEL;CT=3to5;END={pos + len(ins)}",
                     "SUBTYPE=DEL:TR", f"TRPERIOD={ev['period']}",
                     f"TRCOPIES={len(ins) / ev['period']:.1f}"]
            alt = "<DEL>"
        else:
            info += [f"SVTYPE=INS;CT=NtoN;END={pos + 1}",
                     f"INSLEN={len(ins)}"]
            if fam == "TR":
                info += ["SUBTYPE=INS:TR", f"TRPERIOD={ev['period']}",
                         f"TRCOPIES={len(ins) / ev['period']:.1f}"]
            elif ev.get("mei"):
                info += ["SUBTYPE=INS:ME:ALU",
                         "INSSTRAND=" + rng.choice(["+", "-"])]
            if rng.random() < 0.5 and precise:
                ref = genome[pos - 1]
                alt = ref + ins
            else:
                alt = "<INS>"
                info += [f"CONSENSUS={'ACGT' * 10}{ins}{'TGCA' * 10}",
                         "CONSBP=40"]
    else:  # BND
        end = pos + 1
        info += [f"SVTYPE=BND;CT={('3to3', '5to5', '3to5', '5to3')[ev['ct']]};"
                 f"END={pos + 1};CHR2={ev['chrom2']};POS2={ev['pos2']}"]
        alt = "<BND>"
        info += [f"CONSENSUS={ev['cons']}", "CONSBP=60"]
    pe = rng.randint(0, 12)
    sr = rng.randint(2, 20)
    info += [f"PE={pe}", f"MAPQ={rng.randint(20, 60)}", f"SR={sr}",
             f"SRMAPQ={rng.randint(20, 60)}",
             f"SRQ={rng.choice(['0.95', '1', '0.87'])}", "CE=1.9",
             f"HOMLEN={rng.randint(0, 8)}"]
    gt = rng.choice(["0/1", "0/1", "1/1"])
    rr, rv = rng.randint(0, 20), rng.randint(4, 25)
    dr, dv = rng.randint(0, 20), rng.randint(0, 20)
    filt = "PASS" if rng.random() < 0.85 else "LowQual"
    return (chrom, pos,
            f"{chrom}\t{pos}\tSV{k:07d}\t{ref}\t{alt}\t{qual}\t{filt}\t"
            + ";".join(info)
            + f"\tGT:RR:RV:DR:DV\t{gt}:{rr}:{rv}:{dr}:{dv}")


def _write_sample_vcfs(rng, tmp_path, nsamples, n_events, tag):
    genome = _seq(rng, 40000) * 50  # 2 Mb, cheap
    events = _gen_events(rng, genome, n_events)
    files = []
    for s in range(nsamples):
        recs = []
        k = 0
        for ev in events:
            if rng.random() < 0.65:
                recs.append(_render_record(rng, genome, ev, k))
                k += 1
        # a couple of private events
        for _ in range(rng.randint(0, 2)):
            ev = _gen_events(rng, genome, 1)[0]
            ev["pos"] = rng.randint(5000, 1500000)
            recs.append(_render_record(rng, genome, ev, k))
            k += 1
        recs.sort(key=lambda r: (r[0], r[1]))
        hdr = HDR + [("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                      f"\tFORMAT\tS{s}")]
        p = str(tmp_path / f"{tag}_s{s}.vcf")
        with open(p, "w") as fh:
            fh.write("\n".join(hdr + [r[2] for r in recs]) + "\n")
        files.append(p)
    return files


def _run_mine(files, cfg, workdir):
    out = str(workdir / "my_merged.vcf")
    cfg.outfile = out
    cfg.files = list(files)
    assert run_merge(cfg) == 0
    return [l for l in open(out).read().splitlines()
            if not l.startswith("#")]


def _assert_same(tag, mine, ref):
    assert len(mine) == len(ref), (tag, len(mine), len(ref),
                                   mine[:1], ref[:1])
    for k, (m, r) in enumerate(zip(mine, ref)):
        assert m == r, (tag, k, m, r)


def test_sv_cohort_merge_matches_reference(oracle, tmp_path):
    rng = random.Random(60648)
    total = 0
    for case in range(4):
        nsamples = rng.choice([2, 4, 7])
        files = _write_sample_vcfs(rng, tmp_path, nsamples,
                                   rng.randint(8, 22), f"c{case}")
        kw = dict(filter_for_pass=bool(case % 2),
                  filter_for_precise=bool(case == 2),
                  qualthres=rng.choice([0, 200]),
                  vaf=rng.choice([0.15, 0.0]),
                  coverage=rng.choice([5, 0]),
                  minsize=rng.choice([0, 100]))
        wd = tmp_path / f"w{case}"
        wd.mkdir()
        mine = _run_mine(files, MergeConfig(**kw), wd)
        ref = oracle(files, MergeConfig(**kw), wd)
        _assert_same(f"svmerge{case}", mine, ref)
        total += len(ref)
    assert total >= 25, total


def test_site_list_remerge_matches_reference(oracle, tmp_path):
    """Re-merging merged site lists (0-sample inputs exercise the
    siteList branch of _collectSVtype, merge.h:463-466)."""
    rng = random.Random(1907)
    files = _write_sample_vcfs(rng, tmp_path, 3, 12, "sl")
    wd1 = tmp_path / "stage1"
    wd1.mkdir()
    cfg = MergeConfig()
    mine1 = _run_mine(files, cfg, wd1)
    ref1 = oracle(files, MergeConfig(), wd1)
    _assert_same("stage1", mine1, ref1)
    # stage 2: merge each side's own stage-1 output with itself
    wd2 = tmp_path / "stage2"
    wd2.mkdir()
    cfg2 = MergeConfig(vaf=0.0, coverage=0)
    mine2 = _run_mine([str(wd1 / "my_merged.vcf")] * 2, cfg2, wd2)
    ref2 = oracle([str(wd1 / "ref_merged.vcf")] * 2,
                  MergeConfig(vaf=0.0, coverage=0), wd2)
    _assert_same("stage2", mine2, ref2)
    assert len(ref2) >= 5


def test_cnv_interval_merge_matches_reference(oracle, tmp_path):
    rng = random.Random(424243)
    hdr_cnv = [
        "##fileformat=VCFv4.2",
        "##contig=<ID=chrA,length=5000000>",
        '##FILTER=<ID=LowQual,Description="L">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="E">',
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="T">',
        '##INFO=<ID=CIPOS,Number=2,Type=Integer,Description="C">',
        '##INFO=<ID=CIEND,Number=2,Type=Integer,Description="C">',
        '##INFO=<ID=SRL,Number=1,Type=Integer,Description="S">',
        '##INFO=<ID=SRR,Number=1,Type=Integer,Description="S">',
        '##INFO=<ID=UNIQ,Number=1,Type=Float,Description="U">',
        '##INFO=<ID=MP,Number=1,Type=Float,Description="M">',
        '##INFO=<ID=PRECISE,Number=0,Type=Flag,Description="P">',
        '##INFO=<ID=IMPRECISE,Number=0,Type=Flag,Description="I">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">',
        '##FORMAT=<ID=CN,Number=1,Type=Integer,Description="C">',
    ]
    for case in range(2):
        files = []
        base = [(rng.randint(10000, 4000000), rng.randint(3000, 150000),
                 rng.choice([0, 1, 3, 4, 6]))
                for _ in range(rng.randint(5, 12))]
        for s in range(3):
            recs = []
            for k, (p, size, cn) in enumerate(base):
                if rng.random() < 0.3:
                    continue
                pos = p + rng.randint(-500, 500)
                end = pos + size + rng.randint(-500, 500)
                qual = rng.choice([30, 120, 400])
                precise = rng.random() < 0.5
                info = ("PRECISE" if precise else "IMPRECISE")
                # real delly CNV output always carries CIPOS/CIEND/MP
                # (cnv.h cnvVCF); the reference re-emits them from the
                # input unconditionally (merge.h:1366-1370,1401-1403)
                ci = rng.randint(10, 400)
                info += (f";SVTYPE=CNV;END={end};CIPOS=-{ci},{ci}"
                         f";CIEND=-{ci},{ci}"
                         f";MP={rng.choice(['0.7', '0.9', '1'])}"
                         f";SRL={rng.randint(0, 5)}"
                         f";SRR={rng.randint(0, 5)}"
                         f";UNIQ={rng.choice(['0.5', '0.8', '0.95'])}")
                recs.append((pos,
                             f"chrA\t{pos}\tCNV{k:05d}\tN\t<CNV>\t{qual}"
                             f"\tPASS\t{info}\tGT:CN\t./.:{cn}"))
            recs.sort()
            p = str(tmp_path / f"cnv{case}_s{s}.vcf")
            with open(p, "w") as fh:
                fh.write("\n".join(
                    hdr_cnv
                    + [f"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                       f"\tFORMAT\tS{s}"] + [r[1] for r in recs]) + "\n")
            files.append(p)
        kw = dict(cnv_mode=True, minsize=rng.choice([0, 5000]),
                  maxsize=1000000)
        wd = tmp_path / f"cw{case}"
        wd.mkdir()
        mine = _run_mine(files, MergeConfig(**kw), wd)
        ref = oracle(files, MergeConfig(**kw), wd)
        _assert_same(f"cnvmerge{case}", mine, ref)


def test_chunked_merge_matches_reference(oracle, tmp_path):
    """>chunksize cohorts go through per-chunk mergeRun + a site-list
    re-merge with VAF/coverage gating off (merge.h:2040-2087): 120
    single-sample files at chunksize 100."""
    rng = random.Random(31415)
    genome = _seq(rng, 40000) * 50
    events = _gen_events(rng, genome, 10)
    files = []
    for s in range(120):
        recs = []
        k = 0
        for ev in events:
            if rng.random() < 0.5:
                recs.append(_render_record(rng, genome, ev, k))
                k += 1
        recs.sort(key=lambda r: (r[0], r[1]))
        hdr = HDR + [("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
                      f"\tINFO\tFORMAT\tS{s}")]
        p = str(tmp_path / f"chunk_s{s}.vcf")
        with open(p, "w") as fh:
            fh.write("\n".join(hdr + [r[2] for r in recs]) + "\n")
        files.append(p)
    wd = tmp_path / "wchunk"
    wd.mkdir()
    cfg = MergeConfig(chunksize=100)
    mine = _run_mine(files, cfg, wd)
    ref = oracle(files, MergeConfig(chunksize=100), wd)
    _assert_same("chunked", mine, ref)
    assert len(ref) >= 5
