"""Multi-sample germline/somatic workflow parity (README.md:75-99 of the
reference: per-sample discovery -> merge -> joint re-genotyping ->
filter)."""

import os
import subprocess
import sys

import pytest

from delly_tpu.io.bcf import bcf_to_vcf_text

EXAMPLE = "/root/reference/example"


def _run(args, timeout=600):
    r = subprocess.run([sys.executable, "-m", "delly_tpu.cli"] + args,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, r.stderr[-1500:]


def _records(path):
    text = bcf_to_vcf_text(open(path, "rb").read())
    return [l for l in text.split("\n") if l and not l.startswith("#")]


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    d = tmp_path_factory.mktemp("wf")
    import shutil
    s2bam = str(d / "s2.bam")
    shutil.copy(f"{EXAMPLE}/sr.bam", s2bam)
    s1, s2 = str(d / "s1.bcf"), str(d / "s2.bcf")
    sites = str(d / "sites.bcf")
    geno = str(d / "geno.bcf")
    _run(["sr", "-g", f"{EXAMPLE}/ref.fa", "-o", s1, f"{EXAMPLE}/sr.bam"])
    _run(["sr", "-g", f"{EXAMPLE}/ref.fa", "-o", s2, s2bam])
    _run(["merge", "-o", sites, s1, s2])
    _run(["sr", "-g", f"{EXAMPLE}/ref.fa", "-v", sites, "-o", geno,
          f"{EXAMPLE}/sr.bam", s2bam])
    return d, geno


def test_merge_and_joint_genotyping(chain):
    d, geno = chain
    recs = _records(str(d / "sites.bcf"))
    assert len(recs) == 1 and "SVTYPE=DEL" in recs[0]
    grecs = _records(geno)
    assert len(grecs) == 1
    f = grecs[0].split("\t")
    assert len(f) == 11  # two sample columns
    assert f[9].startswith("0/1") and f[10].startswith("0/1")


def test_germline_filter_reference_semantics(chain):
    """With every sample carrying the DEL there is no 0/0 control, so
    rdRatio defaults to 1 > rddel and the site fails (filter.h:891-897)
    — the reference drops it too."""
    d, geno = chain
    out = str(d / "germ.bcf")
    _run(["filter", "-f", "germline", "-o", out, geno])
    assert _records(out) == []


def test_somatic_filter_control_carrier(chain):
    """A control sample carrying the variant must block a somatic call."""
    d, geno = chain
    tsv = d / "samples.tsv"
    tsv.write_text("sr\ttumor\nsr\tcontrol\n")
    out = str(d / "som.bcf")
    _run(["filter", "-f", "somatic", "-s", str(tsv), "-o", out, geno])
    assert _records(out) == []


def test_lr_alt_alignment_filter(tmp_path):
    """-l keeps split reads recurring in the alternate alignment
    (junction.h:504-588); using the same BAM filters nothing and the
    DEL survives."""
    cfgf = tmp_path / "alt.tsv"
    cfgf.write_text(f"{EXAMPLE}/lr.bam\t{EXAMPLE}/ref.fa\n")
    out = str(tmp_path / "lr_alt.bcf")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "lr",
         "-l", str(cfgf), "-g", f"{EXAMPLE}/ref.fa", "-o", out,
         f"{EXAMPLE}/lr.bam"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "Filtered 0 out of" in r.stderr
    recs = _records(out)
    assert len(recs) == 1 and "SVTYPE=DEL" in recs[0]


def test_merge_chunked_and_filelist(tmp_path, chain):
    """Chunked merging beyond the chunk size (merge.h:2034-2096) and the
    single-file list-of-BCFs input mode (merge.h:1878-1886)."""
    import shutil
    d, _ = chain
    src = str(d / "s1.bcf")
    files = []
    for i in range(130):
        f = str(tmp_path / f"c{i}.bcf")
        shutil.copy(src, f)
        files.append(f)
    out = str(tmp_path / "chunked.bcf")
    _run(["merge", "-u", "100", "-o", out] + files)
    recs = _records(out)
    assert len(recs) == 1 and "SVTYPE=DEL" in recs[0]
    lst = tmp_path / "files.txt"
    lst.write_text("\n".join(files[:40]) + "\n")
    out2 = str(tmp_path / "fromlist.bcf")
    _run(["merge", "-o", out2, str(lst)])
    assert len(_records(out2)) == 1


def test_translocation_end_to_end(tmp_path):
    """Synthetic two-contig reciprocal translocation: discordant pairs +
    split reads -> one PRECISE BND with correct partner coordinates;
    delly2bnd then emits the paired breakend records."""
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import make_translocation_dataset
    bam, fa = make_translocation_dataset(str(tmp_path))
    out = str(tmp_path / "tra.vcf")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "sr", "-g", fa,
         "-o", out, bam],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    recs = [l for l in open(out) if not l.startswith("#")]
    assert len(recs) == 1
    f = recs[0].split("\t")
    info = f[7]
    assert "SVTYPE=BND" in info and "PRECISE" in info
    assert {f[0], info.split("CHR2=")[1].split(";")[0]} == {"ctgA", "ctgB"}
    assert "]" in f[4] or "[" in f[4]
    assert int(info.split(";PE=")[1].split(";")[0]) >= 30
    gt = f[9].split(":")[0]
    assert gt in ("0/1", "1/1")
    # paired breakends via the helper script
    bndout = str(tmp_path / "bnd.vcf")
    r2 = subprocess.run(
        [sys.executable, "scripts/delly2bnd.py", "-v", out, "-r", fa,
         "-o", bndout], capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-800:]
    bnd = [l for l in open(bndout) if not l.startswith("#")]
    assert len(bnd) == 2
    ids = [l.split("\t")[2] for l in bnd]
    mates = [l.split("MATEID=")[1].split(";")[0].split("\t")[0]
             for l in bnd]
    assert ids == mates[::-1]


def test_dup_and_inv_pe_only_end_to_end(tmp_path):
    """PE-only tandem-DUP (RF pairs) and 3to3 INV (FF pairs) signatures
    -> IMPRECISE calls near the true breakpoints."""
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import make_dup_inv_dataset
    bam, fa = make_dup_inv_dataset(str(tmp_path))
    out = str(tmp_path / "dupinv.vcf")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "sr", "-g", fa,
         "-o", out, bam],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    by_type = {}
    for f in recs:
        svt = f[7].split("SVTYPE=")[1].split(";")[0]
        by_type[svt] = f
    assert set(by_type) == {"DUP", "INV"}
    dup = by_type["DUP"]
    assert abs(int(dup[1]) - 5000) < 200
    assert abs(int(dup[7].split("END=")[1].split(";")[0]) - 8000) < 200
    assert "IMPRECISE" in dup[7] and "CT=5to3" in dup[7]
    inv = by_type["INV"]
    assert abs(int(inv[1]) - 12000) < 300
    assert "CT=3to3" in inv[7]
    for f in (dup, inv):
        assert f[9].split(":")[0] in ("0/1", "1/1")


def test_insertion_end_to_end(tmp_path):
    """Split reads spanning a 40bp novel insertion -> PRECISE INS with
    the exact inserted sequence in the ALT allele."""
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import make_insertion_dataset
    bam, fa, ins = make_insertion_dataset(str(tmp_path))
    out = str(tmp_path / "ins.vcf")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "sr", "-g", fa,
         "-o", out, bam],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert len(recs) == 1
    f = recs[0]
    assert "SVTYPE=INS" in f[7] and "PRECISE" in f[7]
    assert int(f[1]) == 10000
    assert f[4][1:] == ins  # exact inserted sequence reconstructed
    assert "SVLEN=40" in f[7]


def test_lr_insertion_end_to_end(tmp_path):
    """Long-read INS via I CIGAR ops -> PRECISE INS through the msaWfa
    consensus + splitAlign glue path."""
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import make_lr_insertion_dataset
    bam, fa, ins = make_lr_insertion_dataset(str(tmp_path))
    out = str(tmp_path / "lri.vcf")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "lr", "-g", fa,
         "-o", out, bam],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert len(recs) == 1
    f = recs[0]
    assert "SVTYPE=INS" in f[7] and "PRECISE" in f[7]
    assert int(f[1]) == 20000
    assert "SVLEN=500" in f[7]


def test_sr_multi_sample_direct_call(tmp_path):
    """Two alignment files in one sr run: per-sample columns, both
    genotyped at every implanted DEL (delly.h multi-sample mode)."""
    import shutil

    from bamsynth import make_multi_contig_del_dataset

    bam, fa, truth = make_multi_contig_del_dataset(
        str(tmp_path), n_contigs=2, contig_len=80_000, name="ms1")
    b2 = str(tmp_path / "ms2.bam")
    shutil.copy(bam, b2)
    shutil.copy(bam + ".bai", b2 + ".bai")
    out = str(tmp_path / "ms.vcf")
    r = subprocess.run([sys.executable, "-m", "delly_tpu.cli", "sr",
                        "-g", fa, "-o", out, bam, b2],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1200:]
    hdr = [ln for ln in open(out) if ln.startswith("#CHROM")][0]
    assert len(hdr.strip().split("\t")) == 11  # 2 sample columns
    body = [ln.split("\t") for ln in open(out)
            if ln.strip() and not ln.startswith("#")]
    assert len(body) == len(truth)
    for rec in body:
        gts = [c.split(":")[0] for c in rec[9:]]
        assert gts == ["0/1", "0/1"], (rec[0], rec[1], gts)


def test_somatic_workflow_tumor_normal_genome(tmp_path):
    """The flagship somatic workflow (reference README: joint
    tumor+control call, then `filter -f somatic -s samples.tsv`):
    somatic DELs survive, germline DELs are removed."""
    from bamsynth import make_somatic_pair_dataset

    tumor, control, fa, germ, soma = make_somatic_pair_dataset(
        str(tmp_path))
    joint = str(tmp_path / "joint.bcf")
    r = subprocess.run([sys.executable, "-m", "delly_tpu.cli", "sr",
                        "-g", fa, "-o", joint, tumor, control],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1200:]
    body = [ln.split("\t") for ln in
            bcf_to_vcf_text(open(joint, "rb").read()).splitlines()
            if ln and not ln.startswith("#")]
    # joint discovery sees germline + somatic DELs
    assert len(body) == len(germ) + len(soma), [b[:2] for b in body]

    tsv = tmp_path / "samples.tsv"
    tsv.write_text("tumor\ttumor\ncontrol\tcontrol\n")
    som = str(tmp_path / "somatic.bcf")
    r = subprocess.run([sys.executable, "-m", "delly_tpu.cli", "filter",
                        "-f", "somatic", "-s", str(tsv), "-o", som,
                        joint],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1200:]
    kept = [ln.split("\t") for ln in
            bcf_to_vcf_text(open(som, "rb").read()).splitlines()
            if ln and not ln.startswith("#")]
    kept_loci = {(rec[0], int(rec[1])) for rec in kept}
    for cname, bp1, _bp2 in soma:
        assert any(c == cname and abs(p - bp1) < 60
                   for c, p in kept_loci), (cname, bp1, kept_loci)
    for cname, bp1, _bp2 in germ:
        assert not any(c == cname and abs(p - bp1) < 60
                       for c, p in kept_loci), (cname, bp1, kept_loci)


def test_cnv_cohort_workflow_merge_and_regenotype(tmp_path):
    """Reference CNV cohort workflow: per-sample cnv discovery ->
    `merge -e` (interval-based CNV merging) -> `cnv -v` re-genotyping
    against the merged site list."""
    import shutil

    from bamsynth import make_multi_contig_del_dataset

    bam1, fa, _truth = make_multi_contig_del_dataset(
        str(tmp_path), n_contigs=2, contig_len=120_000,
        pairs_per_contig=2500, name="cc1")
    bam2 = str(tmp_path / "cc2.bam")
    shutil.copy(bam1, bam2)
    shutil.copy(bam1 + ".bai", bam2 + ".bai")

    bcfs = []
    for i, bam in enumerate((bam1, bam2)):
        out = str(tmp_path / f"cnv{i}.bcf")
        r = subprocess.run([sys.executable, "-m", "delly_tpu.cli",
                            "cnv", "-g", fa, "-o", out, bam],
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-1000:]
        bcfs.append(out)

    sites = str(tmp_path / "cnv_sites.bcf")
    # -y 0: these shallow synthetic CNVs carry low GQ-based QUAL; the
    # reference applies the same rec->qual < qualthres gate (merge.h:412)
    r = subprocess.run([sys.executable, "-m", "delly_tpu.cli", "merge",
                        "-e", "-y", "0", "-o", sites] + bcfs,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1000:]
    merged = [ln.split("\t") for ln in
              bcf_to_vcf_text(open(sites, "rb").read()).splitlines()
              if ln and not ln.startswith("#")]
    assert merged, "merge -e produced no CNV sites"

    geno = str(tmp_path / "cnv_geno.bcf")
    r = subprocess.run([sys.executable, "-m", "delly_tpu.cli", "cnv",
                        "-g", fa, "-v", sites, "-o", geno, bam1],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1000:]
    got = [ln.split("\t") for ln in
           bcf_to_vcf_text(open(geno, "rb").read()).splitlines()
           if ln and not ln.startswith("#")]
    assert len(got) == len(merged)
    for rec in got:
        fmt = dict(zip(rec[8].split(":"), rec[9].split(":")))
        assert fmt.get("RDCN") not in (None, ""), rec[:3]


def test_mergegeno_script_sample_column_merge(tmp_path):
    """scripts/mergegeno.py (role of `bcftools merge -m id`,
    README.md:95): per-sample re-genotyped BCFs paste into one
    multi-sample file consumable by `filter`."""
    import shutil

    s2bam = str(tmp_path / "s2.bam")
    shutil.copy(f"{EXAMPLE}/sr.bam", s2bam)
    _run(["sr", "-g", f"{EXAMPLE}/ref.fa",
          "-o", str(tmp_path / "s1.bcf"), f"{EXAMPLE}/sr.bam"])
    _run(["sr", "-g", f"{EXAMPLE}/ref.fa",
          "-o", str(tmp_path / "s2.bcf"), s2bam])
    _run(["merge", "-o", str(tmp_path / "sites.bcf"),
          str(tmp_path / "s1.bcf"), str(tmp_path / "s2.bcf")])
    for i, bam in enumerate((f"{EXAMPLE}/sr.bam", s2bam)):
        _run(["sr", "-g", f"{EXAMPLE}/ref.fa",
              "-v", str(tmp_path / "sites.bcf"),
              "-o", str(tmp_path / f"g{i}.bcf"), bam])
    multi = str(tmp_path / "multi.bcf")
    r = subprocess.run([sys.executable, "scripts/mergegeno.py",
                        "-o", multi,
                        str(tmp_path / "g0.bcf"),
                        str(tmp_path / "g1.bcf")],
                       capture_output=True, text=True, timeout=300,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-800:]
    recs = _records(multi)
    assert len(recs) == 1
    f = recs[0].split("\t")
    assert len(f) == 11
    assert f[9].split(":")[0] == f[10].split(":")[0] == "0/1"
    # and the merged file feeds filter
    _run(["filter", "-f", "germline", "-o",
          str(tmp_path / "germ.bcf"), multi])


def test_mixed_sv_types_single_file(tmp_path):
    """All five SV families implanted in ONE input: each must come out
    with the right type, position and precision (the genome-scale
    variant of this runs as `bench_e2e.py --engine svmix`)."""
    from bamsynth import make_multi_sv_dataset
    from delly_tpu.models.config import SrConfig
    from delly_tpu.models.sr import run_sr

    bam, fa, truth = make_multi_sv_dataset(
        str(tmp_path), n_contigs=2, contig_len=100_000,
        pairs_per_contig=1500)
    out = str(tmp_path / "out.vcf")
    assert run_sr(SrConfig(genome=fa, files=[bam], outfile=out)) == 0
    calls = []
    for ln in open(out):
        if ln.startswith("#"):
            continue
        c = ln.split("\t")
        svt = [f for f in c[7].split(";")
               if f.startswith("SVTYPE=")][0][7:]
        calls.append((svt, c[0], int(c[1]),
                      "PRECISE" in c[7].split(";")))
    win = {"DEL": 100, "DUP": 150, "INS": 100, "INV": 400, "BND": 150}
    for t in truth:
        if t[0] == "BND":
            assert any(s == "BND" and ((cc == t[1] and
                       abs(cp - int(t[2])) < 150) or (cc == t[3] and
                       abs(cp - int(t[4])) < 150))
                       for s, cc, cp, _ in calls), t
        else:
            assert any(s == t[0] and cc == t[1]
                       and abs(cp - int(t[2])) < win[t[0]]
                       for s, cc, cp, _ in calls), t
    # SR-backed types refine to PRECISE; PE-only inversions stay not
    for s, _c, _p, precise in calls:
        if s in ("DEL", "DUP", "INS", "BND"):
            assert precise, s
        if s == "INV":
            assert not precise
    assert len(calls) == len(truth)


def test_sr_exclude_regions_mask_scan(tmp_path):
    """-x exclude: reads inside excluded intervals are never scanned
    (reference iterates sam_itr_queryi over VALID intervals,
    shortpe.h:349-350), so an SV inside an excluded region must not be
    called while one outside still is."""
    from bamsynth import make_multi_sv_dataset
    bam, fa, truth = make_multi_sv_dataset(
        str(tmp_path), n_contigs=1, contig_len=100_000,
        pairs_per_contig=1500)
    # exclude the DEL locus (15% of 100kb = 15000..23000) generously
    excl = tmp_path / "excl.bed"
    excl.write_text("chr1\t10000\t30000\n")
    out = str(tmp_path / "out.vcf")
    _run(["sr", "-g", fa, "-x", str(excl), "-o", out, bam])
    calls = [(l.split("\t")[7].split("SVTYPE=")[1].split(";")[0],
              int(l.split("\t")[1]))
             for l in open(out) if not l.startswith("#")]
    assert not any(t == "DEL" and abs(p - 15000) < 1000
                   for t, p in calls), calls
    # the DUP at 35000 lies outside the exclusion and survives
    assert any(t == "DUP" and abs(p - 35000) < 200 for t, p in calls), calls


def test_plot_scripts_smoke(tmp_path):
    """The plotting helpers (role of the reference's R/rd.R, R/cnv.R,
    R/gcbias.R) run end-to-end on real cnv outputs and emit images."""
    import subprocess
    import sys

    pytest.importorskip("matplotlib")
    cov = str(tmp_path / "cov.gz")
    out = str(tmp_path / "cnv.vcf")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "cnv",
         "-g", "/root/reference/example/ref.fa", "-c", cov, "-o", out,
         "/root/reference/example/sr.bam"],
        capture_output=True, text=True, timeout=590)
    assert r.returncode == 0, r.stderr[-1000:]
    prefix = str(tmp_path / "rd")
    r = subprocess.run(
        [sys.executable, "scripts/plot_rd.py", cov, "-o", prefix],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-1000:]
    assert os.path.getsize(prefix + ".wholegenome.png") > 1000


def test_sr_dump_supporting_reads(tmp_path):
    """-d writes the gzipped SV-supporting-read table
    (coverage.h:337-342: '#svid bam qname chr pos mapq type')."""
    import gzip
    import subprocess
    import sys

    out = str(tmp_path / "d.vcf")
    dump = str(tmp_path / "support.tsv.gz")
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "sr",
         "-g", "/root/reference/example/ref.fa", "-o", out,
         "-d", dump, "/root/reference/example/sr.bam"],
        capture_output=True, text=True, timeout=590)
    assert r.returncode == 0, r.stderr[-1000:]
    with gzip.open(dump, "rt") as fh:
        lines = fh.read().splitlines()
    assert lines[0] == ("#svid\tbam\tqname\tchr\tpos\tmatechr\t"
                        "matepos\tmapq\ttype")  # coverage.h:341
    rows = [ln.split("\t") for ln in lines[1:]]
    assert rows, "no supporting reads dumped"
    assert all(row[0] == "DEL00000000" for row in rows)
    assert {row[8] for row in rows} <= {"SR", "PE"}
    # the junction reads recorded here must match the VCF's RV count
    fmt_keys = [ln for ln in open(out)
                if not ln.startswith("#")][0].split("\t")
    rv = int(fmt_keys[9].split(":")[fmt_keys[8].split(":").index("RV")])
    assert sum(1 for row in rows if row[8] == "SR") == rv
