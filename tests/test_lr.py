"""LR engine tests: assembly kernels, annotation, methylation, end-to-end."""

import subprocess
import sys

import numpy as np
import pytest

from delly_tpu.models.assemble import (
    best_diagonal, build_superstring, consensus_edlib, consensus_wfa,
    fill_kmer_table, msa_edlib, msa_wfa, select_best_reads, trim_consensus,
)
from delly_tpu.models.svanno import detect_tandem_repeat
from delly_tpu.models.methyl import (
    MethylAccum, cluster_and_filter_cpg, finalize_methyl_info,
)
from delly_tpu.ops.edist import MODE_NW, align, edit_distance


class _Cfg:
    min_clique_size = 3
    max_read_per_sv = 15
    min_cons_window = 1000


def _mat(rows):
    width = max(len(r) for r in rows)
    rows = [r.ljust(width, "-") for r in rows]
    return np.frombuffer("".join(rows).encode(),
                         dtype=np.uint8).reshape(len(rows), width)


def test_consensus_edlib_majority_and_ambiguity():
    m = _mat(["ACGT", "ACGA", "ACGA"])
    cons = consensus_edlib(m)
    assert cons[:3] == "ACG"
    # column 3: A=2, T=1 -> 2*1 < 2 is False -> ambiguity code W (A/T)
    assert cons[3] == "W"
    # unanimous columns
    assert consensus_edlib(_mat(["AAAA", "AAAA"])) == "AAAA"


def test_consensus_wfa_masks_outside_read_span():
    # second read spans only cols 2..3, so col 0 counts only read 1
    m = _mat(["ACGT", "--GT"])
    cons = consensus_wfa(m)
    assert cons[0] == "A"
    assert cons[2] == "G"


def test_kmer_table_and_best_diagonal():
    rng = np.random.default_rng(0)
    base = "".join(rng.choice(list("ACGT"), size=200))
    s1 = base[:150]
    s2 = base[50:]
    t1 = fill_kmer_table(s1)
    t2 = fill_kmer_table(s2)
    diag = best_diagonal(t1, t2, len(s1), len(s2))
    assert abs(diag - 50) <= 10


def test_build_superstring_recovers_sequence():
    rng = np.random.default_rng(1)
    base = "".join(rng.choice(list("ACGT"), size=300))
    s1 = base[:200]
    s2 = base[100:]
    # overlap = base[100:200], diag=100
    _, _, ops = align(s1[100:200], s2[:100], MODE_NW)
    sup = build_superstring(s1, s2, ops, 100, 0, 0, 100)
    assert sup == base


def test_msa_edlib_recovers_consensus():
    rng = np.random.default_rng(2)
    truth = "".join(rng.choice(list("ACGT"), size=400))
    reads = []
    for _ in range(6):
        b = list(truth)
        for p in rng.choice(len(b), size=8, replace=False):
            b[p] = rng.choice(list("ACGT"))
        reads.append("".join(b))
    support, cons = msa_edlib(_Cfg(), reads)
    assert support >= 4
    d, _ = edit_distance(cons, truth[20:380], MODE_NW)
    assert d < 25


def test_msa_wfa_builds_insertion_consensus():
    rng = np.random.default_rng(3)
    truth = "".join(rng.choice(list("ACGT"), size=600))
    reads = [truth[0:400], truth[100:500], truth[200:600], truth[50:450]]
    support, cons = msa_wfa(_Cfg(), reads)
    assert support >= 3
    d, _ = edit_distance(cons, truth[len(truth) // 2 - len(cons) // 2:
                                     len(truth) // 2 + len(cons) // 2],
                         MODE_NW)
    # consensus should be a near-exact substring of the truth
    dd, _ = edit_distance(cons, truth, 2)
    assert dd >= -1  # HW would be better; NW sanity only


def test_trim_consensus_orients_and_trims():
    rng = np.random.default_rng(4)
    left = "".join(rng.choice(list("ACGT"), size=100))
    ins = "".join(rng.choice(list("ACGT"), size=50))
    right = "".join(rng.choice(list("ACGT"), size=100))
    cs = "TTTT" + left + ins + right + "GGGG"
    out = trim_consensus(left, right, cs)
    assert out.startswith(left[:10]) or len(out) < len(cs)


def test_select_best_reads():
    seqs = ["a", "b", "c", "d"]
    scores = [1, 9, 3, 7]
    out = select_best_reads(seqs, scores, 2)
    assert out == ["b", "d"]


def test_detect_tandem_repeat():
    period, copies = detect_tandem_repeat("ACGACGACGACGACGACG")
    assert period == 3
    assert copies == pytest.approx(6.0)
    period, _ = detect_tandem_repeat(
        "ACGTTGCAATCGGATCCGTAGCTTAGCGA")  # random-ish
    assert period == 0


def test_detect_tandem_repeat_float32_threshold():
    """The reference compares (float)matches/(float)(n-p) against the
    float32 config threshold (svanno.h:50); at the exact 17/20 boundary
    with the f32-rounded 0.85 config value, float64 arithmetic rejects
    while the reference accepts."""
    import numpy as np
    seq = "A" * 10 + "B" + "A" * 9 + "C"  # p=1: 17 matches over 20
    frac = float(np.float32(0.85))  # config threshold after f32 round-trip
    period, copies = detect_tandem_repeat(seq, 100, frac)
    assert period == 1
    assert copies == pytest.approx(21.0)


def test_cpg_clustering():
    # positions 10,11 cluster (depth 5+4=9); position 50 isolated depth 2
    assert cluster_and_filter_cpg({10: 5, 11: 4, 50: 2}, 5) == 1
    assert cluster_and_filter_cpg({10: 5, 11: 4, 50: 7}, 5) == 2
    assert cluster_and_filter_cpg({}, 5) == 0


def test_finalize_methyl_info():
    acc = MethylAccum()
    acc.alt_m[0] = 8
    acc.alt_t[0] = 10
    acc.cpg[0] = {5: 6}
    mi = finalize_methyl_info(acc, 5)
    assert mi.altSvStartL == 80
    assert mi.mncStartL == 1
    assert mi.mdpStartL == 10  # (10 alt + 0 ref) / 1 CpG cluster
    assert mi.refSvStartL == -1


def test_lr_end_to_end_example():
    """Smoke: the bundled long-read example yields the expected DEL."""
    out = "/tmp/test_lr_e2e.vcf"
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "lr",
         "-g", "/root/reference/example/ref.fa", "-o", out,
         "/root/reference/example/lr.bam"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    records = [l for l in open(out) if not l.startswith("#")]
    assert len(records) == 1
    fields = records[0].split("\t")
    assert fields[0] == "18"
    assert abs(int(fields[1]) - 100000) < 50
    assert "SVTYPE=DEL" in fields[7]
    assert "PRECISE" in fields[7]
    gt = fields[9].split(":")[0]
    assert gt in ("0/1", "1/1", "0|1", "1|0")


def test_lr_hp_ps_phasing_end_to_end(tmp_path):
    """HP/PS aux tags flow into the HP (hp1ref,hp1alt,hp2ref,hp2alt)
    and PS FORMAT fields (genotype.h haplotype pass)."""
    import os
    import random
    import struct
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import (encode_record, random_contig, write_bam,
                          write_fasta)

    rng = random.Random(13)
    clen = 120_000
    ref = random_contig(rng, clen)
    contigs = [("chrP1", ref)]
    del_len = 1500
    posd = clen // 2
    read_len = 6000

    def hp_ps(hp, ps):
        return b"HPC" + bytes([hp]) + b"PSi" + struct.pack("<i", ps)

    recs = []
    qid = 0
    for _ in range(12):          # REF reads on haplotype 1
        p = posd - rng.randint(3000, 4500)
        recs.append((p, encode_record(
            f"r{qid}", 0x0, 0, p, 60, [("M", read_len)], -1, -1, 0,
            ref[p:p + read_len], aux=hp_ps(1, 77))))
        qid += 1
    for _ in range(10):          # ALT reads on haplotype 2
        lo = rng.randint(1500, 2500)
        hi = rng.randint(1500, 2500)
        p = posd - lo
        seq = ref[p:posd] + ref[posd + del_len:posd + del_len + hi]
        recs.append((p, encode_record(
            f"a{qid}", 0x0, 0, p, 60,
            [("M", lo), ("D", del_len), ("M", hi)], -1, -1, 0, seq,
            aux=hp_ps(2, 77))))
        qid += 1
    recs.sort(key=lambda r: r[0])
    bam = str(tmp_path / "phase.bam")
    fa = str(tmp_path / "phase.fa")
    write_bam(bam, contigs, [r[1] for r in recs])
    write_fasta(fa, contigs)

    out = str(tmp_path / "phase.vcf")
    r = subprocess.run([sys.executable, "-m", "delly_tpu.cli", "lr",
                        "-g", fa, "-o", out, bam],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    body = [ln.split("\t") for ln in open(out)
            if ln.strip() and not ln.startswith("#")]
    dels = [rec for rec in body if "SVTYPE=DEL" in rec[7]]
    assert dels, body
    fmt = dict(zip(dels[0][8].split(":"), dels[0][9].split(":")))
    hp1ref, hp1alt, hp2ref, hp2alt = [int(x) for x in
                                      fmt["HP"].split(",")]
    assert hp1ref >= 8 and hp2alt >= 6, fmt["HP"]
    assert hp1alt == 0 and hp2ref == 0, fmt["HP"]
    assert fmt["PS"] == "77", fmt


def test_lr_calls_survive_ont_error_rates(tmp_path):
    """DEL + INS still called exactly with 5% substitution + 5% 1bp
    indel noise on every read (ONT-class realism with realistic noisy
    CIGARs; exercises the consensus + realignment stack rather than
    exact-match shortcuts)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from bamsynth import make_lr_genome_dataset

    from delly_tpu.models.config import LrConfig
    from delly_tpu.models.lr import run_lr

    bam, fa, truth = make_lr_genome_dataset(
        str(tmp_path), n_contigs=1, contig_len=200_000,
        reads_per_contig=60, var_reads=12, error_rate=0.05,
        indel_error_rate=0.05, name="noisy")
    out = str(tmp_path / "noisy.vcf")
    cfg = LrConfig(genome=fa, files=[bam], outfile=out)
    assert run_lr(cfg) == 0
    body = [ln.split("\t") for ln in open(out)
            if ln.strip() and not ln.startswith("#")]
    calls = []
    for rec in body:
        info = dict(kv.split("=", 1) for kv in rec[7].split(";")
                    if "=" in kv)
        calls.append((rec[0], info.get("SVTYPE"), int(rec[1])))
    for c, kind, pos, _l in truth:
        assert any(cc == c and kk == kind and abs(pp - pos) < 60
                   for cc, kk, pp in calls), (c, kind, pos, calls)


def test_lr_all_five_sv_families(tmp_path):
    """One long-read input carrying split-alignment evidence for DUP,
    INV (reverse-strand supplementary) and cross-contig BND plus
    CIGAR-op DEL/INS: the lr engine must type and place all five
    (junction.h select* paths through tegua)."""
    from bamsynth import make_lr_sv_dataset
    from delly_tpu.models.config import LrConfig
    from delly_tpu.models.lr import run_lr

    bam, fa, truth = make_lr_sv_dataset(str(tmp_path))
    out = str(tmp_path / "out.vcf")
    assert run_lr(LrConfig(genome=fa, files=[bam], outfile=out)) == 0
    calls = []
    for ln in open(out):
        if ln.startswith("#"):
            continue
        c = ln.split("\t")
        svt = [f for f in c[7].split(";")
               if f.startswith("SVTYPE=")][0][7:]
        calls.append((svt, c[0], int(c[1]), c[4]))
    got = {s for s, *_ in calls}
    assert got == {"DEL", "INS", "DUP", "INV", "BND"}, calls
    for typ, chrom, pos in [("DEL", "ctgA", 20000), ("INS", "ctgA", 45000),
                            ("DUP", "ctgA", 70000), ("INV", "ctgA", 100000)]:
        assert any(s == typ and cc == chrom and abs(cp - pos) <= 5
                   for s, cc, cp, _ in calls), (typ, calls)
    bnd = [c for c in calls if c[0] == "BND"][0]
    assert bnd[1] == "ctgB" and abs(bnd[2] - 30000) <= 5
    assert "ctgA:125000" in bnd[3]


def test_lr_ultra_long_reads_no_blowup(tmp_path):
    """120 kb background reads (real ONT territory) through the full
    lr engine: must complete quickly (banded/bit-parallel paths, no
    quadratic full-matrix fallbacks) and still call the implanted SVs."""
    import time

    from bamsynth import make_lr_genome_dataset

    from delly_tpu.models.config import LrConfig
    from delly_tpu.models.lr import run_lr

    bam, fa, truth = make_lr_genome_dataset(
        str(tmp_path), n_contigs=1, contig_len=400_000,
        reads_per_contig=25, read_len=120_000, var_reads=6,
        error_rate=0.02, name="ultralong")
    out = str(tmp_path / "ul.vcf")
    t0 = time.time()
    cfg = LrConfig(genome=fa, files=[bam], outfile=out)
    assert run_lr(cfg) == 0
    wall = time.time() - t0
    body = [ln for ln in open(out) if not ln.startswith("#")]
    assert len(body) == len(truth)
    # generous bound: quadratic blowups on 120 kb reads would take
    # minutes, the banded paths take seconds
    assert wall < 120, wall
