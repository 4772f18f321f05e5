#!/usr/bin/env python
"""Genome-scale end-to-end sr benchmark with implanted truth.

Generates (and caches) a multi-contig short-read BAM with one
heterozygous ~8kb deletion per contig, runs the FULL `sr` pipeline
(scan -> cluster -> assembly -> refine -> genotype -> VCF) and reports
wall time, per-stage breakdown, read throughput and recall/precision
against the implanted truth set.

Prints ONE JSON line:
  {"metric": "sr_e2e_reads_per_s", "value": N, "unit": "reads/s",
   "wall_s": ..., "recall": ..., "precision": ..., "n_reads": ...,
   "stages": {...}}

Usage: python bench_e2e.py [--contigs 8] [--pairs 40000] [--len 1500000]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine",
                    choices=["sr", "lr", "cnv", "merge", "svmix",
                             "asm", "deepgeno", "deepgeno_lr",
                             "cohort", "cnv3gb"],
                    default="sr")
    ap.add_argument("--coverage", type=int, default=45,
                    help="background coverage (deepgeno engine)")
    ap.add_argument("--dels", type=int, default=150,
                    help="DELs per contig (deepgeno engine)")
    ap.add_argument("--cnv-window", dest="cnv_window", type=int,
                    default=0,
                    help="fixed CNV window size (cnv3gb engine; 0 = "
                         "adaptive)")
    ap.add_argument("--samples", type=int, default=50,
                    help="cohort size (merge engine)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the engine N times, report best wall")
    ap.add_argument("--contigs", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=40_000,
                    help="normal pairs per contig (sr) / background "
                         "reads per contig (lr)")
    ap.add_argument("--len", dest="clen", type=int, default=1_500_000)
    ap.add_argument("--threads", type=int, default=4,
                    help="scan-plane worker count (sr engine)")
    ap.add_argument("--workdir", default="/tmp/delly_tpu_bench_e2e")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--error-rate", type=float, default=0.0,
                    help="per-base substitution error rate (lr reads)")
    ap.add_argument("--indel-error-rate", type=float, default=0.0,
                    help="per-base 1bp-indel error rate (lr reads)")
    args = ap.parse_args()
    if args.engine == "lr":
        return run_lr_bench(args)
    if args.engine == "cnv":
        return run_cnv_bench(args)
    if args.engine == "merge":
        return run_merge_bench(args)
    if args.engine == "deepgeno":
        return run_deepgeno_bench(args)
    if args.engine == "deepgeno_lr":
        return run_deepgeno_lr_bench(args)
    if args.engine == "cohort":
        return run_cohort_bench(args)
    if args.engine == "cnv3gb":
        return run_cnv3gb_bench(args)
    if args.engine == "svmix":
        return run_svmix_bench(args)
    if args.engine == "asm":
        return run_asm_bench(args)

    # tests/ holds the synthetic writer
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.bamsynth import make_multi_contig_del_dataset

    # Honor JAX_PLATFORMS even when a PJRT plugin registers regardless
    # of the env filter (the axon TPU tunnel does).
    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()

    os.makedirs(args.workdir, exist_ok=True)
    tag = f"c{args.contigs}_p{args.pairs}_l{args.clen}"
    if args.error_rate > 0:
        tag += f"_e{args.error_rate:g}"
    bam = f"{args.workdir}/multi_{tag}.bam"
    fa = f"{args.workdir}/multi_{tag}.fa"
    truth_path = f"{args.workdir}/multi_{tag}.truth"
    if args.fresh or not (os.path.exists(bam) and os.path.exists(fa)
                          and os.path.exists(truth_path)):
        t0 = time.time()
        bam, fa, truth = make_multi_contig_del_dataset(
            args.workdir, n_contigs=args.contigs, contig_len=args.clen,
            pairs_per_contig=args.pairs, name=f"multi_{tag}",
            error_rate=args.error_rate)
        with open(truth_path, "w") as fh:
            for c, s, e in truth:
                fh.write(f"{c}\t{s}\t{e}\n")
        print(f"[bench_e2e] generated {bam} "
              f"({os.path.getsize(bam) / 1e6:.1f} MB compressed) "
              f"in {time.time() - t0:.1f}s", file=sys.stderr)
    truth = [ln.split("\t") for ln in open(truth_path).read().splitlines()]
    truth = [(c, int(s), int(e)) for c, s, e in truth]

    n_reads = 2 * args.pairs * args.contigs + 48 * args.contigs

    from delly_tpu.models.config import SrConfig
    from delly_tpu.models.sr import run_sr
    from delly_tpu.utils import log as _log_mod

    # stage breakdown via the pipeline's own stage banners: observe the
    # log hook and convert banner-to-banner gaps into per-stage seconds
    marks = []

    def _capture(msg):
        marks.append((time.time(), msg))

    out = f"{args.workdir}/bench_{tag}.vcf"
    cfg = SrConfig(genome=fa, files=[bam], outfile=out,
                   max_threads=args.threads)
    wall = None
    stages = {}
    for _rep in range(max(1, args.repeat)):
        marks.clear()
        _log_mod.hook = _capture
        t0 = time.time()
        try:
            rc = run_sr(cfg)
        finally:
            _log_mod.hook = None
        t1 = time.time()
        w = t1 - t0
        if wall is None or w < wall:
            wall = w
            stages = {}
            pts = [(t0, "startup")] + marks + [(t1, None)]
            for (ts, msg), (te, _)in zip(pts, pts[1:]):
                if msg is not None and te - ts >= 0.005:
                    key = msg.split(",")[0][:40]
                    stages[key] = round(stages.get(key, 0.0)
                                        + (te - ts), 2)
    if rc != 0:
        print(json.dumps({"metric": "sr_e2e_reads_per_s", "value": 0,
                          "unit": "reads/s", "error": f"rc={rc}"}))
        return 1

    body = [ln.split("\t") for ln in open(out).read().splitlines()
            if ln and not ln.startswith("#")]
    dels = [(c[0], int(c[1])) for c in body if "SVTYPE=DEL" in c[7]]
    tp = sum(1 for c, s, _e in truth
             if any(dc == c and abs(dp - s) < 100 for dc, dp in dels))
    matched_calls = sum(1 for dc, dp in dels
                        if any(dc == c and abs(dp - s) < 100
                               for c, s, _e in truth))
    recall = tp / len(truth) if truth else 0.0
    precision = matched_calls / len(dels) if dels else 0.0

    print(json.dumps({
        "metric": "sr_e2e_reads_per_s",
        "value": round(n_reads / wall, 1),
        "unit": "reads/s",
        "wall_s": round(wall, 2),
        "n_reads": n_reads,
        "n_contigs": args.contigs,
        "recall": round(recall, 4),
        "precision": round(precision, 4),
        "calls": len(dels),
        "truth": len(truth),
        "stages": stages,
    }))
    return 0


def run_cnv_bench(args):
    """Read-depth engine over the sr dataset (same generator): three
    full-genome read passes (scan, GC bias, count) + segmentation."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.bamsynth import make_multi_contig_del_dataset

    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()
    os.makedirs(args.workdir, exist_ok=True)
    tag = f"c{args.contigs}_p{args.pairs}_l{args.clen}"
    bam = f"{args.workdir}/multi_{tag}.bam"
    fa = f"{args.workdir}/multi_{tag}.fa"
    if not (os.path.exists(bam) and os.path.exists(fa)):
        bam, fa, _truth = make_multi_contig_del_dataset(
            args.workdir, n_contigs=args.contigs, contig_len=args.clen,
            pairs_per_contig=args.pairs, name=f"multi_{tag}")
    n_reads = 2 * args.pairs * args.contigs + 48 * args.contigs

    from delly_tpu.models.coral import CnvConfig, run_cnv
    out = f"{args.workdir}/cnv_{tag}.vcf"
    cov = f"{args.workdir}/cnv_{tag}.cov.gz"
    cfg = CnvConfig(genome=fa, bam_file=bam, outfile=out, covfile=cov)
    wall = None
    for _rep in range(max(1, args.repeat)):
        t0 = time.time()
        rc = run_cnv(cfg)
        w = time.time() - t0
        wall = w if wall is None else min(wall, w)
    if rc != 0:
        print(json.dumps({"metric": "cnv_e2e_reads_per_s", "value": 0,
                          "unit": "reads/s", "error": f"rc={rc}"}))
        return 1
    body = [ln.split("\t") for ln in open(out).read().splitlines()
            if ln and not ln.startswith("#")]
    # implanted homozygous coverage holes (bamsynth: [4/5*len,
    # +min(60k, len/10)) per contig)
    hole_len = min(60_000, args.clen // 10)
    hit = 0
    for c in range(args.contigs):
        lo = args.clen * 4 // 5
        hi = lo + hole_len
        for rec in body:
            if rec[0] != f"chr{c + 1}":
                continue
            info = dict(kv.split("=", 1) for kv in rec[7].split(";")
                        if "=" in kv)
            s = int(rec[1])
            e = int(info.get("END", s))
            if s < hi and e > lo:
                hit += 1
                break
    print(json.dumps({
        "metric": "cnv_e2e_reads_per_s",
        "value": round(n_reads / wall, 1),
        "unit": "reads/s",
        "wall_s": round(wall, 2),
        "n_reads": n_reads,
        "calls": len(body),
        "hole_recall": round(hit / args.contigs, 4),
    }))
    return 0


def run_lr_bench(args):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.bamsynth import make_lr_genome_dataset

    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()
    os.makedirs(args.workdir, exist_ok=True)
    tag = f"lr_c{args.contigs}_r{args.pairs}_l{args.clen}"
    if args.error_rate > 0:
        tag += f"_e{args.error_rate:g}"
    if args.indel_error_rate > 0:
        tag += f"_i{args.indel_error_rate:g}"
    bam = f"{args.workdir}/{tag}.bam"
    fa = f"{args.workdir}/{tag}.fa"
    truth_path = f"{args.workdir}/{tag}.truth"
    if args.fresh or not (os.path.exists(bam) and os.path.exists(fa)
                          and os.path.exists(truth_path)):
        t0 = time.time()
        bam, fa, truth = make_lr_genome_dataset(
            args.workdir, n_contigs=args.contigs, contig_len=args.clen,
            reads_per_contig=args.pairs, name=tag,
            error_rate=args.error_rate,
            indel_error_rate=args.indel_error_rate)
        with open(truth_path, "w") as fh:
            for c, kind, p, ln in truth:
                fh.write(f"{c}\t{kind}\t{p}\t{ln}\n")
        print(f"[bench_e2e] generated {bam} "
              f"({os.path.getsize(bam) / 1e6:.1f} MB compressed) "
              f"in {time.time() - t0:.1f}s", file=sys.stderr)
    truth = [ln.split("\t") for ln in
             open(truth_path).read().splitlines()]
    truth = [(c, k, int(p), int(ln)) for c, k, p, ln in truth]
    n_reads = (args.pairs + 24) * args.contigs
    n_bases = n_reads * 4000

    from delly_tpu.models.config import LrConfig
    from delly_tpu.models.lr import run_lr
    out = f"{args.workdir}/{tag}.vcf"
    cfg = LrConfig(genome=fa, files=[bam], outfile=out)
    wall = None
    for _rep in range(max(1, args.repeat)):
        t0 = time.time()
        rc = run_lr(cfg)
        w = time.time() - t0
        wall = w if wall is None else min(wall, w)
    if rc != 0:
        print(json.dumps({"metric": "lr_e2e_bases_per_s", "value": 0,
                          "unit": "bases/s", "error": f"rc={rc}"}))
        return 1
    body = [ln.split("\t") for ln in open(out).read().splitlines()
            if ln and not ln.startswith("#")]
    calls = []
    for c in body:
        info = dict(kv.split("=", 1) for kv in c[7].split(";")
                    if "=" in kv)
        calls.append((c[0], info.get("SVTYPE"), int(c[1])))
    tp = sum(1 for c, k, p, _l in truth
             if any(cc == c and kk == k and abs(pp - p) < 60
                    for cc, kk, pp in calls))
    recall = tp / len(truth) if truth else 0.0
    import resource
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(json.dumps({
        "metric": "lr_e2e_bases_per_s",
        "peak_rss_gb": round(rss_gb, 2),
        "value": round(n_bases / wall, 1),
        "unit": "bases/s",
        "wall_s": round(wall, 2),
        "n_reads": n_reads,
        "recall": round(recall, 4),
        "calls": len(calls),
        "truth": len(truth),
    }))
    return 0


def run_merge_bench(args):
    """Cohort-scale multi-sample merge (merge.h): `--samples` call
    sets, `--pairs` shared loci each (DEL/DUP/INV mix across
    `--contigs` contigs) with per-sample breakpoint jitter; times the
    k-way merge + union-find clustering + site emission."""
    import json as _json
    import random

    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()
    os.makedirs(args.workdir, exist_ok=True)
    rng = random.Random(5)
    nloci = args.pairs if args.pairs < 20_000 else 3000
    contigs = [(f"chr{c + 1}", 50_000_000) for c in range(args.contigs)]
    svts = ["DEL", "DUP", "INV"]
    loci = []
    for i in range(nloci):
        cname, clen = contigs[i % len(contigs)]
        pos = rng.randint(10_000, clen - 200_000)
        loci.append((cname, pos, pos + rng.randint(300, 120_000),
                     svts[i % 3]))
    hdr_lines = ["##fileformat=VCFv4.2"]
    hdr_lines += [f"##contig=<ID={n},length={ln}>" for n, ln in contigs]
    hdr_lines += [
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
    ]
    ct_of = {"DEL": "3to5", "DUP": "5to3", "INV": "3to3"}
    files = []
    t0 = time.time()
    for s in range(args.samples):
        path = f"{args.workdir}/merge_s{s}.vcf"
        with open(path, "w") as fh:
            fh.write("\n".join(hdr_lines) + "\n")
            fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\t"
                     f"INFO\tFORMAT\tS{s}\n")
            rows = []
            for i, (cname, b1, b2, svt) in enumerate(loci):
                if rng.random() < 0.3:
                    continue          # sample lacks this SV
                j1 = b1 + rng.randint(-40, 40)
                j2 = b2 + rng.randint(-40, 40)
                rows.append(
                    (cname, j1,
                     f"{cname}\t{j1}\t{svt}{i:05d}\tN\t<{svt}>\t"
                     f"700\tPASS\tPRECISE;SVTYPE={svt};"
                     f"CT={ct_of[svt]};END={j2};PE=9;SR=8;SRMAPQ=60;"
                     f"SRQ=0.97;CE=1.9\tGT:RR:RV\t0/1:12:11"))
            rows.sort(key=lambda r: (r[0], r[1]))
            fh.write("\n".join(r[2] for r in rows) + "\n")
        files.append(path)
    gen_s = time.time() - t0
    out = f"{args.workdir}/merged_{args.samples}x{nloci}.bcf"
    from delly_tpu.models.merge import MergeConfig, run_merge
    cfg = MergeConfig(outfile=out, files=files)
    t0 = time.time()
    rc = run_merge(cfg)
    wall = time.time() - t0
    from delly_tpu.io.bcf import bcf_to_vcf_text
    body = [ln for ln in bcf_to_vcf_text(
        open(out, "rb").read()).split("\n")
        if ln and not ln.startswith("#")]
    n_in = args.samples * nloci
    print(_json.dumps({
        "metric": "merge_sites_per_s",
        "value": round(n_in / wall, 1),
        "unit": "input sites/s",
        "wall_s": round(wall, 2),
        "samples": args.samples,
        "loci": nloci,
        "merged_sites": len(body),
        "gen_s": round(gen_s, 2),
        "rc": rc,
    }))
    return rc


def run_asm_bench(args):
    """Assembly-mode engine at genome scale: two ~contig-length
    haplotype alignments per sample with implanted DEL + INS
    (asmode.h squashed pipeline)."""
    import random

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.bamsynth import (
        encode_record, random_contig, write_bam, write_fasta,
    )

    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()

    os.makedirs(args.workdir, exist_ok=True)
    rng = random.Random(7)
    L = args.clen
    ref = random_contig(rng, L)
    posd, dell = L // 3, 1200
    posi, insl = 2 * L // 3, 600
    ins_seq = random_contig(rng, insl)
    contigs = [("chr1", ref)]

    def hap(qname):
        cig = [("M", posd), ("D", dell),
               ("M", posi - (posd + dell)), ("I", insl),
               ("M", L - posi)]
        seq = ref[:posd] + ref[posd + dell:posi] + ins_seq + ref[posi:]
        return encode_record(qname, 0x0, 0, 0, 60, cig, -1, -1, 0, seq)

    bam = f"{args.workdir}/asm_{L}.bam"
    fa = f"{args.workdir}/asm_{L}.fa"
    write_bam(bam, contigs, [hap("h1"), hap("h2")])
    write_fasta(fa, contigs)

    from delly_tpu.models.asmode import AsmConfig, run_asm
    out = f"{args.workdir}/asm_{L}.vcf"
    wall = None
    for _ in range(max(1, args.repeat)):
        t0 = time.time()
        rc = run_asm(AsmConfig(genome=fa, files=[bam], outfile=out))
        w = time.time() - t0
        wall = w if wall is None else min(wall, w)
    body = [ln for ln in open(out) if not ln.startswith("#")]
    hits = sum(1 for ln in body
               for want, pos in (("DEL", posd), ("INS", posi))
               if f"SVTYPE={want}" in ln
               and abs(int(ln.split("\t")[1]) - pos) < 50)
    print(json.dumps({
        "metric": "asm_e2e_bases_per_s",
        "value": round(2 * L / wall, 1) if wall else 0.0,
        "unit": "bases/s", "wall_s": round(wall, 2),
        "aligned_bases": 2 * L, "rc": rc,
        "sv_hits": f"{hits}/2",
    }))
    return rc


def run_deepgeno_bench(args):
    """Deep-coverage re-genotyping: the coverage.h:271 batching regime
    where the per-read x per-SV junction realignment DP dominates.

    Discovery runs once (cached) to produce a CONSENSUS site list;
    the TIMED phase is `sr -v sites` against ~coverage x of reads at
    the reference-default read cap (maxGenoReadCount=250) — flush
    batches are >=65k pairs, so the device path carries the DP. Run
    under JAX_PLATFORMS=cpu for the host floor; the ratio is the
    device's end-to-end advantage in its natural regime."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.bamsynth import make_deep_geno_dataset

    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()

    os.makedirs(args.workdir, exist_ok=True)
    n_contigs = min(args.contigs, 4)
    clen = args.clen
    tag = f"deepgeno_c{n_contigs}_d{args.dels}_x{args.coverage}_l{clen}"
    bam = f"{args.workdir}/{tag}.bam"
    fa = f"{args.workdir}/{tag}.fa"
    truth_path = f"{args.workdir}/{tag}.truth"
    if args.fresh or not (os.path.exists(bam) and os.path.exists(fa)
                          and os.path.exists(truth_path)):
        t0 = time.time()
        bam, fa, truth = make_deep_geno_dataset(
            args.workdir, n_contigs=n_contigs, contig_len=clen,
            dels_per_contig=args.dels, coverage=args.coverage,
            name=tag)
        with open(truth_path, "w") as fh:
            for t in truth:
                fh.write("\t".join(str(x) for x in t) + "\n")
        print(f"[bench_e2e] generated {bam} "
              f"({os.path.getsize(bam) / 1e6:.1f} MB) in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
    truth = [ln.split("\t")
             for ln in open(truth_path).read().splitlines()]

    from delly_tpu.models.config import SrConfig
    from delly_tpu.models.sr import run_sr
    from delly_tpu.utils import log as _log_mod

    sites = f"{args.workdir}/{tag}.sites.vcf"
    if args.fresh or not os.path.exists(sites):
        cfg = SrConfig(genome=fa, files=[bam], outfile=sites,
                       max_threads=args.threads)
        t0 = time.time()
        assert run_sr(cfg) == 0
        print(f"[bench_e2e] discovery {time.time() - t0:.1f}s",
              file=sys.stderr)
    n_sites = sum(1 for ln in open(sites) if not ln.startswith("#"))

    out = f"{args.workdir}/{tag}.geno.vcf"
    wall = None
    stages = {}
    marks = []
    for _rep in range(max(1, args.repeat)):
        cfg = SrConfig(genome=fa, files=[bam], outfile=out,
                       vcffile=sites, max_threads=args.threads)
        marks.clear()
        _log_mod.hook = lambda msg: marks.append((time.time(), msg))
        t0 = time.time()
        try:
            rc = run_sr(cfg)
        finally:
            _log_mod.hook = None
        t1 = time.time()
        w = t1 - t0
        if wall is None or w < wall:
            wall = w
            stages = {}
            pts = [(t0, "startup")] + marks + [(t1, None)]
            for (ts, msg), (te, _) in zip(pts, pts[1:]):
                if msg is not None and te - ts >= 0.005:
                    key = msg.split(",")[0][:40]
                    stages[key] = round(stages.get(key, 0.0)
                                        + (te - ts), 2)
    if rc != 0:
        print(json.dumps({"metric": "deepgeno_e2e_wall_s", "value": 0,
                          "error": f"rc={rc}"}))
        return 1

    # genotype sanity: every truth DEL should be a het/hom-alt call
    gt_alt = 0
    calls = 0
    for ln in open(out):
        if ln.startswith("#"):
            continue
        calls += 1
        sample = ln.rstrip("\n").split("\t")[9]
        gt = sample.split(":")[0]
        if gt in ("0/1", "1/1"):
            gt_alt += 1
    n_reads = 2 * (args.coverage * clen // 200) * n_contigs
    print(json.dumps({
        "metric": "deepgeno_e2e_wall_s",
        "value": round(wall, 2),
        "unit": "s",
        "n_sites": n_sites,
        "truth": len(truth),
        "alt_genotyped": gt_alt,
        "calls": calls,
        "n_reads_approx": n_reads,
        "reads_per_s": round(n_reads / wall, 1) if wall else 0.0,
        "stages": stages,
    }))
    return 0


def run_deepgeno_lr_bench(args):
    """Deep-coverage LONG-READ re-genotyping (genotype.h:93-397): the
    large-DP regime — every breakpoint-overlapping 4kb read scores
    REF/ALT probes with ~(2*offset)^2-cell NW DPs, so the batched
    device kernel carries the pipeline. Discovery runs once (cached);
    the TIMED phase is `lr -v sites`. Run under JAX_PLATFORMS=cpu for
    the host floor."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.bamsynth import make_deep_lr_dataset

    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()

    os.makedirs(args.workdir, exist_ok=True)
    n_contigs = min(args.contigs, 4)
    clen = args.clen
    tag = (f"deeplr_c{n_contigs}_d{args.dels}_x{args.coverage}_l{clen}")
    bam = f"{args.workdir}/{tag}.bam"
    fa = f"{args.workdir}/{tag}.fa"
    truth_path = f"{args.workdir}/{tag}.truth"
    if args.fresh or not (os.path.exists(bam) and os.path.exists(fa)
                          and os.path.exists(truth_path)):
        t0 = time.time()
        bam, fa, truth = make_deep_lr_dataset(
            args.workdir, n_contigs=n_contigs, contig_len=clen,
            dels_per_contig=args.dels, coverage=args.coverage,
            name=tag)
        with open(truth_path, "w") as fh:
            for t in truth:
                fh.write("\t".join(str(x) for x in t) + "\n")
        print(f"[bench_e2e] generated {bam} "
              f"({os.path.getsize(bam) / 1e6:.1f} MB) in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
    truth = [ln.split("\t")
             for ln in open(truth_path).read().splitlines()]

    from delly_tpu.models.config import LrConfig
    from delly_tpu.models.lr import run_lr
    from delly_tpu.utils import log as _log_mod

    sites = f"{args.workdir}/{tag}.sites.vcf"
    if args.fresh or not os.path.exists(sites):
        cfg = LrConfig(genome=fa, files=[bam], outfile=sites,
                       max_threads=args.threads)
        t0 = time.time()
        assert run_lr(cfg) == 0
        print(f"[bench_e2e] discovery {time.time() - t0:.1f}s",
              file=sys.stderr)
    n_sites = sum(1 for ln in open(sites) if not ln.startswith("#"))

    out = f"{args.workdir}/{tag}.geno.vcf"
    wall = None
    stages = {}
    marks = []
    for _rep in range(max(1, args.repeat)):
        cfg = LrConfig(genome=fa, files=[bam], outfile=out,
                       vcffile=sites, max_threads=args.threads)
        marks.clear()
        _log_mod.hook = lambda msg: marks.append((time.time(), msg))
        t0 = time.time()
        try:
            rc = run_lr(cfg)
        finally:
            _log_mod.hook = None
        t1 = time.time()
        w = t1 - t0
        if wall is None or w < wall:
            wall = w
            stages = {}
            pts = [(t0, "startup")] + marks + [(t1, None)]
            for (ts, msg), (te, _) in zip(pts, pts[1:]):
                if msg is not None and te - ts >= 0.005:
                    key = msg.split(",")[0][:40]
                    stages[key] = round(stages.get(key, 0.0)
                                        + (te - ts), 2)
    if rc != 0:
        print(json.dumps({"metric": "deepgeno_lr_e2e_wall_s",
                          "value": 0, "error": f"rc={rc}"}))
        return 1

    gt_alt = 0
    calls = 0
    for ln in open(out):
        if ln.startswith("#"):
            continue
        calls += 1
        sample = ln.rstrip("\n").split("\t")[9]
        if sample.split(":")[0] in ("0/1", "1/1"):
            gt_alt += 1
    n_bases = args.coverage * clen * n_contigs // 2
    print(json.dumps({
        "metric": "deepgeno_lr_e2e_wall_s",
        "value": round(wall, 2),
        "unit": "s",
        "n_sites": n_sites,
        "truth": len(truth),
        "alt_genotyped": gt_alt,
        "calls": calls,
        "bases_per_s": round(n_bases / wall, 1) if wall else 0.0,
        "stages": stages,
    }))
    return 0


def run_cnv3gb_bench(args):
    """Human-genome-scale CNV point (coral.h:93 three-pass design at
    hg38 size): 24 x 125 Mb contigs (3 Gb), ~2x fragment coverage
    (30M pairs), implanted hom/het deletion windows, full
    scan -> GC-bias -> count run with covfile; records wall, peak RSS
    and per-stage walls. Validates the retained-arena malloc policy
    and the GC/coverage track memory behavior at 3 Gb."""
    import resource

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np

    from tests.bamsynth import (
        _bulk_pair_records, _merge_sorted_blobs, random_contig,
        write_bam, write_fasta,
    )

    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()

    os.makedirs(args.workdir, exist_ok=True)
    n_contigs, clen = 24, 125_000_000
    coverage = 2
    rl, isize = 100, 400
    tag = "cnv3gb"
    bam = f"{args.workdir}/{tag}.bam"
    fa = f"{args.workdir}/{tag}.fa"
    if args.fresh or not (os.path.exists(bam) and os.path.exists(fa)):
        t0 = time.time()
        contigs = []
        blobs = []
        truth = []
        for tid in range(n_contigs):
            ref = random_contig(1000 + tid, clen, gc_blocks=clen
                                // 100_000)
            name = f"chr{tid + 1}"
            contigs.append((name, ref))
            npairs = coverage * clen // (2 * rl)
            g = np.random.default_rng(77 + tid)
            p1 = np.sort(g.integers(0, clen - isize - 80, size=npairs)
                         ).astype(np.int64)
            # jittered insert sizes: a constant isize makes the library
            # MAD zero and the scan's normal-insert gate empty
            isz = (isize + g.integers(-60, 61, size=npairs)
                   ).astype(np.int64)
            # implanted CNVs: 2 hom-del (drop all) + 3 het (drop half)
            mid = p1 + isize // 2
            drop = np.zeros(len(p1), dtype=bool)
            for k in range(5):
                s0 = (k + 1) * clen // 7
                e0 = s0 + 150_000
                inside = (mid >= s0) & (mid < e0)
                if k < 2:
                    drop |= inside
                    truth.append((name, s0, e0, 0))
                else:
                    drop |= inside & (g.random(len(p1)) < 0.5)
                    truth.append((name, s0, e0, 1))
            p1 = p1[~drop]
            isz = isz[~drop]
            ref_u8 = np.frombuffer(ref.encode(), dtype=np.uint8)
            bpos, bbuf, rec_w = _bulk_pair_records(
                tid, ref_u8, p1, isz, tid * 10_000_000, rl=rl,
                seed=77 + tid)
            blobs += _merge_sorted_blobs(bpos, bbuf, rec_w, [])
            print(f"[bench_e2e] contig {name} ready "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr)
        write_fasta(fa, contigs)
        write_bam(bam, contigs, blobs, sample="cnv3gb")
        del blobs, contigs
        print(f"[bench_e2e] generated {bam} "
              f"({os.path.getsize(bam) / 1e9:.2f} GB) in "
              f"{time.time() - t0:.0f}s", file=sys.stderr)

    from delly_tpu.models.coral import CnvConfig, run_cnv
    from delly_tpu.utils import log as _log_mod

    out = f"{args.workdir}/{tag}.bcf"
    cov = f"{args.workdir}/{tag}.cov.gz"
    marks = []
    _log_mod.hook = lambda msg: marks.append((time.time(), msg))
    t0 = time.time()
    try:
        rc = run_cnv(CnvConfig(genome=fa, bam_file=bam, outfile=out,
                               covfile=cov,
                               window_size=args.cnv_window,
                               window_offset=args.cnv_window))
    finally:
        _log_mod.hook = None
    wall = time.time() - t0
    stages = {}
    pts = [(t0, "startup")] + marks + [(time.time(), None)]
    for (ts, msg), (te, _) in zip(pts, pts[1:]):
        if msg is not None and te - ts >= 0.01:
            key = msg.split(",")[0][:40]
            stages[key] = round(stages.get(key, 0.0) + (te - ts), 2)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    import gzip as _gzip
    nrows = 0
    with _gzip.open(cov, "rt") as fh:
        for _ln in fh:
            nrows += 1
    from delly_tpu.io.bcf import bcf_to_vcf_text
    calls = [ln for ln in bcf_to_vcf_text(
        open(out, "rb").read()).splitlines()
        if ln and not ln.startswith("#")]
    print(json.dumps({
        "metric": "cnv_3gb_wall_s",
        "value": round(wall, 1),
        "unit": "s",
        "rc": rc,
        "genome_gb": round(n_contigs * clen / 1e9, 2),
        "coverage_x": coverage,
        "peak_rss_gb": round(rss_gb, 2),
        "covfile_rows": nrows,
        "cnv_calls": len(calls),
        "stages": stages,
    }))
    return 0


def run_cohort_bench(args):
    """Reference germline workflow (README.md:75-99) end-to-end over a
    synthetic population: per-sample discovery -> delly-tpu merge ->
    per-sample `-v sites` genotyping -> mergegeno sample paste ->
    germline filter. Records per-stage walls and site+genotype
    accuracy vs the implanted population truth."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.bamsynth import make_population_cohort

    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()

    os.makedirs(args.workdir, exist_ok=True)
    n_samples = args.samples
    tag = f"cohort_{n_samples}"
    fa = f"{args.workdir}/{tag}.fa"
    truth_path = f"{args.workdir}/{tag}.truth"
    bam0 = f"{args.workdir}/{tag}_s000.bam"
    if args.fresh or not (os.path.exists(bam0)
                          and os.path.exists(truth_path)):
        t0 = time.time()
        bams, fa, truth = make_population_cohort(
            args.workdir, n_samples=n_samples, name=tag)
        with open(truth_path, "w") as fh:
            for c, a, b, af, car in truth:
                fh.write(f"{c}\t{a}\t{b}\t{af}\t"
                         + ",".join(str(x) for x in sorted(car)) + "\n")
        print(f"[bench_e2e] generated {n_samples} samples in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
    bams = [f"{args.workdir}/{tag}_s{s:03d}.bam"
            for s in range(n_samples)]
    truth = []
    for ln in open(truth_path):
        c, a, b, af, car = ln.rstrip("\n").split("\t")
        truth.append((c, int(a), int(b), float(af),
                      frozenset(int(x) for x in car.split(","))
                      if car else frozenset()))

    from delly_tpu.models.config import SrConfig
    from delly_tpu.models.merge import MergeConfig, run_merge
    from delly_tpu.models.sr import run_sr
    from delly_tpu.models.filter import FilterConfig, filter_run

    stages = {}

    # 1. per-sample discovery
    t0 = time.time()
    disc = []
    for s, bam in enumerate(bams):
        out = f"{args.workdir}/{tag}_disc{s:03d}.bcf"
        assert run_sr(SrConfig(genome=fa, files=[bam], outfile=out,
                               max_threads=args.threads)) == 0
        disc.append(out)
    stages["discovery"] = round(time.time() - t0, 2)

    # 2. cohort site merge
    t0 = time.time()
    sites = f"{args.workdir}/{tag}_sites.bcf"
    assert run_merge(MergeConfig(outfile=sites, files=disc)) == 0
    stages["merge"] = round(time.time() - t0, 2)

    # 3. per-sample re-genotyping against the merged sites
    t0 = time.time()
    geno = []
    for s, bam in enumerate(bams):
        out = f"{args.workdir}/{tag}_geno{s:03d}.bcf"
        assert run_sr(SrConfig(genome=fa, files=[bam], outfile=out,
                               vcffile=sites,
                               max_threads=args.threads)) == 0
        geno.append(out)
    stages["genotype"] = round(time.time() - t0, 2)

    # 4. sample-column merge (bcftools merge -m id role)
    import subprocess
    t0 = time.time()
    cohort = f"{args.workdir}/{tag}_cohort.bcf"
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "scripts", "mergegeno.py"),
         "-o", cohort] + geno,
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-800:]
    stages["mergegeno"] = round(time.time() - t0, 2)

    # 5. germline filter
    t0 = time.time()
    germ = f"{args.workdir}/{tag}_germline.bcf"
    assert filter_run(FilterConfig(filter="germline", vcffile=cohort,
                                   outfile=germ)) == 0
    stages["filter"] = round(time.time() - t0, 2)

    # accuracy vs implanted truth
    from delly_tpu.io.bcf import bcf_to_vcf_text
    text = bcf_to_vcf_text(open(germ, "rb").read())
    header_cols = []
    calls = []
    for ln in text.splitlines():
        if ln.startswith("#CHROM"):
            header_cols = ln.split("\t")[9:]
            continue
        if ln.startswith("#") or not ln:
            continue
        c = ln.split("\t")
        if "SVTYPE=DEL" not in c[7]:
            continue
        gts = [f.split(":")[0] for f in c[9:]]
        calls.append((c[0], int(c[1]), gts))
    sample_idx = {name: i for i, name in enumerate(header_cols)}

    site_tp = 0
    gt_ok = 0
    gt_tot = 0
    for chrom, bp1, _bp2, _af, car in truth:
        hit = None
        for cc, cp, gts in calls:
            if cc == chrom and abs(cp - bp1) < 100:
                hit = gts
                break
        if hit is None:
            continue
        site_tp += 1
        for s in range(n_samples):
            col = sample_idx.get(f"S{s:03d}", s)
            gt = hit[col]
            want_alt = s in car
            is_alt = gt in ("0/1", "1/1")
            gt_tot += 1
            gt_ok += (is_alt == want_alt)
    precision_tp = 0
    for cc, cp, _g in calls:
        if any(cc == c and abs(cp - a) < 100
               for c, a, _b, _af, _car in truth):
            precision_tp += 1

    print(json.dumps({
        "metric": "cohort_germline_site_recall",
        "value": round(site_tp / len(truth), 4) if truth else 0.0,
        "unit": "recall",
        "samples": n_samples,
        "truth_sites": len(truth),
        "filtered_calls": len(calls),
        "precision": round(precision_tp / len(calls), 4) if calls
        else 0.0,
        "genotype_concordance": round(gt_ok / gt_tot, 4) if gt_tot
        else 0.0,
        "stages": stages,
        "wall_s": round(sum(stages.values()), 2),
    }))
    return 0


def run_svmix_bench(args):
    """Mixed-SV truth set at genome scale: per-type recall/precision
    (DEL/DUP/INV/INS/BND) through the full sr pipeline."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.bamsynth import make_multi_sv_dataset

    from delly_tpu.utils.jaxenv import setup as _jax_setup
    _jax_setup()

    os.makedirs(args.workdir, exist_ok=True)
    tag = f"svmix_c{args.contigs}_p{args.pairs}_l{args.clen}"
    if args.error_rate > 0:
        tag += f"_e{args.error_rate:g}"
    bam = f"{args.workdir}/{tag}.bam"
    fa = f"{args.workdir}/{tag}.fa"
    truth_path = f"{args.workdir}/{tag}.truth"
    if args.fresh or not (os.path.exists(bam) and os.path.exists(fa)
                          and os.path.exists(truth_path)):
        t0 = time.time()
        bam, fa, truth = make_multi_sv_dataset(
            args.workdir, n_contigs=args.contigs, contig_len=args.clen,
            pairs_per_contig=args.pairs, name=tag,
            error_rate=args.error_rate)
        with open(truth_path, "w") as fh:
            for t in truth:
                fh.write("\t".join(str(x) for x in t) + "\n")
        print(f"[bench_e2e] generated {bam} "
              f"({os.path.getsize(bam) / 1e6:.1f} MB compressed) "
              f"in {time.time() - t0:.1f}s", file=sys.stderr)
    truth = [ln.split("\t")
             for ln in open(truth_path).read().splitlines()]

    from delly_tpu.models.config import SrConfig
    from delly_tpu.models.sr import run_sr

    from delly_tpu.utils import log as _log_mod

    out = f"{args.workdir}/{tag}.vcf"
    cfg = SrConfig(genome=fa, files=[bam], outfile=out,
                   max_threads=args.threads)
    wall = None
    stages = {}
    marks = []
    for _rep in range(max(1, args.repeat)):
        marks.clear()
        _log_mod.hook = lambda msg: marks.append((time.time(), msg))
        t0 = time.time()
        try:
            rc = run_sr(cfg)
        finally:
            _log_mod.hook = None
        t1 = time.time()
        w = t1 - t0
        if wall is None or w < wall:
            wall = w
            stages = {}
            pts = [(t0, "startup")] + marks + [(t1, None)]
            for (ts, msg), (te, _) in zip(pts, pts[1:]):
                if msg is not None and te - ts >= 0.005:
                    key = msg.split(",")[0][:40]
                    stages[key] = round(stages.get(key, 0.0)
                                        + (te - ts), 2)
    if rc != 0:
        print(json.dumps({"metric": "svmix_e2e_recall", "value": 0,
                          "error": f"rc={rc}"}))
        return 1

    calls = []
    for ln in open(out):
        if ln.startswith("#"):
            continue
        c = ln.split("\t")
        svt = [f for f in c[7].split(";")
               if f.startswith("SVTYPE=")][0][7:]
        calls.append((svt, c[0], int(c[1])))

    # imprecise PE-only types get a wider match window
    win = {"DEL": 100, "DUP": 150, "INS": 100, "INV": 400, "BND": 150}
    per_type = {}
    matched_truth = 0
    for t in truth:
        typ = t[0]
        st = per_type.setdefault(typ, {"truth": 0, "tp": 0})
        st["truth"] += 1
        if typ == "BND":
            _typ, ca, pa, cb, pb = t[0], t[1], int(t[2]), t[3], int(t[4])
            hit = any(svt == "BND"
                      and ((cc == ca and abs(cp - pa) < win["BND"])
                           or (cc == cb and abs(cp - pb) < win["BND"]))
                      for svt, cc, cp in calls)
        else:
            c, p = t[1], int(t[2])
            hit = any(svt == typ and cc == c and abs(cp - p) < win[typ]
                      for svt, cc, cp in calls)
        if hit:
            st["tp"] += 1
            matched_truth += 1
    # precision: every call must correspond to some truth entry
    matched_calls = 0
    for svt, cc, cp in calls:
        ok = False
        for t in truth:
            if t[0] == "BND" and svt == "BND":
                ok = ((cc == t[1] and abs(cp - int(t[2])) < win["BND"])
                      or (cc == t[3] and abs(cp - int(t[4])) < win["BND"]))
            elif t[0] == svt:
                ok = cc == t[1] and abs(cp - int(t[2])) < win[svt]
            if ok:
                break
        matched_calls += ok
    n_reads = 2 * args.pairs * args.contigs
    print(json.dumps({
        "metric": "svmix_e2e_recall",
        "value": round(matched_truth / len(truth), 4) if truth else 0.0,
        "unit": "recall",
        "wall_s": round(wall, 2),
        "n_reads_approx": n_reads,
        "reads_per_s": round(n_reads / wall, 1) if wall else 0.0,
        "precision": round(matched_calls / len(calls), 4) if calls
        else 0.0,
        "calls": len(calls),
        "truth": len(truth),
        "per_type": {k: f"{v['tp']}/{v['truth']}"
                     for k, v in sorted(per_type.items())},
        "stages": stages,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
