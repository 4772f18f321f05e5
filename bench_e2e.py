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
    ap.add_argument("--engine", choices=["sr", "lr", "cnv"],
                    default="sr")
    ap.add_argument("--contigs", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=40_000,
                    help="normal pairs per contig (sr) / background "
                         "reads per contig (lr)")
    ap.add_argument("--len", dest="clen", type=int, default=1_500_000)
    ap.add_argument("--workdir", default="/tmp/delly_tpu_bench_e2e")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--error-rate", type=float, default=0.0,
                    help="per-base substitution error rate (lr reads)")
    args = ap.parse_args()
    if args.engine == "lr":
        return run_lr_bench(args)
    if args.engine == "cnv":
        return run_cnv_bench(args)

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

    # stage breakdown via the pipeline's own stage banners
    stages = {}
    marks = []

    out = f"{args.workdir}/bench_{tag}.vcf"
    cfg = SrConfig(genome=fa, files=[bam], outfile=out)
    t0 = time.time()
    rc = run_sr(cfg)
    wall = time.time() - t0
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
    t0 = time.time()
    rc = run_cnv(cfg)
    wall = time.time() - t0
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
    bam = f"{args.workdir}/{tag}.bam"
    fa = f"{args.workdir}/{tag}.fa"
    truth_path = f"{args.workdir}/{tag}.truth"
    if args.fresh or not (os.path.exists(bam) and os.path.exists(fa)
                          and os.path.exists(truth_path)):
        t0 = time.time()
        bam, fa, truth = make_lr_genome_dataset(
            args.workdir, n_contigs=args.contigs, contig_len=args.clen,
            reads_per_contig=args.pairs, name=tag,
            error_rate=args.error_rate)
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
    t0 = time.time()
    rc = run_lr(cfg)
    wall = time.time() - t0
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
    print(json.dumps({
        "metric": "lr_e2e_bases_per_s",
        "value": round(n_bases / wall, 1),
        "unit": "bases/s",
        "wall_s": round(wall, 2),
        "n_reads": n_reads,
        "recall": round(recall, 4),
        "calls": len(calls),
        "truth": len(truth),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
