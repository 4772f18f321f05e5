#!/usr/bin/env python
"""GC-bias curve plotting (Python equivalent of R/gcbias.R).

Input: the `GC` section of the gzipped stats file written by
`delly-tpu cnv --statsfile` (columns gcsum/sample/reference/
percentiles/fractions/obsexp/meancoverage).
"""

import argparse
import gzip
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description="Plot GC bias curve")
    ap.add_argument("statsfile", help="gzipped stats file (GC section)")
    ap.add_argument("-o", "--out", default="gcbias.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    gc = []
    frac_sample = []
    frac_ref = []
    obsexp = []
    op = gzip.open if args.statsfile.endswith(".gz") else open
    with op(args.statsfile, "rt") as fh:
        for line in fh:
            t = line.rstrip("\n").split("\t")
            if t[0] != "GC" or t[1] == "gcsum":
                continue
            gc.append(int(t[1]))
            frac_sample.append(float(t[6]) * 100)
            frac_ref.append(float(t[7]) * 100)
            obsexp.append(float(t[8]))
    if not gc:
        print("No GC rows found in stats file", file=sys.stderr)
        return 1
    denom = max(gc)
    gcfrac = [g / denom for g in gc]

    fig, ax = plt.subplots(figsize=(12, 6))
    ax.bar(gcfrac, frac_sample, width=1.0 / denom, color="#1b9e77",
           alpha=0.6, label="fractionSample")
    ax.bar(gcfrac, frac_ref, width=1.0 / denom, bottom=frac_sample,
           color="#d95f02", alpha=0.6, label="fractionReference")
    ax.plot(gcfrac, obsexp, color="black", lw=1.5, label="obs/exp")
    ax.set_xlabel("GC content")
    ax.set_ylabel("Obs / Exp")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"Wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
