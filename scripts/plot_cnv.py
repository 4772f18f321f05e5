#!/usr/bin/env python
"""Population CNV histogram plotting (Python equivalent of R/cnv.R).

Input: a table with the CNV id in column 1 and per-sample RDCN values in
the remaining columns (e.g. extracted from a merged CNV BCF with
`bcftools query -f '%ID[\\t%RDCN]\\n'`). One histogram per CNV, colored
by rounded integer copy-number.
"""

import argparse
import math
import sys

# One color per rounded CN 0..9 (matches the reference palette)
PALETTE = ["#ff7f00", "#1f78b4", "#33a02c", "#e31a1c", "#6a3d9a",
           "#fdbf6f", "#a6cee3", "#b2df8a", "#fb9a99", "#cab2d6"]


def main() -> int:
    ap = argparse.ArgumentParser(description="Plot CNV RDCN histograms")
    ap.add_argument("table", help="ID + per-sample RDCN columns")
    ap.add_argument("-o", "--out-prefix", default="cnv")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    per_cnv = {}
    with open(args.table) as fh:
        for line in fh:
            t = line.rstrip("\n").split("\t")
            if len(t) < 2:
                continue
            vals = []
            for v in t[1:]:
                try:
                    f = float(v)
                except ValueError:
                    continue
                if f != -1 and math.isfinite(f):
                    vals.append(f)
            if vals:
                per_cnv.setdefault(t[0], []).extend(vals)
    if not per_cnv:
        print("No usable rows", file=sys.stderr)
        return 1

    nsamples = max(len(v) for v in per_cnv.values())
    nbins = max(30, 2 * int(math.ceil(math.sqrt(nsamples))))
    for cnv_id, vals in per_cnv.items():
        print(cnv_id, file=sys.stderr)
        fig, ax = plt.subplots(figsize=(8, 4))
        groups = {}
        for v in vals:
            cn = min(int(round(v)), 9)
            groups.setdefault(cn, []).append(v)
        edges = [i * 6.0 / nbins for i in range(nbins + 1)]
        for cn in sorted(groups):
            ax.hist(groups[cn], bins=edges, color=PALETTE[cn],
                    label=f"CN{cn}", alpha=0.9)
        ax.set_xlabel("Copy-number")
        ax.set_ylabel("Count")
        ax.set_xlim(0, 6)
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(f"{args.out_prefix}.{cnv_id}.png", dpi=150)
        plt.close(fig)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
