"""Differential oracle for the pangenome graph-alignment plane.

tests/pangenome_probe.cpp compiles the reference's gfa.h + gaf.h +
pangenome.h AS-IS and runs the real parseGfa + findGraphJunctions over
real GFA/GAF text files; this module fuzzes randomized graphs and graph
alignments (multi-segment paths in both orientations, I/D cigar events,
leading/trailing clips) against delly_tpu/models/pangenome.py: the
concatenated-segment graph model, GAF record/path/cigar parsing, and
every emitted junction in graph-segment coordinates.
"""

import os
import random
import shutil
import subprocess

import pytest

from delly_tpu.models.pangenome import (
    Graph, find_graph_junctions, parse_gfa,
)

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__),
                         "pangenome_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC,
                                               "pangenome.h"))):
        pytest.skip("g++ or reference pangenome.h unavailable")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", SHIM_DIR, "-I", REF_SRC,
         PROBE_SRC])

    def run(min_map_qual, min_ref_sep, gfa, gafs):
        out = subprocess.run(
            [exe, str(min_map_qual), str(min_ref_sep), gfa] + gafs,
            capture_output=True, text=True, check=True).stdout
        juncs = {}
        graph_line = None
        for ln in out.splitlines():
            if ln.startswith("GRAPH "):
                graph_line = ln
                continue
            seed, rest = ln.split(" ", 1)
            juncs[int(seed)] = [
                tuple(int(x) for x in tok.split(","))
                for tok in rest.split(";")]
        return juncs, graph_line

    return run


def _seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _make_graph(rng, nseg):
    segs = []
    for i in range(nseg):
        segs.append((f"s{i}", _seq(rng, rng.randint(80, 1200))))
    lines = []
    for name, seq in segs:
        lines.append(f"S\t{name}\t{seq}")
    for i in range(nseg - 1):
        lines.append(f"L\ts{i}\t+\ts{i + 1}\t+\t0M")
    return segs, "\n".join(lines) + "\n"


def _make_gaf(rng, segs, nreads):
    """Randomized graph alignments with plausible path/cigar algebra."""
    rows = []
    for r in range(nreads):
        npath = rng.randint(1, min(3, len(segs)))
        i0 = rng.randrange(len(segs) - npath + 1)
        path = []
        ptok = ""
        plen = 0
        for k in range(npath):
            fwd = rng.random() < 0.75
            name, seq = segs[i0 + k]
            ptok += (">" if fwd else "<") + name
            path.append((fwd, name, len(seq)))
            plen += len(seq)
        pstart = rng.randint(0, max(0, path[0][2] // 2))
        pend = plen - rng.randint(0, max(0, path[-1][2] // 2))
        if pend <= pstart + 30:
            continue
        span = pend - pstart
        # cigar over the path interval: M blocks with optional I/D
        ops = []
        left = span
        qlen_consumed = 0
        while left > 0:
            m = min(left, rng.randint(20, 400))
            ops.append((m, "M"))
            qlen_consumed += m
            left -= m
            if left > 40 and rng.random() < 0.5:
                if rng.random() < 0.5:
                    d = rng.randint(10, min(200, left - 20))
                    ops.append((d, "D"))
                    left -= d
                else:
                    ins = rng.randint(10, 300)
                    ops.append((ins, "I"))
                    qlen_consumed += ins
        cig = "".join(f"{n}{o}" for n, o in ops)
        lead = rng.randint(0, 400)   # leading clip in read space
        trail = rng.randint(0, 400)  # trailing clip
        qlen = lead + qlen_consumed + trail
        qstart, qend = lead, lead + qlen_consumed
        mapq = rng.choice([0, 10, 60])
        rows.append(f"read{r}\t{qlen}\t{qstart}\t{qend}\t+\t{ptok}\t"
                    f"{plen}\t{pstart}\t{pend}\t{span}\t{span}\t{mapq}"
                    f"\tcg:Z:{cig}")
    return "\n".join(rows) + "\n"


def test_graph_junctions_match_reference(oracle, tmp_path):
    rng = random.Random(5150)
    total = 0
    for case in range(8):
        segs, gfa_text = _make_graph(rng, rng.randint(2, 6))
        gfa = str(tmp_path / f"g{case}.gfa")
        open(gfa, "w").write(gfa_text)
        gafs = []
        for f in range(rng.randint(1, 2)):
            gaf = str(tmp_path / f"g{case}_{f}.gaf")
            open(gaf, "w").write(_make_gaf(rng, segs,
                                           rng.randint(3, 12)))
            gafs.append(gaf)
        min_mq, min_rs = rng.choice([(1, 25), (10, 30), (20, 50)])
        ref_juncs, ref_graph = oracle(min_mq, min_rs, gfa, gafs)

        g = parse_gfa(gfa)
        assert ref_graph is not None
        nseq, total_len, offs, ranks = ref_graph.split(" ")[1:]
        assert int(nseq) == len(g.smap)
        assert int(total_len) == len(g.sequence)
        assert offs == ",".join(str(o) for o in g.offset)
        assert ranks == ",".join(
            f"{k}={v}" for k, v in sorted(g.smap.items()))

        class Cfg:
            min_map_qual = min_mq
            min_ref_sep = min_rs

        read_bp = {}
        find_graph_junctions(Cfg(), g, gafs, read_bp, set())
        mine = {
            seed: [(int(j.forward), int(j.scleft), j.refidx, j.rstart,
                    j.refpos, j.seqpos, int(j.qual)) for j in v]
            for seed, v in read_bp.items()}
        assert mine == ref_juncs, case
        total += sum(len(v) for v in ref_juncs.values())
    assert total >= 30, total
