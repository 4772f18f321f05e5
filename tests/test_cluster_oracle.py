"""Differential oracle for the clique-clustering engine.

tests/cluster_probe.cpp compiles the reference's cluster.h AS-IS (its
heavy includes are unused by the clustering code and satisfied by
no-op shims) and drives both cluster() instantiations over a line
protocol; this module fuzzes delly_tpu/models/cluster.py against the
live reference: streaming component building with graph-cleaning
barriers (cluster.h:345-440,547-625), component merge/relabel, edge
pruning at graphPruning, greedy weighted clique growth — SR CIPOS/
CIEND window algebra with size-scaled wiggle and paired-seed dedup
(cluster.h:207-321), PE _initClique/_updateClique wiggle algebra per
svt (cluster.h:68-204) — and every emitted StructuralVariantRecord
field including the svid read-assignments.
"""

import os
import random
import shutil
import subprocess

import pytest

from delly_tpu.models.cluster import (
    BamAlignRecord, cluster_pe, cluster_sr,
)
from delly_tpu.utils.tags import SRBamRecord, StructuralVariantRecord

REF_SRC = "/root/reference/src"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "cluster_probe.cpp")
SHIM_DIR = os.path.join(os.path.dirname(__file__), "boost_shim")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if (shutil.which("g++") is None
            or not os.path.isfile(os.path.join(REF_SRC, "cluster.h"))):
        pytest.skip("g++ or reference cluster.h unavailable")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", SHIM_DIR, "-I", REF_SRC,
         PROBE_SRC])

    def run(lines):
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(lines)
        return out

    return run


def _sr_case(rng):
    """Clustered + noise split-read records across 1-3 chromosomes,
    sorted by (chr, pos, chr2, pos2) like _clusterSRReads feeds them."""
    svt = rng.choice([0, 1, 2, 2, 3, 4, 5, 6, 7, 8])
    nchr = rng.randint(1, 3)
    recs = []
    next_id = 0
    for _ in range(rng.randint(1, 6)):  # true clusters
        chrom = rng.randrange(nchr)
        chr2 = rng.randrange(nchr) if svt >= 5 else chrom
        pos = rng.randint(1000, 500000)
        if svt >= 5:
            pos2 = rng.randint(1000, 500000)
        elif svt == 4:
            pos2 = pos + rng.randint(0, 5)
        else:
            pos2 = pos + rng.randint(120, 20000)
        inslen = rng.randint(40, 900) if svt == 4 else 0
        support = rng.randint(1, 8)
        for _ in range(support):
            jit = rng.choice([0, 1, 2, 5, 12, 30, 60])
            recs.append(SRBamRecord(
                chr=chrom, pos=pos + rng.randint(-jit, jit),
                chr2=chr2, pos2=pos2 + rng.randint(-jit, jit),
                rstart=rng.randint(0, 100), sstart=rng.randint(0, 100),
                qual=rng.randint(10, 60),
                inslen=inslen + (rng.randint(-8, 8) if svt == 4 else 0),
                id=next_id))
            # paired-seed dedup: sometimes consecutive ids (two
            # junctions of one read), sometimes gaps
            next_id += rng.choice([1, 1, 2, 3])
    for _ in range(rng.randint(0, 10)):  # noise
        chrom = rng.randrange(nchr)
        recs.append(SRBamRecord(
            chr=chrom, pos=rng.randint(1000, 500000),
            chr2=rng.randrange(nchr) if svt >= 5 else chrom,
            pos2=rng.randint(1000, 520000), rstart=0, sstart=0,
            qual=rng.randint(10, 60),
            inslen=rng.randint(40, 900) if svt == 4 else 0,
            id=next_id))
        next_id += rng.choice([1, 2])
    recs.sort(key=lambda r: r.sort_key())
    cfg = (rng.choice([2, 3]), rng.choice([5, 40, 1000]))  # minclq,prune
    return svt, nchr, 35, cfg[0], cfg[1], recs


def test_cluster_sr_matches_reference(oracle):
    rng = random.Random(5151)
    cases = [_sr_case(rng) for _ in range(150)]
    lines = []
    for svt, nchr, mrs, mcs, prune, recs in cases:
        toks = " ".join(
            f"{r.chr},{r.pos},{r.chr2},{r.pos2},{r.rstart},{r.sstart},"
            f"{r.qual},{r.inslen},{r.id}" for r in recs)
        lines.append(f"CLUSTERSR {svt} {nchr} {mrs} {mcs} {prune} "
                     f"{len(recs)} {toks}")
    n_svs = 0
    for (svt, nchr, mrs, mcs, prune, recs), out in zip(cases,
                                                       oracle(lines)):
        parts = out.split("|")
        ref_svids = ([int(x) for x in parts[0].split(",")]
                     if parts[0] != "-" else [])
        ref_svs = [tuple(int(x) for x in p.split(","))
                   for p in parts[1:]]
        svs: list = []
        cluster_sr(recs, svs, svt, nchr, mrs, prune, mcs)
        assert [r.svid for r in recs] == ref_svids, (svt, mcs, prune)
        mine = [(s.chr, s.svStart, s.chr2, s.svEnd, s.ciposlow,
                 s.ciposhigh, s.ciendlow, s.ciendhigh, s.srSupport,
                 s.srMapQuality, s.mapq, s.insLen, s.svt, s.id)
                for s in svs]
        assert mine == ref_svs, (svt, mcs, prune)
        n_svs += len(svs)
    assert n_svs >= 150  # corpus must actually produce cliques


def _pe_case(rng):
    """Abnormal-pair records per svt orientation (anchored at the
    rightmost read: pos > mpos for intra-chromosomal pairs, like
    shortpe.h builds them), clustered + noise, sorted."""
    svt = rng.choice([0, 1, 2, 2, 3, 5, 6, 7, 8])
    median, mad = 500, 30
    maxisize = median + 5 * mad
    recs = []
    for _ in range(rng.randint(1, 5)):
        left = rng.randint(2000, 400000)
        span = rng.randint(300, 15000)
        for _ in range(rng.randint(1, 7)):
            j1 = rng.randint(-120, 120)
            j2 = rng.randint(-120, 120)
            if svt >= 5:
                recs.append(BamAlignRecord(
                    tid=0, pos=left + j1, mtid=1,
                    mpos=rng.randint(2000, 400000) + j2, alen=150,
                    malen=150, median=median, mad=mad,
                    maxNormalISize=maxisize, flag=0,
                    mapQuality=rng.randint(10, 60)))
            else:
                recs.append(BamAlignRecord(
                    tid=0, pos=left + span + j2, mtid=0, mpos=left + j1,
                    alen=150, malen=150, median=median, mad=mad,
                    maxNormalISize=maxisize, flag=0,
                    mapQuality=rng.randint(10, 60)))
    for _ in range(rng.randint(0, 8)):  # noise pairs
        p = rng.randint(2000, 420000)
        recs.append(BamAlignRecord(
            tid=0, pos=p + rng.randint(300, 20000),
            mtid=1 if svt >= 5 else 0, mpos=p, alen=150, malen=150,
            median=median, mad=mad, maxNormalISize=maxisize, flag=0,
            mapQuality=rng.randint(10, 60)))
    recs.sort(key=lambda r: r.sort_key())
    varisize = rng.choice([4 * mad, maxisize])
    return svt, varisize, rng.choice([2, 3]), rng.choice([5, 1000]), recs


def test_cluster_pe_matches_reference(oracle):
    rng = random.Random(5252)
    cases = [_pe_case(rng) for _ in range(150)]
    lines = []
    for svt, varisize, mcs, prune, recs in cases:
        toks = " ".join(
            f"{r.tid},{r.pos},{r.mtid},{r.mpos},{r.alen},{r.malen},"
            f"{r.median},{r.mad},{r.maxNormalISize},{r.flag},"
            f"{r.mapQuality}" for r in recs)
        lines.append(f"CLUSTERPE {svt} {varisize} {mcs} {prune} "
                     f"{len(recs)} {toks}")
    n_svs = 0
    for (svt, varisize, mcs, prune, recs), out in zip(cases,
                                                      oracle(lines)):
        parts = out.split("|")
        ref_svs = [tuple(int(x) for x in p.split(","))
                   for p in parts[1:]]
        svs: list = []
        cluster_pe(recs, svs, varisize, svt, prune, mcs)
        mine = [(s.chr, s.svStart, s.chr2, s.svEnd, s.ciposlow,
                 s.ciposhigh, s.ciendlow, s.ciendhigh, s.peSupport,
                 s.peMapQuality, s.mapq, s.svt) for s in svs]
        assert mine == ref_svs, (svt, varisize, mcs, prune)
        n_svs += len(svs)
    assert n_svs >= 100
