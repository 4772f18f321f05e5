"""Clustering and breakpoint-refinement property tests."""

import numpy as np
import pytest

from delly_tpu.models.cluster import cluster_sr
from delly_tpu.ops.gotoh import DnaScore, align_to_strings, gotoh
from delly_tpu.ops.needle import GAP, long_needle, longest_homology
from delly_tpu.utils.tags import SRBamRecord


# Seeds are spread out because consecutive ids are treated as READ1/READ2
# of one fragment by the clique counter (cluster.h:288-298).
def _sr(pos, pos2, seed, qual=60, inslen=0):
    return SRBamRecord(0, pos, 0, pos2, pos - 100, 50, qual, inslen, seed)


def test_cluster_sr_two_loci():
    """Reads near two distinct deletions form two cliques."""
    br = []
    for k in range(5):
        br.append(_sr(1000 + k, 5000 + k, seed=10 * k + 5))
    for k in range(4):
        br.append(_sr(20000 + k, 26000 + k, seed=1000 + 10 * k))
    br.sort(key=lambda r: r.sort_key())
    svs = []
    cluster_sr(br, svs, svt=2, nchr=1, max_read_sep=40,
               graph_pruning=1000, min_clique_size=2)
    assert len(svs) == 2
    starts = sorted(sv.svStart for sv in svs)
    assert abs(starts[0] - 1002) <= 5
    assert abs(starts[1] - 20001) <= 5
    sup = sorted(sv.srSupport for sv in svs)
    assert sup == [4, 5]
    # every clustered read got its svid assigned
    assert all(r.svid != -1 for r in br)


def test_cluster_sr_min_clique_size_gate():
    br = [_sr(1000, 5000, seed=0)]
    svs = []
    cluster_sr(br, svs, svt=2, nchr=1, max_read_sep=40,
               graph_pruning=1000, min_clique_size=2)
    assert svs == []  # singleton below minCliqueSize


def test_cluster_sr_far_reads_not_merged():
    br = [_sr(1000, 5000, seed=0), _sr(1500, 5500, seed=1)]
    br.sort(key=lambda r: r.sort_key())
    svs = []
    cluster_sr(br, svs, svt=2, nchr=1, max_read_sep=40,
               graph_pruning=1000, min_clique_size=2)
    assert svs == []  # 500bp apart > maxReadSep wiggle


def test_gotoh_affine_vs_simple():
    score, merged = gotoh("ACGTACGT", "ACGTACGT")
    assert score == 8 * 5  # all matches at +5
    rows = align_to_strings(merged)
    assert rows[0] == rows[1] == "ACGTACGT"
    # one long gap should cost go + k*ge, not k*(go+ge)
    score2, merged2 = gotoh("ACGTACGT", "ACGT")
    sc = DnaScore()
    assert score2 == 4 * sc.match + sc.go + 4 * sc.ge


def test_longest_homology():
    # identical prefixes: homology extends to threshold
    assert longest_homology("AAAATTTT", "AAAACCCC", -2) >= 4
    assert longest_homology("GGGG", "CCCC", -1) <= 1


def test_long_needle_finds_deletion_split():
    rng = np.random.default_rng(7)
    left = "".join(rng.choice(list("ACGT"), 300))
    deleted = "".join(rng.choice(list("ACGT"), 500))
    right = "".join(rng.choice(list("ACGT"), 300))
    probe = left + deleted + right  # reference junction probe
    consensus = left + right        # read consensus spanning the DEL
    aln = long_needle(consensus, probe)
    assert aln is not None
    # the reference row must contain a ~500bp gap in the consensus row
    cons_row = aln[0]
    gap_run = 0
    best_run = 0
    for ch in cons_row:
        if ch == GAP:
            gap_run += 1
            best_run = max(best_run, gap_run)
        else:
            gap_run = 0
    assert abs(best_run - 500) <= 10


def test_long_needle_no_split_for_perfect_match():
    rng = np.random.default_rng(8)
    s = "".join(rng.choice(list("ACGT"), 400))
    assert long_needle(s, s) is None  # no split beats the full alignment


def test_merge_sort_augment_does_not_break_window_scan():
    """shortpe.h:536-621 exact semantics: the lower_bound runs on LIVE
    record keys, so an earlier augmentation that moved a PE record's
    svStart below the window makes later searches land PAST it — the
    genuine later match is still augmented, no duplicate appended."""
    from delly_tpu.models.sr import merge_sort
    from delly_tpu.utils.tags import StructuralVariantRecord as SV

    pe = [
        SV(chr=0, svStart=1000, chr2=0, svEnd=5000, ciposlow=-900,
           ciposhigh=900, ciendlow=-900, ciendhigh=900, svt=2,
           peSupport=4, precise=False),
        SV(chr=0, svStart=1400, chr2=0, svEnd=5400, ciposlow=-300,
           ciposhigh=300, ciendlow=-300, ciendhigh=300, svt=2,
           peSupport=3, precise=False),
    ]
    sr = [
        # processed first (sorted): augments pe[0], moving it to 600 —
        # 740bp away from the next SR record's svStart
        SV(chr=0, svStart=600, chr2=0, svEnd=4800, svt=2, srSupport=5,
           srAlignQuality=0.9, precise=True, consensus="ACGT"),
        SV(chr=0, svStart=1340, chr2=0, svEnd=5380, svt=2, srSupport=6,
           srAlignQuality=0.9, precise=True, consensus="TTTT"),
    ]
    merge_sort(pe, sr)
    # both PE records augmented in place; no SR-only duplicate appended
    assert len(pe) == 2, [(s.svStart, s.precise) for s in pe]
    assert all(s.precise for s in pe)
    starts = sorted(s.svStart for s in pe)
    assert starts == [600, 1340]


def test_revcomp_reference_quirk():
    """util.h:549-563 mutates in place: non-ACGTN characters keep the
    ORIGINAL character at the ORIGINAL position (un-reversed, original
    case); everything else is the uppercased reverse complement."""
    from delly_tpu.utils.tags import revcomp
    assert revcomp("ACGT") == "ACGT"
    assert revcomp("AACG") == "CGTT"
    assert revcomp("acgt") == "ACGT"
    # "ARCT" reversed is "TCRA"; out[i] = comp(rev[i]) for ACGTN,
    # else the ORIGINAL char at i: A G <orig C> T
    assert revcomp("ARCT") == "AGCT"
