"""CNV engine tests: tracks, segmentation, GC machinery, end-to-end."""

import gzip
import subprocess
import sys

import numpy as np
import pytest

from delly_tpu.models.cnv import (
    CNV, cnv_segment, merge_adjacent_same_cn,
)
from delly_tpu.models.depth import (
    gc_content_track, set_min_chr_len, uniq_content_track,
)
from delly_tpu.models.gcbias import reg_corr_factor, smooth_fill_curve
from delly_tpu.ops.likelihood import compute_cnls


def test_gc_content_track():
    seq = "ACGTACGTAC" * 10
    gc = gc_content_track(seq, 5)
    # interior windows of width 5 over a 50% GC periodic sequence
    assert gc[:2].tolist() == [0, 0]
    assert all(2 <= v <= 3 for v in gc[2:98])
    assert gc[98] == 0 and gc[99] == 0


def test_uniq_content_track_homdel_vs_unmappable():
    n = 100
    cov = np.ones(n, dtype=np.uint16)
    uniq = np.ones(n, dtype=np.uint16)
    cov[40:60] = 0  # zero run flanked by covered bases -> hom-del, callable
    out = uniq_content_track(cov, uniq, "A" * n, 11)
    assert out[50] == 11
    # run extending to the chromosome end -> unmappable
    cov2 = np.ones(n, dtype=np.uint16)
    cov2[80:] = 0
    out2 = uniq_content_track(cov2, uniq, "A" * n, 11)
    assert out2[90] == 0


def test_set_min_chr_len():
    assert set_min_chr_len([100, 1000, 10000], 0.95) == 1000
    assert set_min_chr_len([10000, 10000], 0.4) == 10000


def test_cnv_segment_finds_step():
    rng = np.random.default_rng(0)
    y = np.concatenate([rng.normal(0, 0.05, 50), rng.normal(-1, 0.05, 30),
                        rng.normal(0, 0.05, 50)])
    bnd = cnv_segment(y, beta=0.5 * 0.05 ** 2 * np.log(130) * 100, kmin=4)
    # Use realistic beta
    bnd = cnv_segment(y, beta=3 * 0.05 ** 2 * np.log(130), kmin=4)
    assert any(abs(b - 50) <= 2 for b in bnd)
    assert any(abs(b - 80) <= 2 for b in bnd)


def test_cnv_segment_flat_no_boundaries():
    rng = np.random.default_rng(1)
    y = rng.normal(0, 0.02, 100)
    bnd = cnv_segment(y, beta=3 * 0.02 ** 2 * np.log(100), kmin=4)
    assert bnd == [] or len(bnd) <= 1


def test_merge_adjacent_same_cn():
    a = CNV(0, 0, 100, cn=1.0, mappable=1.0)
    b = CNV(0, 100, 300, cn=1.05, mappable=1.0)
    c = CNV(0, 300, 400, cn=2.0, mappable=1.0)
    out = merge_adjacent_same_cn([a, b, c], 0.25)
    assert len(out) == 2
    assert out[0].end == 300
    assert out[0].cn == pytest.approx((1.0 * 100 + 1.05 * 200) / 300)


def test_smooth_fill_curve_fills_holes():
    curve = [1.0, 0.0, 3.0]
    weight = [1.0, 0.0, 1.0]
    out = smooth_fill_curve(curve, weight)
    assert out[1] > 0  # hole filled then smoothed


def test_reg_corr_factor():
    rc = [1.0] * 101
    rc[50] = 2.0
    assert reg_corr_factor(rc, 0.5) == 2.0
    assert reg_corr_factor([], 0.5) == 1.0


def test_compute_cnls_centers_on_cn():
    gl, gq, varqual, best = compute_cnls(1.0, 0.1, 2.0)
    assert best == 1
    assert gl[1] == 0.0  # rescaled by best
    assert varqual > 0  # CN1 far from ploidy 2
    gl2, _, varqual2, best2 = compute_cnls(2.0, 0.1, 2.0)
    assert best2 == 2
    assert varqual2 <= 0


def test_compute_cnls_half_ploidy_rounds_away_from_zero():
    """boost::math::iround(c.ploidy) rounds 2.5 to 3 (half away from
    zero, bolog.h:119); Python's banker's round() would pick CN2."""
    _, _, vq_half, _ = compute_cnls(2.0, 0.5, 2.5)
    _, _, vq_cn3, _ = compute_cnls(2.0, 0.5, 3.0)
    _, _, vq_cn2, _ = compute_cnls(2.0, 0.5, 2.0)
    assert vq_half == vq_cn3
    assert vq_half != vq_cn2


def test_cnv_end_to_end_example():
    """The bundled short-read example has a het DEL -> CN~1 segment."""
    out = "/tmp/test_cnv_e2e.vcf"
    cov = "/tmp/test_cnv_e2e.cov.gz"
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "cnv",
         "-g", "/root/reference/example/ref.fa", "-o", out, "-c", cov,
         "/root/reference/example/sr.bam"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    records = [l for l in open(out) if not l.startswith("#")]
    assert len(records) >= 1
    f = records[0].split("\t")
    assert f[0] == "18"
    # CN1 segment overlapping the known DEL at 100000-108000
    assert int(f[1]) < 104000
    info = f[7]
    assert "SVTYPE=CNV" in info
    fmt = dict(zip(f[8].split(":"), f[9].split(":")))
    assert fmt["CN"] == "1"
    # coverage table exists with logR column
    head = gzip.open(cov, "rt").readline()
    assert "logR" in head


def test_sr_dump_file():
    """-d writes the SV-read dump (coverage.h:337-341,519-535,656-661)."""
    out = "/tmp/test_sr_dump.bcf"
    dump = "/tmp/test_sr_dump.gz"
    r = subprocess.run(
        [sys.executable, "-m", "delly_tpu.cli", "sr",
         "-g", "/root/reference/example/ref.fa", "-o", out, "-d", dump,
         "/root/reference/example/sr.bam"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = gzip.open(dump, "rt").read().strip().split("\n")
    assert lines[0] == ("#svid\tbam\tqname\tchr\tpos\tmatechr\tmatepos"
                       "\tmapq\ttype")
    kinds = {l.split("\t")[-1] for l in lines[1:]}
    assert kinds == {"SR", "PE"}
    assert all(l.split("\t")[0].startswith("DEL") for l in lines[1:])


def test_cnv_segment_native_matches_numpy():
    """The native PELT core returns byte-identical boundaries to the
    numpy formulation (double math, FP contraction disabled)."""
    import numpy as np

    from delly_tpu import native
    from delly_tpu.models import cnv as cnvmod

    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(23)
    for trial in range(25):
        n = int(rng.integers(8, 4000))
        y = rng.normal(0, 0.3, n)
        # implant steps
        for _ in range(int(rng.integers(0, 5))):
            a = int(rng.integers(0, n))
            b = min(n, a + int(rng.integers(10, 400)))
            y[a:b] += rng.normal(0, 1.5)
        beta = float(rng.uniform(0.5, 8.0))
        native_b = native.cnv_segment_core(y, beta, 4)
        # numpy path (bypass the native dispatch)
        orig = native.cnv_segment_core
        native.cnv_segment_core = lambda *a: None
        try:
            numpy_b = cnvmod.cnv_segment(y, beta, 4)
        finally:
            native.cnv_segment_core = orig
        assert native_b == numpy_b, (trial, native_b, numpy_b)


def test_native_cov_rows_byte_identical():
    """Native covfile row rendering (hostio.cpp cov_rows) matches the
    Python f-string loop byte-for-byte, including %g edge cases."""
    import numpy as np

    from delly_tpu import native

    if native.get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    nw = 5000
    start = (np.arange(nw, dtype=np.int64) * 997) % (1 << 31)
    end = start + rng.integers(1, 100000, nw)
    uniq = np.where(rng.random(nw) < 0.1, -1.0, rng.random(nw))
    logr = rng.normal(size=nw) * 3
    cn = np.abs(rng.normal(size=nw) * 2)
    # %g regimes: integers, tiny, huge, inf, nan
    logr[0], logr[1], logr[2], logr[3] = 0.0, 1e-7, 1e20, -0.0
    cn[4], cn[5] = np.inf, np.nan
    cn[6] = 2.0
    na = (rng.random(nw) < 0.2).astype(np.uint8)
    na[4] = na[5] = 0
    got = native.cov_rows("chr7", start, end, uniq, logr, cn, na)
    rows = []
    for i in range(nw):
        if na[i]:
            rows.append(f"chr7\t{start[i]}\t{end[i]}\t{uniq[i]:g}"
                        f"\tNA\tNA\n")
        else:
            rows.append(f"chr7\t{start[i]}\t{end[i]}\t{uniq[i]:g}\t"
                        f"{logr[i]:g}\t{cn[i]:g}\n")
    assert got == "".join(rows)
