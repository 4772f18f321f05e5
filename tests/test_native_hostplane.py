"""Unit regressions for the late-round-4 native host-plane kernels.

Each function here replaced a numpy formulation that remains in the
code as the fallback path, so every test is a differential check of
native vs numpy on the same inputs — including the exact failure
shapes that the adversarial corpus caught during development
(float insert-size cutoff, scalar-tid broadcast, 64-bit LCS word
boundaries, BGZF block-boundary range reads).
"""

import os
import random
import struct

import numpy as np
import pytest

from delly_tpu import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")

EXAMPLE = "/root/reference/example"


def _no_native(monkeypatch):
    monkeypatch.setattr(native, "get_lib", lambda: None)


# ---------------------------------------------------------------- lcs


def test_lcs_many_matches_numpy_dp(monkeypatch):
    from delly_tpu.ops.msa import _lcs_host_batch, lcs
    rng = random.Random(99)
    pairs = []
    for _ in range(300):
        m = rng.randint(0, 200)
        n = rng.randint(0, 200)
        pairs.append(("".join(rng.choice("ACGTN") for _ in range(m)),
                      "".join(rng.choice("ACGTN") for _ in range(n))))
    # 64-bit word boundaries on the b side (the bit-vector side)
    for n in (63, 64, 65, 127, 128, 129, 191, 192, 1, 0):
        pairs.append(("".join(rng.choice("ACGT") for _ in range(80)),
                      "".join(rng.choice("ACGT") for _ in range(n))))
    out = _lcs_host_batch(pairs)
    ref = np.asarray([lcs(a, b) for a, b in pairs])
    assert np.array_equal(out, ref)


# -------------------------------------------------------------- gotoh


def test_gotoh_core_matches_numpy_dp(monkeypatch):
    import delly_tpu.ops.gotoh as G
    rng = random.Random(5)

    def rs(n):
        return "".join(rng.choice("ACGTN") for _ in range(n))

    for trial in range(60):
        m = rng.randint(1, 60)
        n = rng.randint(1, 60)
        a1 = G.to_align(rs(m))
        if trial % 3 == 0:
            rows = rng.randint(2, 4)
            arr = np.frombuffer(
                ("".join(rng.choice("ACGT-")
                         for _ in range(m * rows))).encode(),
                np.uint8).reshape(rows, m).copy()
            a1 = arr
        a2 = G.to_align(rs(n))
        ac = (rng.random() < 0.5, rng.random() < 0.5)
        s1, al1 = G.gotoh(a1, a2, ac)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(native, "get_lib", lambda: None)
            s2, al2 = G.gotoh(a1, a2, ac)
        assert s1 == s2 and np.array_equal(al1, al2), (trial, ac)


# -------------------------------------------------------------- isize


def _isize_both(monkeypatch, *args):
    import delly_tpu.utils.tags as T
    o1 = T.isize_mapping_pos_batch(*args)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(native, "get_lib", lambda: None)
        o2 = T.isize_mapping_pos_batch(*args)
    return o1, o2


def test_isize_float_cutoff_boundary(monkeypatch):
    """Regression: a truncated cutoff reclassified |tlen| inside the
    fractional gap as a DUP-type signal (caught by the svmix recall
    drop)."""
    a = lambda v: np.array(v, np.int32)  # noqa: E731
    # both rows are orientation 2 (FR pairs) with |tlen| = 787 exactly
    # inside the fractional gap below cutoff 787.5
    o1, o2 = _isize_both(
        monkeypatch, a([99, 147]), a([0, 0]), a([100, 326]), a([0, 0]),
        a([600, 26]), a([787, -787]), 787.5)
    assert np.array_equal(o1, o2)
    assert list(o1) == [-1, -1]


def test_isize_scalar_tid_broadcast(monkeypatch):
    """Regression: callers pass tid as a scalar ref_index;
    ascontiguousarray promotes it to shape (1,), so the length — not
    ndim — must trigger broadcasting (caught by the BND orientation
    corpus: rows past index 0 read garbage tids and became
    translocations)."""
    a = lambda v: np.array(v, np.int32)  # noqa: E731
    flag = a([99, 147, 163])
    pos = a([323, 326, 1000])
    mtid = a([0, 0, 2])
    mpos = a([623, 26, 500])
    tlen = a([400, -400, 0])
    o1, o2 = _isize_both(monkeypatch, flag, np.int64(0), pos, mtid,
                         mpos, tlen, 500.0)
    assert np.array_equal(o1, o2)
    # empty batch + scalar tid must not fail either
    o1, o2 = _isize_both(monkeypatch, a([]), np.int64(0), a([]), a([]),
                         a([]), a([]), 500.0)
    assert len(o1) == 0 and len(o2) == 0


def test_isize_random_parity(monkeypatch):
    rng = np.random.default_rng(17)
    n = 20000
    args = (rng.integers(0, 4096, n).astype(np.int32),
            rng.integers(0, 4, n).astype(np.int32),
            rng.integers(0, 10**6, n).astype(np.int32),
            rng.integers(-1, 4, n).astype(np.int32),
            rng.integers(-1, 10**6, n).astype(np.int32),
            rng.integers(-40000, 40000, n).astype(np.int32))
    for cutoff in (613.25, 500):
        o1, o2 = _isize_both(monkeypatch, *args, cutoff)
        assert np.array_equal(o1, o2)


# --------------------------------------------------------------- bgzf


def test_bgzf_range_reads_byte_identical():
    from delly_tpu.io.bgzf import BgzfReader, _block_size_at, \
        bgzf_decompress
    path = os.path.join(EXAMPLE, "sr.bam")
    if not os.path.isfile(path):
        pytest.skip("bundled example unavailable")
    full = bgzf_decompress(open(path, "rb").read())
    fh = open(path, "rb")
    blocks = []  # (coffset, uoffset_base, isize)
    co = uoff = 0
    while True:
        sz = _block_size_at(fh, co)
        if sz <= 0:
            break
        fh.seek(co + sz - 4)
        isize = struct.unpack("<I", fh.read(4))[0]
        blocks.append((co, uoff, isize))
        uoff += isize
        co += sz
    fh.close()
    r = BgzfReader(path)
    rnd = random.Random(41)
    checked = 0
    for _ in range(120):
        i = rnd.randrange(len(blocks))
        j = rnd.randrange(i, len(blocks))
        cb, ub_base, isz_i = blocks[i]
        ce, ue_base, isz_j = blocks[j]
        ub = rnd.randrange(0, max(1, isz_i))
        ue = rnd.randrange(0, max(1, isz_j + 1))
        if (ue_base + ue) < (ub_base + ub):
            continue
        got = r.read_voffset_range((cb << 16) | ub, (ce << 16) | ue)
        assert got == full[ub_base + ub:ue_base + ue]
        checked += 1
    # block-boundary end (uoffset 0 of a later block)
    cb, ub_base, isz_i = blocks[0]
    ce, ue_base, _ = blocks[min(2, len(blocks) - 1)]
    got = r.read_voffset_range((cb << 16) | 5, ce << 16)
    assert got == full[ub_base + 5:ue_base]
    r.close()
    assert checked > 60


def test_bam_count_matches_scan():
    from delly_tpu.io.bam import BamFile
    path = os.path.join(EXAMPLE, "sr.bam")
    if not os.path.isfile(path):
        pytest.skip("bundled example unavailable")
    with BamFile(path) as bf:
        total = 0
        for tid in range(bf.header.n_targets):
            view = bf.chrom(tid)
            n = len(view["offsets"])
            total += n
            # exact-fit columns: every SoA column sized to the count
            for k in ("tid", "pos", "flag", "mapq"):
                assert len(view[k]) == n
        assert total > 0
