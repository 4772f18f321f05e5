"""Parity tests for the native SoA passes against their Python
fallbacks and the scalar reference implementations.

These guard the host-plane fast paths (hostio.cpp bam_cigar_stats /
bam_match_coverage / bam_base_coverage and the batch hashing) that the
sr/lr/cnv drivers now run on.
"""

import numpy as np
import pytest

from delly_tpu import native
from delly_tpu.io.bam import BamFile
from delly_tpu.models.depth import MAX_COVERAGE, add_base_coverage
from delly_tpu.models.genotype_sr import _cigar_stats
from delly_tpu.utils.hashing import (
    hash_pair, hash_pair_h, hash_sr, hash_sr_batch, hash_string,
)

EXAMPLE_BAM = "/root/reference/example/sr.bam"


@pytest.fixture(scope="module")
def bam():
    return BamFile(EXAMPLE_BAM)


@pytest.fixture(scope="module")
def sample_offsets(bam):
    ci = bam.core_index()
    # spread a few hundred records across the file
    return ci["offsets"][:: max(1, len(ci["offsets"]) // 300)]


def test_cigar_stats_native_matches_python(bam, sample_offsets):
    nat = native.bam_cigar_stats(bam._data, sample_offsets)
    assert nat is not None
    for i, off in enumerate(sample_offsets):
        rec = bam._parse_at(int(off))
        assert nat["name_hash"][i] == hash_string(rec.qname)
        assert nat["ref_span"][i] == rec.alignment_length()
        ops, lens = rec.cigar_ops, rec.cigar_lens
        lsc = int(lens[0]) if len(ops) and ops[0] == 4 else 0
        assert nat["leading_sc"][i] == lsc
        has_soft = bool((ops == 4).any())
        has_clip = has_soft or bool((ops == 5).any())
        assert bool(nat["clip_flags"][i] & 1) == has_soft
        assert bool(nat["clip_flags"][i] & 2) == has_clip
        clip = (ops == 4) | (ops == 5)
        mc = int(lens[clip].max()) if clip.any() else 0
        indel = (ops == 1) | (ops == 2)
        mi = int(lens[indel].max()) if indel.any() else 0
        assert nat["max_clip"][i] == mc
        assert nat["max_indel"][i] == mi
        lead = (int(lens[0]) if len(ops) and ops[0] in (4, 5) else 0)
        trail = (int(lens[-1]) if len(ops) and ops[-1] in (4, 5) else 0)
        assert nat["lead_clip"][i] == lead
        assert nat["trail_clip"][i] == trail


def test_cigar_stats_fnv_matches_hash_sr(bam, sample_offsets):
    st = _cigar_stats(bam, sample_offsets)
    ci = bam.core_index()
    omap = {int(o): k for k, o in enumerate(ci["offsets"])}
    flags = np.asarray([ci["flag"][omap[int(o)]] for o in sample_offsets])
    seeds = hash_sr_batch(st["name_hash"], st["fnv_hash"], flags)
    for i, off in enumerate(sample_offsets):
        rec = bam._parse_at(int(off))
        assert int(seeds[i]) == hash_sr(rec.qname, rec.flag)


def test_hash_pair_h_matches_hash_pair():
    assert (hash_pair_h(hash_string("read/1"), 0, 55, 1, 900)
            == hash_pair("read/1", 0, 55, 1, 900))


def test_match_coverage_native_matches_python(bam):
    ci = bam.core_index()
    offs = ci["offsets"][ci["tid"] == 0][:400]
    target_len = bam.header.lengths[0]
    nat = native.bam_match_coverage(bam._data, offs, target_len)
    assert nat is not None
    # scalar reference: per-record M-segment walk (coverage.h:461-476)
    ref = np.zeros(target_len, dtype=np.int64)
    for off in offs:
        rec = bam._parse_at(int(off))
        rp = 0
        for op, ol in zip(rec.cigar_ops, rec.cigar_lens):
            ol = int(ol)
            if op == 0:
                lo = rec.pos + rp
                hi = min(rec.pos + rp + ol, target_len)
                if lo < hi:
                    ref[lo:hi] += 1
                rp += ol
            elif op in (2, 3):
                rp += ol
    assert np.array_equal(np.asarray(nat), ref)


def test_base_coverage_native_matches_add_base_coverage(bam):
    ci = bam.core_index()
    offs = ci["offsets"][ci["tid"] == 0][:400]
    reflen = bam.header.lengths[0]
    mapq_uniq = 20
    nat = native.bam_base_coverage(bam._data, offs, mapq_uniq, reflen)
    assert nat is not None
    cov = np.zeros(reflen, dtype=np.uint16)
    cov_uniq = np.zeros(reflen, dtype=np.uint16)
    for off in offs:
        add_base_coverage(bam._parse_at(int(off)), cov, cov_uniq,
                          mapq_uniq, reflen)
    tot = np.minimum(nat[0], MAX_COVERAGE - 1).astype(np.uint16)
    uni = np.minimum(nat[1], MAX_COVERAGE - 1).astype(np.uint16)
    assert np.array_equal(tot, cov)
    assert np.array_equal(uni, cov_uniq)


def test_core_index_python_fallback_matches_native(bam):
    nat = bam.core_index()
    py = bam._build_index_python()
    for key in ("offsets", "tid", "pos", "flag", "mapq", "mtid", "mpos",
                "tlen", "lqseq"):
        assert np.array_equal(nat[key], py[key]), key


def test_crafted_inputs_fail_cleanly():
    """Memory-safety regressions (guard-page-verified fixes): crafted
    BGZF headers, BAM records and rANS frequency tables must return
    clean errors, not read/write out of bounds."""
    import struct

    from delly_tpu import native

    # truncated BGZF header claiming a 64KB FEXTRA area
    crafted = (b"\x1f\x8b\x08\x04" + b"\x00" * 6
               + struct.pack("<H", 0xFFFF) + b"\x00" * 6)
    assert native.bgzf_inflate(crafted) is None

    # BSIZE smaller than header+trailer (size_t underflow path)
    tiny = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 + struct.pack("<H", 6)
            + b"BC" + struct.pack("<H", 2) + struct.pack("<H", 19)
            + b"\x00" * 30)
    assert native.bgzf_inflate(tiny) is None

    # BAM record whose l_read_name/n_cigar exceed its block_size
    rec = (struct.pack("<i", 36)
           + struct.pack("<iiBBHHHiiii", 0, 100, 255, 60, 0, 0xFFFF,
                         0, 4, -1, -1, 0) + b"\x00" * 4)
    offs = np.zeros(1, dtype=np.int64)
    st = native.bam_cigar_stats(rec, offs)
    assert st is None or int(st["ref_span"][0]) == 0
    assert native.bam_match_coverage(rec, offs, 1000) is not None
    assert native.bam_base_coverage(rec, offs, 20, 1000) is not None


def test_qname_hash_stops_at_nul():
    """BAM extranul qname padding must not enter the read-name hashes
    (tags.h:260-267 hash_string stops at NUL) — otherwise the same
    read seeds differently in BAM vs CRAM containers."""
    import sys
    sys.path.insert(0, "tests")
    from bamsynth import encode_record

    from delly_tpu import native
    from delly_tpu.io.bam import parse_record_at

    recs = b"".join(encode_record(q, 0, 0, 100, 60, [("M", 8)],
                                  -1, -1, 0, "ACGTACGT")
                    for q in ("ab", "abc", "abcd", "abcde"))
    offs = []
    pos = 0
    import struct as _s
    while pos < len(recs):
        offs.append(pos)
        (bs,) = _s.unpack_from("<i", recs, pos)
        pos += 4 + bs
    offs = np.asarray(offs, dtype=np.int64)
    st = native.bam_cigar_stats(recs, offs)
    for k, q in enumerate(("ab", "abc", "abcd", "abcde")):
        rec = parse_record_at(recs, int(offs[k]))
        assert rec.qname == q   # no padding NULs in the string
    # native hashes equal a direct NUL-free hash of the name
    def py_hash(s):
        h = 37
        for ch in s.encode():
            h = ((h * 54059) ^ (ch * 76963)) & 0xFFFFFFFF
        return h
    for k, q in enumerate(("ab", "abc", "abcd", "abcde")):
        assert int(st["name_hash"][k]) == py_hash(q), q
