"""Deterministic 64-bit read-name hashing.

The reference identifies reads by hash (util.h:501-542). The only semantic
requirements carried into downstream logic are:

1. ids are deterministic per qname and collision-resistant,
2. for paired-end reads, id(READ1) == id(READ2) - 1 (util.h:519-527:
   ``if (flag & BAM_FREAD1) --seed``), which the SR clique counter uses to
   count a fragment once (cluster.h:289-298).

We use the same outer recipe (hash_string combined with a hash_range over
the qname via the boost golden-ratio combine) in 64-bit arithmetic.
"""

from __future__ import annotations

import numpy as np

MASK64 = (1 << 64) - 1
_GOLD64 = np.uint64(0x9E3779B97F4A7C15)


def hash_sr_batch(name_hash, fnv_hash, flags) -> "np.ndarray":
    """Vectorized hash_sr (util.h:519-527) from the native stats pass:
    hash_combine(hash_string, fnv1a64) with READ1 getting id - 1."""
    h = name_hash.astype(np.uint64)
    seeds = h ^ (fnv_hash + _GOLD64 + (h << np.uint64(6))
                 + (h >> np.uint64(2)))
    read1 = (flags & 64) > 0
    return np.where(read1 & (seeds > 0), seeds - np.uint64(1), seeds)


def hash_lr_batch(name_hash, fnv_hash) -> "np.ndarray":
    """Vectorized hash_lr (util.h:529-542) from the native stats pass."""
    h = name_hash.astype(np.uint64)
    return h ^ (fnv_hash + _GOLD64 + (h << np.uint64(6))
                + (h >> np.uint64(2)))


def hash_string(s: str) -> int:
    """Reference tags.h:260-267 (unsigned 32-bit arithmetic)."""
    h = 37
    for ch in s.encode():
        h = ((h * 54059) ^ (ch * 76963)) & 0xFFFFFFFF
    return h


def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & MASK64
    return h


def hash_combine(seed: int, value: int) -> int:
    """boost::hash_combine golden-ratio mix (64-bit)."""
    seed ^= (value + 0x9E3779B97F4A7C15 + ((seed << 6) & MASK64) + (seed >> 2)) & MASK64
    return seed & MASK64


def hash_sr(qname: str, flag: int) -> int:
    """Short-read id (util.h:519-527): READ1 gets id - 1."""
    seed = hash_combine(hash_string(qname), _fnv1a64(qname.encode()))
    if (flag & 64) and seed > 0:  # BAM_FREAD1
        seed -= 1
    return seed


def hash_lr(qname: str) -> int:
    """Long-read id (util.h:529-542)."""
    return hash_combine(hash_string(qname), _fnv1a64(qname.encode()))


def hash_pair(qname: str, tid: int, pos: int, mtid: int, mpos: int) -> int:
    """Pair key as seen from the first read (util.h:501-508)."""
    return hash_pair_h(hash_string(qname), tid, pos, mtid, mpos)


def hash_pair_mate(qname: str, tid: int, pos: int, mtid: int, mpos: int) -> int:
    """Pair key as seen from the second read (util.h:510-517)."""
    return hash_pair_h(hash_string(qname), mtid, mpos, tid, pos)


def hash_pair_h(qhash: int, a: int, b: int, c: int, d: int) -> int:
    """Pair key from a precomputed hash_string(qname) value (the native
    bam_cigar_stats pass emits these in bulk)."""
    seed = qhash
    for v in (a, b, c, d):
        seed = hash_combine(seed, v & MASK64)
    return seed


def hash_pair_h_batch(qhash, a, b, c, d):
    """Vectorized hash_pair_h over numpy arrays (uint64 wraparound
    arithmetic matches the scalar path bit-for-bit)."""
    import numpy as np

    try:
        from delly_tpu import native
        got = native.hash_pair_h_many(qhash, a, b, c, d)
        if got is not None:
            return got
    except Exception:
        pass
    gold = np.uint64(0x9E3779B97F4A7C15)
    six = np.uint64(6)
    two = np.uint64(2)
    seed = np.asarray(qhash).astype(np.uint64)
    for v in (a, b, c, d):
        v = np.asarray(v).astype(np.int64).astype(np.uint64)
        seed = seed ^ (v + gold + (seed << six) + (seed >> two))
    return seed
