"""Differential validation against the REFERENCE edlib, actually
executing (round-2 VERDICT next-round #2).

The reference vendors edlib (src/edlib.cpp) and the repo re-implements
its semantics from scratch (ops/edist.py + native edist_scan /
edist_scan_last / edist_path_banded / edist_many). The reference binary
as a whole cannot be built in this image (no boost, empty htslib
submodule), but edlib.cpp compiles standalone with g++ alone — so this
module compiles it as a live oracle (tests/edlib_probe.cpp) and fuzzes
the repo's entire edit-distance/alignment plane against it:

- >=10k randomized + adversarial cases across NW/SHW/HW,
  DISTANCE/LOC/PATH, custom equality pairs and k-cutoffs;
- asserted bit-equal: distance, leftmost optimal end location, HW
  start location (the reversed-SHW "last position" rule,
  edlib.cpp:244-255), and the full PATH op string (the traceback
  preference order);
- the batched device/native distance kernels are checked on the same
  corpus.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from delly_tpu.ops.edist import (
    MODE_HW, MODE_NW, MODE_SHW, align, batched_pairs_distance,
    edit_distance, equality_matrix, infix_start,
)

REF_EDLIB = "/root/reference/src/edlib.cpp"
PROBE_SRC = os.path.join(os.path.dirname(__file__), "edlib_probe.cpp")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("g++") is None or not os.path.isfile(REF_EDLIB):
        pytest.skip("g++ or reference edlib.cpp unavailable")
    from probeutil import cached_probe
    exe = cached_probe(["g++", "-O2", "-std=c++17", "-I", os.path.dirname(REF_EDLIB),
         PROBE_SRC, REF_EDLIB])

    def run(cases):
        """cases: list of (mode, task, k, qbytes, tbytes, eqpairs).
        Returns list of (status, dist, ends|None, starts|None,
        aln|None)."""
        lines = []
        for mode, task, k, q, t, eq in cases:
            eqb = b"".join(bytes(p) for p in eq)
            lines.append(
                f"{mode} {task} {k} {q.hex() or '-'} {t.hex() or '-'} "
                f"{eqb.hex() or '-'}")
        out = subprocess.run(
            [exe], input="\n".join(lines) + "\n", text=True,
            capture_output=True, check=True).stdout.splitlines()
        assert len(out) == len(cases)
        parsed = []
        for ln in out:
            st, dist, ends, starts, aln = ln.split()
            parsed.append((
                int(st), int(dist),
                None if ends == "-" else
                [int(x) for x in ends.split(",")],
                None if starts == "-" else
                [int(x) for x in starts.split(",")],
                None if aln == "-" else np.frombuffer(
                    bytes.fromhex(aln), dtype=np.uint8)))
        return parsed

    return run


def _rand_seq(rng, alphabet: bytes, lo: int, hi: int) -> bytes:
    n = int(rng.integers(lo, hi + 1))
    return bytes(alphabet[i] for i in rng.integers(0, len(alphabet),
                                                   size=n))


def _corpus(rng, n_random: int):
    """(mode, k, q, t, eqpairs) case mix: random lengths with emphasis
    on Myers word boundaries, adversarial tie/repeat structures, custom
    equality pairs, k-cutoffs, empty sequences."""
    alphabets = [b"ACGT", b"ACGTN", b"AB", b"AC",
                 bytes(range(33, 127))]
    iupac = [(78, 65), (78, 67), (78, 71), (78, 84)]  # N=A/C/G/T
    cases = []
    for _ in range(n_random):
        mode = int(rng.integers(0, 3))
        alpha = alphabets[int(rng.integers(0, len(alphabets)))]
        # lengths clustered around the 64-bit Myers word boundaries
        pick = rng.random()
        if pick < 0.3:
            lo, hi = 1, 40
        elif pick < 0.6:
            lo, hi = 55, 75
        elif pick < 0.8:
            lo, hi = 120, 140
        else:
            lo, hi = 1, 300
        q = _rand_seq(rng, alpha, lo, hi)
        t = _rand_seq(rng, alpha, 1, max(2 * hi, 60))
        eq = iupac if rng.random() < 0.15 else []
        k = -1
        if rng.random() < 0.2:
            k = int(rng.integers(0, max(len(q), len(t)) + 2))
        cases.append((mode, k, q, t, eq))
    # adversarial block
    for mode in (MODE_NW, MODE_SHW, MODE_HW):
        cases += [
            (mode, -1, b"", b"ACGT", []),
            (mode, -1, b"ACGT", b"", []),
            (mode, -1, b"", b"", []),
            (mode, 0, b"", b"AC", []),       # empty ignores k in edlib
            (mode, 2, b"ACGT", b"", []),
            (mode, -1, b"AAAA", b"TTTT", []),   # all-insertions tie
            (mode, -1, b"AAAAAAAA", b"TT", []),
            (mode, -1, b"A" * 64, b"A" * 64, []),
            (mode, -1, b"A" * 65, b"A" * 63, []),
            (mode, -1, b"ACGT" * 32, b"ACGT" * 40, []),  # periodic ties
            (mode, -1, b"AC" * 50, b"CA" * 50, []),
            (mode, -1, b"ACGT", b"ACGT", []),
            (mode, 0, b"ACGT", b"ACGT", []),
            (mode, 1, b"ACGTACGT", b"TTTTTTTT", []),  # dist >> k
            (mode, -1, b"N" * 10, b"ACGTACGTAC", iupac),
            (mode, -1, b"ANGT", b"ACGTACGT", iupac),
            (mode, -1, b"\x00\xff!~", b"!~\x00\xff\x00", []),
        ]
    return cases


def _eqm(eq):
    return None if not eq else equality_matrix(
        [(chr(a), chr(b)) for a, b in eq])


def test_distance_and_end_locations_vs_edlib(oracle):
    rng = np.random.default_rng(2024)
    cases = _corpus(rng, 6000)
    want = oracle([(m, 0, k, q, t, eq) for m, k, q, t, eq in cases])
    for (mode, k, q, t, eq), (st, dist, ends, _s, _a) in zip(cases, want):
        assert st == 0
        qa = np.frombuffer(q, dtype=np.uint8)
        ta = np.frombuffer(t, dtype=np.uint8)
        got_d, got_e = edit_distance(qa, ta, mode, k=k, eq=_eqm(eq))
        ctx = (mode, k, q, t, eq)
        if dist == -1:
            assert got_d == -1, ctx
            continue
        assert got_d == dist, ctx
        assert ends == sorted(ends), ctx  # edlib reports ascending
        assert got_e == ends[0], ctx      # leftmost optimum


def test_path_start_and_ops_vs_edlib(oracle):
    rng = np.random.default_rng(77)
    cases = _corpus(rng, 2500)
    want = oracle([(m, 2, k, q, t, eq) for m, k, q, t, eq in cases])
    n_path = 0
    for (mode, k, q, t, eq), (st, dist, ends, starts, aln) in zip(
            cases, want):
        assert st == 0
        qa = np.frombuffer(q, dtype=np.uint8)
        ta = np.frombuffer(t, dtype=np.uint8)
        got_d, got_e, got_ops = align(qa, ta, mode, k=k, eq=_eqm(eq))
        ctx = (mode, k, q, t, eq)
        if dist == -1:
            assert got_d == -1, ctx
            continue
        assert got_d == dist, ctx
        assert got_e == ends[0], ctx
        if aln is None:
            # edlib skips the PATH stage for empty sequences; the repo
            # still emits the trivial op string — only compare lengths
            # via the distance, which already matched
            continue
        n_path += 1
        np.testing.assert_array_equal(got_ops, aln, err_msg=str(ctx))
        if mode == MODE_HW:
            assert infix_start(got_ops, got_e) == starts[0], ctx
        elif starts is not None:
            assert starts[0] == 0, ctx
    assert n_path > 2000  # the PATH comparison must not be vacuous


def _mutate(rng, seq: bytes, rate: float) -> bytes:
    out = bytearray(seq)
    i = 0
    res = bytearray()
    letters = b"ACGT"
    while i < len(out):
        r = rng.random()
        if r < rate / 3:
            res.append(letters[int(rng.integers(0, 4))])  # sub
            i += 1
        elif r < 2 * rate / 3:
            i += 1                                        # del
        elif r < rate:
            res.append(letters[int(rng.integers(0, 4))])  # ins
        else:
            res.append(out[i])
            i += 1
    return bytes(res) if res else b"A"


def test_long_read_regime_path_vs_edlib(oracle):
    """The lr consensus/probe regime: kb-scale sequences at 1-5%
    divergence, where align() routes through the native Ukkonen-banded
    path DP (edist_path_banded) and the reversed-SHW start rule —
    checked against real edlib PATH output."""
    rng = np.random.default_rng(4242)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    cases = []
    for _ in range(60):
        n = int(rng.integers(1500, 5000))
        t = bytes(letters[rng.integers(0, 4, size=n)])
        rate = float(rng.choice([0.01, 0.02, 0.05]))
        mode = int(rng.integers(0, 3))
        if mode == MODE_HW:
            # infix query inside a longer target
            lo = int(rng.integers(0, n // 3))
            hi = int(rng.integers(2 * n // 3, n))
            q = _mutate(rng, t[lo:hi], rate)
        else:
            q = _mutate(rng, t, rate)
        # some cases with IUPAC equality pairs and N-sprinkled queries
        # (the Hirschberg columns must honor custom equality too)
        eq = []
        if rng.random() < 0.25:
            eq = [(78, 65), (78, 67), (78, 71), (78, 84)]
            qa = bytearray(q)
            for _ in range(max(1, len(qa) // 200)):
                qa[int(rng.integers(0, len(qa)))] = 78
            q = bytes(qa)
        cases.append((mode, -1, q, t, eq))
    want = oracle([(m, 2, k, q, t, eq) for m, k, q, t, eq in cases])
    for (mode, k, q, t, eq), (st, dist, ends, starts, aln) in zip(
            cases, want):
        assert st == 0 and dist >= 0
        qa = np.frombuffer(q, dtype=np.uint8)
        ta = np.frombuffer(t, dtype=np.uint8)
        got_d, got_e, got_ops = align(qa, ta, mode, eq=_eqm(eq))
        ctx = (mode, len(q), len(t), dist, bool(eq))
        assert got_d == dist, ctx
        assert got_e == ends[0], ctx
        np.testing.assert_array_equal(got_ops, aln, err_msg=str(ctx))
        if mode == MODE_HW:
            assert infix_start(got_ops, got_e) == starts[0], ctx


def test_batched_distance_kernels_vs_edlib(oracle):
    """The batched device/native DISTANCE kernel (the genotyping hot
    loop) against the oracle on exact-equality cases."""
    rng = np.random.default_rng(5150)
    per_mode = {MODE_NW: [], MODE_SHW: [], MODE_HW: []}
    for _ in range(2000):
        mode = int(rng.integers(0, 3))
        q = _rand_seq(rng, b"ACGT", 1, 150)
        t = _rand_seq(rng, b"ACGT", 1, 250)
        per_mode[mode].append((q, t))
    for mode, pairs in per_mode.items():
        want = oracle([(mode, 0, -1, q, t, []) for q, t in pairs])
        got = batched_pairs_distance(
            [(q.decode(), t.decode()) for q, t in pairs], mode)
        for (q, t), (st, dist, _e, _s, _a), g in zip(pairs, want, got):
            assert st == 0 and int(g) == dist, (mode, q, t)
