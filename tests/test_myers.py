"""Myers bit-parallel kernel tests (pure-JAX backend; the Pallas TPU
kernel shares the packing and column math and is validated on-device by
bench.py's oracle spot-check)."""

import numpy as np
import pytest

from delly_tpu.ops.edist import MODE_HW, MODE_NW, MODE_SHW, edit_distance
from delly_tpu.ops.myers import batched_edit_distance_myers, encode_batch

LETTERS = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _random_case(rng, b, m, n):
    q = LETTERS[rng.integers(0, 5, size=(b, m))]
    t = LETTERS[rng.integers(0, 5, size=(b, n))]
    ql = rng.integers(1, m + 1, size=b).astype(np.int32)
    tl = rng.integers(0, n + 1, size=b).astype(np.int32)
    return q, ql, t, tl


@pytest.mark.parametrize("m,n", [(10, 20), (33, 50), (64, 96), (100, 70)])
@pytest.mark.parametrize("mode", [MODE_NW, MODE_SHW, MODE_HW])
def test_myers_matches_oracle(m, n, mode):
    rng = np.random.default_rng(m * 100 + n + mode)
    q, ql, t, tl = _random_case(rng, 32, m, n)
    got = np.asarray(batched_edit_distance_myers(q, ql, t, tl, mode))
    want = np.array([
        edit_distance(q[i, :ql[i]].tobytes().decode(),
                      t[i, :tl[i]].tobytes().decode(), mode)[0]
        for i in range(32)])
    assert (got == want).all()


def test_encode_batch_bit_layout():
    q = np.frombuffer(b"ACGTACGT", dtype=np.uint8).reshape(1, 8)
    t = np.frombuffer(b"AAAA", dtype=np.uint8).reshape(1, 4)
    peq, tcodes, ql, tl = encode_batch(q, [8], t, [4])
    # alphabet sorted by byte: A<C<G<T -> codes 0..3
    assert peq.shape[0] == 4
    # A occurs at query positions 0 and 4 -> bits 0b10001
    assert peq[0, 0, 0] == 0b10001
    assert peq[1, 0, 0] == 0b100010  # C at 1, 5
    assert (tcodes == 0).all()


def test_encode_respects_qlen_mask():
    q = np.frombuffer(b"AAAAAAAA", dtype=np.uint8).reshape(1, 8)
    t = np.frombuffer(b"AA", dtype=np.uint8).reshape(1, 2)
    peq, _, _, _ = encode_batch(q, [3], t, [2])
    assert peq[0, 0, 0] == 0b111  # only the first 3 positions


def test_large_alphabet_falls_back():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 256, size=(4, 10), dtype=np.uint8)
    t = rng.integers(0, 256, size=(4, 12), dtype=np.uint8)
    assert encode_batch(q, [10] * 4, t, [12] * 4) is None
    ql = np.full(4, 10, np.int32)
    tl = np.full(4, 12, np.int32)
    got = np.asarray(batched_edit_distance_myers(q, ql, t, tl, MODE_NW))
    want = np.array([
        edit_distance(q[i], t[i], MODE_NW)[0] for i in range(4)])
    assert (got == want).all()


def test_pallas_pipeline_cache_bounded(monkeypatch):
    """Compile-churn guard (coverage.h batch genotyping jobs arrive in
    arbitrary sizes per chromosome): the padded dims AND the batch tile
    count must be bucketed so the Pallas pipeline cache and each
    pipeline's traced-shape set stay O(log) in the input variety."""
    from delly_tpu.ops import edist
    from delly_tpu.ops import myers_pallas as mp

    made = []          # pipeline compile keys
    shapes = set()     # padded (gp, m, n) batch shapes entering jit

    def fake_make_pipeline(nalpha, w, m, n, mode, interpret):
        made.append((nalpha, w, m, n, mode))

        def run(q, t, ql, tl, letters):
            shapes.add((q.shape[0], q.shape[1], t.shape[1]))
            return np.zeros(q.shape[0], dtype=np.int32)

        return run

    monkeypatch.setattr(mp, "_make_pipeline", fake_make_pipeline)
    monkeypatch.setattr(mp, "_cache", {})
    # route batched_pairs_distance through the pallas path regardless of
    # backend
    monkeypatch.setattr(edist, "_use_pallas", True)

    rng = np.random.default_rng(7)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    for _ in range(40):
        nb = int(rng.integers(1, 9000))
        m = int(rng.integers(8, 500))
        n = int(rng.integers(8, 900))
        qs = letters[rng.integers(0, 4, size=(2, m))]
        ts = letters[rng.integers(0, 4, size=(2, n))]
        pairs = [(qs[i % 2, :rng.integers(1, m + 1)].tobytes().decode(),
                  ts[i % 2, :rng.integers(1, n + 1)].tobytes().decode())
                 for i in range(nb)]
        edist.batched_pairs_distance(pairs, MODE_HW)

    monkeypatch.setattr(edist, "_use_pallas", None)
    # m buckets: 16 word-multiples <= 512; n buckets: powers of two
    # >= 128; one alphabet class, one mode -> cross-product <= 64 keys
    # no matter how many distinct raw shapes arrive.
    keys = set(made)
    assert len(keys) <= 64, keys
    for nalpha, w, m, n, mode in keys:
        assert m == 32 * w  # word-exact query dim (minimal w)
        assert n >= 128 and (n & (n - 1)) == 0  # pow2 target dim
    # batch tiles bucketed to powers of two: gp in {1,2,4,8} * TILE here
    gps = {s[0] for s in shapes}
    assert all(gp % mp.TILE == 0 and ((gp // mp.TILE) &
               (gp // mp.TILE - 1)) == 0 for gp in gps), gps
    assert len(gps) <= 5, gps
