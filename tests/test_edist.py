import numpy as np
import pytest

from delly_tpu.ops.edist import (
    MODE_HW, MODE_NW, MODE_SHW, align, batched_edit_distance, edit_distance,
    infix_start,
)


def brute_nw(q, t):
    m, n = len(q), len(t)
    D = np.zeros((m + 1, n + 1), dtype=int)
    D[:, 0] = np.arange(m + 1)
    D[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D[i][j] = min(D[i - 1][j - 1] + (q[i - 1] != t[j - 1]),
                          D[i - 1][j] + 1, D[i][j - 1] + 1)
    return D


def rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.mark.parametrize("seed", range(5))
def test_host_nw_vs_brute(seed):
    rng = np.random.default_rng(seed)
    q = rand_seq(rng, int(rng.integers(1, 40)))
    t = rand_seq(rng, int(rng.integers(1, 40)))
    D = brute_nw(q, t)
    d, e = edit_distance(q, t, MODE_NW)
    assert d == D[-1, -1]
    assert e == len(t) - 1


@pytest.mark.parametrize("seed", range(5))
def test_host_hw_shw_vs_brute(seed):
    rng = np.random.default_rng(seed + 100)
    q = rand_seq(rng, int(rng.integers(1, 25)))
    t = rand_seq(rng, int(rng.integers(1, 60)))
    # HW: min over all substrings
    D = brute_nw(q, t)
    D_hw = D.copy()
    # redo with free top row
    m, n = len(q), len(t)
    D_hw[0, :] = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D_hw[i][j] = min(D_hw[i - 1][j - 1] + (q[i - 1] != t[j - 1]),
                             D_hw[i - 1][j] + 1, D_hw[i][j - 1] + 1)
        D_hw[i][0] = i
    d, e = edit_distance(q, t, MODE_HW)
    assert d == D_hw[-1].min()
    assert e == int(np.argmin(D_hw[-1])) - 1
    d, e = edit_distance(q, t, MODE_SHW)
    assert d == D[-1].min()


def test_align_path_consistency():
    rng = np.random.default_rng(7)
    for _ in range(20):
        q = rand_seq(rng, int(rng.integers(1, 30)))
        t = rand_seq(rng, int(rng.integers(1, 50)))
        for mode in (MODE_NW, MODE_SHW, MODE_HW):
            d, e, ops = align(q, t, mode)
            # ops consume full query
            q_consumed = int(np.count_nonzero(ops != 2))
            assert q_consumed == len(q)
            # edit cost along path == distance
            cost = int(np.count_nonzero(ops != 0))
            assert cost == d
            if mode == MODE_NW:
                assert int(np.count_nonzero(ops != 1)) == len(t)
            # target span covered = end - start + 1
            start = infix_start(ops, e)
            t_consumed = int(np.count_nonzero(ops != 1))
            if mode == MODE_HW:
                assert t_consumed == e - start + 1


def test_batched_device_matches_host():
    rng = np.random.default_rng(11)
    B = 17
    queries, targets = [], []
    for _ in range(B):
        queries.append(rand_seq(rng, int(rng.integers(1, 35))))
        targets.append(rand_seq(rng, int(rng.integers(1, 70))))
    from delly_tpu.ops.dna import encode_batch
    qarr, qlens = encode_batch(queries, 40)
    tarr, tlens = encode_batch(targets, 80)
    for mode in (MODE_NW, MODE_SHW, MODE_HW):
        dev = np.asarray(batched_edit_distance(qarr, qlens, tarr, tlens, mode))
        for i in range(B):
            d, _ = edit_distance(queries[i], targets[i], mode)
            assert dev[i] == d, (i, mode, queries[i], targets[i])


def test_hw_path_leftmost_start_edlib_rule():
    """edlib.cpp:244-255: the HW alignment start comes from a reversed
    SHW scan taking the LAST optimal position, so tied-start alignments
    never begin with an insertion when a mismatch start exists."""
    from delly_tpu.ops.edist import (
        EDOP_MATCH, EDOP_MISMATCH, MODE_HW, align, infix_start,
    )
    d, e, ops = align("CA", "TA", MODE_HW)
    assert (d, e) == (1, 1)
    assert ops.tolist() == [EDOP_MISMATCH, EDOP_MATCH]
    assert infix_start(ops, e) == 0


def test_native_scan_row_matches_numpy_rows():
    """The native Myers last-row scan (hostio.cpp edist_scan_row, the
    Hirschberg column engine) equals the numpy two-row DP for random
    and adversarial inputs, with and without custom equality."""
    import numpy as np
    import pytest

    from delly_tpu import native
    from delly_tpu.ops.edist import (
        MODE_NW, _last_dp_row, equality_matrix,
    )
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(31)
    letters = np.frombuffer(b"ACGTN", dtype=np.uint8)
    eqm = equality_matrix([("N", c) for c in "ACGT"])
    cases = []
    for _ in range(40):
        q = letters[rng.integers(0, 5, size=rng.integers(1, 200))]
        t = letters[rng.integers(0, 5, size=rng.integers(0, 300))]
        cases.append((q, t, None))
        cases.append((q, t, eqm))
    cases.append((letters[np.zeros(65, np.int64)],
                  letters[np.zeros(130, np.int64)], None))  # word edge
    cases.append((letters[np.zeros(64, np.int64)],
                  letters[np.ones(64, np.int64)], None))
    for q, t, eq in cases:
        eqb = None if eq is None else \
            np.ascontiguousarray(eq, dtype=np.uint8).tobytes()
        got = native.edist_scan_row(q.tobytes(), t.tobytes(), eqb)
        assert got is not None
        # numpy fallback: bypass the native fast path by inlining the
        # two-row recurrence (same code path _last_dp_row falls back to)
        n = len(t)
        prev = np.arange(n + 1, dtype=np.int32)
        rows = [prev.copy()]
        j_idx = np.arange(1, n + 1, dtype=np.int32)
        for i in range(1, len(q) + 1):
            if eq is None:
                sub = (q[i - 1] != t).astype(np.int32)
            else:
                sub = (~eq[q[i - 1], t]).astype(np.int32)
            cand = np.minimum(prev[:-1] + sub, prev[1:] + 1)
            run = np.minimum.accumulate(
                np.concatenate(([np.int32(i)], cand - j_idx)))
            cur = np.empty(n + 1, dtype=np.int32)
            cur[0] = i
            cur[1:] = np.minimum(cand, run[1:] + j_idx)
            prev = cur
        np.testing.assert_array_equal(np.asarray(got), prev,
                                      err_msg=f"{len(q)}x{n}")
