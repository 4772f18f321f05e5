"""Property tests: the vectorized mate-pair automaton vs scalar
oracles that replay the reference's dict semantics literally
(store/overwrite/pop + _firstPairObs seen-set, tags.h:269-274)."""

import random

import numpy as np

from delly_tpu.models.pairing import (
    first_obs_mask, match_store_pop, saturating_midpoint_counts,
)


def _scalar_first(pos, uncond, eqm, check, add):
    n = len(pos)
    first = [False] * n
    seen = set()
    last_pos = -1
    for i in range(n):
        p = int(pos[i])
        if p > last_pos:
            seen.clear()
            last_pos = p
        if uncond[i]:
            first[i] = True
        elif eqm[i]:
            first[i] = int(check[i]) not in seen
        if first[i]:
            seen.add(int(add[i]))
    return np.asarray(first)


def _scalar_match(keys, first):
    store = {}
    S, F = [], []
    for i in range(len(keys)):
        k = int(keys[i])
        if first[i]:
            store[k] = i
        else:
            j = store.pop(k, None)
            if j is not None:
                S.append(i)
                F.append(j)
    return np.asarray(S, dtype=np.int64), np.asarray(F, dtype=np.int64)


def _random_case(rng, n, val_space, same_pos_frac=0.3):
    pos = np.sort(rng.integers(0, n // 2, size=n)).astype(np.int64)
    check = rng.integers(0, val_space, size=n).astype(np.uint64)
    mpos = pos + rng.integers(-5, 6, size=n)
    uncond = mpos > pos
    eqm = mpos == pos
    return pos, uncond, eqm, check


def test_first_obs_mask_same_hash():
    rng = np.random.default_rng(5)
    for _ in range(20):
        pos, uncond, eqm, check = _random_case(rng, 400, 12)
        got = first_obs_mask(pos, uncond, eqm, check)
        want = _scalar_first(pos, uncond, eqm, check, check)
        np.testing.assert_array_equal(got, want)


def test_first_obs_mask_asymmetric_hashes_with_collisions():
    """Insert hash_sr / probe hash_string asymmetry: collisions between
    the two value spaces must block exactly like the scalar set."""
    rng = np.random.default_rng(11)
    for _ in range(20):
        pos, uncond, eqm, check = _random_case(rng, 300, 8)
        # adds drawn from an overlapping small space to force real
        # insert/probe collisions
        add = rng.integers(0, 8, size=len(pos)).astype(np.uint64)
        got = first_obs_mask(pos, uncond, eqm, check, add)
        want = _scalar_first(pos, uncond, eqm, check, add)
        np.testing.assert_array_equal(got, want)


def test_first_obs_mask_asymmetric_no_collisions():
    rng = np.random.default_rng(13)
    pos, uncond, eqm, check = _random_case(rng, 300, 1000)
    add = (rng.integers(0, 1000, size=len(pos)) + 10_000).astype(np.uint64)
    got = first_obs_mask(pos, uncond, eqm, check, add)
    want = _scalar_first(pos, uncond, eqm, check, add)
    np.testing.assert_array_equal(got, want)


def test_match_store_pop_against_dict_oracle():
    rng = np.random.default_rng(7)
    for _ in range(30):
        n = int(rng.integers(1, 300))
        # small key space -> plenty of duplicate keys exercising
        # overwrite (F,F,S) and exhaustion (F,S,S) paths
        keys = rng.integers(0, 25, size=n).astype(np.uint64)
        first = rng.random(n) < 0.55
        S, F = match_store_pop(keys, first)
        S0, F0 = _scalar_match(keys, first)
        np.testing.assert_array_equal(S, S0)
        np.testing.assert_array_equal(F, F0)


def test_saturating_midpoint_counts():
    mids = np.asarray([0, 1, 1, 5, -3, 99, 100], dtype=np.int64)
    out = saturating_midpoint_counts(mids, 100, cap=1)
    assert out[0] == 1 and out[1] == 1 and out[5] == 1 and out[99] == 1
    assert out.sum() == 4  # -3 and 100 out of range; cap clamps the dup


def test_native_matches_numpy_formulation():
    """The native single-pass automaton and the vectorized numpy
    formulation agree on random inputs (both are also property-tested
    against the scalar oracles above)."""
    import numpy as np

    from delly_tpu import native
    from delly_tpu.models import pairing

    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(19)
    for trial in range(30):
        n = int(rng.integers(1, 2000))
        pos = np.sort(rng.integers(0, 60, n)).astype(np.int64)
        uncond = rng.random(n) < 0.45
        eqm = ~uncond & (rng.random(n) < 0.5)
        chk = rng.integers(0, 25, n).astype(np.uint64)
        add = (chk if trial % 2 == 0
               else rng.integers(0, 25, n).astype(np.uint64))
        got = native.pair_first_obs(pos, uncond, eqm, chk, add)
        # scalar oracle (the replay loop the numpy path refines)
        seen = set()
        last = -1
        want = np.zeros(n, dtype=bool)
        for i in range(n):
            if pos[i] != last:
                seen.clear()
                last = pos[i]
            f = bool(uncond[i]) or (bool(eqm[i])
                                    and int(chk[i]) not in seen)
            if not uncond[i] and not eqm[i]:
                f = False
            want[i] = f
            if f:
                seen.add(int(add[i]))
        np.testing.assert_array_equal(got, want, err_msg=str(trial))

        keys = rng.integers(0, 40, n).astype(np.uint64)
        first = rng.random(n) < 0.5
        gs, gf = native.pair_match(keys, first)
        # dict oracle
        store = {}
        ws, wf = [], []
        for i in range(n):
            if first[i]:
                store[int(keys[i])] = i
            else:
                j = store.pop(int(keys[i]), None)
                if j is not None:
                    ws.append(i)
                    wf.append(j)
        np.testing.assert_array_equal(gs, ws)
        np.testing.assert_array_equal(gf, wf)
