"""Sharded read-depth step: 8-virtual-device mesh parity tests."""

import math

import numpy as np
import pytest

import jax

from delly_tpu.parallel.depth_step import (
    MAX_CN, make_sharded_depth_step, sharded_depth_inputs,
)
from delly_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")
    return make_mesh(8)


def test_depth_step_shapes_and_noise(mesh):
    step = make_sharded_depth_step(mesh)
    rng = np.random.default_rng(7)
    args = sharded_depth_inputs(rng, mesh, per_device=16)
    logr, cn, cnl, best_cn, noise = step(*args)
    W = 16 * 8
    assert logr.shape == (W,)
    assert cnl.shape == (W, MAX_CN)
    assert best_cn.shape == (W,)
    assert float(noise) > 0.0


def test_depth_step_matches_host_math(mesh):
    step = make_sharded_depth_step(mesh)
    rng = np.random.default_rng(11)
    args = sharded_depth_inputs(rng, mesh, per_device=16)
    logr, cn, cnl, best_cn, noise = map(np.asarray, step(*args))
    covsum = np.asarray(args[0])
    gcfrac = np.asarray(args[1])
    gc_curve = np.asarray(args[4])
    from delly_tpu.ops.depth_math import window_depth
    for i in range(0, len(covsum), 17):
        exp = gc_curve[min(100, int(gcfrac[i] * 100))]
        # the production window formulas (coral.h:296-414), via the
        # same shared function the host CNV driver calls
        cn_host, logr_host = window_depth(np, float(covsum[i]),
                                          float(exp), 2.0, 1.0, 2.0,
                                          2.0)
        cn_host = float(cn_host)
        assert cn[i] == pytest.approx(float(cn_host), rel=1e-5)
        assert logr[i] == pytest.approx(float(logr_host), rel=1e-4)
        sd = max(0.15 * cn_host, 0.025)
        # bolog.h:88-133 Gaussian CN likelihood at the best CN
        g = int(best_cn[i])
        pdf = math.exp(-0.5 * ((g - cn_host) / sd) ** 2) / (
            sd * math.sqrt(2 * math.pi))
        assert cnl[i, g] == pytest.approx(math.log10(pdf), rel=1e-3)
        assert g == int(round(min(cn_host, MAX_CN - 1)))


def test_cnl_tail_parity_with_scalar_path():
    """cn_log10_likelihoods matches compute_cnls (bolog.h exp-form)
    everywhere, including the deep tail where the double pdf underflows
    to 0 and the likelihood snaps to SMALLEST_GL: analytic values in
    (-1000, ~-323) must be unreachable on the device path too."""
    from delly_tpu.ops.depth_math import SMALLEST_GL, cn_log10_likelihoods
    means = np.array([0.0, 0.07, 0.5, 1.9, 2.0, 3.4, 6.0, 9.5])
    sds = np.array([0.025, 0.025, 0.05, 0.15, 0.3, 0.4, 0.9, 1.4])
    got = cn_log10_likelihoods(np, means.astype(np.float64),
                               sds.astype(np.float64), MAX_CN)
    saw_underflow = False
    for i, (m, sd) in enumerate(zip(means, sds)):
        for g in range(MAX_CN):
            pdf = math.exp(-0.5 * ((g - m) / sd) ** 2) / (
                sd * math.sqrt(2 * math.pi))
            want = max(math.log10(pdf), SMALLEST_GL) if pdf > 0 \
                else SMALLEST_GL
            if pdf == 0.0:
                saw_underflow = True
                assert got[i, g] == SMALLEST_GL
            else:
                assert got[i, g] == pytest.approx(want, abs=1e-9)
    # the grid must actually exercise the underflow band, e.g.
    # mean=0 sd=0.025 geno=2: analytic ~ -347 -> snapped to -1000
    assert saw_underflow
    # no emitted value may fall in the unreachable band
    arr = np.asarray(got)
    assert not np.any((arr < -324.0) & (arr > SMALLEST_GL))


def test_depth_step_psum_matches_local(mesh):
    """The psum'd noise proxy equals the host-side global average."""
    step = make_sharded_depth_step(mesh)
    rng = np.random.default_rng(3)
    args = sharded_depth_inputs(rng, mesh, per_device=32)
    logr, _, _, _, noise = map(np.asarray, step(*args))
    # Host reference: per-shard sums of |diff| then global combine.
    n_dev = 8
    per = len(logr) // n_dev
    tot = 0.0
    cnt = 0
    for d in range(n_dev):
        seg = logr[d * per:(d + 1) * per]
        tot += float(np.abs(np.diff(seg)).sum())
        cnt += per - 1
    assert float(noise) == pytest.approx(tot / cnt, rel=1e-5)
