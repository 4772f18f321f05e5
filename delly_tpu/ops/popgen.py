"""Population genetics estimators over genotype likelihoods.

Reference: src/popgen.h — EM allele frequency under HWE, EM genotype
frequencies, inbreeding coefficient FIC, imputation R², dosage R²
between sites, and an HWE likelihood-ratio χ² test. The per-sample
posterior loops are vectorized over the (N, 3) GL matrix; each EM
iteration is a handful of array ops, the natural shape for device
offload on population-scale panels.
"""

from __future__ import annotations

import math

import numpy as np


def _as_gl_matrix(gl_vector) -> np.ndarray:
    return np.asarray(gl_vector, dtype=np.float64).reshape(-1, 3)


def est_biallelic_af(gl_vector, epsilon: float = 1e-20,
                     maxiter: int = 1000):
    """EM allele frequency under HWE (popgen.h:12-51).
    Returns (af_ref, af_alt)."""
    g = _as_gl_matrix(gl_vector)
    if g.size == 0:
        return 0.5, 0.5
    af = np.array([0.5, 0.5])
    hwe_af = af.copy()
    err = 1.0
    count = 0
    while err > epsilon and count < maxiter:
        gtprior = np.array([af[0] * af[0], 2 * af[0] * af[1],
                            af[1] * af[1]])
        gt = g * gtprior[None, :]
        p = gt.sum(axis=1)
        ok = p > 0
        used = int(np.count_nonzero(ok))
        hwe_af = np.zeros(2)
        if used:
            gtn = gt[ok] / p[ok, None]
            hwe_af[0] = float((gtn[:, 0] + 0.5 * gtn[:, 1]).sum()) / used
            hwe_af[1] = float((gtn[:, 2] + 0.5 * gtn[:, 1]).sum()) / used
        err = float(((af - hwe_af) ** 2).sum())
        af = hwe_af.copy()
        count += 1
    return float(hwe_af[0]), float(hwe_af[1])


def est_biallelic_gt_freq(gl_vector, epsilon: float = 1e-20,
                          maxiter: int = 1000):
    """EM genotype frequencies (popgen.h:54-91)."""
    g = _as_gl_matrix(gl_vector)
    if g.size == 0:
        return (0.0, 0.0, 0.0)
    prior = np.full(3, 1.0 / 3.0)
    mle = prior.copy()
    err = 1.0
    count = 0
    while err > epsilon and count < maxiter:
        gt = g * prior[None, :]
        p = gt.sum(axis=1)
        ok = p > 0
        used = int(np.count_nonzero(ok))
        mle = np.zeros(3)
        if used:
            mle = (gt[ok] / p[ok, None]).sum(axis=0) / used
        err = float(((prior - mle) ** 2).sum())
        prior = mle.copy()
        count += 1
    return tuple(float(x) for x in mle)


def est_biallelic_fic(gl_vector, hwe_af) -> float:
    """Inbreeding coefficient (popgen.h:94-111)."""
    g = _as_gl_matrix(gl_vector)
    if g.size == 0:
        return 0.0
    hwe_gt = np.array([hwe_af[0] ** 2, 2 * hwe_af[0] * hwe_af[1],
                       hwe_af[1] ** 2])
    p = (g * hwe_gt[None, :]).sum(axis=1)
    ok = p > 0
    if not ok.any():
        return 0.0
    sum_gl_het = float(((g[ok, 1] * hwe_gt[1]) / p[ok]).sum())
    denominator = hwe_gt[1] * int(np.count_nonzero(ok))
    if denominator > 0:
        return 1.0 - sum_gl_het / denominator
    return 0.0


def est_biallelic_rsq(gl_vector, hwe_af) -> float:
    """Imputation R² (popgen.h:114-147)."""
    g = _as_gl_matrix(gl_vector)
    if g.size == 0:
        return 0.0
    hwe_gt = np.array([hwe_af[0] ** 2, 2 * hwe_af[0] * hwe_af[1],
                       hwe_af[1] ** 2])
    post = g * hwe_gt[None, :]
    p = post.sum(axis=1)
    ok = p > 0
    used = int(np.count_nonzero(ok))
    if used <= 1 or hwe_gt[1] <= 0:
        return 0.0
    postn = post[ok] / p[ok, None]
    d = postn[:, 1] + 2 * postn[:, 0]
    sum_d = float(d.sum())
    sum_d2 = float((d * d).sum())
    mean_d = sum_d / used
    var = max(sum_d2 - used * mean_d * mean_d, 0.0) / (used - 1)
    return var / hwe_gt[1]


def dosage_r2(a, b, min_shared: int) -> float:
    """Squared Pearson correlation over shared-called dosages
    (popgen.h:149-177)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    m = min(len(a), len(b))
    a = a[:m]
    b = b[:m]
    ok = (a >= 0) & (b >= 0)
    n = int(np.count_nonzero(ok))
    if n < min_shared:
        return -1.0
    x = a[ok]
    y = b[ok]
    cov = float((x * y).sum()) - x.sum() * y.sum() / n
    va = float((x * x).sum()) - x.sum() ** 2 / n
    vb = float((y * y).sum()) - y.sum() ** 2 / n
    if va <= 0 or vb <= 0:
        return -1.0
    r = cov / math.sqrt(va * vb)
    return r * r


def chi2_sf_1df(x: float) -> float:
    """Survival function of χ²(1): erfc(sqrt(x/2))."""
    return math.erfc(math.sqrt(max(x, 0.0) / 2.0))


def est_biallelic_hwe_lrt(gl_vector, hwe_af, mle_gt_freq) -> float:
    """HWE LRT χ²(1) p-value (popgen.h:180-201)."""
    g = _as_gl_matrix(gl_vector)
    if g.size == 0:
        return 1.0
    hwe_gt = np.array([hwe_af[0] ** 2, 2 * hwe_af[0] * hwe_af[1],
                       hwe_af[1] ** 2])
    mle = np.asarray(mle_gt_freq, dtype=np.float64)
    pnull = (g * hwe_gt[None, :]).sum(axis=1)
    palt = (g * mle[None, :]).sum(axis=1)
    ok = (pnull > 0) & (palt > 0)
    if not ok.any():
        return 1.0
    null = float(np.log(pnull[ok]).sum())
    alt = float(np.log(palt[ok]).sum())
    lrts = max(-2 * (null - alt), 0.0)
    return chi2_sf_1df(lrts)
