"""Genotype and copy-number likelihood math.

Reference: src/bolog.h. Double-precision host math (the per-site vectors are
tiny); the batched JAX variant used by the genotyping engine computes the
same quantities across all sites at once.
"""

from __future__ import annotations

import math

import numpy as np

from delly_tpu.utils.stats import iround

SMALLEST_GL = -1000

# phred -> prob lookup, phred2prob[i] = 10^(-i/10) (bolog.h:11-20)
PHRED2PROB = np.power(10.0, -(np.arange(0, -10 * SMALLEST_GL + 1) / 10.0))


def _log10(x: float) -> float:
    """C++ std::log10 semantics: log10(0) = -inf (no exception), so a
    mapq-0 read (phred2prob == 1) contributes -inf and is capped at
    SMALLEST_GL downstream, exactly like bolog.h:33-40."""
    if x > 0.0:
        return math.log10(x)
    return -math.inf


def compute_gls(mapq_ref, mapq_alt):
    """Diploid RR/RA/AA genotype likelihoods (bolog.h:23-85).

    Returns (gl: [AA, RA, RR] floats as stored by the reference into the
    gls array slots [2]=gl0 etc, gq, gt, pl) where gt is one of
    ((1,1),(0,1),(0,0)) or None for missing.
    """
    gl = [0.0, 0.0, 0.0]
    pe_depth = len(mapq_ref) + len(mapq_alt)
    for q in mapq_ref:
        p = PHRED2PROB[q]
        gl[0] += _log10(p)
        gl[1] += _log10(p + (1.0 - p))
        gl[2] += _log10(1.0 - p)
    for q in mapq_alt:
        p = PHRED2PROB[q]
        gl[0] += _log10(1.0 - p)
        gl[1] += _log10((1.0 - p) + p)
        gl[2] += _log10(p)
    gl[1] += -pe_depth * math.log10(2.0)
    gl_best = 0
    gl_best_val = gl[0]
    for geno in (1, 2):
        if gl[geno] >= gl_best_val:
            gl_best_val = gl[geno]
            gl_best = geno
    for geno in range(3):
        gl[geno] -= gl_best_val
        gl[geno] = max(gl[geno], SMALLEST_GL)
    # boost::math::round is half-away-from-zero, not banker's rounding
    pl = [iround(-10 * gl[0]), iround(-10 * gl[1]), iround(-10 * gl[2])]
    if pe_depth and (pl[0] + pl[1] + pl[2]) > 0:
        total = (PHRED2PROB[pl[0]] + PHRED2PROB[pl[1]] + PHRED2PROB[pl[2]])
        arg = 1 - 1 / total
        likelihood = math.log10(arg) if arg > 0 else SMALLEST_GL
        likelihood = max(likelihood, SMALLEST_GL)
        gq = iround(-10 * likelihood)
        if gl_best == 0:
            gt = (1, 1)
        elif gl_best == 1:
            gt = (0, 1)
        else:
            gt = (0, 0)
        # GL array layout as written: gls[2]=gl[0], gls[1]=gl[1], gls[0]=gl[2]
        gls = (float(gl[2]), float(gl[1]), float(gl[0]))
        # modvcf.h:681 derives PL from the float32-STORED GL values
        # (std::round(-10.0f * gl_val)), so mirror the f32 multiply
        pls = [max(0, iround(float(np.float32(-10.0) * np.float32(g))))
               for g in gls]
        return gls, gq, gt, pls
    return None, 0, None, None


def compute_cnls(mean: float, sd: float, ploidy: float, max_cn: int = 10):
    """Copy-number likelihoods CN0..CN{max_cn-1} (bolog.h:88-133).

    The reference stores each likelihood into a float* array, so every
    comparison and the final rescale read back FLOAT32 values while
    glObs stays double — mirrored here exactly (pinned by
    tests/test_stats_oracle.py against bolog.h compiled live).
    Returns (gl list rescaled by best, gq, varqual, best_cn).
    """
    def norm_pdf(x):
        # boost::math::normal pdf evaluation order
        exponent = x - mean
        exponent *= -exponent
        exponent /= 2 * sd * sd
        return math.exp(exponent) / (sd * math.sqrt(2 * math.pi))

    cap = np.float32(SMALLEST_GL)
    gl = []
    for geno in range(max_cn):
        v = np.float32(_log10(norm_pdf(float(geno))))  # (float) store
        gl.append(v if v > cap else cap)
    best = 0
    best2 = 1
    if gl[best] < gl[best2]:
        best, best2 = 1, 0
    for geno in range(2, max_cn):
        if gl[geno] > gl[best2]:
            if gl[geno] > gl[best]:
                best2 = best
                best = geno
            else:
                best2 = geno
    gl_obs = max(_log10(norm_pdf(mean)), SMALLEST_GL)  # double
    pl_variant = iround(-10 * gl_obs)
    pl_ploidy = iround(-10 * float(gl[iround(ploidy)]))
    varqual = pl_ploidy - pl_variant
    pl_best = iround(-10 * float(gl[best]))
    pl_best2 = iround(-10 * float(gl[best2]))
    gq = pl_best2 - pl_best
    best_val = float(gl[best])  # double(glBestVal), bolog.h:128
    gl = [float(np.float32(float(g) - best_val)) for g in gl]
    return gl, gq, varqual, best
