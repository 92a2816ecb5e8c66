"""Histograms, regression, and error metrics (SURVEY.md §2.4 A9/A13-A16).

NumPy forms of [ref: mod/stat_band.pyx:8-58; lib/linear_regress.py:10-98;
lib/cal_metrics.py:12-95; lib/density_map.py:64-131].  These double as the
test oracles for the SQL versions (Spark ``corr/covar_samp/var_samp`` etc.).
"""

from __future__ import annotations

import numpy as np


def value_counts(dat):
    """A9: full-band {value: count}.  [ref: mod/stat_band.pyx:8-58]"""
    vals, cnts = np.unique(np.asarray(dat).ravel(), return_counts=True)
    return dict(zip(vals.tolist(), cnts.astype(float).tolist()))


def histogram2d(x, y, bins_x, bins_y, log=False):
    """A14: 2-D histogram density.  [ref: lib/density_map.py:64-131]"""
    h, _, _ = np.histogram2d(np.asarray(x), np.asarray(y), bins=[bins_x, bins_y])
    if log:
        with np.errstate(divide="ignore"):
            h = np.where(h > 0, np.log10(h), 0.0)
    return h


def estimate_levels(vals, k):
    """A13: k evenly-spaced order statistics for legend breaks.

    [ref: util/landsat_tiles_csv2png.py:70-92]"""
    v = np.sort(np.asarray(vals, dtype=np.float64))
    if len(v) == 0:
        return []
    idx = (np.linspace(0, 1, k, endpoint=False) * len(v)).astype(int)
    return v[idx].tolist()


def _s_xy(xs, ys):
    """Sample covariance.  [ref: lib/linear_regress.py:81-89]"""
    xs, ys = np.asarray(xs, np.float64), np.asarray(ys, np.float64)
    return float(np.sum((ys - ys.mean()) * (xs - xs.mean())) / (len(xs) - 1))


def _s(vs):
    """Sample variance.  [ref: lib/linear_regress.py:91-98]"""
    vs = np.asarray(vs, np.float64)
    return float(np.sum((vs - vs.mean()) ** 2) / (len(vs) - 1))


def linear_regress_ols(xs, ys):
    """A15 OLS: (intercept, slope, R2).  [ref: lib/linear_regress.py:10-35]"""
    sxy, sxx, syy = _s_xy(xs, ys), _s(xs), _s(ys)
    if sxx == 0:
        raise ValueError("zero variance in X")
    b1 = sxy / sxx
    b0 = float(np.mean(ys)) - b1 * float(np.mean(xs))
    r2 = sxy ** 2 / (sxx * syy)
    return b0, b1, r2


def linear_regress_rma(xs, ys):
    """A15 RMA: (intercept, slope, R2).  [ref: lib/linear_regress.py:37-62]"""
    sxy, sxx, syy = _s_xy(xs, ys), _s(xs), _s(ys)
    if sxx == 0:
        raise ValueError("zero variance in X")
    b1 = float(np.sign(sxy)) * (syy / sxx) ** 0.5
    b0 = float(np.mean(ys)) - b1 * float(np.mean(xs))
    r2 = sxy ** 2 / (sxx * syy)
    return b0, b1, r2


def cal_rmsd(x, y):
    """A16: sqrt of SUM of squared diffs (the reference does NOT divide by n).

    [ref: lib/cal_metrics.py:70-77]"""
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    return float(np.sqrt(np.sum((x - y) ** 2)))


def cal_rmsds(x, y, slope, offset):
    """A16: (RMSD, RMSDs, RMSDu) against the regression line.

    [ref: lib/cal_metrics.py:79-94]"""
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    p = x * slope + offset
    s = float(np.mean((x - p) ** 2))
    u = float(np.mean((y - p) ** 2))
    return (s + u) ** 0.5, s ** 0.5, u ** 0.5


def cal_mbe(xs, ys):
    """A16: (mean bias error, S2d).  [ref: lib/cal_metrics.py:55-69]"""
    xs, ys = np.asarray(xs, np.float64), np.asarray(ys, np.float64)
    d = xs - ys
    t = float(d.mean())
    s = float(np.sum((d - t) ** 2) / (len(xs) - 1))
    return t, s


def cal_error_bound(x, y, scale):
    """A16: hit-rate inside the scaled error envelope.  [ref: lib/cal_metrics.py:31-44]"""
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    err = scale * (0.005 + 0.05 * x)
    return float(np.mean((y > x - err) & (y < x + err)))
