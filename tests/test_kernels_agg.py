"""Kernel parity vs straight-line loop oracles (SURVEY.md §5.1).

The oracles below re-implement the reference's per-cell gather loops
verbatim-in-Python (same area formula mod/agg_band.pyx:225-228, same gates)
independently of the vectorized kernels under test.
"""

import math

import numpy as np
import pytest

from geo_raster_spark.kernels import agg


def _windows(off, scale, n_out, n_in):
    for n in range(n_out):
        lo = off + n * scale
        hi = lo + scale
        if hi <= 0 or lo >= n_in:
            yield n, None
            continue
        yield n, (lo, hi, max(0, int(math.floor(lo))), min(n_in, int(math.ceil(hi))))


def oracle_mean(dat, off_y, off_x, scale, nodata, rows, cols, v_min, v_max, min_rate):
    out = np.full((rows, cols), nodata, float)
    for r, wr in _windows(off_y, scale, rows, dat.shape[0]):
        if wr is None:
            continue
        for c, wc in _windows(off_x, scale, cols, dat.shape[1]):
            if wc is None:
                continue
            vs = ns = aa = 0.0
            for ro in range(wr[2], wr[3]):
                for co in range(wc[2], wc[3]):
                    a = ((min(ro + 1, wr[1]) - max(ro, wr[0]))
                         * (min(co + 1, wc[1]) - max(co, wc[0])))
                    aa += a
                    v = dat[ro, co]
                    if v == nodata or (v_min is not None and v < v_min) or \
                            (v_max is not None and v > v_max):
                        continue
                    vs += v * a
                    ns += a
            if aa <= 0 or ns <= 0 or ns < aa * min_rate:
                continue
            out[r, c] = vs / ns
    return out


def oracle_median(dat, off_y, off_x, scale, nodata, rows, cols, min_rate, pval):
    out = np.full((rows, cols), nodata, float)
    for r, wr in _windows(off_y, scale, rows, dat.shape[0]):
        if wr is None:
            continue
        for c, wc in _windows(off_x, scale, cols, dat.shape[1]):
            if wc is None:
                continue
            vs, ns, aa = [], 0.0, 0.0
            for ro in range(wr[2], wr[3]):
                for co in range(wc[2], wc[3]):
                    a = ((min(ro + 1, wr[1]) - max(ro, wr[0]))
                         * (min(co + 1, wc[1]) - max(co, wc[0])))
                    if a < 0.5:
                        continue
                    aa += a
                    v = dat[ro, co]
                    if v == nodata:
                        continue
                    ns += a
                    vs.append(v)
            if ns <= 0 or ns < aa * min_rate or not vs:
                continue
            if len(vs) <= 2:
                out[r, c] = vs[0]
            else:
                out[r, c] = sorted(vs)[int(len(vs) * pval / 100.0)]
    return out


def oracle_dominated(dat, off_y, off_x, scale, nodata, rows, cols, weights, nd_scale):
    out = np.full((rows, cols), nodata, float)
    for r, wr in _windows(off_y, scale, rows, dat.shape[0]):
        if wr is None:
            continue
        for c, wc in _windows(off_x, scale, cols, dat.shape[1]):
            if wc is None:
                continue
            counts, ns = {}, 0.0
            for ro in range(wr[2], wr[3]):
                for co in range(wc[2], wc[3]):
                    a = ((min(ro + 1, wr[1]) - max(ro, wr[0]))
                         * (min(co + 1, wc[1]) - max(co, wc[0])))
                    if a < 0.5:
                        continue
                    ns += a
                    v = dat[ro, co]
                    counts[v] = counts.get(v, 0) + 1
            if ns <= 0:
                continue
            cnts = dict(counts)
            if weights:
                for lo, hi, wgt in weights:
                    for k in cnts:
                        if lo <= k <= hi:
                            cnts[k] *= wgt
            if nodata in cnts:
                cnts[nodata] *= nd_scale
            mx, vv = 0, nodata
            for k, v in cnts.items():  # insertion order
                if v > mx:
                    mx, vv = v, k
            out[r, c] = vv
    return out


@pytest.fixture
def rng_dat():
    rng = np.random.default_rng(42)
    dat = rng.integers(0, 20, size=(64, 64)).astype(np.float64)
    dat[rng.random((64, 64)) < 0.15] = 255  # nodata speckle
    return dat


@pytest.mark.parametrize("off_y,off_x,scale", [
    (0.0, 0.0, 4.0),            # exact integer ratio
    (1.5, -2.25, 3.7),          # fractional windows + negative offset
    (0.0, 0.0, 0.5),            # upsample
    (-10.0, 70.0, 5.0),         # windows partially off both ends
])
def test_mean_parity(rng_dat, off_y, off_x, scale):
    rows = cols = 16
    got = agg.mean(rng_dat, off_y, off_x, scale, 255.0, rows, cols,
                   v_min=1, v_max=18, min_rate=0.1)
    want = oracle_mean(rng_dat, off_y, off_x, scale, 255.0, rows, cols, 1, 18, 0.1)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("scale,min_rate,pval", [(4.0, 0.0, 50), (3.3, 0.2, 25)])
def test_median_parity(rng_dat, scale, min_rate, pval):
    got = agg.median(rng_dat, 0.7, 1.1, scale, 255.0, 12, 12, min_rate, pval)
    want = oracle_median(rng_dat, 0.7, 1.1, scale, 255.0, 12, 12, min_rate, pval)
    np.testing.assert_allclose(got, want)


def test_dominated_parity(rng_dat):
    w = [(5, 10, 3.0)]
    got = agg.dominated(rng_dat.astype(np.int64), 0.0, 0.0, 4.0, 255, 16, 16,
                        weights=w, nodata_scaling=0.2)
    want = oracle_dominated(rng_dat.astype(np.int64), 0.0, 0.0, 4.0, 255, 16, 16, w, 0.2)
    np.testing.assert_allclose(got, want)


def test_count_distinct(rng_dat):
    got = agg.count_distinct(rng_dat, 0.0, 0.0, 8.0, 255.0, 8, 8, val_min=2, val_max=15)
    # oracle: brute per block
    for r in range(8):
        for c in range(8):
            win = rng_dat[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8]
            v = win[(win != 255) & (win >= 2) & (win <= 15)]
            want = len(np.unique(v)) if len(v) else 255.0
            assert got[r, c] == want, (r, c)


def test_perc_gates_and_scale(rng_dat):
    got = agg.perc(rng_dat, 0.0, 0.0, 4.0, val=7, s_nodata=255, t_nodata=200,
                   rows=16, cols=16, scale_val=100, ceil_output=True)
    for r in range(16):
        for c in range(16):
            win = rng_dat[r * 4:(r + 1) * 4, c * 4:(c + 1) * 4]
            aa = win.size
            valid = win != 255
            ns = valid.sum()
            if ns <= 0 or ns < 0.5 * aa:
                assert got[r, c] == 200.0
                continue
            vs = (win[valid] == 7).sum()
            want = 0.0 if vs == 0 else math.ceil(min(100.0 * vs / ns, 100.0))
            assert got[r, c] == want, (r, c, got[r, c], want)


def test_std_matches_numpy(rng_dat):
    got = agg.std(rng_dat, 0.0, 0.0, 8.0, 255.0, 8, 8)
    for r in range(8):
        for c in range(8):
            win = rng_dat[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8]
            v = win[win != 255]
            if len(v) == 0:
                assert got[r, c] == 255.0
            else:
                np.testing.assert_allclose(got[r, c], np.std(v), rtol=1e-9)


def test_mean_integer_ratio_equals_block_mean():
    dat = np.arange(64, dtype=float).reshape(8, 8)
    got = agg.mean(dat, 0.0, 0.0, 2.0, -1.0, 4, 4, min_rate=0.0)
    want = dat.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(got, want)


def test_mean_cv_and_mode_purity(rng_dat):
    m, cv = agg.mean_cv(rng_dat, 0.0, 0.0, 4.0, 255.0, 16, 16)
    ok = m != 255.0
    assert ok.any()
    s = agg.std(rng_dat, 0.0, 0.0, 4.0, 255.0, 16, 16)
    sel = ok & (s != 255.0) & (m != 0)
    np.testing.assert_allclose(cv[sel], s[sel] / np.abs(m[sel]))

    v, p = agg.mode_purity(rng_dat.astype(np.int64), 0.0, 0.0, 4.0, 255, 16, 16)
    assert ((p[v != 255] > 0) & (p[v != 255] <= 100)).all()
