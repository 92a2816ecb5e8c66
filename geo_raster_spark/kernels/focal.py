"""Neighborhood / focal window ops (SURVEY.md §2.5 W1-W6, W8).

Vectorized NumPy reimplementations of the reference's per-pixel window scans.
Windows are Chebyshev boxes ``±dist`` (inclusive) clamped at array edges,
reading the ORIGINAL array and writing a copy (non-in-place per iteration),
exactly like the reference.

Documented deviations from reference bugs (SURVEY.md §7.3 watch list):
- ``clean``: the reference computes neighbor distance as ``hypot(row, col)``
  — distance from the array ORIGIN, not from the center pixel
  [ref: mod/mod_filter.pyx:290] — which effectively disables the filter
  outside the top-left corner.  We implement the intended
  ``hypot(row-r0, col-c0)`` Euclidean radius.
- ``mmu``: the reference accumulates class votes as ``c = 2c+1``
  [ref: mod/filter_band.pyx:71] and crashes on all-nodata neighborhoods;
  we count normally (argmax order-compatible) and return nodata instead.
"""

from __future__ import annotations

import numpy as np


def _window_view(dat, dist, pad_value):
    """Padded sliding-window view: (H, W, (2d+1)^2) flattened windows."""
    d = int(dist)
    p = np.pad(dat, d, mode="constant", constant_values=pad_value)
    win = np.lib.stride_tricks.sliding_window_view(p, (2 * d + 1, 2 * d + 1))
    return win.reshape(dat.shape[0], dat.shape[1], -1)


def focal_median(dat, dist, nodata, vs=None):
    """W1: replace each valid pixel with the window median (sorted pick at
    ``n//2``); nodata pixels pass through.  [ref: mod/mod_filter.pyx:70-188]

    Returns (filtered, n_changed)."""
    dat = np.asarray(dat)
    win = _window_view(dat.astype(np.float64), dist, np.nan)
    win = np.where(win == nodata, np.nan, win)
    n_valid = np.sum(~np.isnan(win), axis=-1)
    # sorted pick at int(n/2): sort with NaN last, index by count//2
    srt = np.sort(win, axis=-1)
    idx = np.minimum(n_valid // 2, win.shape[-1] - 1)
    med = np.take_along_axis(srt, idx[..., None], axis=-1)[..., 0]

    out = dat.copy()
    sel = (dat != nodata) & (n_valid > 0)
    if vs is not None:
        sel &= np.isin(dat, list(vs))
    # all-NaN windows are excluded by sel; fill before cast to avoid the
    # invalid-cast warning flooding executor logs
    med_cast = np.nan_to_num(med, nan=float(nodata)).astype(dat.dtype)
    changed = int(np.sum(sel & (med_cast != dat)))
    out[sel] = med_cast[sel]
    return out, changed


def filter_band_median(dat, dist, nodata, iterations=10, threshold=100):
    """Iterate focal_median until fewer than ``threshold`` pixels change.

    [ref: mod/mod_filter.pyx:36-57]"""
    cur = np.asarray(dat).copy()
    for _ in range(iterations):
        cur, n = focal_median(cur, dist, nodata)
        if n < threshold:
            break
    return cur


def _box_count(mask, dist):
    """Count of True in the ±dist Chebyshev box via summed-area table."""
    d = int(dist)
    m = mask.astype(np.int64)
    c = np.cumsum(np.cumsum(np.pad(m, ((1, d), (1, d))), axis=0), axis=1)
    h, w = mask.shape
    r0 = np.clip(np.arange(h) - d, 0, None)
    c0 = np.clip(np.arange(w) - d, 0, None)
    r1 = np.minimum(np.arange(h) + d + 1, h)
    c1 = np.minimum(np.arange(w) + d + 1, w)
    return (c[np.ix_(r1, c1)] - c[np.ix_(r0, c1)]
            - c[np.ix_(r1, c0)] + c[np.ix_(r0, c0)])


def _disk_offsets(dist):
    d = int(dist)
    dr, dc = np.mgrid[-d:d + 1, -d:d + 1]
    keep = np.hypot(dr, dc) <= dist
    return dr[keep], dc[keep]


def clean(dat, dist, min_num, nodata, vs=None):
    """W2: noise clean.  Intended semantics of [ref: mod/mod_filter.pyx:190-317]:

    For each valid pixel: n1 = same-class count within Euclidean radius
    ``dist`` (center excluded).  If ``0 < n1 < min_num`` and the count at
    radius ``dist+1`` doesn't grow (n2 <= n1), replace with the radius-
    ``dist+1`` neighborhood majority (center excluded, first-max tie-break
    by value order).  Returns (cleaned, n_changed)."""
    dat = np.asarray(dat)
    h, w = dat.shape
    out = dat.copy()

    def same_count(radius):
        dr, dc = _disk_offsets(radius)
        cnt = np.zeros((h, w), dtype=np.int64)
        valid = dat != nodata
        for r, c in zip(dr, dc):
            if r == 0 and c == 0:
                continue
            sh = np.full((h, w), nodata, dtype=dat.dtype)
            rs = slice(max(0, -r), min(h, h - r))
            rd = slice(max(0, r), min(h, h + r))
            cs = slice(max(0, -c), min(w, w - c))
            cd = slice(max(0, c), min(w, w + c))
            sh[rd, cd] = dat[rs, cs]
            cnt += (sh == dat) & valid & (sh != nodata)
        return cnt

    n1 = same_count(dist)
    n2 = same_count(dist + 1)
    sel = (dat != nodata) & (n1 > 0) & (n1 < min_num) & (n2 <= n1)
    if vs is not None:
        sel &= np.isin(dat, list(vs))
    if not sel.any():
        return out, 0

    # neighborhood majority at radius dist+1 for selected pixels
    dr, dc = _disk_offsets(dist + 1)
    rows, cols = np.nonzero(sel)
    for r0, c0 in zip(rows, cols):
        counts = {}
        for r, c in zip(dr, dc):
            if r == 0 and c == 0:
                continue
            rr, cc = r0 + r, c0 + c
            if 0 <= rr < h and 0 <= cc < w:
                v = dat[rr, cc]
                if v != nodata:
                    counts[v] = counts.get(v, 0) + 1
        if counts:
            mx = max(counts.values())
            for k, v in counts.items():  # insertion order first-max
                if v == mx:
                    out[r0, c0] = k
                    break
    return out, int(sel.sum())


def expand(dat, ref_mask, val, non, dist, min_num):
    """W3: grow class ``val`` into ``non`` background where the Chebyshev-box
    count of ``val`` neighbors >= min_num and ``ref_mask`` is set.

    [ref: mod/mod_filter.pyx:319-372] — the reference's 199-marker two-pass
    is equivalent to counting on the original array (markers never equal
    ``val``), which is what we do vectorized.  Returns (expanded, n_changed)."""
    dat = np.asarray(dat).copy()
    cnt = _box_count(dat == val, dist)
    sel = (dat == non) & (np.asarray(ref_mask) == 1) & (cnt >= min_num)
    dat[sel] = val
    return dat, int(sel.sum())


def variety(dat, dist):
    """W5a: count of distinct values in the half-open window
    ``[r-d, r+d) x [c-d, c+d)`` (the reference's asymmetric bound, copied).
    [ref: mod/geo_grid_c.pyx:17-35]"""
    dat = np.asarray(dat)
    h, w = dat.shape
    out = np.zeros((h, w), dtype=np.int64)
    d = int(dist)
    for r in range(h):
        r0, r1 = max(0, r - d), min(h, r + d)
        for c in range(w):
            c0, c1 = max(0, c - d), min(w, c + d)
            out[r, c] = len(np.unique(dat[r0:r1, c0:c1]))
    return out


def value_range(dat, dist):
    """W5b: max - min in the same half-open window.  [ref: mod/geo_grid_c.pyx:37-55]"""
    dat = np.asarray(dat, dtype=np.float64)
    h, w = dat.shape
    d = int(dist)
    out = np.zeros((h, w), dtype=np.float64)
    for r in range(h):
        r0, r1 = max(0, r - d), min(h, r + d)
        sub = dat[r0:r1]
        for c in range(w):
            c0, c1 = max(0, c - d), min(w, c + d)
            win = sub[:, c0:c1]
            out[r, c] = win.max() - win.min()
    return out


def mmu(dat, dist, min_num, nodata):
    """W6: majority smooth — keep own class if its count in the ±dist box
    (center excluded) >= min_num, else neighborhood majority of other
    classes (nodata when none).  Intended semantics of
    [ref: mod/filter_band.pyx:18-75] (vote-doubling bug not copied)."""
    dat = np.asarray(dat)
    h, w = dat.shape
    out = dat.copy()
    valid = dat != nodata

    own = _box_count_eq(dat, dat, dist, nodata) - 1  # exclude center
    sel = valid & (own < min_num)
    rows, cols = np.nonzero(sel)
    d = int(dist)
    for r0, c0 in zip(rows, cols):
        r_lo, r_hi = max(0, r0 - d), min(h, r0 + d + 1)
        c_lo, c_hi = max(0, c0 - d), min(w, c0 + d + 1)
        win = dat[r_lo:r_hi, c_lo:c_hi].ravel().copy()
        center = (r0 - r_lo) * (c_hi - c_lo) + (c0 - c_lo)
        win = np.delete(win, center)
        win = win[(win != nodata) & (win != dat[r0, c0])]
        if len(win) == 0:
            out[r0, c0] = nodata
            continue
        vals, first, cnts = np.unique(win, return_index=True, return_counts=True)
        order = np.argsort(first, kind="stable")
        vals, cnts = vals[order], cnts[order]
        out[r0, c0] = vals[np.argmax(cnts == cnts.max())]
    return out


def _box_count_eq(dat, ref, dist, nodata):
    """Per-pixel count of window cells equal to the center's value."""
    h, w = dat.shape
    cnt = np.zeros((h, w), dtype=np.int64)
    d = int(dist)
    for r in range(-d, d + 1):
        for c in range(-d, d + 1):
            sh = np.full((h, w), nodata if nodata is not None else -1, dtype=dat.dtype)
            rs = slice(max(0, -r), min(h, h - r))
            rd = slice(max(0, r), min(h, h + r))
            cs = slice(max(0, -c), min(w, w - c))
            cd = slice(max(0, c), min(w, w + c))
            sh[rd, cd] = dat[rs, cs]
            cnt += (sh == ref) & (sh != nodata)
    return cnt


def label_components(mask):
    """4-connectivity connected-component labels (two-pass union-find).

    Pure NumPy; labels start at 1, background (False) = 0."""
    mask = np.asarray(mask, dtype=bool)
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int64)
    parent = [0]

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    nxt = 1
    for r in range(h):
        for c in range(w):
            if not mask[r, c]:
                continue
            up = labels[r - 1, c] if r > 0 and mask[r - 1, c] else 0
            left = labels[r, c - 1] if c > 0 and mask[r, c - 1] else 0
            if up == 0 and left == 0:
                parent.append(nxt)
                labels[r, c] = nxt
                nxt += 1
            elif up and left:
                ru, rl = find(up), find(left)
                labels[r, c] = min(ru, rl)
                parent[max(ru, rl)] = min(ru, rl)
            else:
                labels[r, c] = up or left
    # resolve
    lut = np.array([find(i) for i in range(nxt)], dtype=np.int64)
    labels = lut[labels]
    # compact
    uniq = np.unique(labels)
    remap = np.zeros(labels.max() + 1, dtype=np.int64)
    remap[uniq] = np.arange(len(uniq))
    return remap[labels], len(uniq) - 1


def mmu_area_filter(dat, min_area, nodata=None):
    """W4: minimum-mapping-unit filter on a CLASS raster — connected
    components smaller than ``min_area`` pixels are absorbed into their
    most-frequent neighboring class.

    The reference calls skimage ``area_closing``/``area_opening`` on class
    maps [ref: mod/mod_filter.pyx:20-34]; on class-coded rasters (the
    reference's actual inputs) the component-absorption form below is the
    intended MMU semantics — documented replacement, not a translation."""
    dat = np.asarray(dat).copy()
    h, w = dat.shape
    for val in np.unique(dat):
        if nodata is not None and val == nodata:
            continue
        labels, n = label_components(dat == val)
        if n == 0:
            continue
        sizes = np.bincount(labels.ravel())
        for comp in range(1, n + 1):
            if sizes[comp] >= min_area:
                continue
            sel = labels == comp
            # neighbors: dilate by 1 (4-conn) minus the component
            nb = np.zeros_like(sel)
            nb[1:, :] |= sel[:-1, :]
            nb[:-1, :] |= sel[1:, :]
            nb[:, 1:] |= sel[:, :-1]
            nb[:, :-1] |= sel[:, 1:]
            nb &= ~sel
            vals = dat[nb]
            if nodata is not None:
                vals = vals[vals != nodata]
            vals = vals[vals != val]
            if len(vals) == 0:
                continue
            uv, first, cnts = np.unique(vals, return_index=True, return_counts=True)
            order = np.argsort(first, kind="stable")
            uv, cnts = uv[order], cnts[order]
            dat[sel] = uv[np.argmax(cnts == cnts.max())]
    return dat


def detect_corners(dat, nodata):
    """W8: first/last non-nodata rows/cols -> (row0, row1, col0, col1) or None.

    [ref: lib/rasterize_band.py:62-119]"""
    valid = np.asarray(dat) != nodata
    rows = np.flatnonzero(valid.any(axis=1))
    cols = np.flatnonzero(valid.any(axis=0))
    if len(rows) == 0:
        return None
    return int(rows[0]), int(rows[-1]), int(cols[0]), int(cols[-1])
