"""Visualization / scalar pixel functions (SURVEY.md §2.8 F1-F8).

NumPy kernels for per-tile use inside Arrow batches; all semantics cited to
the reference.
"""

from __future__ import annotations

import numpy as np


def search_threshold(counts, levels, share):
    """F1: histogram threshold at cumulative ``share`` of pixels.

    [ref: util/visualize_bands.py:14-23] — first level where the running
    count exceeds ``share`` of the total."""
    target = int(np.sum(counts) * share)
    run = 0
    for i, c in enumerate(counts):
        run += int(c)
        if run > target:
            return levels[i]
    raise ValueError("failed to find threshold")


def linear_stretch(dat, nodata=None, share=0.2, scale=None):
    """F1: histogram-thresholded linear stretch to uint8.

    [ref: util/visualize_bands.py:61-101] — thresholds from both histogram
    tails at ``share``; or explicit ``scale=(low, top)``."""
    dat = np.asarray(dat)
    valid = dat if nodata is None else dat[dat != nodata]
    if scale is None:
        lo_v, hi_v = float(valid.min()), float(valid.max())
        bins = max(int(hi_v - lo_v), 10)
        vs, ls = np.histogram(valid, bins=bins, range=(lo_v, hi_v))
        low = search_threshold(vs, ls, share)
        top = search_threshold(vs[::-1], ls[::-1], share)
    else:
        low, top = scale
    if top <= low:
        raise ValueError(f"failed to find threshold {low} - {top}")
    out = (dat.astype(np.float32) - low) * (256.0 / (top - low))
    return np.clip(out, 0, 255).astype(np.uint8), (low, top)


def log10_stretch(dat, v_min=500.0, v_max=4500.0):
    """F2: log10 surface-reflectance stretch.

    [ref: util/visualize_bands.py:25-59] — clamp to [v_min, v_max-v_min],
    then log10 map onto 0-255 (reference's exact clamp quirk preserved:
    the upper clamp uses ``v_max - v_min``)."""
    dat = np.asarray(dat, dtype=np.float64).copy()
    low, top = np.log10(v_min), np.log10(v_max)
    dat[dat > (v_max - v_min)] = v_max - v_min
    dat[dat < v_min] = v_min
    out = np.zeros(dat.shape, dtype=np.uint8)
    sel = dat > v_min
    out[sel] = ((np.log10(dat[sel]) - low) * (256.0 / (top - low))).astype(np.uint8)
    return out


def colorize_byte(dat, breaks, codes, nodata=None):
    """F3: threshold colorize to palette codes.

    [ref: mod/geo_raster_c.pyx:616-632] — ascending breaks; each pixel gets
    the code of the highest break it reaches; non-matching/nodata -> 255."""
    dat = np.asarray(dat)
    out = np.full(dat.shape, 255, dtype=np.uint8)
    idx = np.ones(dat.shape, dtype=bool) if nodata is None else dat != nodata
    for k, code in sorted(zip(breaks, codes)):
        i = idx & (dat >= k)
        out[i] = code
        idx = i
    return out


def colorize_rgba(dat, breaks, colors, nodata=None, interpolate=True):
    """F3: threshold colorize to RGBA planes (4, H, W).

    [ref: mod/geo_raster_c.pyx:634-657]; ``interpolate`` blends linearly
    between consecutive break colors [ref: lib/color_table.py:130-247]."""
    dat = np.asarray(dat, dtype=np.float64)
    out = np.zeros((4,) + dat.shape, dtype=np.uint8)
    idx = np.ones(dat.shape, dtype=bool) if nodata is None else dat != nodata
    pairs = sorted(zip(breaks, colors))
    for j, (k, color) in enumerate(pairs):
        i = idx & (dat >= k)
        if interpolate and j + 1 < len(pairs):
            k2, c2 = pairs[j + 1]
            t = np.clip((dat - k) / max(k2 - k, 1e-300), 0.0, 1.0)
            for b in range(4):
                blended = (1 - t) * color[b] + t * c2[b]
                out[b][i] = blended[i].astype(np.uint8)
        else:
            for b in range(4):
                out[b][i] = color[b]
        idx = i
    return out


def burn_band(rgba, ref_gray, ref_nodata=None, offset=250):
    """F4: burn a grayscale band into an RGBA image (+ref - offset, clamp);
    alpha zeroed where ref is nodata.  [ref: lib/band_op.py:9-57]"""
    out = rgba.astype(np.int16).copy()
    ref = np.asarray(ref_gray, dtype=np.int16)
    for b in range(3):
        ch = out[b] + ref - offset
        out[b] = np.clip(ch, 0, 255)
    alpha = out[3]
    if ref_nodata is not None:
        alpha[ref == ref_nodata] = 0
    out[3] = alpha
    return out.astype(np.uint8)


def burn_transparency(rgba, ref, v_min, v_max, ref_nodata=None):
    """F4b: alpha channel from a value range.  [ref: lib/band_op.py:59-84]"""
    out = np.asarray(rgba).copy()
    d = (np.asarray(ref, dtype=np.float64) - v_min) * 255.0 / (v_max - v_min)
    d = np.clip(d, 0, 255)
    if ref_nodata is not None:
        d[np.asarray(ref) == ref_nodata] = 0
    out[3] = d.astype(np.uint8)
    return out


# QA class codes (F6/F7)
QA_LAND, QA_WATER, QA_CLOUD, QA_SNOW, QA_SHADOW, QA_NODATA = 0, 1, 2, 3, 4, 255


def convert_qa(dat):
    """F6: LEDAPS QA bit-decode to {0 valid, 1 water, 2 cloud, 3 snow,
    9 invalid}.  Vectorized with the reference's exact precedence
    [ref: mod/lc_agg_module.pyx:192-235]."""
    d = np.asarray(dat).astype(np.int64)
    out = np.zeros(d.shape, dtype=np.uint8)
    water = (d & 0x800) == 0
    cloud = (d & 0x2300) > 0
    snow = (d & 0x410) > 0
    invalid = (d & 0x1) > 0
    out[water] = 1
    out[cloud] = 2
    out[snow] = 3
    out[invalid] = 9
    return out


def from_fmask(dat, code_set=1):
    """F7: fmask -> simple QA recode via lookup
    [ref: lib/landsat_dataset.py:37-59].  code_set 1 = {0 land, 2 shadow,
    4 cloud, 1 water, 3 snow, 255 nodata}; 0 = legacy coding."""
    mapping = ({0: QA_LAND, 2: QA_SHADOW, 4: QA_CLOUD, 1: QA_WATER,
                3: QA_SNOW, 255: QA_NODATA}
               if code_set == 1 else
               {1: QA_LAND, 2: QA_WATER, 3: QA_SHADOW, 4: QA_CLOUD,
                5: QA_SNOW, 0: QA_NODATA})
    d = np.asarray(dat)
    out = np.full(d.shape, QA_NODATA, dtype=np.uint8)
    for src, dst in mapping.items():
        out[d == src] = dst
    return out


def parse_color_table(text: str):
    """F8: GDAL txt color table -> (breaks, colors).

    [ref: mod/geo_raster_c.pyx:1358-1386; lib/color_table.py:22-128] —
    lines of ``value r g b [a]``; '#' comments skipped."""
    breaks, colors = [], []
    for line in text.splitlines():
        line = line.split("#")[0].strip()
        if not line:
            continue
        parts = line.replace(",", " ").split()
        breaks.append(float(parts[0]))
        rgba = [int(float(p)) for p in parts[1:5]]
        while len(rgba) < 4:
            rgba.append(255)
        colors.append(tuple(rgba))
    return breaks, colors


def render_density_map(hist, log: bool = True, vmin=None, vmax=None,
                       diagonal: bool = True, dash: int = 6):
    """Rendered density map: 2-D histogram counts -> RGBA image.

    The reference draws this with matplotlib/PIL
    [ref: lib/density_map.py:64-131]: ``np.histogram2d`` counts, positive
    cells ``log10``-transformed (or ``(h+10)/10`` when not log), rendered
    with ``imshow(hist.T, origin='lower')`` plus a dashed 1:1 line.  Here
    the same transform + a built-in blue->red heat gradient + the dashed
    diagonal, pure NumPy, (4, H, W) RGBA planes (``codecs.encode_png``
    takes them with ``planes_first=True``).

    ``hist``: (nx, ny) counts, x = columns of the scatter's first axis —
    the output image row 0 is the TOP (max y), matching origin='lower'
    rendering of the transpose, so the diagonal runs bottom-left to
    top-right exactly like the reference's 1:1 line."""
    h = np.asarray(hist, dtype=np.float64).copy()
    pos = h > 0
    if log:
        h[pos] = np.log10(h[pos])           # [ref: density_map.py:103-104]
    else:
        h[pos] = (h[pos] + 10.0) / 10.0     # [ref: density_map.py:106-107]
    lo = float(h[pos].min()) if (vmin is None and pos.any()) else float(vmin or 0.0)
    hi = float(h.max()) if vmax is None else float(vmax)
    if hi <= lo:
        hi = lo + 1.0
    scaled = np.clip((h - lo) / (hi - lo), 0.0, 1.0) * 100.0
    scaled[~pos] = -1.0                      # empty cells stay background
    # imshow(hist.T, origin='lower'): x -> image columns, y -> rows bottom-up
    img = scaled.T[::-1, :]
    # blue -> cyan -> green -> yellow -> red heat ramp over [0, 100]
    breaks = [0.0, 25.0, 50.0, 75.0, 100.0]
    colors = [(0, 0, 160, 255), (0, 200, 255, 255), (0, 220, 0, 255),
              (255, 230, 0, 255), (230, 0, 0, 255)]
    rgba = colorize_rgba(img, breaks, colors, nodata=-1.0, interpolate=True)
    rgba[3][img < 0] = 255                   # opaque black background
    if diagonal:                             # dashed white 1:1 line
        ny, nx = img.shape
        t = np.linspace(0.0, 1.0, max(nx, ny) * 2)
        cc = np.clip((t * (nx - 1)).round().astype(np.int64), 0, nx - 1)
        rr = np.clip(((1.0 - t) * (ny - 1)).round().astype(np.int64), 0, ny - 1)
        on = (np.arange(t.size) // dash) % 2 == 0
        for b, v in enumerate((255, 255, 255, 255)):
            rgba[b][rr[on], cc[on]] = v
    return rgba
