"""NumPy raster kernels — the numeric core executed inside pandas/Arrow UDFs.

Each module reimplements the *loop semantics* of a reference Cython module as
vectorized NumPy (never a code translation):

- ``agg``         area-weighted resampling aggregates   [ref: mod/agg_band.pyx]
- ``focal``       neighborhood/window ops               [ref: mod/mod_filter.pyx, mod/filter_band.pyx, mod/geo_grid_c.pyx]
- ``warp``        cross-CRS block warp + mosaic          [ref: mod/geo_raster_c.pyx:955-1049, mod/geo_raster_ex_c.pyx:1093-1246]
- ``rasterize``   polygon burn / mask / zonal stats      [ref: lib/rasterize_band.py, mod/geo_raster_ex_c.pyx:1272-1297]
- ``interpolate`` IDW                                    [ref: mod/geo_interpolate.pyx]
- ``stats``       histograms, regression, error metrics  [ref: mod/stat_band.pyx, lib/linear_regress.py, lib/cal_metrics.py]
"""
