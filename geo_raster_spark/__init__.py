"""geo_raster_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reimplements the computational semantics of the reference engine
(``fengm/geo-raster``, read-only at /root/reference) as idiomatic Spark:
DataFrame/SQL plans optimized by Catalyst, with vectorized pandas/Arrow UDFs
for the raster kernels that SQL cannot express.

Layout
------
- ``grid``       affine grid math + the global tile grid (SURVEY.md §2.7)
- ``crs``        pure-NumPy CRS transforms (geographic / sinusoidal / mercator)
- ``geometry``   bbox + polygon algebra, vectorized point-in-polygon, WKB
- ``dggs``       hierarchical discrete-global-grid cell index (H3-role index)
- ``codecs``     image payload encode/decode (npy / png / lossy), PSNR
- ``synth``      deterministic synthetic ``images`` + ``zones`` tables
- ``kernels``    NumPy raster kernels (aggregation, focal, warp, rasterize…)
- ``operators``  Spark DataFrame operators (PIP join, tile assignment, kNN…)
- ``functions``  pure column-expression helpers (stay in Catalyst codegen)
- ``plans``      checkpoint table + resumable pipelines
"""

__version__ = "0.1.0"
