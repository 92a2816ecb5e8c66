"""Spark DataFrame operators — the engine's query surface.

Each module builds declarative DataFrame plans (Catalyst-optimized) and drops
to vectorized pandas/Arrow UDFs only for geometry/pixel math SQL can't
express:

- ``footprint``   derive footprint/bbox/cell columns from the images table
- ``pip_join``    broadcast prepared-geometry point-in-polygon join (J1)
- ``tile_assign`` global-grid tile assignment join (G1-G3/J2)
- ``knn``         k-ring kNN (J6)
- ``zonal``       zonal statistics over decoded pixels (A11/R1-R3)
- ``mosaic``      per-tile mosaic/tile-cut pipeline (G5/G11/J7)
- ``dedup``       exact / minhash / simhash near-duplicate detection
- ``similarity``  embedding ANN (brute-force + LSH-bucketed)
- ``text``        language-id, quality, token stats over documents
"""
