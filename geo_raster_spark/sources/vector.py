"""Vector output (SURVEY.md §2.1 S8): polygons/points + attributes to
GeoJSON — the reference writes SHP/KML/GeoJSON via OGR
[ref: mod/geo_base_c.pyx:1047-1091; lib/global_task.py:277-315]; GeoJSON is
the self-contained equivalent here (readable by OGR/GeoPandas/QGIS)."""

from __future__ import annotations

import json

import numpy as np

from .. import geometry


def feature(ring_or_point, props: dict) -> dict:
    """Rings crossing ±180° are split into a MultiPolygon
    [ref: util/raster_extent2shp.py:83-123 _split_polygons]."""
    arr = np.asarray(ring_or_point, dtype=np.float64)
    if arr.ndim == 1:
        geom = {"type": "Point", "coordinates": [float(arr[0]), float(arr[1])]}
    else:
        parts = geometry.split_ring_antimeridian(geometry.ring_close(arr))
        if len(parts) == 1:
            geom = {"type": "Polygon", "coordinates": [parts[0].tolist()]}
        else:
            geom = {"type": "MultiPolygon",
                    "coordinates": [[p.tolist()] for p in parts]}
    return {"type": "Feature", "geometry": geom, "properties": props}


def write_geojson(path: str, features: list[dict], crs: str = "EPSG:4326") -> None:
    fc = {"type": "FeatureCollection",
          "crs": {"type": "name", "properties": {"name": crs}},
          "features": features}
    with open(path, "w") as f:
        json.dump(fc, f)


def footprints_to_geojson(df, path: str, limit: int | None = None) -> int:
    """Images-with-footprint DataFrame -> GeoJSON footprint index
    (the ``raster_extent2shp`` analog, util/raster_extent2shp.py:125-158)."""
    rows = df.select("image_id", "minx", "miny", "maxx", "maxy")
    if limit:
        rows = rows.limit(limit)
    feats = []
    for r in rows.collect():
        ring = geometry.bbox_to_ring((r["minx"], r["miny"], r["maxx"], r["maxy"]))
        feats.append(feature(ring, {"image_id": r["image_id"]}))
    write_geojson(path, feats)
    return len(feats)
