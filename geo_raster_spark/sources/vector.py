"""Vector I/O (SURVEY.md §2.1 S7/S8): polygons/points + attributes to
GeoJSON, KML and ESRI Shapefile — the reference writes all three via OGR
[ref: mod/geo_base_c.pyx:1047-1091; lib/global_task.py:277-315].  GeoJSON
and KML are self-contained text; the shapefile writer emits the .shp/.shx
pair from the public ESRI spec with the attribute table through the
in-repo dBase III writer (``sources.dbf``) — all three readable by
OGR/GeoPandas/QGIS.  ``read_shp`` round-trips Point/Polygon shapefiles."""

from __future__ import annotations

import json
import struct
from xml.sax.saxutils import escape

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


def write_kml(path: str, geoms: list, props: list,
              name_key: str | None = None) -> None:
    """Placemarks for points ((2,) arrays) / polygon rings ((n, 2) arrays)
    with ExtendedData attributes — the reference's KML output slot
    [ref: mod/geo_base_c.pyx:1047-1091 'KML' driver branch]."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>']
    for g, p in zip(geoms, props):
        arr = np.asarray(g, dtype=np.float64)
        out.append("<Placemark>")
        if name_key and name_key in p:
            out.append(f"<name>{escape(str(p[name_key]))}</name>")
        if p:
            out.append("<ExtendedData>")
            for k, v in p.items():
                out.append(f'<Data name="{escape(str(k))}">'
                           f"<value>{escape(str(v))}</value></Data>")
            out.append("</ExtendedData>")
        if arr.ndim == 1:
            out.append(f"<Point><coordinates>{arr[0]!r},{arr[1]!r},0"
                       f"</coordinates></Point>")
        else:
            ring = geometry.ring_close(arr)
            coords = " ".join(f"{x!r},{y!r},0" for x, y in ring)
            out.append("<Polygon><outerBoundaryIs><LinearRing><coordinates>"
                       f"{coords}</coordinates></LinearRing>"
                       "</outerBoundaryIs></Polygon>")
        out.append("</Placemark>")
    out.append("</Document></kml>")
    with open(path, "w") as f:
        f.write("\n".join(out))


def write_shp(path: str, geoms: list, props_pdf=None) -> None:
    """ESRI Shapefile writer (public spec): ``path``.shp + .shx, attributes
    to ``path``.dbf via the in-repo dBase III writer.  ``geoms`` are all
    points ((2,) arrays -> type 1) or all polygon rings ((n, 2) arrays ->
    type 5, outer ring forced CLOCKWISE per spec).  ``path`` may include or
    omit the .shp suffix."""
    from . import dbf as dbf_mod
    base = path[:-4] if path.lower().endswith(".shp") else path
    arrs = [np.asarray(g, dtype=np.float64) for g in geoms]
    is_point = arrs and arrs[0].ndim == 1
    shape_type = 1 if is_point else 5

    recs = []
    for a in arrs:
        if is_point:
            recs.append(struct.pack("<idd", 1, float(a[0]), float(a[1])))
        else:
            ring = geometry.ring_close(a)
            if geometry.ring_area(ring) > 0:      # outer rings are CW in SHP
                ring = ring[::-1]
            bb = geometry.ring_bbox(ring)
            head = struct.pack("<i4dii i", 5, *bb, 1, len(ring), 0)
            recs.append(head + ring.astype("<f8").tobytes())

    if arrs:
        if is_point:
            xs = np.array([a[0] for a in arrs])
            ys = np.array([a[1] for a in arrs])
            bbox = (xs.min(), ys.min(), xs.max(), ys.max())
        else:
            bbs = [geometry.ring_bbox(a) for a in arrs]
            bbox = (min(b[0] for b in bbs), min(b[1] for b in bbs),
                    max(b[2] for b in bbs), max(b[3] for b in bbs))
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)

    def header(total_words: int) -> bytes:
        return (struct.pack(">i", 9994) + b"\x00" * 20
                + struct.pack(">i", total_words)
                + struct.pack("<ii", 1000, shape_type)
                + struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0))

    shp = bytearray()
    shx = bytearray()
    offset = 50  # header words
    for i, content in enumerate(recs):
        words = len(content) // 2
        shp += struct.pack(">ii", i + 1, words) + content
        shx += struct.pack(">ii", offset, words)
        offset += 4 + words
    with open(base + ".shp", "wb") as f:
        f.write(header(offset) + bytes(shp))
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + 4 * len(recs)) + bytes(shx))
    if props_pdf is not None:
        dbf_mod.write_dbf(props_pdf, base + ".dbf")


def read_shp(path: str):
    """-> (geoms, props_pdf|None): Point/Polygon shapefile reader
    (single-ring polygons; attributes from the .dbf sidecar if present)."""
    import os
    from . import dbf as dbf_mod
    base = path[:-4] if path.lower().endswith(".shp") else path
    with open(base + ".shp", "rb") as f:
        data = f.read()
    (total_words,) = struct.unpack_from(">i", data, 24)
    (shape_type,) = struct.unpack_from("<i", data, 32)
    geoms = []
    pos = 100
    end = total_words * 2
    while pos < end:
        _recno, words = struct.unpack_from(">ii", data, pos)
        pos += 8
        (stype,) = struct.unpack_from("<i", data, pos)
        if stype == 1:
            x, y = struct.unpack_from("<dd", data, pos + 4)
            geoms.append(np.array([x, y]))
        elif stype == 5:
            nparts, npoints = struct.unpack_from("<ii", data, pos + 36)
            off = pos + 44 + 4 * nparts
            pts = np.frombuffer(data, "<f8", npoints * 2, off).reshape(-1, 2)
            geoms.append(pts.copy())
        elif stype != 0:  # 0 = null shape
            raise NotImplementedError(f"shape type {stype}")
        pos += words * 2
    props = None
    if os.path.exists(base + ".dbf"):
        props = dbf_mod.read_dbf_pandas(base + ".dbf")
    return geoms, props


def zones_from_shp(path: str, zone_id_field: str | None = None):
    """Polygon shapefile -> the zones_pdf contract every PIP/zonal operator
    takes (columns ``zone_id`` int + ``geometry`` WKB) — the reference's
    'zones come from a shapefile' entry path [ref: mod/geo_base_c.pyx:
    1047-1091 reads task polygons via the shapefile driver].  Attributes
    ride along; ``zone_id`` comes from ``zone_id_field`` when given (else
    the first integer DBF column, else the record index)."""
    import pandas as pd
    geoms, attrs = read_shp(path)
    rings = [np.asarray(g, dtype=np.float64) for g in geoms]
    if any(r.ndim != 2 for r in rings):
        raise ValueError("zones_from_shp needs a POLYGON shapefile")
    if attrs is not None and zone_id_field is None:
        for c in attrs.columns:
            if pd.api.types.is_integer_dtype(attrs[c]):
                zone_id_field = c
                break
    if attrs is not None and zone_id_field is not None:
        zid = attrs[zone_id_field].astype(int).tolist()
    else:
        zid = list(range(len(rings)))
    out = pd.DataFrame({
        "zone_id": zid,
        "geometry": [geometry.ring_to_wkb(r) for r in rings]})
    if attrs is not None:
        for c in attrs.columns:
            if c != zone_id_field:
                out[c] = attrs[c].values
    return out


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
