"""Core module tests: grid math, CRS, geometry, DGGS, codecs, synth."""

import numpy as np
import pytest

from geo_raster_spark import codecs, crs, dggs, geometry, grid, synth


# --- grid -------------------------------------------------------------------

def test_tile_grid_dims_and_tags():
    g = grid.TileGrid()
    assert (g.n_cols, g.n_rows) == (360, 180)
    assert grid.tile_tag(3, 45) == "h003v045"
    assert grid.geo_tile_tag(g, 0, 0) == "180W90N"
    assert grid.geo_tile_tag(g, 183, 88) == "003E02N"
    s = grid.TileGrid(image_size=3000, cell_size=30, is_geog=False, crs="SINU")
    assert s.n_cols == s.n_rows == 444


def test_to_cell_truncates_toward_zero():
    gt = (0.0, 1.0, 0, 0.0, 0, -1.0)
    col, row = grid.to_cell(gt, np.array([-0.5, 0.5]), np.array([0.5, -0.5]))
    assert col.tolist() == [0, 0] and row.tolist() == [0, 0]


def test_to_location_pixel_center():
    gt = (100.0, 2.0, 0, 50.0, 0, -2.0)
    x, y = grid.to_location(gt, 0, 0)
    assert (x, y) == (101.0, 49.0)


def test_align_snaps_outward():
    info = grid.RasterInfo((0.0, 1.0, 0, 10.0, 0, -1.0), 10, 10)
    a = info.align((1.2, 1.2, 3.7, 3.7))
    assert a.gt[0] == 1.0 and a.gt[3] == 4.0 and (a.width, a.height) == (3, 3)


def test_read_window_pads_nodata():
    info = grid.RasterInfo((0.0, 1.0, 0, 10.0, 0, -1.0), 10, 10)
    d = np.arange(100, dtype=float).reshape(10, 10)
    out, oinfo = grid.read_window(d, info, (-2.0, 6.0, 4.0, 12.0), nodata=-1)
    assert out.shape == (6, 6)
    assert (out[:2] == -1).all() and (out[:, :2] == -1).all()
    assert out[2, 2] == d[0, 0]


def test_list_tiles_matches_bruteforce():
    g = grid.TileGrid()
    ext = (-3.25, -2.5, 4.75, 1.5)
    fast = set(g.list_tiles(ext))
    brute = set()
    for row in range(g.n_rows):
        for col in range(g.n_cols):
            te = g.tile_extent(col, row)
            if te[0] <= ext[2] and te[2] >= ext[0] and te[1] <= ext[3] and te[3] >= ext[1]:
                brute.add((col, row))
    assert fast == brute


def test_tile_output_path():
    assert grid.tile_output_path("/out", 12, 34, "tcc") == \
        "/out/data/h012/v034/h012v034/h012v034_tcc"


# --- crs --------------------------------------------------------------------

def test_crs_roundtrips():
    lon = np.array([10.0, -170.0, 0.0])
    lat = np.array([45.0, -59.0, 80.0])
    for c in ["SINU", "EPSG:3857"]:
        x, y = crs.transform("EPSG:4326", c, lon, lat)
        lo, la = crs.transform(c, "EPSG:4326", x, y)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)


def test_transform_extent_contains_corners():
    ext = (10.0, 40.0, 12.0, 42.0)
    sx = crs.transform_extent("EPSG:4326", "SINU", ext)
    cx, cy = crs.transform("EPSG:4326", "SINU",
                           np.array([10.0, 12.0]), np.array([40.0, 42.0]))
    assert sx[0] <= cx.min() and sx[2] >= cx.max()


# --- geometry ---------------------------------------------------------------

def test_pip_and_area():
    tri = np.array([[0, 0], [10, 0], [5, 10]], float)
    assert geometry.points_in_ring(tri, np.array([5.0, -1.0]), np.array([3.0, 3.0])).tolist() == [True, False]
    assert abs(geometry.ring_area(geometry.ring_close(tri)) - 50) < 1e-12


def test_wkb_roundtrip():
    tri = geometry.ring_close(np.array([[0, 0], [4, 0], [2, 3]], float))
    assert np.allclose(geometry.wkb_to_ring(geometry.ring_to_wkb(tri)), tri)


def test_clip_convex():
    tri = np.array([[0, 0], [10, 0], [5, 10]], float)
    c = geometry.clip_convex(tri, geometry.bbox_to_ring((0, 0, 5, 5)))
    assert abs(abs(geometry.ring_area(c)) - 18.75) < 1e-9
    assert geometry.clip_convex(tri, geometry.bbox_to_ring((50, 50, 60, 60))) is None


def test_rings_intersect():
    a = geometry.bbox_to_ring((0, 0, 2, 2))
    assert geometry.rings_intersect(a, geometry.bbox_to_ring((1, 1, 3, 3)))
    assert not geometry.rings_intersect(a, geometry.bbox_to_ring((5, 5, 6, 6)))
    # crossing without contained vertices
    cross = np.array([[-1, 0.5], [3, 0.5], [3, 1.5], [-1, 1.5]], float)
    assert geometry.rings_intersect(a, cross)


# --- dggs -------------------------------------------------------------------

def test_cell_pack_unpack_roundtrip():
    c = dggs.latlng_to_cell(np.array([12.3]), np.array([-45.6]), 9)
    res, col, row = dggs.unpack(c)
    assert res[0] == 9
    bb = dggs.cell_to_bbox(c)
    assert bb[0] <= 12.3 <= bb[2] and bb[1] <= -45.6 <= bb[3]


def test_k_ring_pole_clamp_and_wrap():
    c = int(dggs.latlng_to_cell(np.array([0.0]), np.array([89.9]), 3)[0])
    assert len(dggs.k_ring(c, 1)) == 6
    c2 = int(dggs.latlng_to_cell(np.array([179.9]), np.array([0.0]), 3)[0])
    cols = set(int(v) for v in dggs.unpack(dggs.k_ring(c2, 1))[1])
    assert 0 in cols and 15 in cols


def test_parent_and_cover():
    c = dggs.latlng_to_cell(np.array([10.0]), np.array([10.0]), 9)
    p = dggs.parent(c, 7)
    pb = dggs.cell_to_bbox(p)
    cb = dggs.cell_to_bbox(c)
    assert pb[0] <= cb[0] and pb[2] >= cb[2]
    cover = dggs.polygon_cover(geometry.bbox_to_ring((-1, -1, 1, 1)), 7)
    assert len(cover) >= 4


# --- codecs -----------------------------------------------------------------

@pytest.mark.parametrize("fmt", ["npy", "png", "jpeg"])
def test_codec_roundtrip(fmt):
    arr = synth.image_pixels(3, 64, 96, 987654321)
    dec = codecs.decode(codecs.encode(arr, fmt), fmt)
    assert dec.shape == arr.shape
    if codecs.is_lossless(fmt):
        assert np.array_equal(dec, arr)
    else:
        assert codecs.psnr(arr, dec) >= 40.0


def test_codec_error_paths():
    with pytest.raises(NotImplementedError):
        codecs.decode(b"\xff\xd8\xff\xe0 jfif", "jpeg")
    with pytest.raises(ValueError):
        codecs.decode(b"nope", "png")


# --- synth ------------------------------------------------------------------

def test_images_deterministic_and_batch_stable():
    a = synth.images_pandas(6)
    b = synth.images_pandas(3, start=3)
    pa = a.iloc[3:].reset_index(drop=True)
    assert pa[["image_id", "caption", "phash"]].equals(b[["image_id", "caption", "phash"]])
    assert all(x == y for x, y in zip(pa["bytes"], b["bytes"]))


def test_zones_hot_fixture():
    z = synth.zones_pandas(16, hot=True)
    ring = geometry.wkb_to_ring(z.iloc[0]["geometry"])
    assert abs(abs(geometry.ring_area(ring)) - 180.0 * 120.0) < 1e-6


def test_footprints_within_bounds():
    m = synth.image_meta(np.arange(500))
    assert (m["minx"] >= -181).all() and (m["maxx"] <= 181).all()
    assert (m["miny"] >= -61).all() and (m["maxy"] <= 61).all()


def test_png_rgba_roundtrip():
    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (4, 20, 30)).astype(np.uint8)  # planes-first
    enc = codecs.encode_png(rgba)
    dec = codecs.decode_png(enc)
    assert dec.shape == (20, 30, 4)
    assert np.array_equal(dec, np.transpose(rgba, (1, 2, 0)))
    # viz pipeline: colorize then encode
    from geo_raster_spark.kernels import viz
    arr = synth.image_pixels(1, 32, 32, 42)
    col = viz.colorize_rgba(arr, [0, 128], [(0, 0, 255, 255), (255, 0, 0, 255)])
    enc2 = codecs.encode_png(col)
    assert codecs.decode_png(enc2).shape == (32, 32, 4)
