"""GeoTIFF codec (geo_raster_spark/tiff.py) — the reference's native
on-disk format [ref: mod/geo_raster_c.pyx:91-92, 1177-1268], subset:
striped/tiled, none/LZW, predictor 2, gray 8/16-bit + RGB + float32."""

import struct

import numpy as np
import pytest

from geo_raster_spark import codecs, synth, tiff


def test_lzw_known_vector():
    """Hand-derived TIFF-LZW stream for [7,7,7,8]: Clear,7,258,8,EOI at
    9 bits MSB-first -> 80 01 E0 40 88 08 (independent of the decoder)."""
    enc = tiff.lzw_encode(bytes([7, 7, 7, 8]))
    assert enc == bytes([0x80, 0x01, 0xE0, 0x40, 0x88, 0x08])
    assert tiff.lzw_decode(enc) == bytes([7, 7, 7, 8])


def test_lzw_roundtrip_width_bumps_and_reset():
    """Streams long enough to cross the 9->10->11->12 bit widths AND the
    4094-entry table reset round-trip exactly."""
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"\x00" * 10,
        bytes(rng.integers(0, 256, 60_000, dtype=np.uint8)),  # resets table
        bytes(rng.integers(0, 4, 8_000, dtype=np.uint8)),     # long matches
        bytes(np.tile(np.arange(256, dtype=np.uint8), 64)),
    ]
    for raw in cases:
        assert tiff.lzw_decode(tiff.lzw_encode(raw)) == raw


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("compression,predictor",
                         [("none", 1), ("lzw", 1), ("lzw", 2)])
def test_tiff_roundtrip_gray8(tiled, compression, predictor):
    a = synth.image_pixels(3, 150, 83, 0xABCD)  # non-multiple-of-16 dims
    data = tiff.encode_tiff(a, compression=compression, predictor=predictor,
                            tiled=tiled, tile_size=64)
    back = tiff.decode_tiff(data)
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back, a)


def test_tiff_roundtrip_gray16_rgb_float32():
    g16 = (synth.image_pixels(5, 70, 40, 0x55).astype(np.uint16) * 257)
    np.testing.assert_array_equal(tiff.decode_tiff(tiff.encode_tiff(g16)),
                                  g16)
    assert tiff.decode_tiff(tiff.encode_tiff(g16)).dtype == np.uint16

    rgb = synth.image_pixels_rgb(2, 90, 60, 0x77)
    for tiled in (False, True):
        back = tiff.decode_tiff(tiff.encode_tiff(rgb, tiled=tiled,
                                                 tile_size=32))
        np.testing.assert_array_equal(back, rgb)

    f32 = (synth.image_pixels(9, 33, 21, 0x11).astype(np.float32) / 3.0)
    back = tiff.decode_tiff(tiff.encode_tiff(f32))  # predictor auto-off
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back, f32)


def test_tiff_default_opts_match_reference():
    """Default creation options = the reference's (tiled + LZW +
    predictor 2): assert the tags say so."""
    data = tiff.encode_tiff(synth.image_pixels(1, 40, 30, 0x99))
    tags, bo = tiff._read_ifd(data)
    assert bo == "<"
    assert tags[259] == [5]          # LZW
    assert tags[317] == [2]          # horizontal predictor
    assert 322 in tags and 323 in tags   # tiled
    assert tags[322][0] % 16 == 0


def test_tiff_geotransform_roundtrip():
    gt = (-122.5, 0.01, 0.0, 47.75, 0.0, -0.01)
    data = tiff.encode_tiff(synth.image_pixels(1, 20, 20, 0x1), gt=gt)
    got = tiff.read_geo(data)
    assert got is not None
    np.testing.assert_allclose(got, gt, rtol=0, atol=1e-12)
    assert tiff.read_geo(tiff.encode_tiff(np.zeros((4, 4), np.uint8))) is None
    with pytest.raises(ValueError, match="north-up"):
        tiff.encode_tiff(np.zeros((4, 4), np.uint8),
                         gt=(0.0, 1.0, 0.5, 0.0, 0.0, -1.0))


def test_tiff_big_endian_decode():
    """A hand-built minimal big-endian (MM) striped TIFF decodes, including
    16-bit sample byte order."""
    a = (np.arange(12, dtype=np.uint16) * 999).reshape(3, 4)
    raw = a.astype(">u2").tobytes()
    # header + one IFD with 8 entries, strip data at the end
    entries = [
        (256, 3, 1, 4), (257, 3, 1, 3), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, None), (278, 3, 1, 3),
        (279, 4, 1, len(raw)),
    ]
    ifd_off = 8
    strip_off = ifd_off + 2 + len(entries) * 12 + 4
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off)
    buf += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        v = strip_off if val is None else val
        buf += struct.pack(">HHI", tag, typ, cnt)
        buf += struct.pack(">I", v << 16) if typ == 3 else struct.pack(">I", v)
    buf += struct.pack(">I", 0) + raw
    np.testing.assert_array_equal(tiff.decode_tiff(buf), a)


def test_tiff_dirty_payloads_fail_cleanly():
    """Corrupt/unsupported payloads raise ValueError, never Key/IndexError
    (executor boundary contract)."""
    good = tiff.encode_tiff(synth.image_pixels(1, 30, 30, 0x3))
    bads = [b"", b"II\x2b\x00", b"XX" + good[2:], good[:40],
            good[:len(good) - 25]]
    for b in bads:
        with pytest.raises(ValueError):
            tiff.decode_tiff(b)
    with pytest.raises(ValueError, match="compression"):
        tiff.encode_tiff(np.zeros((4, 4), np.uint8), compression="jpeg")
    with pytest.raises(ValueError, match="dtype"):
        tiff.encode_tiff(np.zeros((4, 4), np.int64))


def test_tif_codec_registered_in_dispatch():
    """codecs.encode/decode route fmt='tif'/'tiff' through the registry
    seam like every other payload format."""
    a = synth.image_pixels(8, 64, 48, 0xFE)
    for fmt in ("tif", "tiff"):
        np.testing.assert_array_equal(
            codecs.decode(codecs.encode(a, fmt), fmt), a)
    assert codecs.is_lossless("tif")


@pytest.mark.skipif(not __import__("geo_raster_spark.fastjpeg",
                                   fromlist=["available"]).available(),
                    reason="no JVM for the independent decoder")
def test_tiff_cross_validated_by_jdk_imageio():
    """INDEPENDENT conformance check: the JDK's ImageIO TIFF reader (a
    libtiff-interoperable implementation we didn't write) must decode our
    striped/tiled, none/LZW, predictor-1/2, gray+RGB output to the exact
    pixels — this pinned the LZW width-change timing (encoder bumps at
    next_code 512/1024/2048, decoder at 511/1023/2047) and the
    predictor-with-no-compression rule."""
    from geo_raster_spark import fastjpeg
    gray = synth.image_pixels(3, 150, 83, 0xABCD)
    rgb = synth.image_pixels_rgb(2, 90, 60, 0x77)
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, (120, 500), dtype=np.uint8)  # 9->11 bits
    cases = [
        (gray, dict(compression="none", tiled=False)),
        (gray, dict(compression="lzw", predictor=1, tiled=False)),
        (gray, dict(compression="lzw", predictor=2, tiled=False)),
        (gray, dict(compression="lzw", predictor=2, tiled=True,
                    tile_size=64)),
        (noisy, dict(compression="lzw", predictor=2, tiled=False)),
        (rgb, dict()),                      # default: tiled+lzw+pred2
        (rgb, dict(tiled=False)),
    ]
    try:
        for arr, kw in cases:
            back = fastjpeg.decode(tiff.encode_tiff(arr, **kw))
            np.testing.assert_array_equal(back, arr, err_msg=str(kw))
    finally:
        fastjpeg.close()


def test_tiff_crs_geokeys_roundtrip():
    """GeoKeyDirectory + GTCitation: EPSG-codeable ids round-trip through
    the coded key; non-EPSG families through the citation; read_info
    assembles a full RasterInfo from the payload alone."""
    a = synth.image_pixels(1, 20, 20, 0x1)
    gt = (-122.5, 0.01, 0.0, 47.75, 0.0, -0.01)
    for cid, want in [("EPSG:4326", "EPSG:4326"), ("SINU", "SINU"),
                      ("UTM:18N", "EPSG:32618"),
                      ("UTM:7S", "EPSG:32707"),
                      ("UTM83:18N", "EPSG:26918"),
                      ("EPSG:5070", "EPSG:5070"),
                      ("PS:70.0,-45.0", "PS:70.0,-45.0"),
                      ("AEA:29.5,45.5,23.0,-96.0", "AEA:29.5,45.5,23.0,-96.0")]:
        d = tiff.encode_tiff(a, gt=gt, crs=cid)
        assert tiff.read_crs(d) == want, cid
        info = tiff.read_info(d)
        assert (info.width, info.height, info.crs) == (20, 20, want)
        np.testing.assert_allclose(info.gt, gt, rtol=0, atol=1e-12)
        np.testing.assert_array_equal(tiff.decode_tiff(d), a)
    # no geo keys -> None; gt without crs -> LOUD unless crs_default
    # names the assumption (silent 4326 would read meters as degrees)
    assert tiff.read_crs(tiff.encode_tiff(a)) is None
    assert tiff.read_info(tiff.encode_tiff(a)) is None
    with pytest.raises(ValueError, match="GeoKeys"):
        tiff.read_info(tiff.encode_tiff(a, gt=gt))
    info = tiff.read_info(tiff.encode_tiff(a, gt=gt), crs_default="SINU")
    assert info is not None and info.crs == "SINU"


def test_tiff_deflate_and_packbits():
    """DEFLATE (8): zlib-backed — the C-speed tile-product path (no
    Python LZW loop in either direction); predictor 2 applies; legacy
    code 32946 decodes.  PackBits (32773) decodes per spec."""
    a = synth.image_pixels(3, 150, 83, 0xABCD)
    for tiled in (False, True):
        d = tiff.encode_tiff(a, compression="deflate", tiled=tiled,
                             tile_size=64)
        tags, _ = tiff._read_ifd(d)
        assert tags[259] == [8] and tags[317] == [2]
        np.testing.assert_array_equal(tiff.decode_tiff(d), a)
    g16 = a.astype(np.uint16) * 257
    np.testing.assert_array_equal(
        tiff.decode_tiff(tiff.encode_tiff(g16, compression="deflate")), g16)
    # legacy 32946 tag value decodes the same payload
    d = bytearray(tiff.encode_tiff(a, compression="deflate", tiled=False))
    import struct as _s
    pos = d.find(_s.pack("<HHI", 259, 3, 1))
    assert pos > 0
    d[pos + 8:pos + 12] = _s.pack("<I", 32946)
    np.testing.assert_array_equal(tiff.decode_tiff(bytes(d)), a)
    # packbits: literals, repeats, and the -128 no-op
    assert tiff.packbits_decode(bytes([2, 1, 2, 3, 0x80, 0xFE, 9]), 6) \
        == bytes([1, 2, 3, 9, 9, 9])


@pytest.mark.skipif(not __import__("geo_raster_spark.fastjpeg",
                                   fromlist=["available"]).available(),
                    reason="no JVM for the independent decoder")
def test_tiff_deflate_cross_validated_by_jdk_imageio():
    from geo_raster_spark import fastjpeg
    a = synth.image_pixels(5, 140, 90, 0x31)
    rgb = synth.image_pixels_rgb(1, 80, 50, 0x99)
    try:
        for arr in (a, rgb):
            for tiled in (False, True):
                d = tiff.encode_tiff(arr, compression="deflate",
                                     tiled=tiled, tile_size=64)
                np.testing.assert_array_equal(fastjpeg.decode(d), arr)
    finally:
        fastjpeg.close()


def test_lzw_tail_width_at_bump_boundaries():
    """Round-5 review find: streams whose FINAL table add lands exactly on
    a width-bump boundary (decoder bumps before reading EOI) must still
    round-trip — the encoder mirrors the decoder's post-final-code add
    (libtiff LZWPostEncode semantics).  Sweep lengths that empirically
    land the dictionary on/near 511/1023/2047 at EOI time."""
    import random
    random.seed(0)
    for n in list(range(380, 480, 4)) + list(range(840, 960, 4)) \
            + list(range(1780, 1860, 2)):
        data = bytes(random.randrange(256) for _ in range(n))
        assert tiff.lzw_decode(tiff.lzw_encode(data)) == data, n


@pytest.mark.skipif(not __import__("geo_raster_spark.fastjpeg",
                                   fromlist=["available"]).available(),
                    reason="no JVM")
def test_seam_tif_decode_routes_by_sample_format():
    """GSR_FASTJPEG seam: integer TIFFs go through the native helper
    (LZW 202 -> 19 ms/Mpix), float TIFFs MUST take the pure decoder —
    ImageIO silently degrades float samples rather than failing, so the
    route is decided from the SampleFormat tag, not exceptions."""
    from geo_raster_spark import fastjpeg
    a = synth.image_pixels(1, 120, 90, 0x42)
    try:
        np.testing.assert_array_equal(
            fastjpeg.decode_tif(tiff.encode_tiff(a, compression="lzw")), a)
        g16 = a.astype(np.uint16) * 257
        np.testing.assert_array_equal(
            fastjpeg.decode_tif(tiff.encode_tiff(g16)), g16)
        f32 = a.astype(np.float32) / 3.0
        out = fastjpeg.decode_tif(tiff.encode_tiff(f32))
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, f32)
    finally:
        fastjpeg.close()


def _patch_tag(data: bytes, tag: int, typ: int, count: int,
               old_val: bytes, new_val: bytes) -> bytes:
    """Replace the 4-byte inline value of an IFD entry (test scaffolding)."""
    ent = struct.pack("<HHI", tag, typ, count)
    pos = data.find(ent)
    assert pos > 0, f"tag {tag} not found"
    assert data[pos + 8:pos + 12] == old_val.ljust(4, b"\0")
    return data[:pos + 8] + new_val.ljust(4, b"\0") + data[pos + 12:]


def test_packbits_encode_roundtrip_and_tiff():
    """PackBits encode (round-5 verdict #7): raw round-trip on runs /
    literals / mixes, plus full TIFF encode->decode with compression tag
    32773 and predictor auto-disabled (libtiff never wires the predictor
    into the PackBits codec)."""
    rng = np.random.default_rng(11)
    cases = [b"", b"\x07" * 300, bytes(range(256)),
             bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
             bytes(rng.integers(0, 3, 4000, dtype=np.uint8))]
    for c in cases:
        assert tiff.packbits_decode(tiff.packbits_encode(c), len(c)) == c
    a = synth.image_pixels(9, 130, 71, 0x55)
    for tiled in (False, True):
        d = tiff.encode_tiff(a, compression="packbits", tiled=tiled,
                             tile_size=64)
        tags, _ = tiff._read_ifd(d)
        assert tags[259] == [32773] and 317 not in tags
        np.testing.assert_array_equal(tiff.decode_tiff(d), a)
    g16 = a.astype(np.uint16) * 257
    np.testing.assert_array_equal(
        tiff.decode_tiff(tiff.encode_tiff(g16, compression="packbits")), g16)


def test_packbits_with_predictor_tag_not_unpredicted():
    """A legacy file carrying Predictor=2 alongside PackBits data (which
    is NOT differenced — libtiff never applies the predictor there) must
    decode unchanged: build one by patching a deflate+predictor2 file's
    compression tag to 32773 and swapping in packbits literals of the
    UN-differenced samples (advice r5)."""
    a = synth.image_pixels(4, 90, 60, 0x21)
    d = tiff.encode_tiff(a, compression="deflate", predictor=2, tiled=False,
                         rows_per_strip=60)        # single strip, tag 317=2
    tags, _ = tiff._read_ifd(d)
    assert tags[317] == [2] and len(tags[273]) == 1
    pb = tiff.packbits_encode(a.tobytes())         # NOT differenced
    strip_off, strip_len = tags[273][0], tags[279][0]
    assert strip_off + strip_len == len(d)         # strip is the file tail
    d2 = d[:strip_off] + pb
    d2 = _patch_tag(d2, 259, 3, 1, struct.pack("<H", 8),
                    struct.pack("<H", 32773))
    d2 = _patch_tag(d2, 279, 4, 1, struct.pack("<I", strip_len),
                    struct.pack("<I", len(pb)))
    np.testing.assert_array_equal(tiff.decode_tiff(d2), a)


def test_bigtiff_offset_ceiling_guard(monkeypatch):
    """Offsets past the classic-TIFF 32-bit ceiling must raise (not wrap):
    exercised by shrinking the module ceiling so no 4 GiB allocation is
    needed — the guard compares the REAL computed final offset."""
    a = synth.image_pixels(2, 64, 64, 0x13)
    monkeypatch.setattr(tiff, "_MAX_CLASSIC_OFFSET", 1024)
    with pytest.raises(ValueError, match="BigTIFF"):
        tiff.encode_tiff(a, compression="none", tiled=False)
    monkeypatch.setattr(tiff, "_MAX_CLASSIC_OFFSET", 0xFFFFFFFF)
    assert isinstance(tiff.encode_tiff(a), bytes)


@pytest.mark.skipif(not __import__("geo_raster_spark.fastjpeg",
                                   fromlist=["available"]).available(),
                    reason="no JVM")
def test_seam_tif_decode_routes_wide_samples_to_pure_decoder():
    """32-bit unsigned TIFFs must NOT go through the JVM helper — its wire
    format caps at 16-bit samples, so the high half would be silently
    truncated (advice r5).  Build a u4 file by widening a u2 'none' strip
    file (encoder intentionally doesn't write u4), then assert
    decode_tif == decode_tiff with the full 32-bit range intact."""
    from geo_raster_spark import fastjpeg
    a16 = synth.image_pixels(6, 80, 50, 0x77).astype(np.uint16)
    d = tiff.encode_tiff(a16, compression="none", tiled=False,
                         rows_per_strip=50)        # single strip
    tags, _ = tiff._read_ifd(d)
    strip_off, strip_len = tags[273][0], tags[279][0]
    assert strip_off + strip_len == len(d)
    a32 = (a16.astype(np.uint32) * 65537 + 70000)  # exercises bits > 16
    d2 = d[:strip_off] + a32.astype("<u4").tobytes()
    d2 = _patch_tag(d2, 258, 3, 1, struct.pack("<H", 16),
                    struct.pack("<H", 32))
    d2 = _patch_tag(d2, 279, 4, 1, struct.pack("<I", strip_len),
                    struct.pack("<I", strip_len * 2))
    pure = tiff.decode_tiff(d2)
    assert pure.dtype == np.uint32 and pure.max() > 0xFFFF
    np.testing.assert_array_equal(pure, a32)
    try:
        out = fastjpeg.decode_tif(d2)
        np.testing.assert_array_equal(out, a32)
    finally:
        fastjpeg.close()


@pytest.mark.skipif(not __import__("geo_raster_spark.fastjpeg",
                                   fromlist=["available"]).available(),
                    reason="no JVM")
def test_packbits_encode_cross_validated_by_jdk_imageio():
    """A self-consistent encoder/decoder pair can hide spec deviations
    (the round-5 LZW lesson) — the PackBits ENCODER must also be readable
    by a decoder this repo did not write (JDK ImageIO TIFF reader)."""
    from geo_raster_spark import fastjpeg
    a = synth.image_pixels(8, 137, 91, 0x3C)
    rgb = synth.image_pixels_rgb(2, 70, 44, 0xB2)
    try:
        for arr in (a, rgb):
            for tiled in (False, True):
                d = tiff.encode_tiff(arr, compression="packbits",
                                     tiled=tiled, tile_size=64)
                np.testing.assert_array_equal(fastjpeg.decode(d), arr)
    finally:
        fastjpeg.close()


def test_geokeys_datum_crs_roundtrip():
    """Datum CRSs land in the right GeoKey: EPSG:27700 as ProjectedCSType
    (model type 1), EPSG:4230 as GeographicType (model type 2 — it is a
    degree-unit CRS even though is_geographic(), the WGS84-pivot check,
    is false for it), and both read back verbatim."""
    a = synth.image_pixels(3, 60, 40, 0x5)
    d = tiff.encode_tiff(a, gt=[400000.0, 10.0, 0.0, 200000.0, 0.0, -10.0],
                         crs="EPSG:27700")
    assert tiff.read_crs(d) == "EPSG:27700"
    tags, _ = tiff._read_ifd(d)
    dirr = tags[34735]
    keys = {dirr[4 + 4 * i]: dirr[7 + 4 * i] for i in range(dirr[3])}
    assert keys.get(3072) == 27700 and keys.get(1024) == 1

    d2 = tiff.encode_tiff(a, gt=[0.0, 0.001, 0.0, 52.0, 0.0, -0.001],
                          crs="EPSG:4230")
    assert tiff.read_crs(d2) == "EPSG:4230"
    tags2, _ = tiff._read_ifd(d2)
    dirr2 = tags2[34735]
    keys2 = {dirr2[4 + 4 * i]: dirr2[7 + 4 * i] for i in range(dirr2[3])}
    assert keys2.get(2048) == 4230 and 3072 not in keys2
    assert keys2.get(1024) == 2


def _make_bigtiff_gray(arr, compression=1, bo="<"):
    """Spec-built BigTIFF fixture (TIFF supplement 2 layout written here
    from the published structure, independent of the decoder): 8-byte
    offsets, 64-bit IFD counts, 20-byte entries, LONG8 strip fields."""
    h, w = arr.shape
    raw = arr.astype(np.dtype(bo + "u1") if arr.dtype == np.uint8
                     else np.dtype(bo + "u2")).tobytes()
    if compression == 5:
        raw = tiff.lzw_encode(arr.astype(arr.dtype.newbyteorder(bo))
                              .tobytes())
    bps = arr.dtype.itemsize * 8
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, bps),
        (259, 3, 1, compression), (262, 3, 1, 1),
        (273, 16, 1, None),               # StripOffsets LONG8, patched
        (277, 3, 1, 1), (278, 4, 1, h),
        (279, 16, 1, len(raw)),           # StripByteCounts LONG8
        (339, 3, 1, 1),
    ]
    ifd_off = 16
    data_off = ifd_off + 8 + len(entries) * 20 + 8
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM")
    out += struct.pack(bo + "HHHQ", 43, 8, 0, ifd_off)
    out += struct.pack(bo + "Q", len(entries))
    for tag, typ, cnt, val in entries:
        if val is None:
            val = data_off
        # inline values are LEFT-justified in the 8-byte field (spec),
        # which matters for big-endian fixtures
        vfield = struct.pack(bo + {3: "H", 4: "I", 16: "Q"}[typ],
                             val).ljust(8, b"\0")
        out += struct.pack(bo + "HHQ", tag, typ, cnt) + vfield
    out += struct.pack(bo + "Q", 0)       # no next IFD
    out += raw
    return bytes(out)


def test_bigtiff_decode_spec_fixture():
    """BigTIFF (magic 43) DECODES: spec-built fixtures — uncompressed +
    LZW, uint8 + uint16, little- AND big-endian — through decode_tiff
    and the fmt sniffer; the encoder keeps refusing to WRITE past the
    classic ceiling (that guard is separate and still tested)."""
    from geo_raster_spark import codecs
    a = synth.image_pixels(7, 90, 61, 0x44)
    for bo in ("<", ">"):
        d = _make_bigtiff_gray(a, compression=1, bo=bo)
        assert codecs.sniff_fmt(d) == "tif"
        np.testing.assert_array_equal(tiff.decode_tiff(d), a)
    d5 = _make_bigtiff_gray(a, compression=5)
    np.testing.assert_array_equal(tiff.decode_tiff(d5), a)
    g16 = a.astype(np.uint16) * 257
    d16 = _make_bigtiff_gray(g16)
    np.testing.assert_array_equal(tiff.decode_tiff(d16), g16)
    # malformed offset size -> loud
    bad = bytearray(_make_bigtiff_gray(a))
    bad[4:6] = struct.pack("<H", 4)
    with pytest.raises(ValueError, match="BigTIFF offset size"):
        tiff.decode_tiff(bytes(bad))
