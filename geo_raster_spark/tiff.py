"""Minimal from-scratch TIFF / GeoTIFF codec (TIFF 6.0, public spec).

The reference's native on-disk format is GeoTIFF written through GDAL with
``predictor=2, tiled, lzw`` as the default creation options
[ref: mod/geo_raster_c.pyx:91-92, 1177-1268].  This module implements the
subset a real image table carrying those payloads needs, with zero native
dependencies:

- container: little-endian ("II") encode; II + big-endian ("MM") decode,
  first IFD, inline/offset tag values; BigTIFF (magic 43, 64-bit
  offsets) DECODE — archival mosaics past 4 GiB read; the encoder stays
  classic with a loud offset-ceiling guard;
- layout: STRIPED and TILED (RowsPerStrip / TileWidth+TileLength), both
  directions;
- compression: none (1), LZW (5) with the TIFF "early change" code
  widths, DEFLATE (8, zlib — the C-speed path for tile products;
  legacy code 32946 also decodes), and PackBits (32773), all encode +
  decode;
- predictor: horizontal differencing (2) for integer samples;
- samples: uint8 / uint16 gray, uint8 RGB (contiguous planar config),
  float32 gray (SampleFormat=3, predictor auto-disabled);
- geo: ModelPixelScaleTag (33550) + ModelTiepointTag (33922) so the
   6-element geotransform round-trips (north-up only, like the
  reference's writer).

Anything outside this subset raises ``ValueError`` loudly (same boundary
contract as the JPEG/PNG codecs: executors see one exception class for
unsupported/corrupt payloads).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_CLEAR, _EOI = 256, 257

# classic TIFF addresses blocks with 32-bit offsets; anything larger needs
# BigTIFF (which this module DECODES but does not write — see
# encode_tiff's guard).  Module-level so tests can exercise the guard
# without materializing 4 GiB.
_MAX_CLASSIC_OFFSET = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# LZW (TIFF 6.0 §13): MSB-first bit packing, 9->12 bit codes, early change
# ---------------------------------------------------------------------------

def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW (the libtiff/JDK de-facto timing, validated
    against the independent JDK ImageIO TIFF decoder in tests): the
    encoder's code width bumps after ASSIGNING entry 511/1023/2047
    (next_code reaching 512/1024/2048); the decoder, whose table add
    trails the encoder's by one code, bumps at 511/1023/2047 — the
    "early change" relative to GIF's 512/1024/2048 decoder timing.  The
    table resets via a Clear code when entry 4094 would be assigned."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == 512:
            width = 10
        elif next_code == 1024:
            width = 11
        elif next_code == 2048:
            width = 12
        elif next_code == 4094:
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
        # the DECODER adds a table entry after reading this final code and
        # may bump its width before reading EOI — mirror it (libtiff's
        # LZWPostEncode free_ent++ + re-check) so EOI is written at the
        # width the decoder will read it with
        next_code += 1
        if next_code == 512:
            width = 10
        elif next_code == 1024:
            width = 11
        elif next_code == 2048:
            width = 12
    emit(_EOI, width)
    if nbits:
        emit(0, 8 - nbits)  # flush
    return bytes(out)


def lzw_decode(data: bytes, expected: int | None = None) -> bytes:
    """Inverse of :func:`lzw_encode`.  The decoder's width bump trails the
    encoder's by one table add, so it fires at next==511/1023/2047."""
    out = bytearray()
    pos = 0          # bit position
    nbytes = len(data)

    def read(width):
        nonlocal pos
        end = pos + width
        if end > nbytes * 8:
            return _EOI  # truncated stream: stop cleanly
        code = 0
        p = pos
        while p < end:
            byte = data[p >> 3]
            take = min(8 - (p & 7), end - p)
            shift = 8 - (p & 7) - take
            code = (code << take) | ((byte >> shift) & ((1 << take) - 1))
            p += take
        pos = end
        return code

    table = [bytes([i]) for i in range(256)] + [b"", b""]
    next_code = 258
    width = 9
    old: bytes | None = None
    while True:
        code = read(width)
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            next_code = 258
            width = 9
            old = None
            continue
        if old is None:
            if code >= 256:
                raise ValueError("LZW: first code after clear not a literal")
            entry = table[code]
        elif code < next_code and code < len(table):
            entry = table[code]
        elif code == next_code:
            entry = old + old[:1]
        else:
            raise ValueError(f"LZW: code {code} out of range")
        out += entry
        if old is not None:
            table.append(old + entry[:1])
            next_code += 1
            if next_code == 511:
                width = 10
            elif next_code == 1023:
                width = 11
            elif next_code == 2047:
                width = 12
        old = entry
        if expected is not None and len(out) >= expected:
            break
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """TIFF §9 PackBits RLE encode: replicate runs of r in [2,128] emit
    header ``257 - r`` + the byte; literal runs of n in [1,128] emit
    ``n - 1`` + the bytes (a literal breaks at the next >=3-byte repeat,
    the spec's break-even point).  Cross-validated against the JDK
    ImageIO TIFF decoder in tests."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:                                  # run of j-i+1 in [2,128]
            out.append((257 - (j - i + 1)) & 0xFF)
            out.append(data[i])
            i = j + 1
        else:                                      # literal until 3-repeat
            while j < n and j - i < 128:
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF §9 PackBits RLE decode (legacy scanned-imagery TIFFs).
    n in [0,127]: copy n+1 literal bytes; n in [-127,-1]: repeat next
    byte 1-n times; -128: no-op."""
    out = bytearray()
    i = 0
    n_in = len(data)
    while i < n_in and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= n_in:
                break
            out += bytes([data[i]]) * (257 - n)
            i += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# predictor 2 (horizontal differencing, per sample, per row)
# ---------------------------------------------------------------------------

def _predict(block: np.ndarray) -> np.ndarray:
    """(rows, w[, spp]) int array -> horizontally-differenced copy."""
    d = block.copy()
    if d.ndim == 2:
        d[:, 1:] = block[:, 1:] - block[:, :-1]
    else:
        d[:, 1:, :] = block[:, 1:, :] - block[:, :-1, :]
    return d


def _unpredict(block: np.ndarray) -> np.ndarray:
    return np.add.accumulate(block, axis=1, dtype=block.dtype)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

_TYPE_ASCII, _TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE = 2, 3, 4, 12
_TYPE_SIZES = {_TYPE_ASCII: 1, _TYPE_SHORT: 2, _TYPE_LONG: 4,
               _TYPE_DOUBLE: 8}


def _pack_values(typ, values):
    if typ == _TYPE_ASCII:
        return bytes(values)
    fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[typ]
    return struct.pack("<" + fmt * len(values), *values)


def _geokeys(crs_id: str):
    """GeoKeyDirectory (34735, SHORTs) + GeoAsciiParams (34737) for a
    registry CRS id — GeoTIFF 1.0 §2.4.  EPSG-codeable ids write the
    GeographicType/ProjectedCSType key; every id also writes a GTCitation
    carrying the canonical string, so non-EPSG families (SINU, generic
    AEA:/LCC:/PS:) round-trip too (32767 = user-defined)."""
    from . import crs as crs_mod
    cid = crs_mod.normalize_crs(crs_id)
    code = crs_mod.to_epsg(cid)
    # degree-unit CRSs take the GeographicType key: WGS84 itself plus the
    # non-WGS84 geographic datums (EPSG:4230/4277/4267), which is_geographic()
    # deliberately excludes (it answers "is this the pivot frame")
    dd = crs_mod._parse_datum_crs(cid.upper())
    geographic = crs_mod.is_geographic(cid.upper()) \
        or (dd is not None and dd[1] == "geog")
    citation = (cid + "|").encode("ascii")
    keys = [(1024, 0, 1, 2 if geographic else 1),   # GTModelType
            (1025, 0, 1, 1),                        # GTRasterType: area
            (1026, 34737, len(citation), 0)]        # GTCitation
    if geographic:
        keys.append((2048, 0, 1, code if code else 32767))
    else:
        keys.append((3072, 0, 1, code if code else 32767))
    keys.sort(key=lambda k: k[0])
    directory = [1, 1, 0, len(keys)]
    for k in keys:
        directory += list(k)
    return directory, citation


def encode_tiff(arr: np.ndarray, compression: str = "lzw",
                predictor: int = 2, tiled: bool = True,
                tile_size: int = 256, rows_per_strip: int | None = None,
                gt=None, crs: str | None = None) -> bytes:
    """Array -> TIFF bytes (little-endian, single IFD).

    Defaults mirror the reference's creation options (tiled + LZW +
    predictor 2, [ref: mod/geo_raster_c.pyx:91-92]).  ``gt`` (optional
    6-element geotransform, north-up) is stored as
    ModelPixelScale + ModelTiepoint; ``crs`` (optional registry id /
    proj4 / WKT) as GeoKeyDirectory + GTCitation, EPSG-coded when the
    family has a code."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        spp = 1
    elif arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
        spp = 3
    else:
        raise ValueError(f"unsupported TIFF array shape {arr.shape} / "
                         f"dtype {arr.dtype} (gray 2-D or uint8 RGB)")
    if arr.dtype == np.uint8:
        bps, sample_format = 8, 1
    elif arr.dtype == np.uint16:
        bps, sample_format = 16, 1
    elif arr.dtype == np.float32:
        bps, sample_format = 32, 3
        predictor = 1  # horizontal differencing is integer-only
    else:
        raise ValueError(f"unsupported TIFF dtype {arr.dtype} "
                         "(uint8/uint16/float32)")
    if compression not in ("none", "lzw", "deflate", "packbits"):
        raise ValueError(f"unsupported TIFF compression {compression!r}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if compression in ("none", "packbits"):
        # TIFF §14 ties the Predictor tag to compression schemes; readers
        # ignore it on uncompressed data, and libtiff never wires the
        # predictor into the PackBits codec (both verified vs the JDK
        # decoder) — writing differenced samples there would be silently
        # wrong for every external reader
        predictor = 1
    h, w = arr.shape[:2]

    def block_bytes(block):
        if predictor == 2:
            block = _predict(block)
        raw = np.ascontiguousarray(block.astype(arr.dtype.newbyteorder("<"),
                                                copy=False)).tobytes()
        if compression == "lzw":
            return lzw_encode(raw)
        if compression == "deflate":
            return zlib.compress(raw, 6)
        if compression == "packbits":
            return packbits_encode(raw)
        return raw

    blocks = []
    if tiled:
        if tile_size % 16:
            raise ValueError("TIFF tile size must be a multiple of 16")
        tw = th = tile_size
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                t = arr[ty:ty + th, tx:tx + tw]
                if t.shape[0] != th or t.shape[1] != tw:
                    pad = [(0, th - t.shape[0]), (0, tw - t.shape[1])]
                    if spp == 3:
                        pad.append((0, 0))
                    t = np.pad(t, pad)
                blocks.append(block_bytes(t))
    else:
        if rows_per_strip is None:
            row_bytes = max(1, w * spp * bps // 8)
            rows_per_strip = max(1, min(h, 65536 // row_bytes))
        for y in range(0, h, rows_per_strip):
            blocks.append(block_bytes(arr[y:y + rows_per_strip]))

    tags = [
        (256, _TYPE_LONG, [w]),
        (257, _TYPE_LONG, [h]),
        (258, _TYPE_SHORT, [bps] * spp),
        (259, _TYPE_SHORT, [{"none": 1, "lzw": 5, "deflate": 8,
                             "packbits": 32773}[compression]]),
        (262, _TYPE_SHORT, [2 if spp == 3 else 1]),
        (277, _TYPE_SHORT, [spp]),
        (284, _TYPE_SHORT, [1]),
        (339, _TYPE_SHORT, [sample_format] * spp),
    ]
    if predictor == 2:
        tags.append((317, _TYPE_SHORT, [2]))
    if tiled:
        tags += [(322, _TYPE_LONG, [tw]), (323, _TYPE_LONG, [th]),
                 (324, _TYPE_LONG, None),   # offsets, filled below
                 (325, _TYPE_LONG, [len(b) for b in blocks])]
    else:
        tags += [(273, _TYPE_LONG, None),
                 (278, _TYPE_LONG, [rows_per_strip]),
                 (279, _TYPE_LONG, [len(b) for b in blocks])]
    if gt is not None:
        gt = [float(v) for v in gt]
        if gt[2] != 0.0 or gt[4] != 0.0:
            raise ValueError("TIFF geotransform must be north-up "
                             "(no rotation terms)")
        tags += [(33550, _TYPE_DOUBLE, [gt[1], -gt[5], 0.0]),
                 (33922, _TYPE_DOUBLE, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0])]
    if crs is not None:
        directory, citation = _geokeys(crs)
        tags += [(34735, _TYPE_SHORT, directory),
                 (34737, _TYPE_ASCII, citation)]
    tags.sort(key=lambda t: t[0])

    # layout: header(8) | IFD | overflow values | block data
    n = len(tags)
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4          # first overflow byte
    overflow = bytearray()
    offsets_tag_pos = None
    entries = []
    for tag, typ, values in tags:
        if values is None:                        # block offsets placeholder
            values = [0] * len(blocks)
            offsets_tag_pos = len(entries)
        raw = _pack_values(typ, values)
        if len(raw) <= 4:
            entries.append([tag, typ, len(values), raw.ljust(4, b"\0"), None])
        else:
            entries.append([tag, typ, len(values), None, len(overflow)])
            overflow += raw
    blocks_off = data_off + len(overflow)
    # now the real block offsets are known
    off = blocks_off
    block_offs = []
    for b in blocks:
        block_offs.append(off)
        off += len(b)
    if off > _MAX_CLASSIC_OFFSET:
        # classic TIFF carries 32-bit offsets; silently wrapping them
        # would produce a file every reader mis-addresses.  BigTIFF (the
        # 64-bit container) is out of scope — tile products are bounded
        # far below this; single-file mosaics that large should be tile
        # stores instead.
        raise ValueError(
            f"TIFF output would be {off} bytes — exceeds the classic-TIFF "
            "4 GiB offset ceiling (BigTIFF unsupported; write a tiled "
            "product set via tile_store instead)")
    tag, typ, cnt, inline, ov = entries[offsets_tag_pos]
    raw = _pack_values(typ, block_offs)
    if len(raw) <= 4:
        entries[offsets_tag_pos] = [tag, typ, cnt, raw.ljust(4, b"\0"), None]
    else:
        overflow[ov:ov + len(raw)] = raw

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n)
    for tag, typ, cnt, inline, ov in entries:
        val = inline if inline is not None else struct.pack("<I",
                                                            data_off + ov)
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)                   # no next IFD
    out += overflow
    for b in blocks:
        out += b
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _read_ifd(data: bytes):
    """-> (tags dict {id: list-of-values}, byteorder '<'|'>').

    Reads classic TIFF (magic 42) AND BigTIFF (magic 43, TIFF spec
    supplement 2: 8-byte offset size, 64-bit IFD offsets/counts, 20-byte
    IFD entries, LONG8/SLONG8/IFD8 value types) — archival mosaics past
    the 4 GiB ceiling DECODE; the encoder stays classic-only with its
    loud offset-ceiling guard."""
    try:
        if data[:2] == b"II":
            bo = "<"
        elif data[:2] == b"MM":
            bo = ">"
        else:
            raise ValueError("not a TIFF (no II/MM byte-order mark)")
        (magic,) = struct.unpack_from(bo + "H", data, 2)
        if magic == 42:
            big = False
            (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
        elif magic == 43:
            big = True
            osize, zero, ifd_off = struct.unpack_from(bo + "HHQ", data, 4)
            if osize != 8 or zero != 0:
                raise ValueError(
                    f"BigTIFF offset size {osize}/reserved {zero} "
                    "(want 8/0)")
        else:
            raise ValueError(f"not a TIFF (magic {magic}, want 42 or 43)")
        if big:
            (n,) = struct.unpack_from(bo + "Q", data, ifd_off)
            ent0, ent_sz, val_off, cnt_fmt = ifd_off + 8, 20, 12, "Q"
            inline_max = 8
        else:
            (n,) = struct.unpack_from(bo + "H", data, ifd_off)
            ent0, ent_sz, val_off, cnt_fmt = ifd_off + 2, 12, 8, "I"
            inline_max = 4
        tags = {}
        type_fmt = {1: "B", 2: "s", 3: "H", 4: "I", 5: "II", 12: "d",
                    6: "b", 8: "h", 9: "i", 11: "f",
                    16: "Q", 17: "q", 18: "Q"}
        type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8, 6: 1, 8: 2,
                     9: 4, 11: 4, 16: 8, 17: 8, 18: 8}
        if n > (len(data) - ent0) // ent_sz:
            raise ValueError(f"TIFF IFD claims {n} entries beyond payload")
        for i in range(n):
            tag, typ = struct.unpack_from(bo + "HH", data, ent0 + i * ent_sz)
            (cnt,) = struct.unpack_from(bo + cnt_fmt, data,
                                        ent0 + i * ent_sz + 4)
            if typ not in type_fmt:
                continue
            sz = type_size[typ] * cnt
            if sz > len(data):
                raise ValueError(
                    f"TIFF tag {tag}: {cnt} values ({sz} bytes) exceed "
                    f"the {len(data)}-byte payload")
            vpos = ent0 + i * ent_sz + val_off
            if sz > inline_max:
                (vpos,) = struct.unpack_from(bo + ("Q" if big else "I"),
                                             data, vpos)
            if typ == 2:
                tags[tag] = [data[vpos:vpos + cnt].split(b"\0")[0].decode(
                    "ascii", "replace")]
            elif typ == 5:  # rational -> float
                vals = struct.unpack_from(bo + "II" * cnt, data, vpos)
                tags[tag] = [vals[2 * j] / (vals[2 * j + 1] or 1)
                             for j in range(cnt)]
            else:
                tags[tag] = list(struct.unpack_from(
                    bo + type_fmt[typ] * cnt, data, vpos))
        return tags, bo
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt TIFF header/IFD ({e})") from e


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> array ((h, w) gray or (h, w, 3) RGB)."""
    data = bytes(data)
    tags, bo = _read_ifd(data)
    try:
        w = tags[256][0]
        h = tags[257][0]
    except (KeyError, IndexError) as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    if w <= 0 or h <= 0 or w * h > 2**34:
        raise ValueError(f"TIFF implausible dims {w}x{h}")
    spp = tags.get(277, [1])[0]
    bps_l = tags.get(258, [8])
    if len(set(bps_l)) != 1:
        raise ValueError(f"TIFF mixed bits-per-sample {bps_l}")
    bps = bps_l[0]
    comp = tags.get(259, [1])[0]
    pred = tags.get(317, [1])[0]
    sfmt = tags.get(339, [1])[0]
    planar = tags.get(284, [1])[0]
    if planar != 1:
        raise ValueError(f"TIFF planar configuration {planar} unsupported "
                         "(chunky only)")
    if comp not in (1, 5, 8, 32946, 32773):
        raise ValueError(f"TIFF compression {comp} unsupported "
                         "(none/LZW/deflate/PackBits only)")
    if pred not in (1, 2):
        raise ValueError(f"TIFF predictor {pred} unsupported")
    if spp not in (1, 3):
        raise ValueError(f"TIFF samples-per-pixel {spp} unsupported")
    dtype = {(8, 1): "u1", (16, 1): "u2", (32, 1): "u4",
             (8, 2): "i1", (16, 2): "i2", (32, 2): "i4",
             (32, 3): "f4", (64, 3): "f8"}.get((bps, sfmt))
    if dtype is None:
        raise ValueError(f"TIFF {bps}-bit sample format {sfmt} unsupported")
    dt = np.dtype(bo + dtype)

    def decode_block(raw, rows, cols):
        want = rows * cols * spp * dt.itemsize
        if comp == 5:
            raw = lzw_decode(raw, expected=want)
        elif comp in (8, 32946):
            try:
                raw = zlib.decompress(bytes(raw))
            except zlib.error as e:
                raise ValueError(f"TIFF deflate block corrupt ({e})") from e
        elif comp == 32773:
            raw = packbits_decode(raw, want)
        if len(raw) < want:
            raise ValueError(f"TIFF block short: {len(raw)} < {want} bytes")
        a = np.frombuffer(raw[:want], dtype=dt)
        a = a.reshape(rows, cols, spp) if spp > 1 else a.reshape(rows, cols)
        if pred == 2 and comp in (5, 8, 32946):
            # readers (libtiff/JDK, verified) ignore the Predictor tag on
            # uncompressed data, and libtiff never wires the predictor
            # into the PackBits codec — apply it only for LZW/deflate,
            # the codecs that actually implement it
            a = _unpredict(a.astype(dt.newbyteorder("="), copy=True))
        return a

    if 322 in tags:  # tiled
        if not tags.get(322) or not tags.get(323):
            raise ValueError("TIFF tiled layout missing TileWidth/TileLength")
        tw, th = tags[322][0], tags[323][0]
        if tw <= 0 or th <= 0:
            raise ValueError(f"TIFF invalid tile dims {tw}x{th}")
        offs, cnts = tags.get(324, []), tags.get(325, [])
        if len(cnts) < len(offs):
            raise ValueError("TIFF tile byte counts shorter than offsets")
        out = np.zeros((h, w, spp) if spp > 1 else (h, w),
                       dtype=dt.newbyteorder("="))
        i = 0
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                if i >= len(offs):
                    raise ValueError("TIFF: fewer tiles than the grid needs")
                block = decode_block(data[offs[i]:offs[i] + cnts[i]], th, tw)
                out[ty:ty + th, tx:tx + tw] = \
                    block[:min(th, h - ty), :min(tw, w - tx)]
                i += 1
        return out
    # striped
    offs = tags.get(273)
    cnts = tags.get(279)
    if not offs or not cnts:
        raise ValueError("TIFF missing strip offsets/byte counts")
    rps = tags.get(278, [h])[0]
    if rps <= 0:
        raise ValueError(f"TIFF invalid RowsPerStrip {rps}")
    parts = []
    for i, (o, c) in enumerate(zip(offs, cnts)):
        rows = min(rps, h - i * rps)
        if rows <= 0:
            break
        parts.append(decode_block(data[o:o + c], rows, w))
    got_rows = sum(p.shape[0] for p in parts)
    if got_rows != h:
        raise ValueError(f"TIFF strips cover {got_rows} of {h} rows")
    return np.concatenate(parts, axis=0).astype(np.dtype(dtype), copy=False)


def read_crs(data: bytes):
    """-> CRS registry id from the GeoKeys, or None when absent.
    Prefers the EPSG-coded ProjectedCSType/GeographicType keys; falls
    back to the GTCitation string (how non-EPSG families round-trip)."""
    tags, _ = _read_ifd(bytes(data))
    return _crs_from_tags(tags)


def _crs_from_tags(tags):
    directory = tags.get(34735)
    if not directory or len(directory) < 4:
        return None
    keys = {}
    for i in range(directory[3]):
        kid, loc, cnt, val = directory[4 + 4 * i:8 + 4 * i]
        keys[kid] = (loc, cnt, val)
    for kid in (3072, 2048):
        if kid in keys and keys[kid][0] == 0 and keys[kid][2] != 32767:
            return f"EPSG:{keys[kid][2]}"
    if 1026 in keys and keys[1026][0] == 34737:
        ascii_params = (tags.get(34737) or [""])[0]
        _loc, cnt, off = keys[1026]
        cite = ascii_params[off:off + cnt].rstrip("|")
        if cite:
            return cite
    return None


def read_info(data: bytes, crs_default: str | None = None):
    """-> :class:`~geo_raster_spark.grid.RasterInfo` assembled from the
    payload's own tags (dims + geotransform + CRS, the reference's
    ``geo_raster.open`` role [ref: mod/geo_raster_c.pyx:1149-1174]), or
    None when the TIFF carries no geotransform.

    A payload WITHOUT CRS GeoKeys raises unless ``crs_default`` names
    the CRS to assume — silently defaulting to 4326 would turn a
    meters-gt GeoTIFF into a nonsense degrees catalog downstream (the
    module's loud-failure boundary contract).  Parses the IFD once."""
    from .grid import RasterInfo
    data = bytes(data)
    tags, _ = _read_ifd(data)
    gt = _geo_from_tags(tags)
    if gt is None:
        return None
    if not tags.get(256) or not tags.get(257):
        raise ValueError("TIFF missing image dimensions")
    crs_id = _crs_from_tags(tags)
    if crs_id is None:
        if crs_default is None:
            raise ValueError(
                "GeoTIFF carries a geotransform but no CRS GeoKeys — "
                "pass crs_default= to name the CRS to assume")
        crs_id = crs_default
    return RasterInfo(tuple(gt), tags[256][0], tags[257][0], crs_id)


def read_geo(data: bytes):
    """-> 6-element geotransform from ModelPixelScale + ModelTiepoint, or
    None when the TIFF carries no geo tags."""
    tags, _ = _read_ifd(bytes(data))
    return _geo_from_tags(tags)


def _geo_from_tags(tags):
    scale, tie = tags.get(33550), tags.get(33922)
    if not scale or not tie or len(tie) < 6:
        return None
    i, j, _k, x, y, _z = tie[:6]
    return (x - i * scale[0], scale[0], 0.0,
            y + j * scale[1], 0.0, -scale[1])
