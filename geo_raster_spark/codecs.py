"""Image payload encode/decode for the ``bytes``/``fmt`` columns.

The input contract (BASELINE.json ``input_hint``) is an images table with
``bytes:binary`` + ``fmt:string``.  No imaging library (PIL/imageio) exists
in this environment, so the engine ships self-contained codecs:

- ``npy``  — raw NumPy buffer (lossless).
- ``png``  — a real, spec-conformant minimal PNG writer/reader (8-bit
  grayscale, zlib/deflate, filter 0) — lossless, readable by any PNG tool.
- ``jpg``  — REAL baseline JPEG (JFIF): 8x8 DCT + Annex-K Huffman, pure
  NumPy (``geo_raster_spark.jpeg``).  Default quality 95 -> PSNR ≈ 42 dB
  even on noise-heavy bands, over the 40 dB parity gate.
- ``jpeg`` — the original DETERMINISTIC LOSSY STUB (uniform quantization,
  step q, + zlib), kept for byte-stable fixtures.  Real JFIF payloads under
  fmt="jpeg" are now auto-detected by their SOI marker and routed to the
  real decoder instead of raising.

Functions operate on 2-D uint8 arrays (single band — the reference's
byte-band common case [ref: mod/geo_raster_c.pyx:33-70 pixel type 1 =
uint8]) and, round 3, on (H, W, 3) RGB: PNG color type 2 and true color
baseline JFIF (4:4:4 / 4:2:2 / 4:2:0 YCbCr; the decoder accepts any
power-of-two sampling factors) — a real image+caption corpus is RGB.

Round 4: every fmt dispatches through a PLUGGABLE registry
(``register``) so a native codec can replace the hot decode path at
deployment, and ``grsc`` container payloads resolve ``file#dataset``
refs (``decode(data, "grsc#<name>")``).
"""

from __future__ import annotations

import io
import os
import struct
import zlib

import numpy as np

JPEG_Q = 4  # uniform quantization step for the lossy stub


# ---------------------------------------------------------------------------
# npy
# ---------------------------------------------------------------------------

def encode_npy(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def decode_npy(data: bytes) -> np.ndarray:
    return np.load(io.BytesIO(data), allow_pickle=False)


# ---------------------------------------------------------------------------
# png (8-bit grayscale, filter 0)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, planes_first: bool | None = None) -> bytes:
    """8-bit grayscale (H, W), RGB (H, W, 3) / (3, H, W), or RGBA
    (H, W, 4) / (4, H, W) PNG.

    ``planes_first`` pins the 3-D layout explicitly (True = (C, H, W), the
    reference's band-stack layout; False = channels-last).  The default
    infers it from the shape — but a (3, H, 3/4) or (4, H, 3/4) array is
    AMBIGUOUS under inference (both axes look like channels), so it raises
    rather than guess a scrambled image; pass ``planes_first`` there.

    A 2-D uint16 array encodes as 16-BIT grayscale (big-endian samples per
    the PNG spec) — the DEM/thermal-band case the reference reads through
    GDAL's wider pixel types [ref: mod/geo_raster_c.pyx:33-70]."""
    a16 = np.asarray(arr)
    if a16.ndim == 2 and a16.dtype == np.uint16:
        h, w = a16.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
        body = np.ascontiguousarray(a16.astype(">u2")).view(np.uint8) \
            .reshape(h, w * 2)
        buf = np.zeros((h, w * 2 + 1), dtype=np.uint8)
        buf[:, 1:] = body
        return (_PNG_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(buf.tobytes(), 6))
                + _chunk(b"IEND", b""))
    if a16.dtype.kind == "i" or (a16.dtype.kind == "u"
                                 and a16.dtype.itemsize > 1):
        # a silent uint8 cast would WRAP wider integer samples mod 256;
        # floats keep the legacy cast (every internal caller pre-clips)
        raise ValueError(
            f"encode_png: dtype {a16.dtype} would wrap in the uint8 cast "
            "(supported: uint8, float pre-clipped to [0,255], or 2-D "
            "uint16 for 16-bit grayscale) — cast explicitly")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3:
        if planes_first is None:
            pf_like = arr.shape[0] in (3, 4)
            cl_like = arr.shape[2] in (3, 4)
            if pf_like and cl_like:
                raise ValueError(
                    f"ambiguous 3-D layout {arr.shape}: both axis 0 and "
                    "axis 2 look like a channel axis — pass planes_first=")
            if not (pf_like or cl_like):
                raise ValueError(f"not an RGB/RGBA image shape: {arr.shape}")
            planes_first = pf_like
        if planes_first:
            if arr.shape[0] not in (3, 4):
                raise ValueError(f"planes-first needs (3|4, H, W), "
                                 f"got {arr.shape}")
            arr = np.ascontiguousarray(np.transpose(arr, (1, 2, 0)))
        elif arr.shape[2] not in (3, 4):
            raise ValueError(f"channels-last needs (H, W, 3|4), "
                             f"got {arr.shape}")
        h, w, nch = arr.shape
        ctype = 6 if nch == 4 else 2  # truecolor (+alpha)
    else:
        h, w = arr.shape
        ctype = 0  # grayscale
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    # filter byte column prepended in one buffer (no per-row Python join)
    buf = np.zeros((h, arr.reshape(h, -1).shape[1] + 1), dtype=np.uint8)
    buf[:, 1:] = arr.reshape(h, -1)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(buf.tobytes(), 6)) + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload, 0)
            if ctype not in (0, 2, 6) or depth not in (8, 16) \
                    or (depth == 16 and ctype != 0):
                raise NotImplementedError(
                    "only 8-bit gray/RGB/RGBA or 16-bit gray PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    bpp = nch * (depth // 8)   # filter lag is BYTES per pixel (PNG spec)
    rb = w * bpp               # row bytes
    raw = zlib.decompress(idat)
    stride = rb + 1
    flat = np.frombuffer(raw, dtype=np.uint8)

    def finish(bytes2d: np.ndarray) -> np.ndarray:
        if depth == 16:
            return np.ascontiguousarray(bytes2d).view(">u2") \
                .astype(np.uint16).reshape(h, w)
        return bytes2d.reshape(h, w, nch) if nch > 1 else bytes2d

    ftypes = flat[::stride]
    if not ftypes.any():  # all filter-0 rows (our own encoder's output):
        # one strided slice instead of a per-row Python loop
        body = flat.reshape(h, stride)[:, 1:]
        return finish(body.copy())
    if not (ftypes > 2).any():  # only None/Sub/Up: cumulative forms, no loop
        body = flat.reshape(h, stride)[:, 1:].copy()
        sub_rows = ftypes == 1
        if sub_rows.any():  # Sub inverts to per-byte-lane cumsum mod 256
            b3 = body.reshape(h, w, bpp)
            b3[sub_rows] = np.cumsum(b3[sub_rows], axis=1, dtype=np.uint64) \
                .astype(np.uint8)
        if (ftypes == 2).any():  # Up inverts to cumsum over maximal runs
            run_id = np.cumsum(ftypes != 2)
            body = np.concatenate([
                np.cumsum(g, axis=0, dtype=np.uint64).astype(np.uint8)
                for g in np.split(body, np.unique(run_id, return_index=True)[1][1:])])
        return finish(body)
    out = np.empty((h, rb), dtype=np.uint8)
    prev = np.zeros(rb, dtype=np.uint8)
    for r in range(h):
        ftype = raw[r * stride]
        line = np.frombuffer(raw, dtype=np.uint8, count=rb, offset=r * stride + 1)
        if ftype == 0:
            row = line.copy()
        elif ftype == 1:  # Sub: recurrence collapses to per-byte-lane cumsum
            row = line.reshape(w, bpp).astype(np.uint8)
            row = np.cumsum(row, axis=0, dtype=np.uint64).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            row = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average (sequential in x)
            row = np.zeros(rb, dtype=np.uint8)
            for x in range(rb):
                a = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth (sequential in x)
            row = np.zeros(rb, dtype=np.uint8)
            for x in range(rb):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {ftype} not supported")
        out[r] = row
        prev = row
    return finish(out)


# ---------------------------------------------------------------------------
# "jpeg" — deterministic lossy stub (quantize + deflate)
# ---------------------------------------------------------------------------

_JPGQ_MAGIC = b"JPGQ"


def encode_jpeg(arr: np.ndarray, q: int = JPEG_Q) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape
    quant = (arr // q).astype(np.uint8)
    head = _JPGQ_MAGIC + struct.pack(">IIB", w, h, q)
    return head + zlib.compress(quant.tobytes(), 6)


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != _JPGQ_MAGIC:
        if data[:2] == b"\xFF\xD8":  # real JFIF payload -> baseline decoder
            from . import jpeg as _jfif
            return _jfif.decode(data)
        raise ValueError("neither JPGQ stub nor JFIF payload")
    w, h, q = struct.unpack_from(">IIB", data, 4)
    quant = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w)
    return (quant.astype(np.uint16) * q + q // 2).clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# "jpg" — real baseline JFIF (geo_raster_spark.jpeg)
# ---------------------------------------------------------------------------

JFIF_QUALITY = 95  # PSNR ≈ 42 dB on noise-heavy bands (>= 40 dB parity gate)


def encode_jfif(arr: np.ndarray, quality: int = JFIF_QUALITY) -> bytes:
    from . import jpeg as _jfif
    return _jfif.encode(np.ascontiguousarray(arr, dtype=np.uint8), quality)


def decode_jfif(data: bytes) -> np.ndarray:
    from . import jpeg as _jfif
    return _jfif.decode(data)


# ---------------------------------------------------------------------------
# "grsc" — multi-dataset container (the reference's HDF file#dataset role)
# ---------------------------------------------------------------------------

_GRSC_MAGIC = b"GRSC\x01"
CONTAINER_FMT = "grsc"


def encode_container(datasets: dict) -> bytes:
    """``{name: (array_or_bytes, fmt)}`` -> one container payload holding
    independently-encoded named sub-datasets.

    Closes S16's container gap: the reference resolves ``file#dataset``
    refs into HDF sub-datasets (path resolution
    [ref: mod/geo_raster_ex_c.pyx:909-988]; Landsat SR band files
    [ref: lib/landsat_dataset.py:115-338]).  Here the container is a
    self-describing payload; a row references one sub-dataset as
    ``fmt = "grsc#<name>"`` and ``decode`` resolves it."""
    entries, blobs = [], []
    for name, (payload, fmt) in datasets.items():
        if not isinstance(payload, (bytes, bytearray)):
            payload = encode(payload, fmt)
        entries.append((name.encode(), fmt.encode(), len(payload)))
        blobs.append(bytes(payload))
    hlen = (len(_GRSC_MAGIC) + 2
            + sum(2 + len(n) + 2 + len(f) + 16 for n, f, _ in entries))
    head = io.BytesIO()
    head.write(_GRSC_MAGIC)
    head.write(struct.pack(">H", len(entries)))
    off = hlen
    for n, f, ln in entries:
        head.write(struct.pack(">H", len(n)) + n)
        head.write(struct.pack(">H", len(f)) + f)
        head.write(struct.pack(">QQ", off, ln))
        off += ln
    return head.getvalue() + b"".join(blobs)


def container_index(data) -> dict:
    """Container payload -> ``{name: (fmt, offset, length)}``.
    Truncated/corrupt headers raise a descriptive ValueError."""
    data = bytes(data)
    if data[:5] != _GRSC_MAGIC:
        raise ValueError("not a GRSC container payload")
    try:
        (cnt,) = struct.unpack_from(">H", data, 5)
        pos, out = 7, {}
        for _ in range(cnt):
            (nl,) = struct.unpack_from(">H", data, pos)
            pos += 2
            name = data[pos:pos + nl].decode()
            pos += nl
            (fl,) = struct.unpack_from(">H", data, pos)
            pos += 2
            fmt = data[pos:pos + fl].decode()
            pos += fl
            off, ln = struct.unpack_from(">QQ", data, pos)
            pos += 16
            if off + ln > len(data):
                raise ValueError(
                    f"GRSC container truncated: dataset {name!r} claims "
                    f"bytes [{off}, {off + ln}) of a {len(data)}-byte payload")
            out[name] = (fmt, off, ln)
        return out
    except (struct.error, UnicodeDecodeError) as e:
        raise ValueError(f"corrupt GRSC container header ({e})") from e


def decode_container(data, name: str) -> np.ndarray:
    """Resolve + decode one named sub-dataset (``file#dataset`` semantics)."""
    idx = container_index(data)
    if name not in idx:
        # ValueError, not KeyError: executors see ONE exception class for
        # corrupt/mismatched payloads (same boundary contract as the JPEG
        # decoder's struct/index/key translation — advice r4)
        raise ValueError(
            f"dataset {name!r} not in container (has {sorted(idx)})")
    fmt, off, ln = idx[name]
    return decode(bytes(data)[off:off + ln], fmt)


# ---------------------------------------------------------------------------
# dispatch + pluggable registry + metrics
# ---------------------------------------------------------------------------

def _encode_tif(arr):
    from . import tiff
    return tiff.encode_tiff(arr)


def _decode_tif(data):
    from . import tiff
    return tiff.decode_tiff(data)


_ENCODERS = {"npy": encode_npy, "png": encode_png, "jpeg": encode_jpeg,
             "jpg": encode_jfif, "tif": _encode_tif, "tiff": _encode_tif}
_DECODERS = {"npy": decode_npy, "png": decode_png, "jpeg": decode_jpeg,
             "jpg": decode_jfif, "tif": _decode_tif, "tiff": _decode_tif}


def register(fmt: str, decode_fn=None, encode_fn=None):
    """Pluggable codec seam — the deployment hook for the one acknowledged
    100 TB wall (pure-NumPy JPEG throughput, SCALE.md): a cluster image
    with a native codec (libjpeg-turbo / GDAL binding) registers it here
    and every decode/encode dispatch — tile_cut, zonal, multimodal,
    parity checks — flows through it with no other code change.  The
    in-repo pure-NumPy implementations stay the defaults.

    Returns the ``(previous_decode, previous_encode)`` pair so tests and
    scoped overrides can restore it."""
    prev = (_DECODERS.get(fmt), _ENCODERS.get(fmt))
    if decode_fn is not None:
        _DECODERS[fmt] = decode_fn
    if encode_fn is not None:
        _ENCODERS[fmt] = encode_fn
    return prev


def registered_formats() -> list:
    return sorted(set(_DECODERS) | set(_ENCODERS))


def encode(arr: np.ndarray, fmt: str) -> bytes:
    if fmt not in _ENCODERS:
        raise ValueError(f"no encoder for fmt {fmt!r} "
                         f"(registered: {registered_formats()})")
    return _ENCODERS[fmt](arr)


def decode(data: bytes, fmt: str) -> np.ndarray:
    """fmt-keyed decode branch (SURVEY.md §2.1 S16's Spark mapping).

    ``fmt = "grsc#<name>"`` resolves sub-dataset ``name`` out of a
    container payload (the reference's ``file#dataset`` refs)."""
    if "#" in fmt:
        base, name = fmt.split("#", 1)
        if base != CONTAINER_FMT:
            raise ValueError(f"dataset ref {fmt!r}: only "
                             f"'{CONTAINER_FMT}#<name>' payloads supported")
        return decode_container(data, name)
    if fmt not in _DECODERS:
        raise ValueError(f"no decoder for fmt {fmt!r} "
                         f"(registered: {registered_formats()})")
    return _DECODERS[fmt](data)


def encode_band_like(out, like_dtype) -> bytes:
    """Clip/round a computed stats plane to the SOURCE tiles' dtype and
    PNG-encode it — uint8 and uint16 tile products keep their range
    through overview/stack/focal pipelines instead of silently saturating
    at 255 (round-5 review).  Float tile products raise: these consumers
    emit PNG, which has no float sample type — keep float pipelines on
    GeoTIFF end to end."""
    dt = np.dtype(like_dtype)
    if dt == np.uint8:
        return encode_png(np.clip(np.round(out), 0, 255).astype(np.uint8))
    if dt == np.uint16:
        return encode_png(np.clip(np.round(out), 0, 65535)
                          .astype(np.uint16))
    raise ValueError(
        f"tile-consumer outputs are PNG (uint8/uint16); {dt} tile "
        "products have no PNG sample type — use a GeoTIFF-native pipeline")


def sniff_fmt(data: bytes):
    """Identify a payload by its magic bytes: png / tif / npy / jpg /
    grsc, or None.  Lets tile CONSUMERS (overviews, stacks, focal halo)
    accept any lossless tile product — tile_cut(out_fmt=) decides the
    encoding once and downstream operators never hard-code it."""
    head = bytes(data[:8])
    if head[:8] == _PNG_SIG:
        return "png"
    if head[:2] in (b"II", b"MM") and len(head) >= 4 and \
            head[2:4] in (b"\x2a\x00", b"\x00\x2a",    # classic (42)
                          b"\x2b\x00", b"\x00\x2b"):   # BigTIFF (43)
        return "tif"
    if head[:6] == b"\x93NUMPY":
        return "npy"
    if head[:2] == b"\xff\xd8":
        return "jpg"
    if head[:4] == b"GRSC":
        return "grsc"
    return None


def decode_auto(data: bytes) -> np.ndarray:
    """Sniff-and-decode (through the registry, so a seam-registered
    native codec serves these too)."""
    fmt = sniff_fmt(data)
    if fmt is None:
        raise ValueError("unrecognized payload (no PNG/TIFF/npy/JFIF/GRSC "
                         "signature)")
    if fmt == "grsc":
        raise ValueError("container payload needs an explicit "
                         "'grsc#<name>' dataset ref")
    return decode(bytes(data), fmt)


def is_lossless(fmt: str) -> bool:
    return fmt in ("npy", "png", "tif", "tiff")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB (inf when identical)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


# Bench-only seam demo (round-5 verdict #6): GSR_FASTJPEG=1 routes fmt
# 'jpg' decodes through the JVM ImageIO helper (geo_raster_spark.fastjpeg)
# — executors re-import this module in each Python worker, so the env gate
# registers the fast decoder cluster-wide with no code change, exactly the
# deployment story SCALE.md documents for a native codec.  The pure-NumPy
# decoder stays the default when the variable is unset.
if os.environ.get("GSR_FASTJPEG") == "1":
    try:
        from . import fastjpeg as _fastjpeg
        if _fastjpeg.available():
            _DECODERS["jpg"] = _fastjpeg.decode
            _DECODERS["tif"] = _DECODERS["tiff"] = _fastjpeg.decode_tif
    except Exception:
        pass  # bench-only: fall back to the pure-NumPy default
