"""Multimodal column operators over the images table (task-brief §multimodal:
decode / feature-extract / resize / frame-sample as Arrow-batched UDFs).

The payload contract is BASELINE.json's ``input_hint``: opaque ``binary``
bytes + typed metadata (``fmt``, ``w``, ``h``).  Decode is REAL for
png/npy/jpg/jpeg (``codecs``) AND for video: the video payload is an MJPEG
stream — concatenated baseline JFIF frames (grayscale or 4:4:4 color) —
split by a structural marker walk and decoded frame-by-frame with the
in-repo DCT+Huffman codec (``geo_raster_spark.jpeg``).  The round-2
deterministic stub decoder is gone.

Scale shape: every operator is ``mapInPandas`` over Arrow batches — one
Python worker per partition, NumPy-vectorized per image, no driver-side
loops, no shuffle (row-wise transforms; frame explode amplifies rows inside
the Arrow batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs


def resize_nn(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (the reference's resampling convention:
    truncation toward the source grid, same as warp's to_cell)."""
    h, w = arr.shape
    rows = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    cols = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return arr[rows[:, None], cols[None, :]]


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize, pixel-center aligned, pure NumPy."""
    h, w = arr.shape
    fy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    fx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :]
    a = arr.astype(np.float64)
    top = a[y0[:, None], x0[None, :]] * (1 - wx) + a[y0[:, None], x1[None, :]] * wx
    bot = a[y1[:, None], x0[None, :]] * (1 - wx) + a[y1[:, None], x1[None, :]] * wx
    return top * (1 - wy[:, 0])[:, None] + bot * wy[:, 0][:, None]


def resize_images(images: DataFrame, out_w: int, out_h: int,
                  method: str = "nearest", out_fmt: str = "png") -> DataFrame:
    """images(bytes, fmt, w, h, ...) -> same ids with resized payloads.

    Row-wise Arrow transform: no shuffle, decode+resize+encode per image."""
    cols = images.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in images.schema.fields)

    def work(it):
        for pdf in it:
            out = pdf.copy()
            for idx, r in pdf.iterrows():
                arr = codecs.decode(r["bytes"], r["fmt"]).astype(np.float64)
                res = (resize_nn(arr, out_h, out_w) if method == "nearest"
                       else resize_bilinear(arr, out_h, out_w))
                enc = codecs.encode(np.clip(np.round(res), 0, 255)
                                    .astype(np.uint8), out_fmt)
                out.at[idx, "bytes"] = enc
                out.at[idx, "fmt"] = out_fmt
                out.at[idx, "w"] = out_w
                out.at[idx, "h"] = out_h
            yield out[cols]

    return images.mapInPandas(work, schema=schema)


FEATURE_SCHEMA = ("image_id string, mean double, std double, p10 double, "
                  "p90 double, edge_energy double, entropy double")


def image_features(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Per-image scalar features from decoded pixels (the feature-extract
    slot): moments, percentiles, gradient energy, 8-bit entropy."""

    def work(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                a = codecs.decode(r["bytes"], r["fmt"]).astype(np.float64)
                gy, gx = np.gradient(a)
                hist = np.bincount(np.clip(a, 0, 255).astype(np.uint8).ravel(),
                                   minlength=256).astype(np.float64)
                p = hist / max(hist.sum(), 1.0)
                nz = p[p > 0]
                rows.append((r[id_col], float(a.mean()), float(a.std()),
                             float(np.percentile(a, 10)),
                             float(np.percentile(a, 90)),
                             float(np.mean(gx * gx + gy * gy)),
                             float(-(nz * np.log2(nz)).sum())))
            yield pd.DataFrame(rows, columns=["image_id", "mean", "std", "p10",
                                              "p90", "edge_energy", "entropy"])

    return images.mapInPandas(work, schema=FEATURE_SCHEMA)


# --- video frame sampling (MJPEG: concatenated baseline JFIF frames) ---------

FRAME_SCHEMA = ("video_id string, frame_idx int, t_sec double, "
                "w int, h int, frame binary")


def mjpeg_encode(frames, quality: int = 90) -> bytes:
    """Frames (each (H, W) gray or (H, W, 3) RGB uint8) -> MJPEG payload:
    back-to-back baseline JFIF frames (the classic Motion-JPEG stream)."""
    from .. import jpeg
    return b"".join(jpeg.encode(np.asarray(f), quality) for f in frames)


def mjpeg_offsets(payload: bytes) -> list:
    """(start, end) byte range of every JFIF frame in an MJPEG stream.

    Structural walk — segment lengths for marker segments, entropy-scan to
    the next true marker after SOS (0xFF00 stuffing and RSTn skipped) — not
    byte-pattern guessing, so FFD9-looking bytes inside quant tables can't
    split a frame."""
    import struct as _s
    offs = []
    pos, n = 0, len(payload)
    while pos < n - 1:
        if payload[pos:pos + 2] != b"\xff\xd8":
            raise ValueError(f"MJPEG: expected SOI at byte {pos}")
        start = pos
        pos += 2
        while True:
            if pos + 1 >= n:
                raise ValueError(
                    f"MJPEG: truncated stream (frame at {start} has no EOI)")
            if payload[pos] != 0xFF:
                raise ValueError(f"MJPEG: expected marker at byte {pos}")
            marker = payload[pos + 1]
            if marker == 0xD9:                                    # EOI
                pos += 2
                break
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:       # bare
                pos += 2
                continue
            if pos + 4 > n:
                raise ValueError(
                    f"MJPEG: truncated marker segment at byte {pos}")
            (ln,) = _s.unpack_from(">H", payload, pos + 2)
            pos += 2 + ln
            if marker == 0xDA:                                    # SOS
                while True:                # skip entropy-coded data
                    nxt = payload.find(b"\xff", pos)
                    if nxt < 0 or nxt >= n - 1:
                        raise ValueError(
                            "MJPEG: truncated stream (entropy data of frame "
                            f"at {start} ends without a marker)")
                    m2 = payload[nxt + 1]
                    if m2 == 0x00 or 0xD0 <= m2 <= 0xD7:
                        pos = nxt + 2
                        continue
                    pos = nxt
                    break
        offs.append((start, pos))
    return offs


def frame_sample(videos: DataFrame, every_n: int = 10,
                 fps: float = 30.0) -> DataFrame:
    """videos(video_id, bytes, ...) -> one row per sampled frame (every
    ``every_n``-th), frame payload PNG-encoded.

    REAL decode: the payload is an MJPEG stream; each sampled frame is
    located by the structural walk and decoded with the in-repo baseline
    JPEG codec (grayscale or 4:4:4 color — color frames land as RGB PNG).
    At scale the explode is map-side (rows amplify inside the Arrow batch,
    no shuffle), and only the SAMPLED frames pay a decode."""
    from .. import jpeg

    def work(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["bytes"])
                offs = mjpeg_offsets(payload)
                for fi in range(0, len(offs), every_n):
                    s, e = offs[fi]
                    fr = jpeg.decode(payload[s:e])
                    fh, fw = fr.shape[0], fr.shape[1]
                    rows.append((r["video_id"], int(fi), float(fi / fps),
                                 int(fw), int(fh), codecs.encode_png(fr)))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "t_sec",
                                              "w", "h", "frame"])

    return videos.mapInPandas(work, schema=FRAME_SCHEMA)
