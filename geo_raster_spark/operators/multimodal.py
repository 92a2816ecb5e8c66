"""Multimodal column operators over the images table (task-brief §multimodal:
decode / feature-extract / resize / frame-sample as Arrow-batched UDFs).

The payload contract is BASELINE.json's ``input_hint``: opaque ``binary``
bytes + typed metadata (``fmt``, ``w``, ``h``).  Decode is REAL for
png/npy/jpg/jpeg (``codecs``); video decode has no library in this
container, so ``frame_sample`` ships a clearly-marked deterministic stub
behind the same Spark plumbing (schema, batch shape, partitioning) a real
decoder would use — swap ``_fake_video_frames`` for an ffmpeg/pyav call and
nothing else changes.

Scale shape: every operator is ``mapInPandas`` over Arrow batches — one
Python worker per partition, NumPy-vectorized per image, no driver-side
loops, no shuffle (row-wise transforms).
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


# --- video frame sampling (decode stubbed; plumbing real) --------------------

FRAME_SCHEMA = ("video_id string, frame_idx int, t_sec double, "
                "w int, h int, frame binary")


def _fake_video_frames(video_id: str, payload: bytes, n_frames: int,
                       w: int, h: int, indices: np.ndarray) -> list:
    """DETERMINISTIC STUB for the video decoder: derives per-frame pixels
    from a SplitMix64 stream seeded by (payload digest, frame index) — the
    same shape, dtype and count a real decoder would return.  Swap for
    ffmpeg/pyav when available; callers see identical plumbing."""
    from ..synth import splitmix64
    import hashlib
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little") or 1
    outs = []
    for fi in indices:
        idx = (np.arange(h * w, dtype=np.uint64)
               + np.uint64((seed + int(fi) * 0x9E3779B9) % 2 ** 63))
        frame = (splitmix64(idx) >> np.uint64(56)).astype(np.uint8).reshape(h, w)
        outs.append(frame)
    return outs


def frame_sample(videos: DataFrame, every_n: int = 10,
                 fps: float = 30.0) -> DataFrame:
    """videos(video_id, bytes, n_frames, w, h) -> one row per sampled frame
    (every ``every_n``-th), frame payload PNG-encoded.

    Real plumbing, stubbed decode (no video lib in this container — the
    stub is deterministic so tests pin exact bytes).  At scale the explode
    is map-side (rows amplify inside the Arrow batch, no shuffle)."""

    def work(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                n = int(r["n_frames"])
                idx = np.arange(0, n, every_n, dtype=np.int64)
                frames = _fake_video_frames(r["video_id"], bytes(r["bytes"]),
                                            n, int(r["w"]), int(r["h"]), idx)
                for fi, fr in zip(idx, frames):
                    rows.append((r["video_id"], int(fi), float(fi / fps),
                                 int(r["w"]), int(r["h"]),
                                 codecs.encode_png(fr)))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "t_sec",
                                              "w", "h", "frame"])

    return videos.mapInPandas(work, schema=FRAME_SCHEMA)
