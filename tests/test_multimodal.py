"""Multimodal operators: resize / feature-extract / frame-sample."""

import numpy as np
import pandas as pd
import pytest

from geo_raster_spark import codecs, synth
from geo_raster_spark.operators import multimodal as mm


def test_resize_nn_kernel():
    a = np.arange(16, dtype=np.float64).reshape(4, 4)
    up = mm.resize_nn(a, 8, 8)
    assert up.shape == (8, 8)
    # each source pixel becomes a 2x2 block
    np.testing.assert_array_equal(up[0:2, 0:2], np.full((2, 2), a[0, 0]))
    np.testing.assert_array_equal(up[6:8, 6:8], np.full((2, 2), a[3, 3]))
    down = mm.resize_nn(up, 4, 4)
    np.testing.assert_array_equal(down, a)


def test_resize_bilinear_kernel():
    const = np.full((10, 10), 37.0)
    np.testing.assert_allclose(mm.resize_bilinear(const, 7, 13), 37.0)
    # a linear ramp is reproduced exactly by bilinear interpolation
    ramp = np.tile(np.linspace(0, 99, 100), (10, 1))
    out = mm.resize_bilinear(ramp, 10, 50)
    # interior columns follow the same ramp at the new pixel centers
    fx = (np.arange(50) + 0.5) * 2 - 0.5
    want = np.clip(fx, 0, 99)
    np.testing.assert_allclose(out[5, 5:45], want[5:45], rtol=1e-12)


def test_resize_images_spark(spark):
    imgs = synth.images_df(spark, 12, 4, with_bytes=True)
    out = mm.resize_images(imgs, 32, 24, method="nearest").collect()
    assert len(out) == 12
    for r in out:
        assert (r["w"], r["h"], r["fmt"]) == (32, 24, "png")
        dec = codecs.decode(bytes(r["bytes"]), "png")
        assert dec.shape == (24, 32)
    # parity with the local kernel for one image
    src = imgs.orderBy("image_id").first()
    arr = codecs.decode(bytes(src["bytes"]), src["fmt"]).astype(np.float64)
    want = np.clip(np.round(mm.resize_nn(arr, 24, 32)), 0, 255).astype(np.uint8)
    got = [r for r in out if r["image_id"] == src["image_id"]][0]
    np.testing.assert_array_equal(codecs.decode(bytes(got["bytes"]), "png"), want)


def test_image_features_match_local(spark):
    imgs = synth.images_df(spark, 10, 4, with_bytes=True)
    got = mm.image_features(imgs).toPandas().set_index("image_id")
    for r in imgs.collect():
        a = codecs.decode(bytes(r["bytes"]), r["fmt"]).astype(np.float64)
        row = got.loc[r["image_id"]]
        np.testing.assert_allclose(row["mean"], a.mean(), rtol=1e-12)
        np.testing.assert_allclose(row["std"], a.std(), rtol=1e-12)
        np.testing.assert_allclose(row["p90"], np.percentile(a, 90), rtol=1e-12)
        assert 0.0 <= row["entropy"] <= 8.0


def test_frame_sample_real_mjpeg(spark):
    """Video = MJPEG (concatenated baseline JFIF frames, gray AND color):
    frame_sample must locate every frame structurally and return EXACTLY
    the pixels the in-repo JPEG codec decodes for that frame."""
    from geo_raster_spark import jpeg, synth

    gray = [synth.image_pixels(i, 16, 12, 1000 + i) for i in range(95)]
    rgb = [synth.image_pixels_rgb(i, 8, 8, 2000 + i) for i in range(30)]
    pay0 = mm.mjpeg_encode(gray, quality=90)
    pay1 = mm.mjpeg_encode(rgb, quality=90)
    vids = spark.createDataFrame(pd.DataFrame({
        "video_id": ["v0", "v1"],
        "bytes": [bytearray(pay0), bytearray(pay1)]}))
    a = mm.frame_sample(vids, every_n=10).toPandas() \
        .sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    assert len(a) == 10 + 3          # ceil(95/10), ceil(30/10)
    assert list(a[a["video_id"] == "v0"]["frame_idx"]) == list(range(0, 95, 10))
    np.testing.assert_allclose(
        a[a["video_id"] == "v0"]["t_sec"].values,
        np.arange(0, 95, 10) / 30.0)
    # the structural walk found the true frame boundaries
    offs0 = mm.mjpeg_offsets(pay0)
    assert len(offs0) == 95
    assert offs0[0][0] == 0 and offs0[-1][1] == len(pay0)
    # sampled frames decode EXACTLY what the codec returns per frame
    for _, r in a.iterrows():
        pay = pay0 if r["video_id"] == "v0" else pay1
        s, e = mm.mjpeg_offsets(pay)[r["frame_idx"]]
        want = jpeg.decode(pay[s:e])
        got = codecs.decode_png(bytes(r["frame"]))
        np.testing.assert_array_equal(got, want)
    # color video sampled as RGB (H, W, 3) with >= 40 dB vs the source
    f1 = codecs.decode_png(bytes(a[a["video_id"] == "v1"].iloc[0]["frame"]))
    assert f1.shape == (8, 8, 3)
    assert codecs.psnr(rgb[0], f1) >= 35.0


def test_mjpeg_offsets_truncated_stream_raises_descriptively():
    """ADVICE r3: truncated MJPEG payloads raise a descriptive ValueError
    instead of leaking index/substring errors."""
    frames = [synth.image_pixels(j, 16, 12, 7 + j) for j in range(3)]
    payload = mm.mjpeg_encode(frames, 90)
    full = mm.mjpeg_offsets(payload)
    assert len(full) == 3
    # cut inside the final frame's entropy data
    cut = payload[: full[-1][1] - 5]
    with pytest.raises(ValueError, match="MJPEG"):
        mm.mjpeg_offsets(cut)
    # stream whose very last byte is a lone 0xFF
    with pytest.raises(ValueError, match="MJPEG"):
        mm.mjpeg_offsets(payload[: full[0][1] - 2] + b"\xff")
    # truncation mid-marker-segment
    with pytest.raises(ValueError, match="MJPEG"):
        mm.mjpeg_offsets(payload[:10])
